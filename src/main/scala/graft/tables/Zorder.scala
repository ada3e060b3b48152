package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering values for [[CowTable.compactZOrder]]
  * — the space-filling-curve layout production formats use for
  * multi-column data skipping (Delta `OPTIMIZE ZORDER BY`, the
  * Iceberg z-ordering rewrite action):
  *
  *   1. each clustering column maps to its QUANTILE RANK (a fixed set
  *      of cut points from one `approxQuantile` pass) — rank, not raw
  *      value, so skewed columns still split the data evenly;
  *   2. the per-column rank bits INTERLEAVE (bit j of column i lands
  *      at position j·nCols + i), so nearby z-values are nearby in
  *      EVERY clustering dimension at once;
  *   3. bucketing rows by z-value then gives each bucket a tight
  *      min/max zone map on every z column simultaneously — the
  *      property one-column sorting can only deliver for its own
  *      column.
  *
  * Everything is a codegen'd Column expression over literal cut
  * points: the rank is Σ(col > cut) comparisons, the interleave is
  * shift/mask arithmetic. No UDF, no shuffle of its own — the z-value
  * rides the rewrite's existing partitioned write.
  */
object Zorder {

  /** Per-column quantile cut points (nLevels−1 each), ONE
    * `approxQuantile` pass over all columns. */
  def boundaries(df: DataFrame, cols: Seq[String],
                 nLevels: Int): Seq[Array[Double]] = {
    val probs = (1 until nLevels).map(_.toDouble / nLevels).toArray
    df.stat.approxQuantile(cols.toArray, probs, 0.001).toSeq
  }

  /** Quantile rank of `c` against `cuts`: Σ (c > cut) — a chain of
    * literal comparisons, fully codegen'd. */
  def level(c: Column, cuts: Array[Double]): Column =
    cuts.map(b => when(c.cast("double") > lit(b), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))

  /** Bit-interleaved z-value of the columns' quantile ranks
    * (`bitsPerCol` bits each). */
  def zValue(cols: Seq[Column], cuts: Seq[Array[Double]],
             bitsPerCol: Int): Column = {
    val n = cols.length
    cols.zip(cuts).zipWithIndex.map { case ((c, b), i) =>
      val l = level(c, b)
      (0 until bitsPerCol).map { j =>
        shiftleft(shiftright(l, j).bitwiseAND(lit(1)), j * n + i)
      }.reduce(_ + _) // disjoint bit positions: + ≡ bitwise OR
    }.reduce(_ + _)
  }
}

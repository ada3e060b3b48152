package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent
  * right row with `right.ts <= left.ts` on the same key — the
  * time-series join a training pipeline uses to attach
  * latest-known-state (features, labels, user profile versions) to
  * events without leaking the future.
  *
  * Spark has no native ASOF JOIN; preference order from the build
  * guide is (a) compose existing ops before (c) a custom
  * LogicalPlan/Strategy. This IS expressible as composition with the
  * right plan shape, so no custom node is warranted:
  * union both sides tagged, one window over (key, ts) carrying the
  * last non-null right payload forward, keep left rows. Cost: ONE
  * hash-partition shuffle on the key + a per-partition sort — the
  * same lower bound a dedicated sort-merge as-of exec would have.
  * (A range/as-of join via inequality join would be O(n·m) nested
  * loop in Spark — the window formulation avoids that cliff.)
  *
  * Ties (`left.ts == right.ts`) see the right row (the `side` column
  * orders rights before lefts at equal timestamps), matching
  * DuckDB/pandas `merge_asof` inclusive semantics.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns survive
    * @param right     state side: key, ts, and `valueCols` payload
    * @param key       equi-join key column name (both sides)
    * @param ts        event-time column name (both sides)
    * @param valueCols right payload columns to carry (null when no
    *                  right row at or before the left row's ts)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           valueCols: Seq[String]): DataFrame = {
    val side = "__graft_side"
    val pay = "__graft_payload"
    val l = left.withColumn(side, lit(1))
    val r = right.select((Seq(key, ts) ++ valueCols).map(col): _*).withColumn(side, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // The whole right payload rides in ONE struct: the struct is
    // non-null for every right row even when all its payload fields
    // are NULL, so `last(..., ignoreNulls)` latches onto the matched
    // row itself — a legitimately-NULL payload from the as-of row is
    // preserved instead of surfacing an older non-null value. The
    // struct also serves as a deterministic tiebreaker for multiple
    // right rows at an identical (key, ts): ascending order makes
    // `last` pick the greatest payload, stable across runs.
    val payload = when(col(side) === 0, struct(valueCols.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side), payload)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn(pay, last(payload, ignoreNulls = true).over(w))
    valueCols.foldLeft(filled) { (df, c) => df.withColumn(c, col(pay).getField(c)) }
      .filter(col(side) === 1)
      .drop(side, pay)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` on the same key — the lookahead twin of
    * [[asOf]] (next reading, next price tick, label-at-horizon).
    * Identical plan shape and cost: the union/window trick mirrored —
    * right rows order AFTER left rows at an equal timestamp (so the
    * inclusive tie is ahead of the probe in frame direction) and
    * `first(..., ignoreNulls)` over the forward frame latches the
    * next right payload. Same leakage discipline, opposite direction:
    * backward as-of never reads the future, forward as-of reads ONLY
    * the future (plus the inclusive tie).
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                  valueCols: Seq[String]): DataFrame = {
    val side = "__graft_side"
    val pay = "__graft_payload"
    val l = left.withColumn(side, lit(0))
    val r = right.select((Seq(key, ts) ++ valueCols).map(col): _*).withColumn(side, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val payload = when(col(side) === 1, struct(valueCols.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side), payload)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned.withColumn(pay, first(payload, ignoreNulls = true).over(w))
    valueCols.foldLeft(filled) { (df, c) => df.withColumn(c, col(pay).getField(c)) }
      .filter(col(side) === 0)
      .drop(side, pay)
  }
}

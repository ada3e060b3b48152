package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for data-quality monitoring: per column the row
  * count, null count, distinct count, and min/max — the health check a
  * pipeline runs on every ingest batch before anything trains on it.
  *
  * Two variants with the same output shape:
  *  - [[profileExact]]: exact distincts via `count(DISTINCT c)`. With
  *    k profiled columns Catalyst plans one Expand (k× row
  *    amplification before partial aggregation) — fine for dimension
  *    tables and ingest batches, and it is the DuckDB-mirrorable
  *    oracle twin.
  *  - [[profileApprox]]: HLL sketches (`approx_count_distinct`), one
  *    flat pass, NO Expand — the 100 TB fact-table path; everything
  *    except n_distinct is still exact.
  *
  * min/max surface as strings so one relation profiles heterogeneous
  * columns; keep float columns out of oracle-pinned profiles (engine
  * float→string formatting differs).
  */
object Profile {

  private def shape(df: DataFrame, cols: Seq[String],
                    distinct: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      distinct(c).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }

  def profileExact(df: DataFrame, cols: Seq[String]): DataFrame =
    shape(df, cols, c => countDistinct(col(c)))

  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    shape(df, cols, c => approx_count_distinct(col(c), rsd))
}

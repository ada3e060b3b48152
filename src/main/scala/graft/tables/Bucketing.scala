package graft.tables

import org.apache.spark.sql.DataFrame

/** Bucketed (pre-partitioned) storage: the co-location strategy that
  * removes the shuffle from repeated joins/aggregations on a fixed
  * key. At 100 TB, bucketing the fact table by its join/group key
  * turns every downstream `groupBy(key)` and bucketed-bucketed join
  * into a zero-exchange plan — the shuffle is paid once at write
  * time instead of per query. (See BucketingSpec: the aggregation
  * plan over a bucketed table contains no Exchange.)
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. `buckets` should match downstream parallelism (a
    * divisor/multiple of shuffle.partitions keeps AQE happy).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}

package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned storage layout — the piece that makes the
  * reference's incremental sync (`after`-timestamp reads,
  * `internal/strava/strava.go:54-58` / `Reads.since`) scale: with
  * events laid out by day, a "last 24 h" read touches one or two
  * directories of a 100 TB store instead of scanning it. Partition
  * values live in the directory structure, so pruning happens at
  * planning time (`PartitionFilters` in the scan node) — zero data
  * files from excluded days are even listed.
  *
  * Day granularity is the deliberate default: hourly partitioning at
  * high event rates produces the classic small-file explosion
  * (24× the directories, each with per-executor fragments), while
  * monthly makes the incremental read re-scan up to 30 days. Pair
  * with `Bucketing.writeBucketed` when the downstream join key is
  * stable (date prunes the scan, buckets co-locate the join).
  */
object Partitioned {

  /** Materialize events partitioned by event date. The extra shuffle
    * on the partition column before the write keeps one output file
    * per (day × shuffle partition) instead of one per (input
    * partition × day) — the difference between a clean layout and a
    * small-file explosion when input partitioning doesn't align with
    * event time.
    */
  def writeByDate(events: DataFrame, dir: String, tsCol: String = "ts"): Unit =
    events
      .withColumn("event_date", to_date(col(tsCol)))
      .repartition(col("event_date"))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(dir)

  /** Incremental read over the partitioned store: the date predicate
    * prunes at planning time; the residual timestamp predicate pushes
    * down into the surviving files' row groups.
    */
  def readSince(spark: SparkSession, dir: String, sinceTs: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("event_date") >= to_date(lit(sinceTs)) &&
        col("ts") >= to_timestamp_ntz(lit(sinceTs)))

  /** Idempotent backfill: overwrite ONLY the partitions present in
    * `batch`, leaving every other day untouched — dynamic partition
    * overwrite, the write mode that makes re-running a day's job safe.
    * The default (static) overwrite mode would DROP the whole table
    * first; the conf is set per-write and restored, so the session's
    * global behavior is unchanged.
    */
  def backfillDays(batch: DataFrame, dir: String, tsCol: String = "ts"): Unit = {
    val spark = batch.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try
      batch
        .withColumn("event_date", to_date(col(tsCol)))
        .repartition(col("event_date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

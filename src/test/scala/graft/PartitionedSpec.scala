package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tables.{Partitioned, Tables}

class PartitionedSpec extends SparkSpec {

  test("date-partitioned incremental read prunes partitions and matches the full-scan filter") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events_by_date"
    val events = Tables.events(spark, sf)
    Partitioned.writeByDate(events, dir)

    val cutoff = "2024-01-20 00:00:00"
    val pruned = Partitioned.readSince(spark, dir, cutoff)
    val full = spark.read.parquet(dir)

    // correctness: identical rows to filtering the unpartitioned table
    // (collect() so the metrics below belong to this same execution)
    val expected = events.filter(col("ts") >= to_timestamp_ntz(lit(cutoff))).count()
    assert(pruned.collect().length.toLong === expected)

    // pruning: the executed scan touched strictly fewer files than the
    // store holds (inputFiles lists pre-pruning, so use scan metrics)
    val allFiles = full.inputFiles.length
    val finalPlan = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = finalPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles > 0 && readFiles < allFiles,
      s"expected pruning: read $readFiles of $allFiles files")

    // the pruned scan carries a planning-time partition filter
    assert(scan.toString.contains("PartitionFilters") &&
      scan.toString.contains("event_date"))
  }

  test("backfillDays overwrites only the batch's partitions (idempotent re-run)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_backfill").toString + "/by_date"
    val events = Tables.events(spark, sf)
    Partitioned.writeByDate(events, dir)
    val before = spark.read.parquet(dir)
      .groupBy($"event_date").count().as[(java.sql.Date, Long)].collect().toMap
    assert(before.size > 1)

    // re-run one day's job with a modified batch (half the rows)
    val day = before.keys.minBy(_.getTime)
    val batch = events
      .filter(to_date($"ts") === lit(day) && $"event_id" % 2 === 0)
    val expectedDay = batch.count()
    Partitioned.backfillDays(batch, dir)

    val after = spark.read.parquet(dir)
      .groupBy($"event_date").count().as[(java.sql.Date, Long)].collect().toMap
    assert(after(day) === expectedDay)              // target day replaced
    assert((after - day) === (before - day))        // every other day untouched
    // re-running the identical backfill changes nothing (idempotent)
    Partitioned.backfillDays(batch, dir)
    val again = spark.read.parquet(dir)
      .groupBy($"event_date").count().as[(java.sql.Date, Long)].collect().toMap
    assert(again === after)
  }
}

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
}

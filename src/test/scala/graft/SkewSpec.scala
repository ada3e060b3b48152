package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.tables.Tables

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, (r._2, math.round(r._3 * 100))))
      .toMap
    val salted = Skew.saltedCountSum(ev, "user_id", "value", salts = 8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, (r._2, math.round(r._3 * 100))))
      .toMap
    assert(salted === plain)
  }

  test("AQE splits a skewed join partition at runtime (complement to salting)") {
    // Force small AQE thresholds so the hot key trips the skew split
    // on fixture-scale data; at 100 TB the defaults fire on real
    // skew. The plan must be read from the SAME Dataset's
    // QueryExecution AFTER its action (a fresh one says
    // isFinalPlan=false — the r1 lesson).
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(200000)
        .select(when($"id" % 10 < 9, 0L).otherwise($"id").as("k"), $"id".as("v"))
      val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("w"))
      val j = left.join(right, "k")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"))
      assert(p.contains("skew=true") && p.contains("AQEShuffleRead skewed"),
        s"AQE did not split the skewed partition:\n${p.take(2000)}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join") {
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id")
    val dim = Tables.customer(spark, sf)
      .select($"c_custkey".as("user_id"), $"c_name")
    val plain = ev.join(dim, "user_id")
      .select($"event_id", $"c_name").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(ev, dim, "user_id", salts = 4)
      .select($"event_id", $"c_name").as[(Long, String)].collect().toSet
    assert(salted === plain)
  }
}

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

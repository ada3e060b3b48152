package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("point-in-interval: exact membership incl. boundaries, multi-bucket intervals") {
    val points = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),  // == interval start (inclusive)
      (2L, 7L, ts("2024-01-01 13:30:00")),  // inside a 4-hour interval
      (3L, 7L, ts("2024-01-01 14:00:00")),  // == interval end (inclusive)
      (4L, 7L, ts("2024-01-01 15:00:00")),  // outside
      (5L, 9L, ts("2024-01-01 13:30:00"))   // right time, wrong user
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (7L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00"))
    ).toDF("user_id", "iv_id", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
        Seq("user_id"), bucketWidthUs = 3600L * 1000000L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("bucketized rewrite plans as an equi join, never a nested loop") {
    val ev = tables.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val sess = graft.operators.Analytics.sessionize(tables.Tables.events(spark, sf))
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"))
    val joined = RangeJoin.pointInInterval(
      ev, sess, "ts", "session_start", "session_end", Seq("user_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not be a nested loop:\n$plan")
    // sessions partition each user's events: one row back per event
    assert(joined.count() === ev.count())
  }
}

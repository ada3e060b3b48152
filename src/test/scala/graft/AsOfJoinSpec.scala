package graft

import org.apache.spark.sql.Row

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("basic as-of: latest right row at or before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-01 09:00:00"))   // before any right row
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "v1"),
      (1L, ts("2024-01-01 11:00:00"), "v2")
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .orderBy($"t").select("v").as[Option[String]].collect().toSeq
    assert(out === Seq(None, Some("v1"), Some("v2")))
  }

  test("tie on ts: the right row at exactly left.ts is visible") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "exact")).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .select("v").as[String].head()
    assert(out === "exact")
  }

  test("a legitimately-NULL payload from the matched row is preserved") {
    // right@11:00 has v = NULL; a left row at 12:00 must see that NULL,
    // not the older non-null v1 (the pre-fix behavior ADVICE flagged).
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some("v1")),
      (1L, ts("2024-01-01 11:00:00"), None: Option[String])
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .select("v").as[Option[String]].head()
    assert(out === None)
  }

  test("duplicate right rows at one (key, ts): deterministic winner") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b")
    ).toDF("k", "t", "v")
    def run() = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .select("v").as[String].head()
    val first = run()
    assert(first === "b") // greatest payload wins under the struct order
    assert((1 to 5).forall(_ => run() === first))
  }

  test("multiple keys stay independent; missing key yields nulls") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("k", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "k1")).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .orderBy($"k").collect().map(r => Option(r.getAs[String]("v"))).toSeq
    assert(out === Seq(Some("k1"), None))
  }
}

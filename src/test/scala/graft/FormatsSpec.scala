package graft

import org.apache.spark.sql.functions._

import graft.sources.Formats

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("csv round trip survives quotes, commas, newlines, unicode, nulls") {
    val tricky = Seq(
      (0L, """{"k": "v,with,commas"}"""),
      (1L, "a \"quoted\" thing"),
      (2L, "line1\nline2"),
      (3L, "tab\there — ünïcodé 中文 𝒳"),
      (4L, null.asInstanceOf[String]),
      (5L, ""),
      (6L, "trailing space ")
    ).toDF("id", "s")
    val back = Formats.csvRoundTrip(tricky, s"tricky:${System.nanoTime()}")
      .orderBy($"id")
    val got = back.as[(Long, Option[String])].collect().toSeq
    val want = tricky.orderBy($"id").as[(Long, Option[String])].collect().toSeq
    // CSV cannot distinguish null from empty string; both sides empty-ish
    val normalize = (xs: Seq[(Long, Option[String])]) =>
      xs.map { case (i, s) => (i, s.filter(_.nonEmpty)) }
    assert(normalize(got) === normalize(want))
  }

  test("csv and orc round trips reproduce the events table exactly") {
    val events = tables.Tables.events(spark, sf)
    val base = events.orderBy($"event_id").collect().toSeq
    val csv = Formats.csvRoundTrip(events, s"spec:$sf")
      .orderBy($"event_id").collect().toSeq
    val orc = Formats.orcRoundTrip(events, s"spec:$sf")
      .orderBy($"event_id").collect().toSeq
    assert(csv === base)   // NTZ micros, doubles, JSON props all exact
    assert(orc === base)
  }
}

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
    // exact — the explicit nullValue/emptyValue options keep NULL ≠ ""
    // through the round trip (row 4 must come back None, row 5 Some(""))
    assert(got === want)
    assert(got(4)._2 === None)
    assert(got(5)._2 === Some(""))
  }

  test("schema evolution: mergeSchema unions writer versions, old rows null-fill") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
    // v1 writer: (id, name); v2 adds a column
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "c", 0.5)).toDF("id", "name", "score")
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("batch", "id", "name", "score"))
    val rows = merged.select($"id", $"score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(0.5)))
    // default read (no mergeSchema) picks ONE file's schema — the trap
    // this spec documents: old batches silently lose the new column
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= merged.columns.length)
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

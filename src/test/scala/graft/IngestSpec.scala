package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Ingest

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: normalize + LWW merge across micro-batches") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val stage = s"$root/stage"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(stage).mkdirs()

    // batch 1: two events
    Files.writeString(java.nio.file.Path.of(stage, "b1.json"),
      """{"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "click", "value": 1.0, "props": "{}"}
        |{"event_id": 2, "ts": "2024-01-01 11:00:00", "user_id": 8, "event_type": "view", "value": 2.0, "props": "{}"}
        |""".stripMargin)
    val q1 = Ingest.start(spark, stage, store, ckpt)
    q1.awaitTermination()

    // batch 2: update event 2 (later ts) + new event 3 + stale dup of 2
    Files.writeString(java.nio.file.Path.of(stage, "b2.json"),
      """{"event_id": 2, "ts": "2024-01-01 12:00:00", "user_id": 8, "event_type": "purchase", "value": 9.0, "props": "{}"}
        |{"event_id": 2, "ts": "2024-01-01 09:00:00", "user_id": 8, "event_type": "stale", "value": 0.0, "props": "{}"}
        |{"event_id": 3, "ts": "2024-01-01 13:00:00", "user_id": 9, "event_type": "signup", "value": 3.0, "props": "{}"}
        |""".stripMargin)
    val q2 = Ingest.start(spark, stage, store, ckpt)
    q2.awaitTermination()

    val out = spark.read.parquet(store)
    assert(out.count() === 3)
    val e2 = out.filter($"event_id" === 2L).head()
    assert(e2.getAs[String]("event_type") === "purchase") // LWW within batch
    assert(e2.getAs[Double]("value") === 9.0)
    assert(out.filter($"event_id" === 3L).count() === 1)
  }

  test("normalize applies the incremental after-predicate") {
    val raw = Seq(
      """{"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"}""",
      """{"event_id": 2, "ts": "2024-02-01 00:00:00", "user_id": 1, "event_type": "b", "value": 2.0, "props": "{}"}"""
    ).toDF("value")
    val out = Ingest.normalize(raw, Some("2024-01-15 00:00:00"))
    assert(out.select("event_id").as[Long].collect().toSeq === Seq(2L))
  }
}

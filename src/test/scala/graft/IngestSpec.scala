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

  test("maxFilesPerTrigger drains a backlog as several bounded batches") {
    val root = Files.createTempDirectory("graft_ingest_mft").toString
    val stage = s"$root/stage"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(stage).mkdirs()
    // 4 staged files, capped at 1 file per micro-batch
    for (i <- 1 to 4)
      Files.writeString(java.nio.file.Path.of(stage, s"f$i.json"),
        s"""{"event_id": $i, "ts": "2024-01-01 0$i:00:00", "user_id": $i, "event_type": "e$i", "value": $i.0, "props": "{}"}\n""")
    val q = Ingest.start(spark, stage, store, ckpt, maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) === 4) // one file per batch
    val out = spark.read.parquet(store)
    assert(out.count() === 4) // every bounded batch merged, none lost
  }

  test("recoverStore: completed tmp with missing store finishes the rename") {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val root = Files.createTempDirectory("graft_recover1").toString
    val store = new org.apache.hadoop.fs.Path(s"$root/store")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/store__tmp")
    // simulate a crash between delete(store) and rename(tmp, store):
    // tmp holds a fully-committed parquet dir, store is gone
    Seq((1L, "kept")).toDF("event_id", "v").write.parquet(tmp.toString)
    assert(fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")))
    Ingest.recoverStore(fs, store, tmp)
    assert(fs.exists(store) && !fs.exists(tmp))
    assert(spark.read.parquet(store.toString).count() === 1) // nothing lost
  }

  test("recoverStore: incomplete tmp is rolled back, store untouched") {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val root = Files.createTempDirectory("graft_recover2").toString
    val store = new org.apache.hadoop.fs.Path(s"$root/store")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/store__tmp")
    Seq((1L, "old")).toDF("event_id", "v").write.parquet(store.toString)
    // crash mid-write: tmp exists but has no _SUCCESS marker
    fs.mkdirs(tmp)
    fs.create(new org.apache.hadoop.fs.Path(tmp, "part-0.parquet")).close()
    Ingest.recoverStore(fs, store, tmp)
    assert(!fs.exists(tmp))
    assert(spark.read.parquet(store.toString).count() === 1) // old store intact
  }

  test("recoverStore: complete tmp alongside a live store is discarded") {
    // the batch never committed to the checkpoint (crash before the
    // delete), so it will replay — keeping tmp would double-merge it
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val root = Files.createTempDirectory("graft_recover3").toString
    val store = new org.apache.hadoop.fs.Path(s"$root/store")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/store__tmp")
    Seq((1L, "live")).toDF("event_id", "v").write.parquet(store.toString)
    Seq((2L, "uncommitted")).toDF("event_id", "v").write.parquet(tmp.toString)
    Ingest.recoverStore(fs, store, tmp)
    assert(!fs.exists(tmp))
    assert(spark.read.parquet(store.toString)
      .select("v").as[String].head() === "live")
  }

  test("corrupt records are quarantined with reasons, not dropped or merged") {
    val root = Files.createTempDirectory("graft_ingest_rej").toString
    val stage = s"$root/stage"; val store = s"$root/store"
    val ckpt = s"$root/ckpt"; val rejects = s"$root/rejects"
    new java.io.File(stage).mkdirs()
    Files.writeString(java.nio.file.Path.of(stage, "mixed.json"),
      """{"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "click", "value": 1.0, "props": "{}"}
        |this is not json at all
        |{"ts": "2024-01-01 11:00:00", "user_id": 8, "event_type": "view", "value": 2.0, "props": "{}"}
        |{"event_id": 4, "ts": "not-a-timestamp", "user_id": 9, "event_type": "view", "value": 3.0, "props": "{}"}
        |""".stripMargin)
    val q = Ingest.start(spark, stage, store, ckpt, rejectsDir = Some(rejects))
    q.awaitTermination()

    val stored = spark.read.parquet(store)
    assert(stored.count() === 1)
    assert(stored.select("event_id").as[Long].head() === 1L)

    val rej = spark.read.parquet(rejects)
      .select("reject_reason").as[String].collect().sorted.toSeq
    assert(rej === Seq("bad_timestamp", "malformed_json", "missing_key"))
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

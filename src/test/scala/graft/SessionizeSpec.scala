package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** TIMESTAMP_NTZ-typed source row — `java.time.LocalDateTime` encodes as
  * TIMESTAMP_NTZ, the type the engine's tables actually carry (the
  * `java.sql.Timestamp`-based [[Sessionize.Event]] encodes as TIMESTAMP,
  * which is NOT what the driver fixture supplies — r3 shipped a broken
  * streaming entry because the spec only covered the TIMESTAMP shape).
  */
case class NtzEvent(event_id: Long, ts: java.time.LocalDateTime,
                    user_id: Long, event_type: String, value: Double)

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Instant =
    Instant.parse(f"2024-01-01T10:$minute%02d:00Z")

  test("watermarked hourly aggregation emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.hourlyCounts(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      Event(1, Instant.parse("2024-01-01T10:05:00Z"), 7, "click", 1.0),
      Event(2, Instant.parse("2024-01-01T10:50:00Z"), 7, "click", 2.0))
    q.processAllAvailable()
    // advance the watermark beyond 11:00 so the 10:00 window finalizes
    in.addData(Event(3, Instant.parse("2024-01-01T12:00:00Z"), 7, "click", 3.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM hourly").collect()
    q.stop()
    assert(out.exists(r => r.getAs[Long]("n") === 2L)) // 10:00 window, both events
  }

  test("hourly aggregation accepts a TIMESTAMP_NTZ source and emits NTZ hours") {
    implicit val sqlCtx = spark.sqlContext
    import java.time.LocalDateTime
    val in = MemoryStream[NtzEvent]
    val out = Sessionize.hourlyCounts(in.toDF(), watermark = "10 minutes")
    assert(out.schema("hour").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val q = out.writeStream.format("memory").queryName("hourly_ntz")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      NtzEvent(1, LocalDateTime.parse("2024-01-01T10:05:00"), 7, "click", 1.0),
      NtzEvent(2, LocalDateTime.parse("2024-01-01T10:50:00"), 7, "click", 2.0))
    q.processAllAvailable()
    in.addData(NtzEvent(3, LocalDateTime.parse("2024-01-01T12:00:00"), 7, "click", 3.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM hourly_ntz").collect()
    q.stop()
    val w = rows.find(r => r.getAs[Long]("n") === 2L)
    assert(w.isDefined) // 10:00 window finalized with both events
    assert(w.get.getAs[LocalDateTime]("hour") === LocalDateTime.parse("2024-01-01T10:00:00"))
    assert(w.get.getAs[Double]("sum_value") === 3.0)
  }

  test("stream-static enrich joins the dim per micro-batch on an NTZ source") {
    implicit val sqlCtx = spark.sqlContext
    import java.time.LocalDateTime
    import org.apache.spark.sql.functions.col
    val dim = Seq((7L, 3), (8L, 5)).toDF("user_id", "nation_key")
    val in = MemoryStream[NtzEvent]
    val out = Sessionize.enrichedHourly(in.toDF(), dim, watermark = "10 minutes")
    assert(out.schema("hour").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val q = out.writeStream.format("memory").queryName("enrich_ntz")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      NtzEvent(1, LocalDateTime.parse("2024-01-01T10:05:00"), 7, "click", 1.0),
      NtzEvent(2, LocalDateTime.parse("2024-01-01T10:20:00"), 7, "click", 1.0),
      NtzEvent(3, LocalDateTime.parse("2024-01-01T10:50:00"), 9, "click", 2.0))
    q.processAllAvailable()
    in.addData(NtzEvent(4, LocalDateTime.parse("2024-01-01T12:00:00"), 8, "click", 3.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM enrich_ntz").collect()
    q.stop()
    val byNation = rows.map(r =>
      (if (r.isNullAt(1)) -1 else r.getInt(1)) -> r.getAs[Long]("n")).toMap
    assert(byNation(3) === 2L)   // user 7 → nation 3, two events
    assert(byNation(-1) === 1L)  // user 9 has no dim row → null nation
  }

  test("stream-stream attribution joins within the window, across batches") {
    implicit val sqlCtx = spark.sqlContext
    import java.time.LocalDateTime
    val in = MemoryStream[NtzEvent]
    val q = graft.streaming.StreamJoin.attribution(in.toDF(), windowMinutes = 30)
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      NtzEvent(1, LocalDateTime.parse("2024-01-01T10:00:00"), 7, "click", 0.0),
      NtzEvent(2, LocalDateTime.parse("2024-01-01T10:10:00"), 7, "purchase", 5.0))
    q.processAllAvailable()
    in.addData( // cross-batch match: click from batch 0 state
      NtzEvent(3, LocalDateTime.parse("2024-01-01T10:20:00"), 7, "purchase", 5.0),
      // outside the 30-min window → no match
      NtzEvent(4, LocalDateTime.parse("2024-01-01T11:00:00"), 7, "purchase", 5.0),
      // different user → no match
      NtzEvent(5, LocalDateTime.parse("2024-01-01T10:05:00"), 8, "purchase", 5.0))
    q.processAllAvailable()
    val pairs = spark.sql("SELECT click_id, purchase_id FROM attr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs === Set((1L, 2L), (1L, 3L)))
  }

  test("streaming dedup drops re-delivered keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.dedupStream(in.toDF(), Seq("event_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(1, ts(0), 7, "click", 1.0),  // same-batch duplicate
      Event(2, ts(1), 7, "view", 2.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(2), 7, "click", 1.0)) // re-delivery, later batch
    q.processAllAvailable()
    val out = spark.sql("SELECT event_id FROM deduped").as[Long].collect().sorted
    q.stop()
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("streaming dedup accepts a TIMESTAMP_NTZ source (engine convention)") {
    implicit val sqlCtx = spark.sqlContext
    import java.time.LocalDateTime
    val in = MemoryStream[NtzEvent]
    val q = Sessionize.dedupStream(in.toDF(), Seq("event_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped_ntz")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      NtzEvent(1, LocalDateTime.parse("2024-01-01T10:00:00"), 7, "click", 1.0),
      NtzEvent(1, LocalDateTime.parse("2024-01-01T10:00:00"), 7, "click", 1.0),
      NtzEvent(2, LocalDateTime.parse("2024-01-01T10:01:00"), 7, "view", 2.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT event_id FROM deduped_ntz").as[Long].collect().sorted
    q.stop()
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("gap sessionization: one session per burst, closed by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.sessions(spark, in.toDS(), gapMinutes = 10, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    // burst 1: 10:00-10:05 (3 events); burst 2: 10:40-10:42 (2 events)
    in.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(3), 7, "view", 2.0),
      Event(3, ts(5), 7, "click", 3.0),
      Event(4, ts(40), 7, "click", 4.0),
      Event(5, ts(42), 7, "view", 5.0))
    q.processAllAvailable()
    // push the watermark far ahead so the second session times out
    in.addData(Event(6, Instant.parse("2024-01-01T13:00:00Z"), 99, "click", 0.0))
    q.processAllAvailable()
    in.addData(Event(7, Instant.parse("2024-01-01T15:00:00Z"), 99, "click", 0.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM sessions WHERE user_id = 7 ORDER BY session_start")
      .as[Session].collect()
    q.stop()
    assert(out.length === 2)
    assert(out(0) === Session(7L, ts(0), ts(5), 3L, 6.0))
    assert(out(1) === Session(7L, ts(40), ts(42), 2L, 9.0))
  }

  test("native session_window: exact-gap merges, strictly-greater gap splits") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.sessionWindowCounts(in.toDF(), gapMinutes = 10,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("swnative")
      .outputMode(OutputMode.Append()).start()
    // 10:05 merges (5 < 10); 10:15 is EXACTLY 10 after 10:05 and still
    // MERGES (measured — split is strictly greater, same convention as
    // the lag/cumsum batch oracle); 10:26 is 11 after 10:15 → splits.
    in.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(5), 7, "view", 2.0),
      Event(3, ts(15), 7, "click", 3.0),
      Event(4, ts(26), 7, "view", 4.0))
    q.processAllAvailable()
    in.addData(Event(5, Instant.parse("2024-01-01T13:00:00Z"), 99, "click", 0.0))
    q.processAllAvailable()
    in.addData(Event(6, Instant.parse("2024-01-01T15:00:00Z"), 99, "click", 0.0))
    q.processAllAvailable()
    val out = spark.sql(
        "SELECT session_start, session_end, n_events FROM swnative " +
        "WHERE user_id = 7 ORDER BY session_start")
      .as[(Instant, Instant, Long)].collect()
    q.stop()
    assert(out.length === 2)
    assert(out(0) === ((ts(0), ts(25), 3L)))   // end = last event + gap
    assert(out(1) === ((ts(26), ts(36), 1L)))
  }

  test("session totals are exact at DECIMAL(12,2) regardless of event order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.sessions(spark, in.toDS(), gapMinutes = 10, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_cents")
      .outputMode(OutputMode.Append()).start()
    // 0.1 + 0.2 + 0.3 in floats ≠ 0.6; in cents it is exactly 0.6
    in.addData(
      Event(1, ts(0), 7, "click", 0.1),
      Event(2, ts(1), 7, "click", 0.2),
      Event(3, ts(2), 7, "click", 0.3))
    q.processAllAvailable()
    in.addData(Event(4, Instant.parse("2024-01-01T13:00:00Z"), 99, "click", 0.0))
    q.processAllAvailable()
    in.addData(Event(5, Instant.parse("2024-01-01T15:00:00Z"), 99, "click", 0.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM sessions_cents WHERE user_id = 7")
      .as[Session].collect()
    q.stop()
    assert(out.length === 1)
    assert(out(0).total_value === 0.6) // exact, not 0.6000000000000001
  }
}

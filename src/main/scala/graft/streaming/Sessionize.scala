package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream processing beyond the reference's needs (its sync
  * loop is stateless upsert — SURVEY §2.7): event-time windowed
  * aggregation with watermarking, and gap-based sessionization with
  * explicit keyed state via `flatMapGroupsWithState`.
  *
  * Scale notes: both operators shuffle once on the grouping key and
  * keep per-key state in the state store (RocksDB-backed on a real
  * cluster); the watermark bounds state size — without it, windows/
  * sessions for quiet keys would accumulate forever at 100 TB/day
  * ingest rates.
  */
object Sessionize extends Serializable {

  /** `Instant` event time encodes as TIMESTAMP at MICROsecond precision
    * — the engine's tables carry micros (`Tables.events` truncates the
    * source nanos), and a `java.sql.Timestamp.getTime`-based state
    * would silently round session bounds to milliseconds and break the
    * stream ≡ batch hash pin against the micro-exact batch oracle.
    */
  case class Event(event_id: Long, ts: Instant, user_id: Long,
                   event_type: String, value: Double)

  /** Keyed state in integer domains only: event-time micros and value
    * cents (DECIMAL(12,2) convention), so the accumulated session is
    * independent of batch boundaries and within-batch row order —
    * float addition order would otherwise leak into `total_value`.
    */
  case class SessionState(startUs: Long, lastUs: Long, n: Long, cents: Long)

  case class Session(user_id: Long, session_start: Instant,
                     session_end: Instant, n_events: Long, total_value: Double)

  private def toUs(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private def fromUs(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  /** value → exact cents, same rounding as Spark's CAST(v AS DECIMAL(12,2)). */
  private def toCents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** Event-time tumbling-window aggregation with a watermark: the
    * streaming shape of `Analytics.eventsHourly`. Append mode — a
    * window only emits once the watermark passes its end, so results
    * are final. The sum runs in exact DECIMAL then casts to double
    * (the engine's float-aggregate convention): the value is then
    * independent of batch boundaries and row order, which is what lets
    * the driver pin stream ≡ batch by hash.
    */
  /** Watermark an event-time column that may be TIMESTAMP_NTZ (the
    * engine's table convention — GraftSession pins the session TZ to
    * UTC, so the NTZ→TZ cast is lossless). Spark streaming watermarks
    * require TIMESTAMP; r3 shipped a broken driver entry because the
    * spec fixture only ever supplied TIMESTAMP.
    */
  private def watermarked(df: DataFrame, tsCol: String, delay: String): DataFrame = {
    val ntz = df.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    val in = if (ntz) df.withColumn(tsCol, col(tsCol).cast("timestamp")) else df
    in.withWatermark(tsCol, delay)
  }

  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    // Watermark and window on TIMESTAMP, cast the emitted hour back so
    // the streaming result is schema-identical to the batch
    // `Analytics.eventsHourly`.
    val ntzIn = events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    val agg = watermarked(events, "ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(28, 2))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    if (ntzIn) agg.withColumn("hour", col("hour").cast("timestamp_ntz")) else agg
  }

  /** Stream-static enrichment — the remaining core Structured
    * Streaming join shape: the event stream joins a STATIC broadcast
    * dimension (re-planned per micro-batch, so a dim refresh between
    * batches is picked up) before the watermarked windowed
    * aggregation. `dim` must be pre-projected to (user_id, dim cols).
    *
    * Sentinels are NOT filtered here: a pre-aggregation filter gets
    * pushed below the EventTimeWatermark operator by Catalyst, so the
    * sentinels would never advance event time and trailing windows
    * would stay unfinalized (observed: the last watermark-delay's
    * worth of hours silently missing). They flow through the join
    * (null dim), land in their far-future window, and callers drop
    * them by output hour.
    */
  def enrichedHourly(events: DataFrame, dim: DataFrame,
                     watermark: String = "2 hours"): DataFrame = {
    val ntzIn = events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    val agg = watermarked(events, "ts", watermark)
      .join(broadcast(dim), Seq("user_id"), "left")
      .groupBy(window(col("ts"), "1 hour"), col("nation_key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("nation_key"), col("n"))
    if (ntzIn) agg.withColumn("hour", col("hour").cast("timestamp_ntz")) else agg
  }

  /** Native merging session windows in streaming — the built-in
    * alternative to [[sessions]]' explicit flatMapGroupsWithState:
    * `session_window` merges overlapping [ts, ts+gap) windows in the
    * state store and append mode emits a session once the watermark
    * passes its end. Boundary semantics (measured, spec-pinned): a gap
    * of EXACTLY `gapMinutes` still MERGES — sessions split only on a
    * strictly greater gap, the same `>` convention as the lag/cumsum
    * batch sessionization and [[sessions]]' explicit state.
    */
  def sessionWindowCounts(events: DataFrame, gapMinutes: Int = 30,
                          watermark: String = "2 hours"): DataFrame = {
    val ntzIn = events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    val agg = watermarked(events, "ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    if (ntzIn)
      agg.withColumn("session_start", col("session_start").cast("timestamp_ntz"))
        .withColumn("session_end", col("session_end").cast("timestamp_ntz"))
    else agg
  }

  /** Streaming exact dedup: drop rows whose `keyCols` were already
    * seen, with state bounded by the watermark — the streaming twin of
    * `Dedup.exact` and the first pass of a continuous training-data
    * ingest (the same event re-delivered by an at-least-once source
    * must not enter the corpus twice). `dropDuplicatesWithinWatermark`
    * evicts per-key state once the watermark passes, so state size
    * tracks the dedup horizon, not the stream's lifetime — the only
    * formulation that survives an unbounded stream.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    watermarked(events, tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap-based sessionization: events for a user belong to one session
    * while the gap between consecutive events stays under
    * `gapMinutes`. Sessions are emitted when the gap elapses
    * (event-time timeout driven by the watermark).
    */
  def sessions(spark: SparkSession, events: Dataset[Event],
               gapMinutes: Int = 30, watermark: String = "2 hours"): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def flush(uid: Long, st: SessionState): Session =
      Session(uid, fromUs(st.startUs), fromUs(st.lastUs), st.n, st.cents / 100.0)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => toUs(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = toUs(e.ts)
              cur match {
                case Some(st) if t - st.lastUs <= gapUs =>
                  cur = Some(st.copy(lastUs = math.max(st.lastUs, t),
                    n = st.n + 1, cents = st.cents + toCents(e.value)))
                case Some(st) =>
                  closed ::= flush(uid, st)
                  cur = Some(SessionState(t, t, 1L, toCents(e.value)))
                case None =>
                  cur = Some(SessionState(t, t, 1L, toCents(e.value)))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // GroupState timeouts are in epoch MILLIseconds — round the
              // micro deadline up so a timeout never fires early.
              state.setTimeoutTimestamp(
                Math.addExact(st.lastUs + gapUs, 999L) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}

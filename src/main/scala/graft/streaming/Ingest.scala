package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Merge

/** Streaming ingest path — the Spark-native re-expression of the
  * reference's hourly sync job (`internal/strava/strava.go:48-83`,
  * `:261-273`): staged JSON events → schema-on-read normalize →
  * idempotent keyed merge into the store.
  *
  * The reference polls one page per hour and upserts row-by-row (N+1
  * round trips). Here the same semantics are one `foreachBatch` merge
  * per micro-batch: late/duplicate records are handled by the
  * last-writer-wins upsert exactly as the reference's ON CONFLICT
  * (SURVEY §2.7 — no watermark needed for correctness; the merge IS
  * the dedup). `Trigger.AvailableNow` gives the scheduled-batch
  * flavor; a real deployment on 100 TB runs the same code with file
  *-source maxFilesPerTrigger to bound batch size, and the merge
  * becomes MERGE INTO under a table format.
  */
object Ingest {

  /** Wire schema of staged activity events (JSON lines). */
  val eventJsonSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),          // RFC3339 / SQL timestamp text
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize a raw JSON-line frame: typed projection + timestamp
    * parse (the `activityToMap` flatten, `strava.go:86-100`) and the
    * incremental `after` predicate (`strava.go:54-58`). Unparseable
    * rows are dropped — use [[splitRejects]] when they must be
    * quarantined instead.
    */
  def normalize(raw: DataFrame, after: Option[String]): DataFrame = {
    val typed = raw
      .select(from_json(col("value"), eventJsonSchema).as("j"))
      .select(col("j.event_id"), to_timestamp_ntz(col("j.ts")).as("ts"),
        col("j.user_id"), col("j.event_type"), col("j.value"), col("j.props"))
      .filter(col("event_id").isNotNull)
    after.map(a => typed.filter(col("ts") >= to_timestamp_ntz(lit(a)))).getOrElse(typed)
  }

  /** Split a raw JSON-line frame into (valid typed rows, rejects).
    * A row is rejected — with its raw line and a reason, never
    * silently dropped — when the JSON doesn't parse, the key is
    * missing, or the timestamp is unparseable. At ingest scale the
    * quarantine is what makes bad upstream data debuggable: the
    * store stays clean AND the evidence survives.
    */
  def splitRejects(raw: DataFrame): (DataFrame, DataFrame) = {
    // PERMISSIVE parse with an explicit corrupt-record column:
    // from_json never yields a null struct for garbage, it yields
    // all-null fields — the _corrupt capture is what distinguishes
    // "unparseable line" from "parseable but incomplete".
    val schemaWithCorrupt = StructType(
      eventJsonSchema.fields :+ StructField("_corrupt", StringType))
    val parsed = raw
      .select(col("value").as("raw_line"),
        from_json(col("value"), schemaWithCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(col("raw_line"), col("j"),
        col("j.event_id").as("event_id"),
        // try_cast: under ANSI a bad timestamp must land in the
        // quarantine as a row, not kill the batch as an exception
        col("j.ts").try_cast("timestamp_ntz").as("ts"),
        col("j.user_id").as("user_id"), col("j.event_type").as("event_type"),
        col("j.value").as("value"), col("j.props").as("props"))
    val reason = when(col("j").isNull || col("j._corrupt").isNotNull, "malformed_json")
      .when(col("event_id").isNull, "missing_key")
      .when(col("j.ts").isNotNull && col("ts").isNull, "bad_timestamp")
    val valid = parsed.filter(reason.isNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val rejects = parsed.filter(reason.isNotNull)
      .select(col("raw_line"), reason.as("reject_reason"))
    (valid, rejects)
  }

  /** Start the ingest stream: text files in `stageDir` → normalize →
    * LWW-merge each micro-batch into the parquet store at `storeDir`.
    * Returns the query handle (caller awaits/stops).
    *
    * `maxFilesPerTrigger` bounds micro-batch size — the Spark twin of
    * the reference's page cap (`strava.go:54-58` `Page(1)`/
    * `PerPage(100)`): under `AvailableNow` a large backlog is drained
    * as several bounded batches instead of one unbounded one.
    */
  def start(spark: SparkSession, stageDir: String, storeDir: String,
            checkpointDir: String, after: Option[String] = None,
            maxFilesPerTrigger: Option[Int] = None,
            rejectsDir: Option[String] = None): StreamingQuery = {
    val reader = spark.readStream.format("text")
    val bounded = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
    val raw = bounded.load(stageDir)
    // With a rejects sink, parsing moves inside foreachBatch so each
    // micro-batch can fork valid/reject; without one, the normalize
    // stays on the streaming plan (rejects drop, as before).
    val (streamed, perBatch): (DataFrame, (DataFrame, Long) => Unit) =
      rejectsDir match {
        case Some(rd) =>
          (raw, (batch: DataFrame, batchId: Long) => {
            val (valid, rejects) = splitRejects(batch)
            val kept = after.map(a =>
              valid.filter(col("ts") >= to_timestamp_ntz(lit(a)))).getOrElse(valid)
            rejects.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(rd)
            mergeBatch(kept, storeDir)
          })
        case None =>
          (normalize(raw, after),
            (batch: DataFrame, _: Long) => mergeBatch(batch, storeDir))
      }
    streamed.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(perBatch)
      .start()
  }

  /** One micro-batch merge: read current store, LWW-upsert the batch
    * (batch wins), swap via a temp dir. Under a table format this is a
    * single MERGE INTO.
    *
    * Crash safety: the swap is write-tmp → delete-store → rename-tmp,
    * which is NOT atomic on its own — a crash between the delete and
    * the rename would leave only `__tmp`. [[recoverStore]] runs before
    * every merge and completes (or rolls back) an interrupted swap, so
    * the invariant is "recover-then-merge never loses ingested data",
    * with the un-merged batch replayed from the streaming checkpoint.
    */
  private[streaming] def mergeBatch(batch: DataFrame, storeDir: String): Unit = {
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val tmp = new org.apache.hadoop.fs.Path(storeDir + "__tmp")
    recoverStore(fs, store, tmp)
    val merged =
      if (fs.exists(store)) {
        // Deduplicate within the batch first (a micro-batch can carry
        // several versions of one key), then merge over the store.
        val current = spark.read.parquet(storeDir)
        val batchDeduped = dedupeBatch(batch)
        Merge.upsert(current, batchDeduped, Seq("event_id"))
      } else dedupeBatch(batch)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(store)) fs.delete(store, true)
    fs.rename(tmp, store)
  }

  /** Complete or roll back a swap interrupted by a crash. `_SUCCESS`
    * (written last by the parquet committer) marks `__tmp` complete:
    *  - tmp complete and store missing → the crash hit between delete
    *    and rename; finish the rename (the merged data is all there).
    *  - any other leftover tmp (incomplete write, or complete but the
    *    store was never deleted → that batch never committed to the
    *    checkpoint either) → discard tmp; the batch replays.
    */
  private[graft] def recoverStore(fs: org.apache.hadoop.fs.FileSystem,
      store: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(tmp)) {
      val complete = fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
      if (complete && !fs.exists(store)) fs.rename(tmp, store)
      else fs.delete(tmp, true)
    }

  /** Within-batch LWW: keep the latest `ts` per key (window over the
    * small batch only — see Merge.upsert's plan-shape note).
    */
  private def dedupeBatch(batch: DataFrame): DataFrame =
    Merge.latestPerKey(batch, Seq("event_id"), "ts")
}

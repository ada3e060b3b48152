package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import java.util.Comparator
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Document-stream replay harness: replays the `documents` table as a
  * REAL two-micro-batch stream (even doc_ids land in batch 0, odd in
  * batch 1 — two staged files with ordered mtimes under
  * `maxFilesPerTrigger=1`), applying a per-batch BATCH transform via
  * `foreachBatch` — the Trigger.AvailableNow batch-inference pattern a
  * deployed quality gate runs (score each arriving micro-batch against
  * a static persisted model; no cross-batch state, so stream ≡ batch
  * by construction and the driver's oracle pins it).
  *
  * No watermark/sentinel machinery: doc-level ops carry no event-time
  * state — that's [[Replay]]'s job for the events table.
  */
object DocReplay {

  private val staged = TrieMap.empty[String, Path]
  private val runSeq = new AtomicInteger(0)

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).iterator().asScala
        .foreach(f => Files.deleteIfExists(f))

  private def partFiles(dir: Path): Set[Path] =
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-")).toSet

  /** Stage `docs` once per (process, key, schema): two parquet files
    * with strictly ordered modification times.
    */
  def stagedDocs(spark: SparkSession, docs: DataFrame, key: String,
                 idCol: String = "doc_id"): Path =
    staged.getOrElseUpdate(s"$key#$idCol#${docs.schema.catalogString.hashCode}", {
      val base = Files.createTempDirectory("graft_docreplay_")
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(base)))
      val stage = base.resolve("stage")
      docs.filter(col(idCol) % 2 === 0)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val t0 = partFiles(stage).map(f => Files.getLastModifiedTime(f).toMillis).max
      val before = partFiles(stage)
      docs.filter(col(idCol) % 2 === 1)
        .coalesce(1).write.mode("append").parquet(stage.toString)
      (partFiles(stage) -- before).foreach(f =>
        Files.setLastModifiedTime(f, FileTime.fromMillis(t0 + 60000L)))
      base
    })

  /** Replay the staged docs through `op` applied PER MICRO-BATCH
    * (foreachBatch), appending each batch's output to a parquet sink;
    * returns a batch DataFrame over the union of emissions.
    */
  def run(spark: SparkSession, docs: DataFrame, key: String,
          idCol: String = "doc_id")
         (op: DataFrame => DataFrame): DataFrame =
    runWithBatchId(spark, docs, key, idCol)((df, _) => op(df))

  /** [[run]] with the micro-batch id surfaced to `op` — the hook an
    * idempotent sink needs (foreachBatch is at-least-once; a retried
    * batch re-arrives under the SAME id, so a batchId-keyed overwrite
    * target absorbs the redelivery — see
    * [[graft.tables.VectorIndex.append]]).
    */
  def runWithBatchId(spark: SparkSession, docs: DataFrame, key: String,
                     idCol: String = "doc_id")
                    (op: (DataFrame, Long) => DataFrame): DataFrame = {
    val base = stagedDocs(spark, docs, key, idCol)
    val n = runSeq.incrementAndGet()
    val out = base.resolve(s"out_$n")
    val ck = base.resolve(s"ck_$n")
    Replay.withReplayShuffle(spark) {
      val src = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(base.resolve("stage").toString)
      val q = src.writeStream
        .option("checkpointLocation", ck.toString)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          // batchId-keyed root + overwrite: foreachBatch is
          // at-least-once, and a redelivered batch must REPLACE its
          // prior attempt's emissions, not append next to them.
          op(df, batchId).write.mode("overwrite")
            .parquet(out.resolve(s"b_$batchId").toString)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    deleteTree(ck)
    spark.read.option("recursiveFileLookup", "true").parquet(out.toString)
  }
}

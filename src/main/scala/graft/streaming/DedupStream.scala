package graft.streaming

import java.nio.file.{Files, Path}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.DedupIndex

/** Streaming EXACT near-dedup — the continuous-ingest loop run for
  * real: micro-batches of fresh documents arrive over the [[DocReplay]]
  * harness and dedup against a GROWING standing set (seeded with the
  * corpus) via the lossless prefix join with the ARRIVAL-ORDER rule:
  * everything already seen vetoes a newcomer regardless of id; ids
  * order only within a batch.
  *
  * The standing set accretes EVERY processed doc, not just survivors —
  * the batch family's partner rule (a dropped doc still vetoes later
  * lookalikes), which is also what makes the replay's output
  * SQL-mirrorable: the oracle encodes arrival order as (corpus vetoes
  * all) ∪ (batch-0 vetoes batch-1) ∪ (same-batch lower-id vetoes).
  *
  * Cross-batch state is the PERSISTED artifact store
  * ([[DedupIndex]]): the seed corpus pays one create (shingles → df →
  * prefix postings, each stored), and every micro-batch then pays
  * batch-sized work only — its own shingle/posting build, broadcast
  * against standing artifacts that are READ, never re-derived. No
  * standing text is stored, so the per-batch full-corpus rescan the
  * naive loop does is unrepresentable here. Batch increments land in
  * batchId-keyed roots with overwrite and [[DedupIndex.dedupBatch]]
  * reads only ids below the current batch — an at-least-once
  * redelivery replaces its own prior attempt and can never make the
  * batch veto itself. Survivors are materialized via localCheckpoint
  * BEFORE the batch's increments land in the store.
  *
  * The whole store lives under a per-run temp dir deleted when the
  * replay completes (and by a shutdown hook if the run dies) — the
  * replay's own output sink is the only thing that outlives the run.
  */
object DedupStream {

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).iterator().asScala
        .foreach(f => Files.deleteIfExists(f))

  def run(spark: SparkSession, corpus: DataFrame, fresh: DataFrame,
          key: String, threshold: Double = 0.5): DataFrame = {
    val cols = Seq(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val base = Files.createTempDirectory("graft_dedupstream_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(base)))
    val dir = base.resolve("index").toString
    DedupIndex.create(spark, corpus.select(cols: _*), dir,
      threshold = threshold)
    val out = DocReplay.runWithBatchId(spark, fresh.select(cols: _*), key) {
      (batch, batchId) =>
        // Append-first (r17): the batch's shingle sets + postings are
        // built ONCE, landed in the store, and read back for the dedup
        // join — the old order built them twice (once in-flight for
        // the join, once for the append) and needed an eager
        // localCheckpoint so the lazy survivors wouldn't observe the
        // store mutating under them. dedupBatchStored reads only roots
        // with id < batchId, so the batch can never veto itself, and a
        // redelivery still overwrites its own roots before re-reading.
        DedupIndex.append(spark, dir, batch, batchId)
        DedupIndex.dedupBatchStored(spark, dir, batch, batchId,
          standingVetoes = true)
    }
    // Replay done: the output sink holds the survivors; drop the
    // store NOW so its parquet + temp state never pressure the next
    // query in the JVM (bench quarantine — r16 watch item).
    deleteTree(base)
    out
  }
}

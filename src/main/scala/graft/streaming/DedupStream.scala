package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming EXACT near-dedup — the continuous-ingest loop run for
  * real: micro-batches of fresh documents arrive over the [[DocReplay]]
  * harness and dedup against a GROWING standing set (seeded with the
  * corpus) via the lossless prefix join
  * ([[Dedup.dedupIncrementalExact]] with `standingVetoes` — the
  * ARRIVAL-ORDER rule: everything already seen vetoes a newcomer
  * regardless of id; ids order only within a batch).
  *
  * The standing set accretes EVERY processed doc, not just survivors —
  * the batch family's partner rule (a dropped doc still vetoes later
  * lookalikes), which is also what makes the replay's output
  * SQL-mirrorable: the oracle encodes arrival order as (corpus vetoes
  * all) ∪ (batch-0 vetoes batch-1) ∪ (same-batch lower-id vetoes).
  *
  * Cross-batch state is a parquet accumulator per run (the
  * store-swap discipline of [[Ingest]] without the swap — appends are
  * new files only, and survivors are materialized via localCheckpoint
  * BEFORE the batch lands in the store, so a batch can never veto
  * itself).
  */
object DedupStream {

  def run(spark: SparkSession, corpus: DataFrame, fresh: DataFrame,
          key: String, threshold: Double = 0.5): DataFrame = {
    val cols = Seq(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val standingDir = Files.createTempDirectory("graft_dedupstream_")
      .resolve("standing").toString
    corpus.select(cols: _*).write.mode("overwrite").parquet(standingDir)
    DocReplay.run(spark, fresh.select(cols: _*), key) { batch =>
      val standing = spark.read.parquet(standingDir)
      val survivors = Dedup.dedupIncrementalExact(standing, batch,
          threshold = threshold, standingVetoes = true)
        .localCheckpoint(true) // materialize BEFORE the store append
      batch.write.mode("append").parquet(standingDir)
      survivors
    }
  }
}

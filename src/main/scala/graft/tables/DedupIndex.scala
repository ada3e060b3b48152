package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted standing artifacts for the EXACT (lossless prefix-join)
  * near-dedup family — what a continuous 100 TB ingest actually
  * stores, so a micro-batch never re-reads or re-derives anything
  * corpus-sized:
  *
  *   - `dir/df`          (h, df)         — the seed corpus's document-
  *     frequency relation. df carries NO correctness weight beyond
  *     ORDERING tokens (PLANS.md r16b: the order is the only shared
  *     artifact), so it is FROZEN at create time: every batch cuts
  *     its prefixes under the same total order (unseen tokens order
  *     as df = 0 — still total, ties by hash), which is exactly what
  *     the positional filter's soundness needs. Re-deriving df from
  *     the grown corpus per batch would change nothing downstream —
  *     the final Jaccard verify is order-free — at two corpus-sized
  *     aggregations per batch of cost.
  *   - `dir/toks_seed`, `dir/toks_batch_<id>` (doc_id, sh, n) —
  *     shingle SETS (the verify pass's partner fetch).
  *   - `dir/pref_seed`, `dir/pref_batch_<id>` (doc_id, n, i, h) —
  *     rarest-first order-prefix postings (the candidate join's
  *     build input).
  *   - `dir/params`      (shingle_k, threshold) — inference params
  *     ride with the artifact (the [[WordpieceModel]] rule: a store
  *     cut at one threshold probed at another silently weakens the
  *     prefix bound below losslessness).
  *
  * Batch roots are keyed by the DELIVERY id and written with
  * overwrite — the [[VectorIndex]]/[[InvertedIndex]] at-least-once
  * discipline: a redelivered batch replaces its own prior attempt
  * instead of double-counting, and [[dedupBatch]] reads only roots
  * with id < the current batch, so a batch whose previous attempt
  * already appended can never veto itself. Standing roots are never
  * read-modified or rewritten: append-only, fingerprint-stable
  * (DedupIndexSpec pins (path, size) across appends).
  *
  * Per-batch cost shape: one fresh-side shingle + posting build
  * (batch-sized), then joins where every fresh relation (postings,
  * candidate pairs, shingle sets) is BROADCAST — the standing
  * postings/toks stream through probe-side with no shuffle and no
  * recomputation; nothing text-sized is stored at all, so a standing
  * text rescan is unrepresentable by construction. The remaining
  * corpus-proportional term is the sequential columnar scan of the
  * skinny standing postings/toks (8-byte hashes + lengths); at
  * cluster scale Spark's runtime bloom-filter join injection over
  * the broadcast fresh side turns that into row-group skipping on
  * the sorted posting files.
  */
object DedupIndex {

  /** Build the standing store from the seed corpus: one shingle pass
    * over the text, then df and postings derived from the PERSISTED
    * toks relation (three artifact passes, zero re-shingling).
    */
  def create(spark: SparkSession, corpus: DataFrame, dir: String,
             shingleK: Int = 3, threshold: Double = 0.5): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // Overlap independent jobs (guide §2.6): the params write shares
    // no lineage with the artifact chain — run it while the toks →
    // df → pref chain (which IS sequentially dependent) executes.
    val paramsF = Future {
      spark.range(1)
        .select(lit(shingleK).as("shingle_k"), lit(threshold).as("threshold"))
        .write.mode("overwrite").parquet(s"$dir/params")
    }
    Dedup.shingleSets(corpus, shingleK)
      .write.mode("overwrite").parquet(s"$dir/toks_seed")
    val toks = spark.read.parquet(s"$dir/toks_seed")
    toks.select(explode(col("sh")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/df")
    Dedup.prefixPostings(toks, spark.read.parquet(s"$dir/df"), threshold)
      .write.mode("overwrite").parquet(s"$dir/pref_seed")
    Await.result(paramsF, Duration.Inf)
    paramsMemo.put(dir, (shingleK, threshold))
  }

  // Params are immutable once written (create overwrites the memo
  // below) and read on every append/dedupBatch — memoizing saves two
  // driver-blocking parquet-read jobs per micro-batch (r17).
  private val paramsMemo =
    scala.collection.concurrent.TrieMap.empty[String, (Int, Double)]

  /** (shingle_k, threshold) from the artifact — one row by construction. */
  def params(spark: SparkSession, dir: String): (Int, Double) =
    paramsMemo.getOrElseUpdate(dir, {
      val r = spark.read.parquet(s"$dir/params")
        .select(col("shingle_k"), col("threshold")).collect().head
      (r.getInt(0), r.getDouble(1))
    })

  /** Roll the store forward with one processed batch's increments —
    * batch-sized work under the FROZEN df order, landed in the
    * batch's own root with overwrite (redelivery replaces itself).
    * The batch is recorded whether or not its docs survived dedup:
    * a dropped doc still vetoes later lookalikes (the family's
    * partner rule).
    */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             batchId: Long): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val (shingleK, threshold) = params(spark, dir)
    // r18: the batch's shingle sets pin once in memory, and the two
    // artifact writes — which no longer depend on each other once
    // both read the pin — run as concurrent jobs (guide §2.6). Both
    // complete before append returns, so dedupBatchStored's read-back
    // contract and the redelivery-overwrite semantics are unchanged.
    val toks = Dedup.shingleSets(batch, shingleK).localCheckpoint()
    val toksF = Future {
      toks.write.mode("overwrite").parquet(s"$dir/toks_batch_$batchId")
    }
    val prefF = Future {
      Dedup.prefixPostings(toks, spark.read.parquet(s"$dir/df"), threshold)
        .write.mode("overwrite").parquet(s"$dir/pref_batch_$batchId")
    }
    Await.result(toksF, Duration.Inf)
    Await.result(prefF, Duration.Inf)
  }

  /** Batch roots with id < `before` (local listing — the harness runs
    * on a local FS; a cluster deployment lists via the FileSystem API
    * or keeps the id watermark in a catalog row).
    */
  private def batchIds(dir: String, before: Long): Seq[Long] = {
    val fs = Option(new java.io.File(dir).list()).getOrElse(Array.empty[String])
    fs.toSeq.collect {
      case n if n.startsWith("toks_batch_") =>
        n.stripPrefix("toks_batch_").toLong
    }.filter(_ < before).sorted
  }

  private def union(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map(spark.read.parquet(_)).reduce(_ unionByName _)

  /** Survivors of `batch` against the standing store (seed + every
    * batch root with id < `batchId`): fresh-side artifacts built
    * in-flight, standing artifacts READ — never re-derived — and the
    * arrival-order veto (`standingVetoes = true`) or the lower-id
    * rule applied by [[Dedup.exactVictims]] with the fresh side
    * broadcast.
    */
  def dedupBatch(spark: SparkSession, dir: String, batch: DataFrame,
                 batchId: Long,
                 standingVetoes: Boolean = true): DataFrame = {
    val (shingleK, threshold) = params(spark, dir)
    val ids = batchIds(dir, batchId)
    val aToks = union(spark,
      s"$dir/toks_seed" +: ids.map(i => s"$dir/toks_batch_$i"))
    val aPref = union(spark,
      s"$dir/pref_seed" +: ids.map(i => s"$dir/pref_batch_$i"))
    val bToks = Dedup.shingleSets(batch, shingleK)
    val bPref = Dedup.prefixPostings(bToks, spark.read.parquet(s"$dir/df"),
      threshold)
    val victims = Dedup.exactVictims(aToks,
      aPref.withColumn("standing", lit(true)), bToks, bPref,
      threshold, standingVetoes, broadcastFresh = true)
    batch.join(victims, Seq("doc_id"), "left_anti")
  }

  /** [[dedupBatch]] when the batch's own roots are ALREADY in the
    * store (append ran first — the streaming loop's order, r17): the
    * fresh-side artifacts are read back from `toks_batch_<id>` /
    * `pref_batch_<id>` instead of re-derived from text, so each
    * delivery pays its shingle + posting build exactly once. Reading
    * strictly-below ids keeps the batch from vetoing itself, which is
    * what makes append-then-dedup redelivery-safe without any eager
    * materialization of the survivors.
    */
  def dedupBatchStored(spark: SparkSession, dir: String, batch: DataFrame,
                       batchId: Long,
                       standingVetoes: Boolean = true): DataFrame = {
    val (_, threshold) = params(spark, dir)
    val ids = batchIds(dir, batchId)
    val aToks = union(spark,
      s"$dir/toks_seed" +: ids.map(i => s"$dir/toks_batch_$i"))
    val aPref = union(spark,
      s"$dir/pref_seed" +: ids.map(i => s"$dir/pref_batch_$i"))
    val bToks = spark.read.parquet(s"$dir/toks_batch_$batchId")
    val bPref = spark.read.parquet(s"$dir/pref_batch_$batchId")
    val victims = Dedup.exactVictims(aToks,
      aPref.withColumn("standing", lit(true)), bToks, bPref,
      threshold, standingVetoes, broadcastFresh = true)
    batch.join(victims, Seq("doc_id"), "left_anti")
  }
}

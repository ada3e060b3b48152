package graft.tables

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Sampling}

/** PERSISTED inverted index, term-bucketed on disk — the stored form
  * of [[graft.operators.Retrieval.postingsStaged]]'s contract that "a
  * query touches only its own terms' buckets". Layout:
  *
  *   root/postings/__tb=<b>/   posting rows (term, doc_id, dl, tf)
  *   root/termstats/           per-term df (vocabulary-sized)
  *   root/corpus/              1 row (n_docs, sum_dl)
  *   root/positions/__tb=<b>/  optional positional postings
  *                             (term, doc_id, pos) for phrase queries
  *   root/_index.json          bucket count
  *
  * plus roll-forward APPEND artifacts (see [[append]]):
  *
  *   root/postings_batch_<id>/__tb=<b>/   a batch's posting increment
  *   root/termstats_batch_<id>/           its per-term df increment
  *   root/corpus_batch_<id>/              its 1-row corpus increment
  *   root/positions_batch_<id>/__tb=<b>/  its positional increment
  *
  * The bucket of a term is the engine-portable md5 bucket
  * ([[Sampling.hashBucket]]) — the same 32-hex-bit idiom every
  * oracle-checked hash in the engine uses, so the skip-count check
  * can derive expected bucket sets in SQL. Queries resolve their
  * terms' buckets DRIVER-SIDE (a few md5s) and open only those
  * partition directories: at 100 TB a 3-term query reads 3/|buckets|
  * of the index, never the corpus and never the full posting set.
  *
  * Crash safety: [[write]] stages every parquet tree under a hidden
  * `root/.staging/` dir, renames each into place (same-FS atomic
  * per-tree moves), and writes the `_index.json` marker LAST — the
  * index "exists" only once complete. A crashed write leaves either
  * staging debris or marker-less trees; the next write() sweeps both
  * and starts clean, so a partial failure can always be retried (the
  * previous marker-last-but-no-staging layout could neither be read
  * — bucketCount threw — nor rewritten — the trees already existed).
  */
object InvertedIndex {

  private def marker(root: String): Path = Paths.get(s"$root/_index.json")

  private def rmTree(p: java.io.File): Unit = {
    Option(p.listFiles).foreach(_.foreach(rmTree)); p.delete(): Unit
  }

  def write(docs: DataFrame, root: String, buckets: Int = 64,
            positions: Boolean = false): Unit = {
    require(!Files.exists(marker(root)), s"index already exists at $root")
    // sweep debris from a crashed earlier attempt (no marker ⇒ any
    // existing trees are partial output, not a live index) — INCLUDING
    // stray batch-append/tombstone roots, which would otherwise
    // silently merge into (or delete from) the fresh index
    Seq(".staging", "postings", "termstats", "corpus", "positions")
      .foreach(d => rmTree(new java.io.File(s"$root/$d")))
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.contains("_batch_"))
      .foreach(rmTree)
    val staging = s"$root/.staging"
    Retrieval.postingsStaged(docs)
      .withColumn("__tb", Sampling.hashBucket(col("term"), buckets))
      .write.partitionBy("__tb").parquet(s"$staging/postings")
    Retrieval.termStatsStaged(docs).write.parquet(s"$staging/termstats")
    Retrieval.corpusStatsStaged(docs).write.parquet(s"$staging/corpus")
    if (positions)
      Retrieval.positionalPostingsStaged(docs)
        .withColumn("__tb", Sampling.hashBucket(col("term"), buckets))
        .write.partitionBy("__tb").parquet(s"$staging/positions")
    (Seq("postings", "termstats", "corpus") ++
      (if (positions) Seq("positions") else Nil)).foreach { d =>
      Files.move(Paths.get(s"$staging/$d"), Paths.get(s"$root/$d")): Unit
    }
    rmTree(new java.io.File(staging))
    Files.write(marker(root),
      s"""{"buckets": $buckets, "positions": $positions}"""
        .getBytes("UTF-8")): Unit
  }

  /** Roll the persisted index FORWARD by one ingest batch — the
    * on-disk form of [[Retrieval.bm25TopKIncremental]]'s additivity
    * (batches carry disjoint doc sets, so postings union without
    * collision, per-term df sums, corpus stats sum component-wise):
    * the batch's posting/df/corpus increments write to their own
    * roots; the STANDING trees are never read, moved, or rewritten,
    * and readers merge additively at query time. This is the 100 TB
    * maintenance path a daily-ingest deployment runs — mirror of
    * [[VectorIndex.append]] on the ANN side; without it the index
    * must rebuild from scratch per ingest.
    *
    * `batch` follows [[VectorIndex.append]]'s at-least-once
    * discipline: with an id, the increments land in the batch's OWN
    * roots with overwrite, so a redelivered micro-batch replaces its
    * prior attempt instead of double-counting; when None, a one-shot
    * driver append gets a fresh unique id. Positional increments are
    * written iff the base index carries a positions tree.
    */
  def append(fresh: DataFrame, root: String,
             batch: Option[String] = None): Unit = {
    val nb = bucketCount(root)
    val id = batch.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    Retrieval.postingsStaged(fresh)
      .withColumn("__tb", Sampling.hashBucket(col("term"), nb))
      .write.mode("overwrite").partitionBy("__tb")
      .parquet(s"$root/postings_batch_$id")
    Retrieval.termStatsStaged(fresh).write.mode("overwrite")
      .parquet(s"$root/termstats_batch_$id")
    Retrieval.corpusStatsStaged(fresh).write.mode("overwrite")
      .parquet(s"$root/corpus_batch_$id")
    if (hasPositions(root))
      Retrieval.positionalPostingsStaged(fresh)
        .withColumn("__tb", Sampling.hashBucket(col("term"), nb))
        .write.mode("overwrite").partitionBy("__tb")
        .parquet(s"$root/positions_batch_$id")
  }

  /** TOMBSTONE-delete documents from the index — the Lucene-shaped
    * contract: the delete itself is O(|ids|) (one skinny doc_id
    * relation written; NO posting bucket is read or rewritten), query
    * paths anti-join the broadcast tombstone set so deleted docs stop
    * matching IMMEDIATELY, and the per-term/corpus statistics DRIFT
    * (they still count the deleted docs) until [[compactTo]] folds the
    * tombstones and recomputes them exactly — precisely Lucene's
    * maxDoc-vs-numDocs behavior between segment merges. The drift is
    * part of the contract, not an approximation: the driver row's
    * oracle spells it (live postings scored under full-corpus stats),
    * so the drifted scores are still bit-exact.
    *
    * Same at-least-once discipline as [[append]]: a batch id makes a
    * redelivered delete rewrite its own root. Deleting an absent id is
    * a no-op everywhere. CONTRACT EDGE: deleting a BLANK-text doc (it
    * has no postings) is a no-op on every query — a blank doc can
    * never match a term — but compacted (n_docs, sum_dl) keep counting
    * it (the index cannot distinguish a deleted blank doc from a
    * deleted absent id), so exact compacted statistics assume
    * tombstones reference posting-bearing docs; blank-doc tombstones
    * leave only an avgdl/idf residue that a rebuild clears.
    */
  def delete(docIds: DataFrame, root: String,
             batch: Option[String] = None): Unit = {
    bucketCount(root): Unit // an index must exist before it can tombstone
    val id = batch.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    docIds.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$root/deletes_batch_$id")
  }

  /** The union of all tombstone sets, distinct — None when the index
    * has never seen a delete, so un-deleted indexes keep their exact
    * query plans. */
  def deletedDocs(spark: SparkSession, root: String): Option[DataFrame] =
    batchRoots(root, "deletes") match {
      case Seq() => None
      case roots =>
        Some(roots.map(spark.read.parquet(_)).reduce(_.unionByName(_))
          .distinct())
    }

  /** `rows` minus tombstoned docs — a broadcast anti-join (the
    * tombstone set is ids-only and policy-sized); identity when no
    * deletes exist. */
  private def filterDeleted(spark: SparkSession, root: String,
                            rows: DataFrame): DataFrame =
    deletedDocs(spark, root) match {
      case None => rows
      case Some(dd) => rows.join(broadcast(dd), Seq("doc_id"), "left_anti")
    }

  def bucketCount(root: String): Int = {
    val body = new String(Files.readAllBytes(marker(root)), "UTF-8")
    """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"bad _index.json at $root"))
  }

  def hasPositions(root: String): Boolean =
    Files.exists(Paths.get(s"$root/positions"))

  /** Batch-append roots for `prefix` (e.g. "postings"), sorted — a
    * driver-side directory listing, once per query plan. */
  private def batchRoots(root: String, prefix: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(s"${prefix}_batch_"))
      .map(_.getAbsolutePath).sorted

  /** Driver-side md5 bucket of a term — bit-identical to
    * [[Sampling.hashBucket]]'s Column form (first 8 hex chars of md5,
    * parsed base-16, mod buckets). */
  def bucketOf(term: String, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  /** The rows of tree `prefix` relevant to `terms`: ONLY the terms'
    * `__tb=` bucket dirs open, in the base tree and in every batch
    * root (each root prunes independently). Returns (rows,
    * bucketsRead, bucketsSkipped) counted against the base tree's
    * bucket space; a requested bucket with no directory (no corpus
    * term hashed there) prunes to zero rows and still counts as read
    * — the counts derive purely from the term→bucket rule, which is
    * what the skip check pins. */
  private def bucketedFor(spark: SparkSession, root: String, prefix: String,
                          terms: Seq[String]): (DataFrame, Int, Int) = {
    val nb = bucketCount(root)
    val want = terms.distinct.map(bucketOf(_, nb)).distinct.sorted
    val roots = s"$root/$prefix" +: batchRoots(root, prefix)
    val paths = roots.flatMap(r => want.map(b => s"$r/__tb=$b"))
      .filter(p => Files.exists(Paths.get(p)))
    val df =
      if (paths.isEmpty)
        spark.read.parquet(s"$root/$prefix").limit(0).drop("__tb")
      else spark.read.parquet(paths: _*)
    (df.filter(col("term").isin(terms.distinct: _*)),
      want.length, nb - want.length)
  }

  /** Postings for `terms`, reading ONLY their buckets (base tree +
    * batch increments). */
  def postingsFor(spark: SparkSession, root: String,
                  terms: Seq[String]): (DataFrame, Int, Int) =
    bucketedFor(spark, root, "postings", terms)

  /** Positional postings for `terms`, same bucket pruning. The index
    * must have been written with `positions = true`. */
  def positionsFor(spark: SparkSession, root: String,
                   terms: Seq[String]): (DataFrame, Int, Int) = {
    require(hasPositions(root), s"index at $root has no positions tree")
    bucketedFor(spark, root, "positions", terms)
  }

  /** Per-term df across the base tree and every appended increment —
    * summed at read (vocabulary-sized work; disjoint batch doc sets
    * make df purely additive). An un-appended index keeps the plain
    * read: its base tree already holds per-term totals, so the merge
    * aggregation (and its exchange) only enters the plan once an
    * increment exists. */
  def termStats(spark: SparkSession, root: String): DataFrame = {
    val base = spark.read.parquet(s"$root/termstats")
    val batches = batchRoots(root, "termstats")
    if (batches.isEmpty) base
    else batches.foldLeft(base)(
        (acc, p) => acc.unionByName(spark.read.parquet(p)))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
  }

  /** Corpus stats across base + increments, summed component-wise
    * (one row per root in flight, one row out); plain 1-row read when
    * no increment exists. */
  def corpusStats(spark: SparkSession, root: String): DataFrame = {
    val base = spark.read.parquet(s"$root/corpus")
    val batches = batchRoots(root, "corpus")
    if (batches.isEmpty) base
    else batches.foldLeft(base)(
        (acc, p) => acc.unionByName(spark.read.parquet(p)))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
  }

  /** BM25 over the persisted index: identical scoring plan to
    * [[Retrieval.bm25TopK]], inputs read from the index tree (postings
    * bucket-pruned; term/corpus stats are vocabulary-/1-row-sized and
    * merge any appended increments additively — append-then-query ≡
    * rebuild-then-query bit-for-bit). */
  def bm25TopK(spark: SparkSession, root: String,
               queries: Seq[(Long, Seq[String])], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (p, _, _) = postingsFor(spark, root, queries.flatMap(_._2))
    // tombstoned docs drop BEFORE scoring (they must not absorb
    // ranks); stats keep counting them until compaction — see delete
    Retrieval.scoreBm25(filterDeleted(spark, root, p),
      termStats(spark, root), corpusStats(spark, root), queries, k, k1, b)
  }

  /** COMPACT the index: fold every batch-append increment into a
    * fresh single-generation index at `dstRoot` — postings re-bucketed
    * union (same bucket count and md5 rule, so pruning contracts are
    * unchanged), df summed, corpus stats summed, positions carried iff
    * the source has them. After enough appends the read-side batch
    * listing and per-bucket file counts grow; compaction bounds both
    * (CowTable.compact's job, at index granularity).
    *
    * Object-store discipline: the compacted index builds at a NEW
    * root (same staging + marker-last crash safety as [[write]]);
    * the SOURCE is never touched, so a crash mid-compact costs
    * nothing and the deployment flips its index pointer only once
    * `dstRoot` carries a marker — write-new, flip, GC-old, exactly
    * like the CoW table's version swap. Query-over-compacted must
    * equal query-over-(base+batches) bit-for-bit. */
  def compactTo(spark: SparkSession, srcRoot: String,
                dstRoot: String): Unit = {
    require(!Files.exists(marker(dstRoot)),
      s"compaction target $dstRoot already an index")
    val nb = bucketCount(srcRoot)
    val staging = s"$dstRoot/.staging"
    Seq(".staging", "postings", "termstats", "corpus", "positions")
      .foreach(d => rmTree(new java.io.File(s"$dstRoot/$d")))
    def allBuckets(prefix: String): DataFrame =
      batchRoots(srcRoot, prefix)
        .foldLeft(spark.read.parquet(s"$srcRoot/$prefix"))(
          (acc, p) => acc.unionByName(spark.read.parquet(p)))
    // tombstones FOLD here: deleted docs' rows drop from the new
    // generation, and the statistics the live index let drift are
    // recomputed EXACTLY from the surviving postings — df by group
    // count, (n_docs, sum_dl) by subtracting the dropped docs'
    // contributions (one skinny (doc_id, dl) row per posting-bearing
    // deleted doc; blank/absent ids had no postings and no effect —
    // the contract edge [[delete]] documents). The tombstone set is
    // read ONCE and reused across every consumer below.
    val tombstones = deletedDocs(spark, srcRoot)
    def dropDead(rows: DataFrame): DataFrame = tombstones match {
      case None => rows
      case Some(dd) => rows.join(broadcast(dd), Seq("doc_id"), "left_anti")
    }
    val allPostings = allBuckets("postings").drop("__tb")
    val live = dropDead(allPostings)
    live
      .withColumn("__tb", Sampling.hashBucket(col("term"), nb))
      .write.partitionBy("__tb").parquet(s"$staging/postings")
    tombstones match {
      case None =>
        termStats(spark, srcRoot).write.parquet(s"$staging/termstats")
        corpusStats(spark, srcRoot).write.parquet(s"$staging/corpus")
      case Some(dd) =>
        live.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .write.parquet(s"$staging/termstats")
        val dropped = dd
          .join(allPostings.select(col("doc_id"), col("dl")), Seq("doc_id"))
          .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
          .agg(count(lit(1)).as("__nd"),
            coalesce(sum(col("dl")), lit(0L)).as("__dl"))
        corpusStats(spark, srcRoot).crossJoin(dropped)
          .select((col("n_docs") - col("__nd")).as("n_docs"),
            (col("sum_dl") - col("__dl")).as("sum_dl"))
          .write.parquet(s"$staging/corpus")
    }
    val pos = hasPositions(srcRoot)
    if (pos)
      dropDead(allBuckets("positions").drop("__tb"))
        .withColumn("__tb", Sampling.hashBucket(col("term"), nb))
        .write.partitionBy("__tb").parquet(s"$staging/positions")
    (Seq("postings", "termstats", "corpus") ++
      (if (pos) Seq("positions") else Nil)).foreach { d =>
      Files.move(Paths.get(s"$staging/$d"), Paths.get(s"$dstRoot/$d")): Unit
    }
    rmTree(new java.io.File(staging))
    Files.write(marker(dstRoot),
      s"""{"buckets": $nb, "positions": $pos}""".getBytes("UTF-8")): Unit
  }

  /** Exact phrase search over the PERSISTED positions tree: the same
    * position-arithmetic fold as
    * [[Retrieval.phraseSearchIndexed]], but the positional postings
    * come off disk with only the phrase words' buckets open — the
    * 100 TB phrase path reads phrase-term buckets, never document
    * text. Matching docs then fetch (doc_id, n_chars) from the store
    * by id — candidates-at-a-time attribute lookup, not a scan. */
  def phraseSearch(spark: SparkSession, root: String, docs: DataFrame,
                   phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    val (p, _, _) = positionsFor(spark, root, words)
    // tombstones filter the MATCH SET (candidates-sized), not the
    // position rows — cheapest point with identical results
    filterDeleted(spark, root,
        Retrieval.phraseAnchorsFrom(p, words).select(col("doc_id")).distinct())
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .orderBy(col("doc_id"))
  }
}

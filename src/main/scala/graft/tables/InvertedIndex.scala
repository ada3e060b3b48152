package graft.tables

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.{Retrieval, Sampling}

/** PERSISTED inverted index, term-bucketed on disk — the stored form
  * of [[graft.operators.Retrieval.postingsStaged]]'s contract that "a
  * query touches only its own terms' buckets". Layout:
  *
  *   root/postings/__tb=<b>/   posting rows (term, doc_id, ver, dl, tf)
  *   root/termstats/           per-term df (vocabulary-sized)
  *   root/corpus/              1 row (n_docs, sum_dl)
  *   root/doclens/             one (doc_id, ver, dl) row per indexed
  *                             doc VERSION — dl=0 for blank/null text,
  *                             so compaction can recompute (n_docs,
  *                             sum_dl) exactly even for docs that
  *                             carry no postings
  *   root/positions/__tb=<b>/  optional positional postings
  *                             (term, doc_id, ver, pos) for phrases
  *   root/_index.json          bucket count
  *
  * plus roll-forward APPEND artifacts (see [[append]]):
  *
  *   root/postings_batch_<id>/__tb=<b>/   a batch's posting increment
  *   root/termstats_batch_<id>/           its per-term df increment
  *   root/corpus_batch_<id>/              its 1-row corpus increment
  *   root/doclens_batch_<id>/             its per-doc-version lengths
  *   root/positions_batch_<id>/__tb=<b>/  its positional increment
  *
  * VERSIONED DOC IDENTITIES: every posting/position/doclens row
  * carries the version of the doc it was indexed under. An UPDATE to
  * a document is then two already-cheap operations — [[supersede]]
  * the old version (one skinny (doc_id, kill_below) row: every
  * indexed version BELOW the new one stops matching immediately) and
  * [[append]] the new text under the new version — which is how a
  * change feed with genuine update ops maintains the index without
  * any rescan ([[applyChanges]]). Statistics DRIFT exactly as for
  * deletes (superseded versions keep counting in df/corpus stats
  * until [[compactTo]] folds them — Lucene's maxDoc-vs-numDocs
  * between merges); the drift is part of the contract the driver
  * oracle spells.
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

  /** Sweep the standard trees AND any stray `*_batch_*` roots at a
    * marker-less root — leftover append/tombstone debris would
    * otherwise silently merge into (or delete from) the fresh index. */
  private def sweepRoot(root: String): Unit = {
    Seq(".staging", "postings", "termstats", "corpus", "doclens",
      "positions").foreach(d => rmTree(new java.io.File(s"$root/$d")))
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.contains("_batch_"))
      .foreach(rmTree)
  }

  // ---- staged relations over a docs relation CARRYING `ver` --------

  /** Postings with the doc version riding each row (the dl
    * discipline applied to identity): same content as
    * [[Retrieval.postingsStaged]] plus `ver`, and two versions of one
    * doc in a single batch stay distinct rows. */
  private def postingsV(dv: DataFrame): DataFrame =
    Retrieval.postingsStagedWith(dv, Seq("ver"))
      .select(col("term"), col("doc_id"), col("ver"), col("dl"), col("tf"))

  /** One (doc_id, ver, dl) row per doc VERSION — including blank/null
    * text docs at dl=0, which is what lets [[compactTo]] recompute
    * corpus stats exactly without postings to witness them. */
  private def docLensV(dv: DataFrame): DataFrame =
    dv.select(col("doc_id"), col("ver"),
      when(col("text").isNull, lit(0L))
        .otherwise(size(tokens(col("text"))).cast("long")).as("dl"))

  private def positionsV(dv: DataFrame): DataFrame =
    dv.select(col("doc_id"), col("ver"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "ver", "pos", "term")

  private def termStatsV(dv: DataFrame): DataFrame =
    postingsV(dv).groupBy(col("term")).agg(count(lit(1)).as("df"))

  def write(docs: DataFrame, root: String, buckets: Int = 64,
            positions: Boolean = false, ver: Long = 0L): Unit = {
    require(!Files.exists(marker(root)), s"index already exists at $root")
    // sweep debris from a crashed earlier attempt (no marker ⇒ any
    // existing trees are partial output, not a live index)
    sweepRoot(root)
    val staging = s"$root/.staging"
    val dv = docs.withColumn("ver", lit(ver))
    postingsV(dv)
      .withColumn("__tb", Sampling.hashBucket(col("term"), buckets))
      .write.partitionBy("__tb").parquet(s"$staging/postings")
    termStatsV(dv).write.parquet(s"$staging/termstats")
    Retrieval.corpusStatsStaged(docs).write.parquet(s"$staging/corpus")
    docLensV(dv).write.parquet(s"$staging/doclens")
    if (positions)
      positionsV(dv)
        .withColumn("__tb", Sampling.hashBucket(col("term"), buckets))
        .write.partitionBy("__tb").parquet(s"$staging/positions")
    (Seq("postings", "termstats", "corpus", "doclens") ++
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
    * (batches carry disjoint doc identities, so postings union
    * without collision, per-term df sums, corpus stats sum
    * component-wise): the batch's posting/df/corpus/doclens
    * increments write to their own roots; the STANDING trees are
    * never read, moved, or rewritten, and readers merge additively at
    * query time. This is the 100 TB maintenance path a daily-ingest
    * deployment runs — mirror of [[VectorIndex.append]] on the ANN
    * side; without it the index must rebuild from scratch per ingest.
    *
    * `batch` follows [[VectorIndex.append]]'s at-least-once
    * discipline: with an id, the increments land in the batch's OWN
    * roots with overwrite, so a redelivered micro-batch replaces its
    * prior attempt instead of double-counting; when None, a one-shot
    * driver append gets a fresh unique id. Positional increments are
    * written iff the base index carries a positions tree. `ver`
    * stamps the batch's doc version (a re-indexed doc appends under a
    * HIGHER version than the one it supersedes).
    */
  def append(fresh: DataFrame, root: String,
             batch: Option[String] = None, ver: Long = 0L): Unit =
    appendVersioned(fresh.withColumn("ver", lit(ver)), root, batch)

  /** [[append]] for a batch whose rows carry their OWN `ver` column —
    * the change-feed shape, where one batch can hold several table
    * versions' worth of churn (and even two versions of the same
    * doc: postings key on (term, doc_id, ver), so they never
    * collide). The batch must be non-empty (an empty parquet
    * partition tree cannot be re-read); [[applyChanges]] guards. */
  def appendVersioned(fresh: DataFrame, root: String,
                      batch: Option[String] = None): Unit = {
    val nb = bucketCount(root)
    val id = batch.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    // the batch feeds 4-5 derivations (postings probe+write, stats,
    // doclens, positions), each of which would re-tokenize from
    // scratch — stage it once; churn-sized by contract
    val f = fresh.persist()
    try {
      // a batch whose docs ALL tokenize to nothing (e.g. a CDC batch
      // of text-clearing updates) has doclens rows but zero postings
      // — a zero-row PARTITIONED parquet tree carries no schema and
      // can never be re-read, so the postings/positions trees are
      // skipped entirely (readers and compactTo list batch roots per
      // prefix; an absent root simply contributes nothing)
      val p = postingsV(f).persist()
      try {
        val hasPostings = !p.isEmpty
        if (hasPostings)
          p.withColumn("__tb", Sampling.hashBucket(col("term"), nb))
            .write.mode("overwrite").partitionBy("__tb")
            .parquet(s"$root/postings_batch_$id")
        p.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .write.mode("overwrite")
          .parquet(s"$root/termstats_batch_$id")
        Retrieval.corpusStatsStaged(f.drop("ver")).write.mode("overwrite")
          .parquet(s"$root/corpus_batch_$id")
        docLensV(f).write.mode("overwrite")
          .parquet(s"$root/doclens_batch_$id")
        if (hasPositions(root) && hasPostings)
          positionsV(f)
            .withColumn("__tb", Sampling.hashBucket(col("term"), nb))
            .write.mode("overwrite").partitionBy("__tb")
            .parquet(s"$root/positions_batch_$id")
      } finally p.unpersist(): Unit
    } finally f.unpersist(): Unit
  }

  /** TOMBSTONE-delete documents from the index — the Lucene-shaped
    * contract: the delete itself is O(|ids|) (one skinny doc_id
    * relation written; NO posting bucket is read or rewritten), query
    * paths anti-join the broadcast tombstone set so deleted docs stop
    * matching IMMEDIATELY (every version), and the per-term/corpus
    * statistics DRIFT (they still count the deleted docs) until
    * [[compactTo]] folds the tombstones and recomputes them exactly —
    * precisely Lucene's maxDoc-vs-numDocs behavior between segment
    * merges. The drift is part of the contract, not an approximation:
    * the driver row's oracle spells it (live postings scored under
    * full-corpus stats), so the drifted scores are still bit-exact.
    *
    * Same at-least-once discipline as [[append]]: a batch id makes a
    * redelivered delete rewrite its own root. Deleting an absent id
    * is a no-op everywhere; deleting a blank-text doc is a no-op on
    * every query and — thanks to the doclens sidecar — still folds
    * exactly at compaction.
    */
  def delete(docIds: DataFrame, root: String,
             batch: Option[String] = None): Unit = {
    bucketCount(root): Unit // an index must exist before it can tombstone
    val id = batch.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    docIds.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$root/deletes_batch_$id")
  }

  /** VERSION-level tombstone: every indexed version of `doc_id`
    * BELOW `kill_below` stops matching immediately. The update
    * primitive — an update at table version v is
    * `supersede(doc → v)` + `append(new text, ver = v)`; a delete at
    * v is `supersede(doc → v)` alone (nothing re-appends, and a later
    * RE-INSERT at v' > v simply appends under v', alive because
    * v' ≥ kill_below). Stateless by construction: no per-doc "current
    * version" bookkeeping exists anywhere — later supersedes compose
    * by max(kill_below). O(|rows|) like [[delete]]; statistics drift
    * identically until compaction.
    */
  def supersede(docVers: DataFrame, root: String,
                batch: Option[String] = None): Unit = {
    bucketCount(root): Unit
    val id = batch.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    docVers.select(col("doc_id"), col("kill_below").cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("kill_below")).as("kill_below"))
      .write.mode("overwrite").parquet(s"$root/supersedes_batch_$id")
  }

  /** Consume a CoW change feed ([[CowTable.changesSince]] shape:
    * op ∈ insert/update/delete, doc_id, new_text, version) — the
    * lakehouse-CDC-drives-the-search-indexer path, UPDATE ops
    * included: inserts and updates append their postings under the
    * feed row's version; updates and deletes supersede every version
    * below it. Two churn-sized writes total, whatever the feed mixes;
    * the table is never rescanned. At-least-once safe under a batch
    * id (both increments rewrite their own roots on redelivery).
    *
    * Feed CONTRACT (what [[CowTable.changesSince]] guarantees):
    * `insert` means a NEW doc identity — an insert does not supersede,
    * so a feed that emits insert for an already-indexed doc_id leaves
    * TWO live versions whose term frequencies would co-score. A
    * source that upserts must emit those rows as `update` (which
    * supersedes below its version) — exactly the shape the CoW
    * changefeed derives.
    *
    * The feed is often a LAZY changefeed (a per-version manifest-diff
    * recomputed per action); it is consumed by several writes here,
    * so it stages through one churn-sized cache instead of re-running
    * the diff per consumer. */
  def applyChanges(feed: DataFrame, root: String,
                   batch: Option[String] = None): Unit = {
    val staged = feed.persist()
    try {
      val ups = staged.filter(col("op") =!= "delete")
        .select(col("doc_id"), col("new_text").as("text"),
          col("version").cast("long").as("ver"))
      val downs = staged.filter(col("op") =!= "insert")
        .select(col("doc_id"), col("version").cast("long").as("kill_below"))
      if (!ups.isEmpty) appendVersioned(ups, root, batch.map(b => s"${b}u"))
      if (!downs.isEmpty) supersede(downs, root, batch.map(b => s"${b}d"))
    } finally staged.unpersist(): Unit
  }

  /** The unified kill rule: one (doc_id, kill_below) row per
    * tombstoned doc — id-level [[delete]]s kill every version
    * (kill_below = Long.MaxValue), [[supersede]]s kill the versions
    * below theirs, and overlaps compose by max. None when the index
    * has never seen a tombstone, so untouched indexes keep their
    * exact query plans. */
  private def killRules(spark: SparkSession, root: String,
                        only: Option[Set[String]] = None)
      : Option[DataFrame] = {
    val dels = batchRoots(root, "deletes", only).map(p =>
      spark.read.parquet(p)
        .select(col("doc_id"), lit(Long.MaxValue).as("kill_below")))
    val sups = batchRoots(root, "supersedes", only).map(spark.read.parquet(_))
    (dels ++ sups) match {
      case Seq() => None
      case parts =>
        Some(parts.reduce(_.unionByName(_))
          .groupBy(col("doc_id"))
          .agg(max(col("kill_below")).as("kill_below")))
    }
  }

  /** `rows` (carrying doc_id + ver) minus tombstoned versions — a
    * broadcast join against the policy-sized kill set; identity when
    * no tombstone exists. A row survives iff its doc has no rule or
    * its version is at/above the doc's kill_below. */
  private def filterDeleted(spark: SparkSession, root: String,
                            rows: DataFrame,
                            only: Option[Set[String]] = None): DataFrame =
    killRules(spark, root, only) match {
      case None => rows
      case Some(kr) =>
        rows.join(broadcast(kr), Seq("doc_id"), "left")
          .filter(col("kill_below").isNull ||
            col("ver") >= col("kill_below"))
          .drop("kill_below")
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
    * driver-side directory listing, once per query plan. With `only`
    * set (the [[IndexCatalog]] serving path), roots whose batch id is
    * not registered are EXCLUDED — an in-flight or
    * crashed-before-commit append is never served and never folded. */
  private def batchRoots(root: String, prefix: String,
                         only: Option[Set[String]] = None): Seq[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(s"${prefix}_batch_"))
      .filter(f => only.forall { ids =>
        val suffix = f.getName.substring(
          f.getName.indexOf("_batch_") + "_batch_".length)
        // a registered id X admits X itself (plain append/delete) AND
        // Xu/Xd — the two roots [[applyChanges]] derives from one
        // batch id, so a catalog-governed CDC apply registers ONE id
        // and both its physical increments serve and fold with it
        ids.contains(suffix) ||
          ((suffix.endsWith("u") || suffix.endsWith("d")) &&
            ids.contains(suffix.dropRight(1)))
      })
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
                          terms: Seq[String],
                          only: Option[Set[String]] = None)
      : (DataFrame, Int, Int) = {
    val nb = bucketCount(root)
    val want = terms.distinct.map(bucketOf(_, nb)).distinct.sorted
    val roots = s"$root/$prefix" +: batchRoots(root, prefix, only)
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
  def postingsFor(spark: SparkSession, root: String, terms: Seq[String],
                  only: Option[Set[String]] = None): (DataFrame, Int, Int) =
    bucketedFor(spark, root, "postings", terms, only)

  /** Positional postings for `terms`, same bucket pruning. The index
    * must have been written with `positions = true`. */
  def positionsFor(spark: SparkSession, root: String, terms: Seq[String],
                   only: Option[Set[String]] = None): (DataFrame, Int, Int) = {
    require(hasPositions(root), s"index at $root has no positions tree")
    bucketedFor(spark, root, "positions", terms, only)
  }

  /** Per-term df across the base tree and every appended increment —
    * summed at read (vocabulary-sized work; disjoint batch doc
    * identities make df purely additive). An un-appended index keeps
    * the plain read: its base tree already holds per-term totals, so
    * the merge aggregation (and its exchange) only enters the plan
    * once an increment exists. */
  def termStats(spark: SparkSession, root: String,
                only: Option[Set[String]] = None): DataFrame = {
    val base = spark.read.parquet(s"$root/termstats")
    val batches = batchRoots(root, "termstats", only)
    if (batches.isEmpty) base
    else batches.foldLeft(base)(
        (acc, p) => acc.unionByName(spark.read.parquet(p)))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
  }

  /** Corpus stats across base + increments, summed component-wise
    * (one row per root in flight, one row out); plain 1-row read when
    * no increment exists. */
  def corpusStats(spark: SparkSession, root: String,
                  only: Option[Set[String]] = None): DataFrame = {
    val base = spark.read.parquet(s"$root/corpus")
    val batches = batchRoots(root, "corpus", only)
    if (batches.isEmpty) base
    else batches.foldLeft(base)(
        (acc, p) => acc.unionByName(spark.read.parquet(p)))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
  }

  /** The (doc_id, ver, dl) sidecar across base + increments — one row
    * per indexed doc version, vocabulary-of-docs-sized (never the
    * postings). */
  private def docLens(spark: SparkSession, root: String,
                      only: Option[Set[String]] = None): DataFrame =
    batchRoots(root, "doclens", only)
      .foldLeft(spark.read.parquet(s"$root/doclens"))(
        (acc, p) => acc.unionByName(spark.read.parquet(p)))

  /** BM25 over the persisted index: identical scoring plan to
    * [[Retrieval.bm25TopK]], inputs read from the index tree (postings
    * bucket-pruned; term/corpus stats are vocabulary-/1-row-sized and
    * merge any appended increments additively — append-then-query ≡
    * rebuild-then-query bit-for-bit). */
  def bm25TopK(spark: SparkSession, root: String,
               queries: Seq[(Long, Seq[String])], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               only: Option[Set[String]] = None,
               filter: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    val (p0, _, _) = postingsFor(spark, root, queries.flatMap(_._2), only)
    // tombstoned/superseded versions drop BEFORE scoring (they must
    // not absorb ranks); stats keep counting them until compaction.
    // `filter` is filter-context (membership only — df/corpus stats
    // stay index-wide, surviving scores bit-identical to unfiltered)
    // and must be expressible on the posting row itself (term,
    // doc_id, dl, ver) — the only faceted shape the persisted index
    // serves without a corpus join.
    val p = filter.foldLeft(filterDeleted(spark, root, p0, only))(_.filter(_))
    Retrieval.scoreBm25(p,
      termStats(spark, root, only), corpusStats(spark, root, only),
      queries, k, k1, b)
  }

  /** Boolean posting algebra over the persisted index — per query,
    * documents containing EVERY include term and NONE of the exclude
    * terms (empty excludes = plain AND). Only the mentioned terms'
    * posting buckets open, tombstoned/superseded doc versions drop
    * BEFORE the set algebra on BOTH arms — a deleted doc can neither
    * match nor have its ghost postings veto a live candidate — and
    * the exclusion is a candidates-sized anti-join against the
    * exclude terms' postings (the complement is never materialized,
    * the only NOT shape that survives 100 TB). Returns
    * (query_id, doc_id, dl). */
  def booleanQuery(spark: SparkSession, root: String,
                   queries: Seq[(Long, Seq[String], Seq[String])],
                   only: Option[Set[String]] = None): DataFrame = {
    val terms = queries.flatMap(q => q._2 ++ q._3).distinct
    val (p0, _, _) = postingsFor(spark, root, terms, only)
    val p = filterDeleted(spark, root, p0, only)
      .select(col("term"), col("doc_id"), col("dl"))
    Retrieval.booleanNotFrom(p, queries)
      .orderBy(col("query_id"), col("doc_id"))
  }

  /** RANKED query + BOOLEAN FILTER clause over the persisted index
    * (Lucene's must/filter): BM25 scores the query terms with
    * index-wide stats, the filter tree evaluates by posting set
    * algebra, and the semi-join restricts membership BEFORE ranking.
    * One bucket-pruned, tombstone-filtered posting read serves both
    * sides; the corpus is never touched. */
  def bm25TopKBooleanFiltered(spark: SparkSession, root: String,
                              queries: Seq[(Long, Seq[String], Retrieval.BoolExpr)],
                              k: Int = 10, k1: Double = 1.2,
                              b: Double = 0.75,
                              only: Option[Set[String]] = None): DataFrame = {
    val terms = (queries.flatMap(_._2) ++
      queries.flatMap(q => Retrieval.BoolExpr.termsOf(q._3))).distinct
    val (p0, _, _) = postingsFor(spark, root, terms, only)
    val p = filterDeleted(spark, root, p0, only)
    val eligible = Retrieval.booleanTreeFrom(
      p.select(col("term"), col("doc_id"), col("dl")),
      queries.map { case (qid, _, f) => (qid, f) })
      .select(col("query_id"), col("doc_id"))
    val scored = Retrieval.scoreBm25Unranked(p,
      termStats(spark, root, only), corpusStats(spark, root, only),
      queries.map { case (qid, ts, _) => (qid, ts) }, k1, b)
    Retrieval.rankTopK(scored.join(eligible, Seq("query_id", "doc_id")), k)
  }

  /** NESTED boolean trees over the persisted index — arbitrary
    * And/Or/Diff composition ([[Retrieval.BoolExpr]]), tombstone-
    * aware on every leaf (a killed doc version neither matches nor
    * vetoes at any depth); only the trees' mentioned terms' buckets
    * open. */
  def booleanTree(spark: SparkSession, root: String,
                  queries: Seq[(Long, Retrieval.BoolExpr)],
                  only: Option[Set[String]] = None): DataFrame = {
    val terms = queries.flatMap(q => Retrieval.BoolExpr.termsOf(q._2))
      .distinct
    val (p0, _, _) = postingsFor(spark, root, terms, only)
    // localCheckpoint (r17): every LEAF of every query tree consumes
    // this relation, and Spark duplicates the whole subtree (bucket
    // scans + tombstone anti-filter + aggregates) per reference — the
    // measured plan carried 60 parquet scans and 110 exchanges for a
    // terms'-buckets-sized relation. Materializing it once per
    // invocation truncates the plan to leaf-joins over the pinned
    // rows; each bench rep still recomputes it from the index files.
    val p = filterDeleted(spark, root, p0, only)
      .select(col("term"), col("doc_id"), col("dl"))
      .localCheckpoint()
    Retrieval.booleanTreeFrom(p, queries)
      .orderBy(col("query_id"), col("doc_id"))
  }

  /** Boolean-OR over the persisted index — posting union with
    * distinct membership, tombstone-aware like [[booleanQuery]];
    * only the query terms' buckets open. */
  def booleanOr(spark: SparkSession, root: String,
                queries: Seq[(Long, Seq[String])],
                only: Option[Set[String]] = None): DataFrame = {
    val (p0, _, _) = postingsFor(spark, root, queries.flatMap(_._2), only)
    val p = filterDeleted(spark, root, p0, only)
      .select(col("term"), col("doc_id"), col("dl"))
    Retrieval.booleanOrFrom(p, queries)
      .orderBy(col("query_id"), col("doc_id"))
  }

  /** COMPACT the index: fold every batch-append increment AND every
    * tombstone into a fresh single-generation index at `dstRoot` —
    * live postings re-bucketed union (same bucket count and md5 rule,
    * so pruning contracts are unchanged), statistics recomputed
    * EXACTLY over the survivors, positions carried iff the source has
    * them. After enough appends the read-side batch listing and
    * per-bucket file counts grow; compaction bounds both
    * (CowTable.compact's job, at index granularity).
    *
    * Exactness: df recomputes from the live postings; (n_docs,
    * sum_dl) recompute from the live DOCLENS sidecar — which carries
    * a dl=0 row for every blank/null-text doc version, so even a
    * tombstone on a posting-less doc folds exactly (no residue; the
    * compacted index is bit-indistinguishable from one built on the
    * live corpus).
    *
    * Object-store discipline: the compacted index builds at a NEW
    * root (same staging + marker-last crash safety as [[write]]);
    * the SOURCE is never touched, so a crash mid-compact costs
    * nothing and the deployment flips its index pointer only once
    * `dstRoot` carries a marker — write-new, flip, GC-old, exactly
    * like the CoW table's version swap (see [[IndexCatalog]] for the
    * OCC pointer flip). Query-over-compacted must equal
    * query-over-(base+batches) bit-for-bit. */
  def compactTo(spark: SparkSession, srcRoot: String, dstRoot: String,
                only: Option[Set[String]] = None): Unit = {
    require(!Files.exists(marker(dstRoot)),
      s"compaction target $dstRoot already an index")
    val nb = bucketCount(srcRoot)
    val staging = s"$dstRoot/.staging"
    // sweep standard trees AND stray batch/tombstone roots at the
    // destination — a reused dstRoot with leftover *_batch_* debris
    // would otherwise silently merge into (or delete from) the
    // compacted generation, the exact hazard write() sweeps
    sweepRoot(dstRoot)
    def allBuckets(prefix: String): DataFrame =
      batchRoots(srcRoot, prefix, only)
        .foldLeft(spark.read.parquet(s"$srcRoot/$prefix"))(
          (acc, p) => acc.unionByName(spark.read.parquet(p)))
    // the kill set is read ONCE and reused across every consumer
    val kill = killRules(spark, srcRoot, only)
    def dropDead(rows: DataFrame): DataFrame = kill match {
      case None => rows
      case Some(kr) =>
        rows.join(broadcast(kr), Seq("doc_id"), "left")
          .filter(col("kill_below").isNull ||
            col("ver") >= col("kill_below"))
          .drop("kill_below")
    }
    val live = dropDead(allBuckets("postings").drop("__tb"))
    live
      .withColumn("__tb", Sampling.hashBucket(col("term"), nb))
      .write.partitionBy("__tb").parquet(s"$staging/postings")
    val liveLens = dropDead(docLens(spark, srcRoot, only))
    kill match {
      case None =>
        // nothing tombstoned: stats are purely additive — merge the
        // standing totals instead of re-aggregating postings
        termStats(spark, srcRoot, only).write.parquet(s"$staging/termstats")
        corpusStats(spark, srcRoot, only).write.parquet(s"$staging/corpus")
      case Some(_) =>
        live.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .write.parquet(s"$staging/termstats")
        liveLens
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
          .write.parquet(s"$staging/corpus")
    }
    liveLens.write.parquet(s"$staging/doclens")
    val pos = hasPositions(srcRoot)
    if (pos)
      dropDead(allBuckets("positions").drop("__tb"))
        .withColumn("__tb", Sampling.hashBucket(col("term"), nb))
        .write.partitionBy("__tb").parquet(s"$staging/positions")
    (Seq("postings", "termstats", "corpus", "doclens") ++
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
    * by id — candidates-at-a-time attribute lookup, not a scan.
    * Tombstoned/superseded versions filter BEFORE the anchor fold, so
    * only the live version's positions participate (two versions of
    * one doc must never cross-match). */
  /** LIVE positional postings for `terms` — term-bucket-pruned and
    * tombstone-filtered (superseded/deleted versions never emit an
    * occurrence): the relation the snippet/highlight consumers read
    * off the persisted index. (term, doc_id, pos). */
  def livePositionsFor(spark: SparkSession, root: String,
                       terms: Seq[String],
                       only: Option[Set[String]] = None): DataFrame = {
    val (p, _, _) = positionsFor(spark, root, terms, only)
    filterDeleted(spark, root, p, only)
      .select(col("term"), col("doc_id"), col("pos"))
  }

  /** Ordered-window proximity over the PERSISTED positions tree:
    * only the window terms' positional buckets open, tombstoned
    * versions drop before the chain joins — the 100 TB `#N(…)` path.
    * Semantically ≡ [[graft.operators.Retrieval.orderedWindow]] on
    * the live corpus (shares its oracle).
    */
  def orderedWindow(spark: SparkSession, root: String, docs: DataFrame,
                    terms: Seq[String], window: Int,
                    only: Option[Set[String]] = None): DataFrame =
    graft.operators.Retrieval
      .orderedWindowFrom(livePositionsFor(spark, root, terms, only), terms, window)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .orderBy(col("doc_id"))

  def phraseSearch(spark: SparkSession, root: String, docs: DataFrame,
                   phrase: String,
                   only: Option[Set[String]] = None): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    val (p, _, _) = positionsFor(spark, root, words, only)
    Retrieval.phraseAnchorsFrom(filterDeleted(spark, root, p, only), words)
      .select(col("doc_id")).distinct()
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .orderBy(col("doc_id"))
  }
}

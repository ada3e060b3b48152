package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.{Retrieval, Sampling}
import graft.tables.InvertedIndex

/** Persisted term-bucketed inverted index: driver-side bucket ≡ the
  * Column-form md5 bucket, pruned reads return exactly the terms'
  * postings, the skip arithmetic, absent-term edges, and score parity
  * with the in-process BM25.
  */
class InvertedIndexSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_invidx_spec_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("bucketOf matches Sampling.hashBucket bit-for-bit") {
    val terms = Seq("vector", "stream", "hash", "customer", "order", "dup",
      "join", "a", "the", "zzz", "Ünïcode", "x" * 100)
    val viaCol = terms.toDF("term")
      .select(col("term"), Sampling.hashBucket(col("term"), 64).as("b"))
      .as[(String, Long)].collect().toMap
    terms.foreach { t =>
      InvertedIndex.bucketOf(t, 64) shouldBe viaCol(t)
    }
  }

  test("write/read: pruned postings ≡ staged postings for the terms") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64)
    val terms = Seq("vector", "dup", "join")
    val (pruned, read, skipped) =
      InvertedIndex.postingsFor(spark, root, terms)
    read shouldBe terms.map(InvertedIndex.bucketOf(_, 64)).distinct.length
    (read + skipped) shouldBe 64
    val got = pruned.select("term", "doc_id", "dl", "tf")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = Retrieval.postingsStaged(docs)
      .filter(col("term").isin(terms: _*))
      .select("term", "doc_id", "dl", "tf")
      .as[(String, Long, Long, Long)].collect().toSet
    got shouldBe want
    // a second write must refuse (create-once like every artifact)
    intercept[IllegalArgumentException] {
      InvertedIndex.write(docs, root)
    }
  }

  test("terms absent from the corpus prune to empty, counts still derive from the rule") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64)
    val (p, read, skipped) =
      InvertedIndex.postingsFor(spark, root, Seq("qqqqq", "wwwww"))
    p.count() shouldBe 0L
    read shouldBe Seq("qqqqq", "wwwww")
      .map(InvertedIndex.bucketOf(_, 64)).distinct.length
    (read + skipped) shouldBe 64
  }

  test("indexed BM25 ≡ in-process BM25, score_q bit-for-bit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64)
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    val direct = Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
    val indexed = InvertedIndex.bm25TopK(spark, root, qs, k = 8)
      .collect().toSeq
    indexed shouldBe direct
  }

  /** Every file under the base trees with (size, mtime) — the
    * untouched-standing-files fingerprint. */
  private def treeState(root: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    Seq("postings", "termstats", "corpus", "positions")
      .flatMap(d => walk(new java.io.File(s"$root/$d")))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("append rolls the index forward; standing trees byte-untouched; query ≡ rebuild") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs.filter(col("doc_id") % 3 =!= 2), root,
      buckets = 64)
    val before = treeState(root)
    InvertedIndex.append(docs.filter(col("doc_id") % 3 === 2), root)
    treeState(root) shouldBe before // maintenance never rewrites the base
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    val full = freshRoot()
    InvertedIndex.write(docs, full, buckets = 64)
    InvertedIndex.bm25TopK(spark, root, qs, k = 8).collect().toSeq shouldBe
      InvertedIndex.bm25TopK(spark, full, qs, k = 8).collect().toSeq
  }

  test("append with a batch id: a redelivered batch replaces, never double-counts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs.filter(col("doc_id") % 2 === 0), root,
      buckets = 64)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    InvertedIndex.append(fresh, root, batch = Some("7"))
    val once = InvertedIndex
      .bm25TopK(spark, root, Seq((0L, Seq("dup", "join"))), k = 8)
      .collect().toSeq
    InvertedIndex.append(fresh, root, batch = Some("7")) // redelivery
    InvertedIndex
      .bm25TopK(spark, root, Seq((0L, Seq("dup", "join"))), k = 8)
      .collect().toSeq shouldBe once
    // corpus stats must not have double-counted either
    InvertedIndex.corpusStats(spark, root)
      .select("n_docs").as[Long].head() shouldBe docs.count()
  }

  test("compactTo folds batch roots into one generation; queries and phrase search unmoved; source untouched") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val src = freshRoot()
    InvertedIndex.write(docs.filter(col("doc_id") % 3 === 0), src,
      buckets = 64, positions = true)
    InvertedIndex.append(docs.filter(col("doc_id") % 3 === 1), src)
    InvertedIndex.append(docs.filter(col("doc_id") % 3 === 2), src)
    val srcState = treeState(src)
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    val before = InvertedIndex.bm25TopK(spark, src, qs, k = 8)
      .collect().toSeq
    val dst = freshRoot()
    InvertedIndex.compactTo(spark, src, dst)
    // one generation: no batch roots, positions carried, marker present
    assert(Option(new java.io.File(dst).listFiles()).toSeq.flatten
      .forall(f => !f.getName.contains("_batch_")))
    assert(InvertedIndex.hasPositions(dst))
    InvertedIndex.bm25TopK(spark, dst, qs, k = 8)
      .collect().toSeq shouldBe before
    InvertedIndex.phraseSearch(spark, dst, docs, "hash join")
      .as[(Long, Long)].collect().toSeq shouldBe
      InvertedIndex.phraseSearch(spark, src, docs, "hash join")
        .as[(Long, Long)].collect().toSeq
    treeState(src) shouldBe srcState // write-new never touches the source
  }

  test("tombstone deletes: O(|ids|) write, immediate filtering, drift until compaction, compacted ≡ rebuilt-on-live") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64, positions = true)
    val before = treeState(root)
    val deleted = docs.filter(col("doc_id") % 10 === 4).select(col("doc_id"))
    InvertedIndex.delete(deleted, root)
    treeState(root) shouldBe before // delete never touches a posting bucket
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    // deleted docs stop matching immediately — bm25 and phrase alike
    val live = InvertedIndex.bm25TopK(spark, root, qs, k = 20).collect()
    live.foreach(r => assert(r.getAs[Long]("doc_id") % 10 != 4))
    InvertedIndex.phraseSearch(spark, root, docs, "hash join").collect()
      .foreach(r => assert(r.getAs[Long]("doc_id") % 10 != 4))
    // redelivered delete (same batch id) is a no-op on state
    InvertedIndex.delete(deleted, root, batch = Some("9"))
    val onceDeleted = InvertedIndex.bm25TopK(spark, root, qs, k = 20)
      .collect().toSeq
    InvertedIndex.delete(deleted, root, batch = Some("9"))
    InvertedIndex.bm25TopK(spark, root, qs, k = 20)
      .collect().toSeq shouldBe onceDeleted
    // compaction folds tombstones: the new generation must be
    // indistinguishable from an index BUILT on the live corpus —
    // stats, scores, and phrase matches all bit-equal
    val cmp = freshRoot()
    InvertedIndex.compactTo(spark, root, cmp)
    val rebuilt = freshRoot()
    InvertedIndex.write(docs.filter(col("doc_id") % 10 =!= 4), rebuilt,
      buckets = 64, positions = true)
    InvertedIndex.corpusStats(spark, cmp).collect().toSeq shouldBe
      InvertedIndex.corpusStats(spark, rebuilt).collect().toSeq
    InvertedIndex.termStats(spark, cmp).orderBy("term").collect().toSeq shouldBe
      InvertedIndex.termStats(spark, rebuilt).orderBy("term").collect().toSeq
    InvertedIndex.bm25TopK(spark, cmp, qs, k = 20).collect().toSeq shouldBe
      InvertedIndex.bm25TopK(spark, rebuilt, qs, k = 20).collect().toSeq
    InvertedIndex.phraseSearch(spark, cmp, docs, "hash join")
      .as[(Long, Long)].collect().toSeq shouldBe
      InvertedIndex.phraseSearch(spark, rebuilt, docs, "hash join")
        .as[(Long, Long)].collect().toSeq
  }

  test("supersede + append = UPDATE: new text serves immediately, stats drift, compaction ≡ rebuild on the updated corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64, positions = true, ver = 1L)
    val before = treeState(root)
    // the update: %5==1 docs get ' dup dup' appended — supersede the
    // old version, append the new text under ver=2
    val updated = docs.filter(col("doc_id") % 5 === 1 && col("text").isNotNull)
      .select(col("doc_id"), concat(col("text"), lit(" dup dup")).as("text"))
    InvertedIndex.supersede(
      updated.select(col("doc_id"), lit(2L).as("kill_below")), root)
    InvertedIndex.append(updated, root, ver = 2L)
    treeState(root) shouldBe before // updates never rewrite standing trees
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    // LIVE state: postings of the new text only (old versions dead),
    // df/corpus stats drifted (old versions still counted) — exactly
    // an index built on updated docs then rolled forward by the same
    // churn (same posting set, same drifted stats by additivity)
    val updatedCorpus = docs.withColumn("text",
      when(col("doc_id") % 5 === 1 && col("text").isNotNull,
        concat(col("text"), lit(" dup dup"))).otherwise(col("text")))
    val twin = freshRoot()
    InvertedIndex.write(updatedCorpus, twin, buckets = 64, ver = 2L)
    // drift twin: same live postings, plus the superseded versions
    // still feeding stats — replay the same lifecycle onto the twin?
    // no: pin the DRIFT arithmetic directly instead. n_docs must
    // count base + appended versions; live matches must never be an
    // old version's.
    import spark.implicits._
    val nUpd = updated.count()
    InvertedIndex.corpusStats(spark, root).select("n_docs").as[Long]
      .head() shouldBe docs.count() + nUpd
    // the live posting set for 'dup' = new-text tokenization: every
    // updated doc matches (its new text carries 'dup'), and no doc
    // surfaces twice (one live version per doc)
    val dupDocs = InvertedIndex.bm25TopK(spark, root,
        Seq((0L, Seq("dup"))), k = 10000)
      .select("doc_id").as[Long].collect().toSeq
    dupDocs.distinct.length shouldBe dupDocs.length
    updated.select("doc_id").as[Long].collect()
      .foreach(d => assert(dupDocs.contains(d)))
    // compaction folds the superseded versions: the compacted index
    // must be indistinguishable from one BUILT on the updated corpus
    val cmp = freshRoot()
    InvertedIndex.compactTo(spark, root, cmp)
    InvertedIndex.corpusStats(spark, cmp).collect().toSeq shouldBe
      InvertedIndex.corpusStats(spark, twin).collect().toSeq
    InvertedIndex.termStats(spark, cmp).orderBy("term").collect().toSeq shouldBe
      InvertedIndex.termStats(spark, twin).orderBy("term").collect().toSeq
    InvertedIndex.bm25TopK(spark, cmp, qs, k = 20).collect().toSeq shouldBe
      InvertedIndex.bm25TopK(spark, twin, qs, k = 20).collect().toSeq
  }

  test("applyChanges consumes a feed with genuine update ops; re-insert after delete stays alive") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64, ver = 1L)
    import spark.implicits._
    // hand-built feed: v2 updates %5==1 (text + ' dup dup'), v3
    // deletes %10==4, v4 RE-INSERTS doc 4's original text
    val upd = docs.filter(col("doc_id") % 5 === 1 && col("text").isNotNull)
      .select(col("doc_id"), lit("update").as("op"),
        concat(col("text"), lit(" dup dup")).as("new_text"),
        lit(2L).as("version"))
    val del = docs.filter(col("doc_id") % 10 === 4)
      .select(col("doc_id"), lit("delete").as("op"),
        lit(null).cast("string").as("new_text"), lit(3L).as("version"))
    val reins = docs.filter(col("doc_id") === 4)
      .select(col("doc_id"), lit("insert").as("op"),
        col("text").as("new_text"), lit(4L).as("version"))
    InvertedIndex.applyChanges(upd.unionByName(del).unionByName(reins), root)
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    val matches = InvertedIndex.bm25TopK(spark, root, qs, k = 10000)
      .select("doc_id").as[Long].collect().toSet
    // %10==4 docs are dead — EXCEPT doc 4, which was re-inserted at a
    // higher version than its kill_below and must serve again
    matches.filter(_ % 10 == 4).foreach(d => assert(d == 4L))
    // compacted n_docs counts one live version per surviving doc:
    // base live = |docs| − |upd ∪ del|, plus the un-deleted updated
    // versions, plus the re-insert — algebra: |docs| − |del| + 1
    val cmp = freshRoot()
    InvertedIndex.compactTo(spark, root, cmp)
    val nDel = docs.filter(col("doc_id") % 10 === 4).count()
    InvertedIndex.corpusStats(spark, cmp).select("n_docs").as[Long]
      .head() shouldBe docs.count() - nDel + 1L
  }

  test("blank-doc tombstone folds EXACTLY: compacted stats ≡ rebuild on live docs (doclens sidecar)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "vector stream hash", 18L),
      (2L, null.asInstanceOf[String], 0L), // blank doc — no postings
      (3L, "dup join dup", 12L),
      (4L, "   ", 3L) // whitespace-only — tokenizes to nothing
    ).toDF("doc_id", "text", "n_chars")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 8)
    // tombstone the two posting-less docs (the former contract edge)
    InvertedIndex.delete(Seq(2L, 4L).toDF("doc_id"), root)
    val cmp = freshRoot()
    InvertedIndex.compactTo(spark, root, cmp)
    val rebuilt = freshRoot()
    InvertedIndex.write(docs.filter(col("doc_id").isin(1L, 3L)), rebuilt,
      buckets = 8)
    // n_docs/sum_dl recompute exactly — no avgdl/idf residue
    InvertedIndex.corpusStats(spark, cmp).collect().toSeq shouldBe
      InvertedIndex.corpusStats(spark, rebuilt).collect().toSeq
    InvertedIndex.termStats(spark, cmp).orderBy("term").collect().toSeq shouldBe
      InvertedIndex.termStats(spark, rebuilt).orderBy("term").collect().toSeq
    val qs = Seq((0L, Seq("vector", "dup")))
    InvertedIndex.bm25TopK(spark, cmp, qs, k = 5).collect().toSeq shouldBe
      InvertedIndex.bm25TopK(spark, rebuilt, qs, k = 5).collect().toSeq
  }

  test("a text-clearing update batch (zero postings) indexes cleanly; compaction still folds") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64, positions = true,
      ver = 1L)
    // a CDC batch of updates that CLEAR text: doclens rows exist
    // (dl=0) but the batch produces ZERO postings — a zero-row
    // partitioned parquet tree would be unreadable, so no
    // postings/positions roots may be written at all
    val clear = docs.filter(col("doc_id") % 7 === 2)
      .select(col("doc_id"), lit("update").as("op"),
        lit(null).cast("string").as("new_text"), lit(2L).as("version"))
    InvertedIndex.applyChanges(clear, root)
    assert(!new java.io.File(root).listFiles().exists(f =>
      f.getName.startsWith("postings_batch_") ||
        f.getName.startsWith("positions_batch_")))
    // cleared docs never match again
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    val m = InvertedIndex.bm25TopK(spark, root, qs, k = 10000)
      .select("doc_id").as[Long].collect().toSet
    assert(m.forall(_ % 7 != 2))
    // compaction folds without error, and ≡ a rebuild on the cleared
    // corpus (cleared docs stay live at dl=0 in the stats)
    val cmp = freshRoot()
    InvertedIndex.compactTo(spark, root, cmp)
    val rebuilt = freshRoot()
    InvertedIndex.write(docs.withColumn("text",
        when(col("doc_id") % 7 === 2, lit(null).cast("string"))
          .otherwise(col("text"))), rebuilt, buckets = 64)
    InvertedIndex.corpusStats(spark, cmp).collect().toSeq shouldBe
      InvertedIndex.corpusStats(spark, rebuilt).collect().toSeq
    InvertedIndex.bm25TopK(spark, cmp, qs, k = 10).collect().toSeq shouldBe
      InvertedIndex.bm25TopK(spark, rebuilt, qs, k = 10).collect().toSeq
  }

  test("crashed write leaves a retryable root; marker is written last") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    // simulate a crash: partial trees + staging debris, NO marker
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/postings/__tb=3"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/.staging/termstats"))
    InvertedIndex.write(docs, root, buckets = 64) // must sweep and succeed
    val qs = Seq((0L, Seq("vector", "stream")))
    InvertedIndex.bm25TopK(spark, root, qs, k = 5).collect().toSeq shouldBe
      Retrieval.bm25TopK(docs, qs, k = 5).collect().toSeq
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/.staging")))
  }

  test("persisted positions: phrase search ≡ staged indexed search; appends carry positions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs.filter(col("doc_id") % 2 === 0), root,
      buckets = 64, positions = true)
    InvertedIndex.append(docs.filter(col("doc_id") % 2 === 1), root)
    val got = InvertedIndex.phraseSearch(spark, root, docs, "hash join")
      .as[(Long, Long)].collect().toSeq
    val want = Retrieval.phraseSearchIndexed(docs, "hash join")
      .as[(Long, Long)].collect().toSeq
    got shouldBe want
    // an index written WITHOUT positions refuses phrase queries
    val bare = freshRoot()
    InvertedIndex.write(docs, bare, buckets = 64)
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseSearch(spark, bare, docs, "hash join")
    }
  }
}

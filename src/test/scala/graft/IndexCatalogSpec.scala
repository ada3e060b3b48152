package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.tables.{IndexCatalog, InvertedIndex, VectorIndex}

/** Generation pointer + OCC for the persisted search indexes: the
  * serving state is what the catalog says (never a directory
  * listing), compaction CAS-fails when an append registered after its
  * snapshot, an append re-homes itself across a generation flip, and
  * unregistered in-flight batch files are never served or folded.
  */
class IndexCatalogSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_idxcat_spec_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  /** The catalog-served BM25: resolve the head, query the generation
    * restricted to REGISTERED batches. */
  private def serve(root: String, k: Int = 8) = {
    val s = IndexCatalog.current(root)
    InvertedIndex.bm25TopK(spark, s.generation, qs, k,
      only = Some(s.batches.toSet))
  }

  test("create → append → compact → append: serving ≡ plain full index at every step") {
    val root = freshRoot()
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 === 1)
    val c = docs.filter(col("doc_id") % 3 === 2)
    IndexCatalog.create(root)(gen => InvertedIndex.write(a, gen))
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(a, qs, k = 8).collect().toSeq
    IndexCatalog.append(root)((gen, id) =>
      InvertedIndex.append(b, gen, batch = Some(id)))
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopKIncremental(Seq(a, b), qs, k = 8)
        .collect().toSeq
    val flipped = IndexCatalog.compact(root)((src, only, dst) =>
      InvertedIndex.compactTo(spark, src, dst, only = Some(only)))
    flipped.batches shouldBe empty
    IndexCatalog.append(root)((gen, id) =>
      InvertedIndex.append(c, gen, batch = Some(id)))
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
  }

  test("append registering between compact's snapshot and its flip: compact retries, nothing lost") {
    val root = freshRoot()
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    IndexCatalog.create(root)(gen => InvertedIndex.write(a, gen))
    var folds = 0
    // the seam fires before COMPACT's commit: an append lands (write +
    // register) after the compaction folded its snapshot — the flip
    // must lose the CAS and re-fold over the grown batch set
    IndexCatalog.beforeCommitHook = () => {
      IndexCatalog.beforeCommitHook = () => ()
      IndexCatalog.append(root)((gen, id) =>
        InvertedIndex.append(b, gen, batch = Some(id)))
    }
    try {
      IndexCatalog.compact(root) { (src, only, dst) =>
        folds += 1
        InvertedIndex.compactTo(spark, src, dst, only = Some(only))
      }
    } finally IndexCatalog.beforeCommitHook = () => ()
    folds shouldBe 2 // first fold lost the race, refold carried the append
    val head = IndexCatalog.current(root)
    head.batches shouldBe empty // the re-fold absorbed the appended batch
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
  }

  test("compact flipping between append's write and its commit: the append re-homes into the new generation") {
    val root = freshRoot()
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    IndexCatalog.create(root)(gen => InvertedIndex.write(a, gen))
    var appendWrites = Seq.empty[String]
    IndexCatalog.beforeCommitHook = () => {
      IndexCatalog.beforeCommitHook = () => ()
      IndexCatalog.compact(root)((src, only, dst) =>
        InvertedIndex.compactTo(spark, src, dst, only = Some(only)))
    }
    try {
      IndexCatalog.append(root) { (gen, id) =>
        appendWrites = appendWrites :+ gen
        InvertedIndex.append(b, gen, batch = Some(id))
      }
    } finally IndexCatalog.beforeCommitHook = () => ()
    // physical write ran twice: once into the dead generation, once
    // re-homed into the flipped one
    appendWrites.length shouldBe 2
    appendWrites.distinct.length shouldBe 2
    val head = IndexCatalog.current(root)
    head.generation shouldBe appendWrites.last
    head.batches.length shouldBe 1
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
  }

  test("unregistered in-flight batch files are never served and never folded") {
    val root = freshRoot()
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    IndexCatalog.create(root)(gen => InvertedIndex.write(a, gen))
    val s0 = IndexCatalog.current(root)
    // a crashed append: files present in the generation dir, id never
    // registered — the directory-listing read would serve it; the
    // catalog read must not
    InvertedIndex.append(b, s0.generation, batch = Some("orphan"))
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(a, qs, k = 8).collect().toSeq
    IndexCatalog.compact(root)((src, only, dst) =>
      InvertedIndex.compactTo(spark, src, dst, only = Some(only)))
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(a, qs, k = 8).collect().toSeq
  }

  test("vector side: catalog-served probe across append, orphan exclusion, and compact flip") {
    val root = freshRoot()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") < 3)
    def serveV(k: Int = 6) = {
      val s = IndexCatalog.current(root)
      VectorIndex.topK(spark, s.generation, queries, k, nprobe = 16,
        only = Some(s.batches.toSet))
    }
    IndexCatalog.create(root)(gen => VectorIndex.write(a, gen, nlist = 16))
    IndexCatalog.append(root)((gen, id) =>
      VectorIndex.append(b, gen, batch = Some(id)))
    val wantAll = operators.Similarity.bruteForceTopK(emb, queries, 6)
      .collect().toSeq
    serveV().collect().toSeq shouldBe wantAll
    // orphan batch: present on disk, never registered → not served
    val s1 = IndexCatalog.current(root)
    VectorIndex.delete(queries.limit(0).select(col("vec_id")),
      s1.generation, batch = Some("orphandel"))
    VectorIndex.append(emb.filter(col("vec_id") < 0), s1.generation,
      batch = Some("orphan"))
    serveV().collect().toSeq shouldBe wantAll
    IndexCatalog.compact(root)((src, only, dst) =>
      VectorIndex.compactTo(spark, src, dst, only = Some(only)))
    serveV().collect().toSeq shouldBe wantAll
  }

  test("gc racing a compaction: the barrier version forces a refold; serving never points at a gutted dir") {
    val root = freshRoot()
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    IndexCatalog.create(root)(gen => InvertedIndex.write(a, gen))
    IndexCatalog.append(root)((gen, id) =>
      InvertedIndex.append(b, gen, batch = Some(id)))
    val headBefore = IndexCatalog.current(root).version
    // gc fires between the compact's fold and its CAS commit — the
    // exact window in which gc deletes the compact's (uncommitted,
    // unreferenced) destination; the barrier version makes the
    // compact LOSE its commit and refold instead of publishing a
    // pointer at the gutted dir
    var armed = true
    IndexCatalog.beforeCommitHook = () =>
      if (armed) { armed = false; IndexCatalog.gc(root): Unit }
    try IndexCatalog.compact(root)((src, only, dst) =>
      InvertedIndex.compactTo(spark, src, dst, only = Some(only)))
    finally IndexCatalog.beforeCommitHook = () => ()
    val s = IndexCatalog.current(root)
    s.version shouldBe headBefore + 2 // gc's barrier + the refold
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s.generation)))
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
  }

  test("create is crash-retryable: a dead create's orphan build never conflicts and gc collects it") {
    val root = freshRoot()
    // simulate the crash: a previous create finished its build (index
    // marker present) but died before the v1 catalog commit — its dir
    // is an orphan the retry must neither trip over nor touch
    InvertedIndex.write(docs.filter(col("doc_id") % 2 === 0), s"$root/g1")
    intercept[IllegalArgumentException] { IndexCatalog.current(root) }
    val s = IndexCatalog.create(root)(gen => InvertedIndex.write(docs, gen))
    s.version shouldBe 1
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
    // a catalog that EXISTS refuses a second create
    intercept[IllegalArgumentException] {
      IndexCatalog.create(root)(_ => ())
    }
    // the orphan (target version 1 ≤ the barrier) dies at the next gc
    val (gens, _) = IndexCatalog.gc(root)
    gens shouldBe 1
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/g1")))
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
  }

  test("catalog-governed CDC apply: ONE registered id serves and folds both of applyChanges' increments") {
    val root = freshRoot()
    import spark.implicits._
    val base = docs.filter(col("doc_id") % 3 =!= 2)
    IndexCatalog.create(root)(gen =>
      InvertedIndex.write(base, gen, ver = 1L))
    val ins = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), lit("insert").as("op"),
        col("text").as("new_text"), lit(2L).as("version"))
    val upd = docs
      .filter(col("doc_id") % 3 =!= 2 && col("doc_id") % 5 === 1 &&
        col("text").isNotNull)
      .select(col("doc_id"), lit("update").as("op"),
        concat(col("text"), lit(" dup dup")).as("new_text"),
        lit(2L).as("version"))
    val del = docs.filter(col("doc_id") % 10 === 4)
      .select(col("doc_id"), lit("delete").as("op"),
        lit(null).cast("string").as("new_text"), lit(3L).as("version"))
    IndexCatalog.append(root)((gen, id) =>
      InvertedIndex.applyChanges(ins.unionByName(upd).unionByName(del),
        gen, batch = Some(id)))
    // the registered id admits BOTH derived roots (<id>u / <id>d):
    // inserts/updates serve, deletes filter — under only=registered
    val m = serve(root, k = 10000).select("doc_id").as[Long]
      .collect().toSet
    assert(m.forall(_ % 10 != 4))
    assert(m.exists(_ % 3 == 2)) // an unregistered u-root would drop these
    // ... and compaction with only=registered folds both increments:
    // compacted serving ≡ a rebuild over the final corpus, bit-exact
    IndexCatalog.compact(root)((src, only, dst) =>
      InvertedIndex.compactTo(spark, src, dst, only = Some(only)))
    val finalCorpus = docs
      .withColumn("text",
        when(col("doc_id") % 3 =!= 2 && col("doc_id") % 5 === 1 &&
          col("text").isNotNull,
          concat(col("text"), lit(" dup dup"))).otherwise(col("text")))
      .filter(col("doc_id") % 10 =!= 4)
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(finalCorpus, qs, k = 8).collect().toSeq
  }

  test("gc: dead generations and losing-OCC orphans die; retained serving unmoved") {
    val root = freshRoot()
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 === 1)
    val c = docs.filter(col("doc_id") % 3 === 2)
    val s0 = IndexCatalog.create(root)(gen => InvertedIndex.write(a, gen))
    IndexCatalog.append(root)((gen, id) =>
      InvertedIndex.append(b, gen, batch = Some(id)))
    val flipped = IndexCatalog.compact(root)((src, only, dst) =>
      InvertedIndex.compactTo(spark, src, dst, only = Some(only)))
    IndexCatalog.append(root)((gen, id) =>
      InvertedIndex.append(c, gen, batch = Some(id)))
    // a losing compact's orphaned build sits next to the live one
    // (its target version 4 is at/below the gc barrier ⇒ collectable)
    val orphan = s"$root/g4_deadbeef"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$orphan/postings"))
    val before = serve(root).collect().toSeq
    val (gens, dropped) = IndexCatalog.gc(root)
    gens shouldBe 2 // superseded create generation + the orphan build
    dropped shouldBe 3 // v1..v3 beyond retainVersions=1
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s0.generation)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(orphan)))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(flipped.generation)))
    serve(root).collect().toSeq shouldBe before
    serve(root).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
    // REPEATED gc must not erode retention: the head is already a
    // barrier, so a second run reuses it and deletes nothing more
    IndexCatalog.gc(root) shouldBe ((0, 0))
    serve(root).collect().toSeq shouldBe before
    // retention > 1 keeps the older state's generation readable
    val root2 = freshRoot()
    val r2s0 = IndexCatalog.create(root2)(gen =>
      InvertedIndex.write(a, gen))
    IndexCatalog.compact(root2)((src, only, dst) =>
      InvertedIndex.compactTo(spark, src, dst, only = Some(only)))
    val (g2, d2) = IndexCatalog.gc(root2, retainVersions = 2)
    (g2, d2) shouldBe ((0, 0))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(r2s0.generation)))
    // ... and repeated gcs STILL keep both user states (the barrier
    // does not count against retainVersions)
    IndexCatalog.gc(root2, retainVersions = 2) shouldBe ((0, 0))
    // time travel: the retained v1 state still serves its snapshot
    val s1 = IndexCatalog.at(root2, 1)
    InvertedIndex.bm25TopK(spark, s1.generation, qs, 8,
        only = Some(s1.batches.toSet)).collect().toSeq shouldBe
      operators.Retrieval.bm25TopK(a, qs, k = 8).collect().toSeq
    intercept[IllegalArgumentException] { IndexCatalog.at(root2, 99) }
  }

  test("zero-byte version claim: readers skip it, a stale claim is reclaimed, gc sweeps strays") {
    import java.nio.file.{Files => F, Paths => P}
    val root = freshRoot()
    IndexCatalog.create(root) { gen =>
      F.createDirectories(P.get(gen)): Unit
    }
    IndexCatalog.append(root) { (gen, id) =>
      F.write(P.get(s"$gen/b_$id.txt"), "x".getBytes("UTF-8")): Unit
    }
    // a fallback commit crashed between claim and publish: zero-byte
    // v3.json. Readers must keep serving v2, and time travel to the
    // claim must refuse (it is not a committed state).
    F.createFile(P.get(s"$root/_catalog/v3.json")): Unit
    IndexCatalog.current(root).version shouldBe 2
    intercept[IllegalArgumentException] { IndexCatalog.at(root, 3) }
    // past the claim TTL the next commit RECLAIMS the wedged version
    // number instead of spinning on ConcurrentCatalogCommit forever
    IndexCatalog.staleClaimTtlMs = -1L
    try {
      val s = IndexCatalog.append(root) { (gen, id) =>
        F.write(P.get(s"$gen/b_$id.txt"), "y".getBytes("UTF-8")): Unit
      }
      s.version shouldBe 3
      s.batches should have size 2
      IndexCatalog.current(root).version shouldBe 3
      // a stray dead claim beyond the head: gc sweeps it
      F.createFile(P.get(s"$root/_catalog/v9.json")): Unit
      IndexCatalog.gc(root): Unit
      assert(!F.exists(P.get(s"$root/_catalog/v9.json")))
      IndexCatalog.current(root).version shouldBe 4 // the gc barrier
      IndexCatalog.current(root).batches should have size 2
    } finally IndexCatalog.staleClaimTtlMs = 60 * 1000L
  }

  test("advanceBarrier: a crashed compact's post-barrier orphan becomes collectable") {
    import java.nio.file.{Files => F, Paths => P}
    val root = freshRoot()
    val created = IndexCatalog.create(root) { gen =>
      F.createDirectories(P.get(gen))
      F.write(P.get(s"$gen/base.txt"), "x".getBytes("UTF-8")): Unit
    }
    IndexCatalog.gc(root): Unit // barrier v2
    // a compact snapshotted the barrier head (targets v3) then
    // crashed: its build dir is an orphan ABOVE the barrier
    val orphan = s"$root/g3_deadbeef"
    F.createDirectories(P.get(orphan)): Unit
    // plain gc reuses the v2 barrier — the orphan may still be a LIVE
    // compaction that could win v3, so it must survive
    IndexCatalog.gc(root)._1 shouldBe 0
    assert(F.exists(P.get(orphan)))
    // advanceBarrier mints a fresh barrier (v3): the crashed build's
    // writer now provably cannot win its CAS — the orphan is dead and
    // this same gc collects it; serving never moves
    val (gens, _) = IndexCatalog.gc(root, advanceBarrier = true)
    gens shouldBe 1
    assert(!F.exists(P.get(orphan)))
    val head = IndexCatalog.current(root)
    head.generation shouldBe created.generation
    assert(F.exists(P.get(s"${head.generation}/base.txt")))
  }
}

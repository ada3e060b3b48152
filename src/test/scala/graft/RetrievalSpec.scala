package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Retrieval

/** BM25 / boolean / phrase / RRF retrieval: hand-computed scores on a
  * tiny corpus, ranking invariants, and fusion arithmetic.
  */
class RetrievalSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "cat dog cat", "en", "s", 11L),
    (1L, "cat dog dog dog fish", "en", "s", 20L),
    (2L, "fish fish fish fish fish fish", "en", "s", 29L),
    (3L, "dog", "en", "s", 3L),
    (4L, "bird bird bird cat", "en", "s", 18L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("postings carry tf and dl per (term, doc)") {
    val p = Retrieval.postingsStaged(corpus)
      .orderBy("term", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    p should contain(("cat", 0L, 3L, 2L))
    p should contain(("dog", 1L, 5L, 3L))
    p should contain(("fish", 2L, 6L, 6L))
    p.count(_._1 == "cat") shouldBe 3
  }

  test("bm25 matches the hand formula and ranks tf up, dl down") {
    val res = Retrieval.bm25TopK(corpus, Seq((0L, Seq("dog"))), k = 5)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    // Hand BM25 (k1=1.2, b=0.75): N=5, df(dog)=3, avgdl=19/5
    val idfQ = math.round(math.log(6.0) * 1e12) - math.round(math.log(3.5) * 1e12)
    def tfNorm(tf: Long, dl: Long): Double = {
      val avgdl = 19.0 / 5.0
      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    }
    def score(tf: Long, dl: Long): Long =
      math.round(idfQ.toDouble * tfNorm(tf, dl))
    res(3L) shouldBe score(1, 1) // "dog": tf=1, dl=1
    res(1L) shouldBe score(3, 5)
    res(0L) shouldBe score(1, 3)
    // short doc with same tf outranks longer doc; higher tf outranks
    res(3L) should be > res(0L)
    res(1L) should be > res(0L)
    res.keySet shouldBe Set(0L, 1L, 3L) // fish/bird docs never match
  }

  test("bm25 sums per-term contributions for multi-term queries") {
    val single =
      Retrieval.bm25TopK(corpus, Seq((0L, Seq("cat")), (1L, Seq("dog"))), k = 5)
        .select("query_id", "doc_id", "score_q").as[(Long, Long, Long)]
        .collect()
    val both = Retrieval.bm25TopK(corpus, Seq((7L, Seq("cat", "dog"))), k = 5)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    val catScores = single.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val dogScores = single.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    both(0L) shouldBe catScores(0L) + dogScores(0L)
    both(1L) shouldBe catScores(1L) + dogScores(1L)
    both(3L) shouldBe dogScores(3L) // cat absent: pure dog term
  }

  test("booleanAnd intersects postings exactly") {
    val hits = Retrieval.booleanAnd(corpus,
      Seq((0L, Seq("cat", "dog")), (1L, Seq("fish")), (2L, Seq("cat", "bird"))))
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    hits shouldBe Set((0L, 0L), (0L, 1L), (1L, 1L), (1L, 2L), (2L, 4L))
  }

  test("booleanAnd dedups repeated query terms") {
    val hits = Retrieval.booleanAnd(corpus, Seq((0L, Seq("dog", "dog"))))
      .select("doc_id").as[Long].collect().toSet
    hits shouldBe Set(0L, 1L, 3L)
  }

  test("booleanOr unions postings with distinct membership") {
    val hits = Retrieval.booleanOr(corpus,
      Seq((0L, Seq("cat", "dog")), (1L, Seq("bird"))))
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    // doc 0/1 match both of query 0's terms — they appear ONCE
    hits shouldBe Set((0L, 0L), (0L, 1L), (0L, 3L), (0L, 4L), (1L, 4L))
  }

  test("boolean edge cases: absent term, all-docs term") {
    // AND with an absent term is empty; OR with one still unions the rest
    Retrieval.booleanAnd(corpus, Seq((0L, Seq("cat", "zzz"))))
      .count() shouldBe 0
    Retrieval.booleanOr(corpus, Seq((0L, Seq("cat", "zzz"))))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(0L, 1L, 4L)
    // a term in EVERY doc: AND with it ≡ the other term's postings;
    // NOT of it excludes everything
    val all = corpus.withColumn("text", concat(col("text"), lit(" xx")))
    Retrieval.booleanAnd(all, Seq((0L, Seq("cat", "xx"))))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(0L, 1L, 4L)
    Retrieval.booleanNot(all, Seq((0L, Seq("cat"), Seq("xx"))))
      .count() shouldBe 0
    // excluding an ABSENT term excludes nothing
    Retrieval.booleanNot(corpus, Seq((0L, Seq("cat"), Seq("zzz"))))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(0L, 1L, 4L)
  }

  test("booleanNot = NOT of AND: candidates minus any-exclude-term docs") {
    val hits = Retrieval.booleanNot(corpus, Seq(
      (0L, Seq("cat", "dog"), Seq("fish")), // doc 1 has fish → out
      (1L, Seq("dog"), Seq("cat", "fish")), // only doc 3 is pure dog
      (2L, Seq("bird"), Seq.empty))) // empty excludes = plain AND
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    hits shouldBe Set((0L, 0L), (1L, 3L), (2L, 4L))
    // a bare NOT (no includes) is refused, never complemented
    val e = intercept[IllegalArgumentException] {
      Retrieval.booleanNot(corpus, Seq((0L, Seq.empty, Seq("cat"))))
    }
    e.getMessage should include("include term")
  }

  test("booleanTree: nested And/Or/Diff set algebra, distinct membership, bounded Diff") {
    import Retrieval.BoolExpr._
    // corpus: 0=cat dog cat, 1=cat dog dog dog fish, 2=fish x6,
    // 3=dog, 4=bird bird bird cat
    val qs = Seq(
      // (cat ∧ dog) ∨ (fish) — doc 1 matches BOTH branches: once
      0L -> Or(Seq(And(Seq(Term("cat"), Term("dog"))), Term("fish"))),
      // (cat ∨ bird) ∖ (dog ∧ fish) — doc 1 vetoed by the nested AND
      1L -> Diff(Or(Seq(Term("cat"), Term("bird"))),
        And(Seq(Term("dog"), Term("fish")))),
      // Diff nested INSIDE an And: dog-docs that are (cat-docs minus
      // fish-docs) — 0 and 3?  3 has no cat → just 0
      2L -> And(Seq(Term("dog"), Diff(Term("cat"), Term("fish")))),
      // absent term at depth: Or falls back to the live branch
      3L -> Or(Seq(Term("zzz"), Term("bird"))))
    val hits = Retrieval.booleanTree(corpus, qs)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    hits shouldBe Set(
      (0L, 0L), (0L, 1L), (0L, 2L),
      (1L, 0L), (1L, 4L),
      (2L, 0L),
      (3L, 4L))
    // dl rides the result rows
    Retrieval.booleanTree(corpus, Seq(0L -> Term("fish")))
      .select("doc_id", "dl").as[(Long, Long)].collect().toSet shouldBe
      Set((1L, 5L), (2L, 6L))
  }

  test("bm25TopKBooleanFiltered: filter gates membership, never re-weighs; ranks within eligible set") {
    import Retrieval.BoolExpr._
    // query "dog" filtered to (cat ∖ fish): docs 0,1,4 have cat; 1
    // has fish → eligible {0, 4}; of those only 0 has dog
    val res = Retrieval.bm25TopKBooleanFiltered(corpus,
      Seq((0L, Seq("dog"), Diff(Term("cat"), Term("fish")))), k = 5)
      .select("doc_id", "rank", "score_q").as[(Long, Long, Long)]
      .collect()
    res.map(_._1).toSet shouldBe Set(0L)
    res.head._2 shouldBe 1L // ranks assigned WITHIN the eligible set
    // filter-context: the surviving score is bit-identical to the
    // unfiltered run's score for the same doc
    val unfiltered = Retrieval.bm25TopK(corpus, Seq((0L, Seq("dog"))),
      k = 5).select("doc_id", "score_q").as[(Long, Long)]
      .collect().toMap
    res.head._3 shouldBe unfiltered(0L)
    // persisted twin serves the identical ranking
    val dir = java.nio.file.Files.createTempDirectory("graft_bmbf_")
    dir.toFile.deleteOnExit()
    tables.InvertedIndex.write(corpus, dir.toString)
    tables.InvertedIndex.bm25TopKBooleanFiltered(spark, dir.toString,
      Seq((0L, Seq("dog"), Diff(Term("cat"), Term("fish")))), k = 5)
      .select("doc_id", "rank", "score_q").as[(Long, Long, Long)]
      .collect().toSeq shouldBe res.toSeq
  }

  test("persisted booleanTree: tombstones kill leaves at any depth") {
    import Retrieval.BoolExpr._
    val dir = java.nio.file.Files.createTempDirectory("graft_treeidx_")
    dir.toFile.deleteOnExit()
    tables.InvertedIndex.write(corpus, dir.toString, ver = 1L)
    // delete doc 1 (cat+dog+fish): it must stop matching any branch
    // AND stop vetoing — (cat ∖ fish) regains nothing it vetoed (doc
    // 0 never had fish), but (bird ∨ fish) loses it as a match
    tables.InvertedIndex.delete(Seq(1L).toDF("doc_id"), dir.toString)
    tables.InvertedIndex.booleanTree(spark, dir.toString,
      Seq(0L -> Or(Seq(Term("bird"), Term("fish")))))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(2L, 4L)
    // and as a veto: (cat ∖ dog) — with doc 1 dead, its dog posting
    // must not veto... doc 1 is dead anyway; doc 0 has dog live → out;
    // doc 4 (bird bird bird cat, no dog) stays
    tables.InvertedIndex.booleanTree(spark, dir.toString,
      Seq(0L -> Diff(Term("cat"), Term("dog"))))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(4L)
  }

  test("persisted booleanQuery drops tombstoned versions on BOTH arms") {
    val dir = java.nio.file.Files.createTempDirectory("graft_boolidx_")
    dir.toFile.deleteOnExit()
    tables.InvertedIndex.write(corpus, dir.toString, ver = 1L)
    // doc 2 (the only all-fish doc) is deleted: it must stop matching
    // (include arm) — and doc 1's ghost must still veto nothing extra
    tables.InvertedIndex.delete(Seq(2L).toDF("doc_id"), dir.toString)
    tables.InvertedIndex.booleanQuery(spark, dir.toString,
      Seq((0L, Seq("fish"), Seq.empty)))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(1L)
    // exclude arm: deleting doc 1 (cat+dog+fish) means its postings
    // must not veto — but it is also no longer a candidate; doc 0
    // (cat dog, no fish) survives the exclusion either way, and the
    // DELETED doc's fish posting must not exclude doc 0 from a
    // hypothetical revival — pin the live algebra directly
    tables.InvertedIndex.booleanQuery(spark, dir.toString,
      Seq((0L, Seq("cat"), Seq("fish"))))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(0L, 4L)
  }

  test("phraseSearch requires adjacency in order") {
    val df = Seq(
      (0L, "hash join wins", 14L),
      (1L, "join hash wins", 14L),
      (2L, "hash  join", 10L), // whitespace run squeezes to adjacency
      (3L, "hash nothing join", 17L),
      (4L, null.asInstanceOf[String], 0L)
    ).toDF("doc_id", "text", "n_chars")
    Retrieval.phraseSearch(df, "hash join")
      .select("doc_id").as[Long].collect().toSet shouldBe Set(0L, 2L)
  }

  test("phraseSearchIndexed ≡ phraseSearch, including repeated words") {
    val df = Seq(
      (0L, "hash join wins", 14L),
      (1L, "join hash wins", 14L),
      (2L, "hash  join", 10L),
      (3L, "hash nothing join", 17L),
      (4L, null.asInstanceOf[String], 0L),
      (5L, "go go go", 8L),
      (6L, "go stop go go", 13L),
      (7L, "go go", 5L)
    ).toDF("doc_id", "text", "n_chars")
    def both(phrase: String): (Set[Long], Set[Long]) = (
      Retrieval.phraseSearch(df, phrase)
        .select("doc_id").as[Long].collect().toSet,
      Retrieval.phraseSearchIndexed(df, phrase)
        .select("doc_id").as[Long].collect().toSet)
    val (s1, i1) = both("hash join")
    i1 shouldBe s1
    i1 shouldBe Set(0L, 2L)
    // tripled word: needs THREE adjacent occurrences (self-join at
    // shifted offsets) — doc 6 has "go go" twice but never "go go go"
    val (s2, i2) = both("go go go")
    i2 shouldBe s2
    i2 shouldBe Set(5L)
    val (s3, i3) = both("go go")
    i3 shouldBe s3
    i3 shouldBe Set(5L, 6L, 7L)
  }

  test("hybridRrf fuses ranks with 1/(60+r) arithmetic") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val res = Retrieval.hybridRrf(docs, emb,
      Seq((0L, Seq("vector", "stream")), (1L, Seq("customer", "order"))),
      kLex = 10, kAnn = 10, k = 5)
    val rows = res.collect()
    rows.map(_.getAs[Long]("query_id")).toSet shouldBe Set(0L, 1L)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      g.length shouldBe 5
      g.map(_.getAs[Long]("rank")).sorted shouldBe Array(1L, 2L, 3L, 4L, 5L)
    }
    // every fused score is reconstructible from its two rank columns
    rows.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank"))
        .map(x => 1.0 / (60.0 + x.toDouble)).getOrElse(0.0)
      val ann = Option(r.getAs[java.lang.Long]("ann_rank"))
        .map(x => 1.0 / (60.0 + x.toDouble)).getOrElse(0.0)
      r.getAs[Double]("rrf") shouldBe (lex + ann)
    }
    // a doc surfaced by both sources outranks one seen by just one at
    // similar ranks: verified structurally — top fused hit has both
    val top = rows.filter(r => r.getAs[Long]("rank") == 1L)
    top.foreach { r =>
      val both = r.getAs[java.lang.Long]("lex_rank") != null ||
        r.getAs[java.lang.Long]("ann_rank") != null
      both shouldBe true
    }
  }

  test("incremental bm25 over disjoint batches ≡ full rebuild") {
    val batches = Seq(
      corpus.filter(col("doc_id") % 3 === 0),
      corpus.filter(col("doc_id") % 3 === 1),
      corpus.filter(col("doc_id") % 3 === 2))
    val qs = Seq((0L, Seq("cat", "dog")), (1L, Seq("fish")))
    val full = Retrieval.bm25TopK(corpus, qs, k = 5).collect().toSeq
    val inc = Retrieval.bm25TopKIncremental(batches, qs, k = 5).collect().toSeq
    inc shouldBe full
  }

  test("incremental bm25 tolerates an empty batch") {
    val batches = Seq(corpus, corpus.filter(col("doc_id") < 0))
    val qs = Seq((0L, Seq("dog")))
    Retrieval.bm25TopKIncremental(batches, qs, k = 5).collect().toSeq shouldBe
      Retrieval.bm25TopK(corpus, qs, k = 5).collect().toSeq
  }

  test("evalMetrics: hand-computed nDCG/MRR/recall on a fixed run") {
    val run = Seq( // query 0: ranks 1..3
      (0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (0L, 13L, 4L)) // rank 4 excluded at k=3
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq( // doc 11 rel=2, doc 12 rel=1, doc 99 rel=3 (missed)
      (0L, 11L, 2L), (0L, 12L, 1L), (0L, 99L, 3L), (0L, 13L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val m = Retrieval.evalMetrics(run, qrels, k = 3).collect().head
    def disc(r: Int): Long =
      math.round(1e12 / (math.log(r + 1.0) / math.log(2.0)))
    // DCG: rank1 rel0 → 0; rank2 rel2 → 3·disc(2); rank3 rel1 → 1·disc(3)
    val dcg = 3L * disc(2) + 1L * disc(3)
    // ideal top-3 by (rel desc, doc_id): 99(rel3), 11(rel2), 12(rel1)
    val idcg = 7L * disc(1) + 3L * disc(2) + 1L * disc(3)
    m.getAs[Long]("dcg_q") shouldBe dcg
    m.getAs[Long]("idcg_q") shouldBe idcg
    m.getAs[Double]("ndcg") shouldBe dcg.toDouble / idcg.toDouble
    m.getAs[Long]("n_rel") shouldBe 4L
    m.getAs[Long]("n_hit_topk") shouldBe 2L
    m.getAs[Long]("first_rel_rank") shouldBe 2L
    m.getAs[Double]("rr") shouldBe 0.5
    m.getAs[Double]("recall_at_k") shouldBe 0.5
  }

  test("evalMetrics: perfect run scores ndcg 1, no-rel run scores 0") {
    val qrels = Seq((0L, 1L, 2L), (0L, 2L, 1L)).toDF("query_id", "doc_id", "rel")
    val perfect = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val mPerfect = Retrieval.evalMetrics(perfect, qrels, k = 5).collect().head
    mPerfect.getAs[Double]("ndcg") shouldBe 1.0
    mPerfect.getAs[Double]("rr") shouldBe 1.0
    mPerfect.getAs[Double]("recall_at_k") shouldBe 1.0
    val miss = Seq((0L, 7L, 1L), (0L, 8L, 2L)).toDF("query_id", "doc_id", "rank")
    val mMiss = Retrieval.evalMetrics(miss, qrels, k = 5).collect().head
    mMiss.getAs[Double]("ndcg") shouldBe 0.0
    mMiss.getAs[Long]("first_rel_rank") shouldBe 0L
    mMiss.getAs[Double]("rr") shouldBe 0.0
  }

  test("phraseOccurrences: 1-based first position and exact counts") {
    val df = Seq(
      (0L, "hash join wins hash join", 24L), // matches at tokens 1 and 4
      (1L, "x hash join", 11L), // match at token 2
      (2L, "join hash", 9L), // no match
      (3L, "go go go", 8L) // overlapping: "go go" at 1 and 2
    ).toDF("doc_id", "text", "n_chars")
    val hj = Retrieval.phraseOccurrences(df, "hash join")
      .as[(Long, Long, Long)].collect().toSeq
    hj shouldBe Seq((0L, 1L, 2L), (1L, 2L, 1L))
    val gg = Retrieval.phraseOccurrences(df, "go go")
      .as[(Long, Long, Long)].collect().toSeq
    gg shouldBe Seq((3L, 1L, 2L))
  }

  test("mmrRerank defers near-duplicates in favor of diverse hits") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
    }
    val q = Array(1f, 0f, 0f)
    val a = Array(0.9f, 0.1f, 0f) // best hit
    val b = Array(0.89f, 0.12f, 0f) // near-dup of a
    val c = Array(0.5f, -0.5f, 0f) // diverse, lower rel
    val emb = Seq(
      (0L, q.toSeq, 0), (10L, a.toSeq, 0), (11L, b.toSeq, 0), (12L, c.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val got = Retrieval.mmrRerank(emb, Seq(0L), kCand = 3, k = 3)
      .select("doc_id", "mmr_rank", "score")
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    // rank 1: pure relevance argmax (a); rank 2: the DIVERSE c beats
    // the near-dup b despite b's higher rel; rank 3: b last
    got.map(_._1).toSeq shouldBe Seq(10L, 12L, 11L)
    // scores match the hand formula at every step
    got(0)._3 shouldBe (0.5 * cos(a, q) - 0.5 * 0.0)
    got(1)._3 shouldBe (0.5 * cos(c, q) - 0.5 * cos(c, a))
    got(2)._3 shouldBe (0.5 * cos(b, q) - 0.5 * math.max(cos(b, a), cos(b, c)))
  }

  test("mmrRerank is deterministic under re-partitioning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val r1 = Retrieval.mmrRerank(emb, Seq(0L, 1L), kCand = 8, k = 4)
      .collect().toSeq
    val r2 = Retrieval.mmrRerank(emb.repartition(7), Seq(0L, 1L),
      kCand = 8, k = 4).collect().toSeq
    r2 shouldBe r1
    r1.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      g.map(_.getAs[Long]("doc_id")).distinct.length shouldBe 4
    }
  }

  test("bm25 plan prunes postings via broadcast query join") {
    val plan = Retrieval.bm25TopK(corpus, Seq((0L, Seq("cat"))), k = 3)
      .queryExecution.executedPlan.toString()
    plan should include("BroadcastHashJoin")
    // the only nested-loop is the 1-row corpus-stats broadcast cross
    "BroadcastNestedLoopJoin".r.findAllIn(plan).length should be <= 1
    plan should not include "CartesianProduct"
  }

  test("filtered bm25: filter-context semantics — candidates restricted, scores unchanged") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val qs = Seq((0L, Seq("dup", "join")))
    val unfiltered = Retrieval.bm25TopK(docs, qs, k = 100000).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q")).toMap
    val keep = docs.filter(col("source").isin("src1", "src2", "src3"))
      .select("doc_id").as[Long].collect().toSet
    val filtered = Retrieval.bm25TopKFiltered(docs, qs, Seq("source"),
      col("source").isin("src1", "src2", "src3"), k = 100000).collect()
    filtered.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(keep(id), s"doc $id ranked despite failing the filter")
      // ES filter-context: the filter never re-weighs — a surviving
      // doc's score is bit-identical to its unfiltered score
      r.getAs[Long]("score_q") shouldBe unfiltered(id)
    }
    filtered.map(_.getAs[Long]("doc_id")).toSet shouldBe
      unfiltered.keySet.intersect(keep)
  }

  test("snippets: window clamps at both document edges; single-space joined") {
    val docs = Seq(
      (1L, "hash join early words", 21L),           // match at pos 1: left clamp
      (2L, "a b c d hash join x y z w", 26L),       // interior: full ±3
      (3L, "one two three hash join", 23L),         // right clamp
      (4L, "no match here", 13L)
    ).toDF("doc_id", "text", "n_chars")
    val got = Retrieval.snippets(docs, "hash join", window = 3)
      .select("doc_id", "first_pos", "n_matches", "snip_start", "snip_end",
        "snippet")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    got shouldBe Seq(
      (1L, 1L, 1L, 1L, 4L, "hash join early words"),
      (2L, 5L, 1L, 2L, 9L, "b c d hash join x y z"),
      (3L, 4L, 1L, 1L, 5L, "one two three hash join"))
  }

  test("indexed hybrid/MMR ≡ scan-backed under full probe (fresh persisted trees)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def tmp(p: String) = {
      val d = java.nio.file.Files.createTempDirectory(p)
      d.toFile.deleteOnExit(); d.toString
    }
    val vdir = tmp("graft_rspec_vidx_")
    graft.tables.VectorIndex.write(emb, vdir, nlist = 16)
    val idir = tmp("graft_rspec_iidx_")
    graft.tables.InvertedIndex.write(docs, idir)
    val qs = Seq(0L -> Seq("vector", "stream"), 2L -> Seq("dup", "join"))
    Retrieval.hybridRrfIndexed(spark, idir, vdir, emb, qs,
        kLex = 15, kAnn = 15, k = 8, nprobe = 16).collect().toSeq shouldBe
      Retrieval.hybridRrf(docs, emb, qs, kLex = 15, kAnn = 15, k = 8)
        .collect().toSeq
    Retrieval.mmrRerankIndexed(spark, vdir, emb, Seq(0L, 2L), kCand = 10,
        k = 5, nprobe = 16).collect().toSeq shouldBe
      Retrieval.mmrRerank(emb, Seq(0L, 2L), kCand = 10, k = 5)
        .collect().toSeq
  }

  test("ordered window: in-order within span, anchors, min span, boundary") {
    val d = Seq(
      (10L, "key a table b row tail", 22L),          // span 4: match
      (11L, "row table key", 13L),                    // out of order: no
      (12L, "key a b c d e f g table row", 27L),      // p2-p0 = 9 > 8: no
      (13L, "key a b c d e f table row", 25L),        // p2-p0 = 8: boundary yes
      (14L, "key table row key x table y row", 31L),  // two anchors
      (15L, "no terms at all here", 20L)
    ).toDF("doc_id", "text", "n_chars")
    val out = Retrieval.orderedWindow(d, Seq("key", "table", "row"), window = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set(10L, 13L, 14L))
    assert(out(10L) === ((1L, 4L)))
    assert(out(13L) === ((1L, 8L)))
    // doc 14: anchors at pos 0 (key table row, span 2) and pos 3
    // (key x table y row, span 4); chains from anchor 0 to the later
    // occurrences stay within 8 too, but min span is 2
    assert(out(14L)._1 === 2L && out(14L)._2 === 2L)
    // window = exact phrase width behaves like adjacency
    val tight = Retrieval.orderedWindow(d, Seq("key", "table", "row"), window = 2)
      .collect().map(_.getLong(0)).toSet
    assert(tight === Set(14L))
  }

  test("unordered window: any order within span, tuple count, min span") {
    val d = Seq(
      (20L, "table a key", 11L),            // span 2, 1 tuple
      (21L, "key table", 9L),               // span 1
      (22L, "table a b c d key", 17L),      // span 5 > 4: no
      (23L, "key a table b key", 17L),      // tuples: (t2,k0) s2, (t2,k4) s2
      (24L, "nothing here", 12L)
    ).toDF("doc_id", "text", "n_chars")
    val out = Retrieval.unorderedWindow(d, Seq("table", "key"), window = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set(20L, 21L, 23L))
    assert(out(20L) === ((1L, 2L)))
    assert(out(21L) === ((1L, 1L)))
    assert(out(23L) === ((2L, 2L)))
  }

  test("sdm: decomposes into bm25 + window evidence; order evidence breaks ties") {
    val d = Seq(
      (0L, "cat dog mouse", 13L),
      (1L, "dog cat mouse", 13L),
      (2L, "cat fish fish fish fish fish fish fish fish dog", 48L)
    ).toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val qs = Seq(0L -> Seq("cat", "dog"))
    val sdm = Retrieval.sdmTopK(d, qs, window = 8, k = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val bm = Retrieval.bm25TopK(d, qs, k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // decomposition: doc 0 has ordered+unordered (1 each); doc 1 only
    // unordered; doc 2 neither (span 9 > 8)
    assert(sdm(0L)._1 === bm(0L) + 100000000000L + 50000000000L)
    assert(sdm(1L)._1 === bm(1L) + 50000000000L)
    assert(sdm(2L)._1 === bm(2L))
    // docs 0 and 1 tie on bm25 (same tf, same dl): order evidence
    // must break the tie in favour of the in-order doc
    assert(bm(0L) === bm(1L))
    assert(sdm(0L)._2 < sdm(1L)._2)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 0/1 near-identical (one word changed), 2 distinct, 3 == 0 exactly.
  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
  private def docs = Seq(
    (0L, base, "en", "s0", base.length.toLong),
    (1L, base.replace("lazy", "sleepy"), "en", "s1", base.length.toLong),
    (2L, "completely different words about spark catalyst plans and shuffles " * 4, "en", "s2", 200L),
    (3L, base, "en", "s3", base.length.toLong)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup keeps lowest id per text") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.count() === 3)
    assert(out.filter($"doc_id" === 3L).count() === 0) // dup of 0
    assert(out.filter($"doc_id" === 0L).count() === 1)
  }

  test("minhash LSH finds planted near-dups and not the distinct doc") {
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L))) // exact dup is also a near-dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("dedupNear keeps first of each near-dup cluster") {
    val kept = Dedup.dedupNear(docs).select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L) && kept.contains(2L))
    assert(!kept.contains(1L) && !kept.contains(3L))
  }

  test("removeDuplicateSpans: total, excises twin spans, leaves unique docs verbatim") {
    val out = Dedup.removeDuplicateSpans(docs, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // total: one row per input doc, no nulls
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
    out.values.foreach { case (n, k2, t) =>
      assert(k2 <= n && t != null)
    }
    // docs 0 and 3 are exact twins: every k-span duplicates, all
    // tokens excised
    assert(out(0L)._2 === 0L && out(0L)._3 === "")
    assert(out(3L)._2 === 0L && out(3L)._3 === "")
    // doc 2 shares no span with anyone EXCEPT its own internal x4
    // repetition — its repeated spans are corpus-duplicated too, so
    // it also shrinks; its token count is still reported in full
    assert(out(2L)._1 === 36L)
    // doc 1 differs from the twins by one word per repetition, but
    // the base sentence repeats 4x WITHIN it, so long spans still
    // duplicate internally; the kept text is a strict subset
    assert(out(1L)._2 < out(1L)._1)
    // a genuinely unique corpus passes through verbatim
    val uniq = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu", "en", "s", 60L),
      (11L, "one two three four five six seven eight nine ten eleven twelve", "en", "s", 60L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val u = Dedup.removeDuplicateSpans(uniq, k = 10)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(u(10L) === "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
    assert(u(11L) === "one two three four five six seven eight nine ten eleven twelve")
  }

  test("removeDuplicateSpansKeepOne: canonical occurrence survives, copies excised") {
    val dropAll = Dedup.removeDuplicateSpans(docs, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val keepOne = Dedup.removeDuplicateSpansKeepOne(docs, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(keepOne.keySet === dropAll.keySet)
    // keep-one never removes MORE than drop-all
    keepOne.keySet.foreach { id =>
      assert(keepOne(id)._1 >= dropAll(id)._1, s"doc $id kept fewer under keep-one")
    }
    // doc 0 is the canonical twin: its first occurrences survive
    // (drop-all excised it to ""), doc 3's spans are all non-canonical
    assert(keepOne(0L)._1 > 0L)
    assert(keepOne(3L)._2 === "")
  }

  test("simhash: identical docs distance 0, near-dups close, distinct far") {
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sh(0L) === sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // near-dup pair strictly closer than the unrelated pair (absolute
    // distances depend on how many distinct shingles the edit touches)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(2L)))
    assert(hamming(sh(0L), sh(2L)) > 10)
    val pairs = Dedup.simhashPairs(docs, maxDist = 3)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("ngram jaccard brute force agrees on the planted pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("incremental dedup ≡ full-union dedup restricted to the fresh batch") {
    val docs = tables.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    val inc = Dedup.dedupIncremental(corpus, fresh)
      .select("doc_id").as[Long].collect().toSet
    // ground truth: dedup the whole union, keep the fresh survivors
    val full = Dedup.dedupNearExact(docs)
      .filter(col("doc_id") >= 250)
      .select("doc_id").as[Long].collect().toSet
    assert(inc === full)
    // and the corpus itself is untouched (only fresh docs are dropped)
    assert(Dedup.dedupIncremental(corpus, fresh).count() <= fresh.count())
    // the MinHash sketch twin agrees with the exact blocking here
    // (the property its shared oracle depends on — cf. clean_corpus_sketch)
    val sk = Dedup.dedupIncrementalSketch(corpus, fresh)
      .select("doc_id").as[Long].collect().toSet
    assert(sk === inc)
  }

  test("minhash on the real corpus finds the driver-planted dup pairs") {
    val real = tables.Tables.documents(spark, sf)
    val pairs = Dedup.minhashPairs(real, threshold = 0.5)
    // sf0.001 corpus: every planted pair has jaccard ≈ 0.97+, so LSH
    // with 16 bands of 4 must catch all of them; spot-check shape.
    val n = pairs.count()
    assert(pairs.filter($"jaccard" < 0.5).count() === 0)
    val brute = Dedup.ngramJaccardPairs(real, threshold = 0.5)
    assert(n === brute.count()) // sketch recall == exact baseline here
  }

  test("containment finds asymmetric inclusion that Jaccard misses") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, quote),                      // short doc
      (1L, s"$filler $quote"),          // long doc QUOTING doc 0 verbatim
      (2L, "totally unrelated words about nothing shared at all here")
    ).toDF("doc_id", "text").withColumn("n_chars", length($"text"))
    // doc 0's shingles ⊆ doc 1's → containment 1.0, directional
    val cont = Dedup.containmentPairs(d, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont === Seq((0L, 1L, 1.0)))
    // symmetric Jaccard can't see it at any usable threshold
    val jac = Dedup.ngramJaccardPairs(d, threshold = 0.5)
    assert(jac.count() === 0L)
  }

  test("sketch ≡ uncapped blocked-exact pair set on the driver fixture") {
    // The CI form of tools/sketch_oracle_sweep.py: several driver rows
    // (dedup_clusters, split_leakage, dup_graph_degrees, ...) run
    // MinHash engine-side but are oracle-checked against the UNCAPPED
    // length-blocked exact pair set — neither subsumes the other by
    // construction (banding can miss true pairs; length-blocking
    // misses cross-block pairs), so the equality those oracles rest on
    // must fail HERE, as a symdiff assertion, when fixture drift ever
    // breaks it — not as a confusing oracle-red in the driver run.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sketch = Dedup.minhashPairs(docs)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, maxBlock = Int.MaxValue)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val symdiff = (sketch diff exact) union (exact diff sketch)
    assert(symdiff.isEmpty,
      s"sketch vs uncapped-exact symdiff must be empty, got: $symdiff")
  }

  test("prefix-filtered jaccard join is LOSSLESS vs all-pairs truth") {
    // The AllPairs/PPJoin claim is exactness without blocking caps:
    // verify against a locally computed full O(n²) truth over the
    // same shingle-hash sets, at the default threshold AND at an
    // inexact-binary one (0.7 exercises the ceil-epsilon guard on
    // the prefix length).
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val sets = real.select($"doc_id",
        graft.functions.WordShingleHashes.word_shingle_hashes($"text", 3).as("sh"))
      .as[(Long, Array[Long])].collect()
      .filter(_._2.nonEmpty)
    for (t <- Seq(0.5, 0.7)) {
      val got = Dedup.jaccardPrefixPairs(real, threshold = t)
        .select("doc_id_a", "doc_id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val truth = (for {
        i <- sets.indices.iterator
        j <- (i + 1 until sets.length).iterator
        (da, sa) = sets(i)
        (db, sb) = sets(j)
        inter = sa.toSet.intersect(sb.toSet).size.toDouble
        jac = inter / (sa.length + sb.length - inter)
        if jac >= t
      } yield (math.min(da, db), math.max(da, db), jac)).toSet
      assert(got === truth, s"threshold $t: prefix join != all-pairs truth")
      assert(truth.nonEmpty, s"threshold $t: fixture lost its planted pairs")
    }
    // planted fixture pairs behave like the blocked validator's
    val pairs = Dedup.jaccardPrefixPairs(docs, threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)) && pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("dedupIncrementalExact ≡ lower-id-partner rule over the unblocked pair truth") {
    val docs = tables.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    val inc = Dedup.dedupIncrementalExact(corpus, fresh)
      .select("doc_id").as[Long].collect().toSet
    // ground truth from the verified lossless all-pairs join: fresh
    // doc survives iff no lower-id partner at J >= 0.5
    val allPairs = Dedup.jaccardPrefixPairs(docs)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect()
    val victims = allPairs.collect { case (a, b) if b >= 250 => b }.toSet
    val freshIds = fresh.select("doc_id").as[Long].collect().toSet
    assert(inc === (freshIds diff victims))
    // corpus docs are never dropped or emitted
    assert(inc.forall(_ >= 250))
    // fresh-only tokens (df = 0 path): a fresh twin pair with words
    // the corpus never saw must still collapse to the lower id
    import spark.implicits._
    val novel = "zq xv qj wk pn bm rv tz ld gh " * 4
    val f2 = Seq((1000L, novel, 60L), (1001L, novel, 60L))
      .toDF("doc_id", "text", "n_chars")
    val out2 = Dedup.dedupIncrementalExact(corpus, f2)
      .select("doc_id").as[Long].collect().toSet
    assert(out2 === Set(1000L))
  }

  test("removeBoilerplateLines excises corpus-frequent lines, keeps order and blanks") {
    val d = Seq(
      (0L, "unique alpha\nSUBSCRIBE NOW\nunique beta"),
      (1L, "other text\nSUBSCRIBE NOW\nmore here\n\nfinal line"),
      (2L, "SUBSCRIBE NOW"),
      (3L, "totally unrelated\n   \nwith blank kept")
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplateLines(d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the planted boilerplate line vanishes from every doc, in order
    assert(out(0L) === ((3L, 2L, "unique alpha\nunique beta")))
    // blank lines pass through (never counted, never removed)
    assert(out(1L) === ((5L, 4L, "other text\nmore here\n\nfinal line")))
    // a doc that IS the boilerplate empties out
    assert(out(2L) === ((1L, 0L, "")))
    // whitespace-only lines are kept and not treated as boilerplate
    assert(out(3L) === ((3L, 3L, "totally unrelated\n   \nwith blank kept")))
    // idempotence: a second pass over the cleaned corpus is a no-op
    val clean = Dedup.removeBoilerplateLines(d)
      .select($"doc_id", $"text_clean".as("text"))
    val twice = Dedup.removeBoilerplateLines(clean)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(twice(0L) === out(0L)._3 && twice(1L) === out(1L)._3)
  }

  test("keepBestPerCluster: max score wins, ties break to the lowest id") {
    import org.apache.spark.sql.functions.col
    val labeled = Seq(
      // cluster 1: clear best (doc 12, score 9)
      (1L, 10L, 5L), (1L, 11L, 7L), (1L, 12L, 9L),
      // cluster 2: tied top score — lowest doc_id (20) must win
      (2L, 21L, 4L), (2L, 20L, 4L), (2L, 22L, 1L),
      // cluster 3: singleton
      (3L, 30L, 2L)).toDF("cluster_id", "doc_id", "score_q")
    val got = Dedup.keepBestPerCluster(labeled)
      .orderBy(col("cluster_id"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 12L, 9L, 3L), (2L, 20L, 4L, 3L), (3L, 30L, 2L, 1L)))
  }
}

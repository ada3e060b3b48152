package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHash
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("normalizeText: NFC-composes, strips controls, collapses whitespace") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = TextAnalysis.normalizeText(
        Seq((1L, "  a\tbc  é\nd  ")).toDF("doc_id", "text"))
      .select(col("text")).as[String].head()
    assert(out === "a bc \u00e9 d")  // é composed, BEL gone, runs collapsed
    // lowercase variant + ASCII fast path returns identical object semantics
    val lower = TextAnalysis.normalizeText(
        Seq((1L, "A  B")).toDF("doc_id", "text"), lowercase = true)
      .select(col("text")).as[String].head()
    assert(lower === "a b")
  }
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox is on the mat", "en", "s0", 33L),
    (1L, "word", "en", "s1", 4L),
    (2L, "a b, c. d! e?", "en", "s2", 13L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("htmlExtract: strips markup, decodes entities, totality on malformed docs") {
    val pages = Seq(
      (0L, "<html><body><h1>Title</h1><p>hello <b>world</b></p></body></html>"),
      (1L, "<script>var x = 1 < 2;</script>text<style>a{b:c}</style>"),
      (2L, "a &amp;amp; b &lt;div&gt; &quot;q&quot; &#39;s&#39;&nbsp;c"),
      (3L, "<div"),                               // malformed: unclosed tag
      (4L, "<div><div><p>nested</p></div></div>"), // nested tags
      (5L, "&amp;" * 10000),                       // entity bomb
      (6L, ""),                                    // blank doc
      (7L, "<SCRIPT SRC=\"x\">evil()</SCRIPT>ok<BR/>"), // uppercase tags
      (8L, "<p\nclass=\"a\">multi\nline</p>")      // newline inside a tag
    ).toDF("doc_id", "text")
    val out = TextAnalysis.htmlExtract(pages).collect()
    def clean(i: Int) = out(i).getAs[String]("clean_text")
    assert(clean(0) === "Title hello world")
    assert(clean(1) === "text")                    // script/style content gone
    assert(clean(2) === "a &amp; b <div> \"q\" 's' c") // double-escape stays escaped once
    assert(clean(3) === "<div")                    // malformed passes through
    assert(clean(4) === "nested")
    assert(clean(5) === "&" * 10000)               // bomb decodes one level, no crash
    assert(clean(6) === "")
    assert(clean(7) === "ok")                      // case-insensitive script strip
    assert(clean(8) === "multi line")
    val r1 = out(1)
    assert(r1.getAs[Long]("n_scripts") === 1L)
    assert(r1.getAs[Long]("n_tags") === 4L)        // script+<style... counted as tags
    assert(out(6).getAs[Long]("n_clean_chars") === 0L)
  }

  test("token counts: whitespace and bpe-ish") {
    val rows = TextAnalysis.tokenCounts(docs).collect()
    assert(rows(0).getLong(1) === 8)  // doc 0: 8 ws tokens
    assert(rows(1).getLong(1) === 1)  // "word"
    assert(rows(2).getLong(1) === 5)  // "a b, c. d! e?"
    assert(rows(2).getLong(2) === 9)  // 5 letters + 4 punct
  }

  test("quality score: stopword and punct ratios") {
    val r0 = TextAnalysis.qualityScore(docs).filter($"doc_id" === 0L).head()
    // "the ... is on the" → stopwords {the, is, on, the} = 4 of 8
    assert(math.abs(r0.getAs[Double]("stopword_ratio") - 0.5) < 1e-9)
    assert(r0.getAs[Double]("punct_ratio") === 0.0)
    val r2 = TextAnalysis.qualityScore(docs).filter($"doc_id" === 2L).head()
    assert(math.abs(r2.getAs[Double]("punct_ratio") - 4.0 / 13.0) < 1e-9)
  }

  test("lang id emits a prediction with confidence for every doc") {
    val out = TextAnalysis.langId(docs).collect()
    assert(out.length === 3)
    assert(out.forall(r => Set("en", "de", "es", "fr", "zh")(r.getAs[String]("predicted_lang"))))
    assert(out.forall(r => r.getAs[Double]("confidence") >= 0.0))
  }

  test("rolling hash: deterministic, content-sensitive, prefix-stable min") {
    val h1 = RollingHash.minWindowHash("abcdefghij".getBytes, 4)
    val h2 = RollingHash.minWindowHash("abcdefghij".getBytes, 4)
    val h3 = RollingHash.minWindowHash("zzzz yyyy xxxx".getBytes, 4)
    assert(h1 === h2)
    assert(h1 !== h3) // disjoint content → different min window hash
    // winnowing property: the min window survives unrelated appends
    // whenever the new windows hash higher.
    val base = RollingHash.minWindowHash("aaaa".getBytes, 4)
    val ext = RollingHash.minWindowHash("aaaazzzz".getBytes, 4)
    assert(ext <= base)
  }

  test("rolling hash as a column expression (codegen path)") {
    val out = docs.select($"doc_id", RollingHash.rolling_hash($"text", 8).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(out(0L) === RollingHash.minWindowHash(
      "the quick brown fox is on the mat".getBytes, 8))
  }

  test("fingerprints and stats run on the real corpus") {
    val real = tables.Tables.documents(spark, sf)
    val fp = TextAnalysis.fingerprints(real)
    assert(fp.count() === real.count())
    assert(fp.select("fp_md5").distinct().count() === real.select("text").distinct().count())
    val stats = TextAnalysis.statsByLang(real)
    assert(stats.count() === 5)
  }

  test("repetition signals: dup lines, top bigram, blank-doc totality") {
    // doc 0: "x y\nx y\nz z" — line "x y" twice (3 non-empty lines,
    // 1 dup; 9 line chars, 3 dup chars); bigrams: "x y"x2 (once per
    // line — '\n' is a token break), "y x"x1, "z z"x1.
    // doc 1: blank → all-zero, must not crash (ANSI 0/0).
    // doc 2: "a b a b a b" — top bigram "a b" x3 of 5 bigrams.
    val rows = TextAnalysis.repetitionSignals(Seq(
        (0L, "x y\nx y\nz z", "en", "s", 11L),
        (1L, "", "en", "s", 0L),
        (2L, "a b a b a b", "en", "s", 11L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect()
    val r0 = rows(0)
    assert(r0.getLong(1) === 3L)                       // n_lines
    assert(math.abs(r0.getDouble(2) - 1.0 / 3) < 1e-12) // dup_line_frac
    assert(math.abs(r0.getDouble(3) - 3.0 / 9) < 1e-12) // dup_line_char_frac
    assert(r0.getString(4) === "x y")
    assert(math.abs(r0.getDouble(5) - 2 * 3.0 / 11) < 1e-12)
    val r1 = rows(1)
    assert(r1.getLong(1) === 0L && r1.getDouble(2) === 0.0 &&
      r1.getDouble(3) === 0.0 && r1.getString(4) === "" && r1.getDouble(5) === 0.0)
    val r2 = rows(2)
    assert(r2.getString(4) === "a b" && math.abs(r2.getDouble(5) - 9.0 / 11) < 1e-12)
  }

  test("repetition stats: tie on count breaks to UTF-8-smallest bigram") {
    val r = TextAnalysis.repetitionSignals(Seq(
        (0L, "b c a b", "en", "s", 7L) // bigrams "b c","c a","a b" all x1
      ).toDF("doc_id", "text", "lang", "source", "n_chars")).head()
    assert(r.getString(4) === "a b")
  }

  test("duplicate spans: corpus-wide k-token span recurrence") {
    import graft.operators.Dedup
    // k=3: doc 0 and doc 1 share span "a b c"; doc 2 repeats its own
    // span; doc 3 is too short for any span.
    val out = Dedup.duplicateSpans(Seq(
        (0L, "a b c x"), (1L, "q a b c"), (2L, "r s r s r s r s"), (3L, "t u")
      ).toDF("doc_id", "text"), k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) === ((2L, 1L, 0.5)))  // "a b c","b c x" — 1 shared
    assert(out(1L) === ((2L, 1L, 0.5)))
    // doc 2 spans: r s r, s r s, r s r, s r s, r s r, s r s — all recur
    assert(out(2L) === ((6L, 6L, 1.0)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("chunking: exact boundaries, overlap, tail chunk, blank docs dropped") {
    val docs = Seq(
      (0L, (1 to 7).map(i => s"t$i").mkString(" "), "en", "s", 0L), // 7 toks
      (1L, "only three tokens", "en", "s", 0L),
      (2L, "", "en", "s", 0L) // blank: no chunks
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.chunkDocuments(docs, chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    // doc 0: stride 2 → ceil((7-2)/2)=3 chunks: [t1..t4],[t3..t6],[t5..t7]
    assert(out((0L, 0L)) === ((4L, "t1 t2 t3 t4")))
    assert(out((0L, 1L)) === ((4L, "t3 t4 t5 t6")))
    assert(out((0L, 2L)) === ((3L, "t5 t6 t7")))
    // doc 1: 3 tokens < window → one whole-doc chunk
    assert(out((1L, 0L)) === ((3L, "only three tokens")))
    assert(out.size === 4) // doc 2 contributes nothing
  }

  test("top ngrams: known bigram frequencies, deterministic tie order") {
    val d = Seq((0L, "a b a b c"), (1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.topNgrams(d, n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    // "a b" ×3 (twice in doc 0, once in doc 1); "b a"/"b c" ×1 tie → text order
    assert(out === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("tfidf top terms: hand-computed scores, per-lang top-k, tie order") {
    // N=4 docs. "shared" appears in all 4 docs (df=4); "ena"/"enb" only
    // in en (df=1); "dea" only in de (df=1).
    val d = Seq(
      (0L, "en", "ena shared"),
      (1L, "en", "ena enb shared"),
      (2L, "de", "dea shared"),
      (3L, "de", "dea dea shared")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tfidfTopTerms(d, k = 2)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // de: dea tf=3 df=2 → 3·4/2=6; shared tf=2 df=4 → 2
    // en: ena tf=2 df=2 → 4 ties enb tf=1 df=1 → 4; tie breaks on term
    //     (shared 2·4/4=2 ranks below k)
    assert(out === Seq(
      ("de", "dea", 3L, 2L, 6.0), ("de", "shared", 2L, 4L, 2.0),
      ("en", "ena", 2L, 2L, 4.0), ("en", "enb", 1L, 1L, 4.0)))
  }

  test("token entropy: hand-checked quantization chain, uniform vs repeated, blank docs") {
    val d = Seq(
      (0L, "a b c d"),        // uniform: H = ln 4
      (1L, "a a a a"),        // degenerate: H = 0
      (2L, "a a b"),          // mixed: ln 3 − (2·ln 2)/3
      (3L, "   ")             // blank: 0 tokens, entropy 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def lnq(x: Long): Long = math.round(math.log(x.toDouble) * 1e12)
    assert(out(0L) === ((0L, 4L, lnq(4), lnq(4).toDouble / 1e12)))
    assert(out(1L) === ((1L, 4L, lnq(4) - 4L * lnq(4) / 4L,
      (lnq(4) - 4L * lnq(4) / 4L).toDouble / 1e12)))
    assert(out(1L)._3 === 0L) // 4·ln(4)/4 cancels exactly in the integer domain
    val e2 = lnq(3) - (2L * lnq(2)) / 3L
    assert(out(2L)._3 === e2)
    assert(out(3L) === ((3L, 0L, 0L, 0.0)))
    // diversity orders as expected: uniform > mixed > repeated
    assert(out(0L)._4 > out(2L)._4 && out(2L)._4 > out(1L)._4)
  }

  test("hashing tfidf: hand-checked arithmetic, blank docs, repartition-stable") {
    val d = Seq(
      (0L, "aa aa bb"),
      (1L, "aa cc"),
      (2L, "  ")  // blank doc: nnz 0, empty CSVs
    ).toDF("doc_id", "text")
    val out = TextAnalysis.hashingTfIdf(d, dim = 16)
      .as[(Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(2L) === ((2L, 0L, "", "")))
    // recompute doc 0 by hand from the same md5 bucket + quantized ln
    def bucket(term: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % 16
    }
    val dfOf = Map(bucket("aa") -> 2L, bucket("bb") -> 1L, bucket("cc") -> 1L)
    def idfQ(df: Long): Long =
      math.round(math.log(4.0 / (df + 1.0)) * 1e12) + 1000000000000L
    val exp0 = Seq(bucket("aa") -> 2 * idfQ(2), bucket("bb") -> 1 * idfQ(1))
      .sortBy(_._1)
    assert(out(0L)._2 === 2L)
    assert(out(0L)._3 === exp0.map(_._1).mkString(","))
    assert(out(0L)._4 === exp0.map(_._2).mkString(","))
    assert(dfOf.values.sum === 4L) // fixture sanity: buckets don't collide
    val out2 = TextAnalysis.hashingTfIdf(d.repartition(7), dim = 16)
      .as[(Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out2 === out)
  }

  test("token-id encoding: vocab ranks, OOV zero, blank doc empty, order kept") {
    // counts: b=4 → id 1, a=3 → id 2; c and zz fall outside top-2 → OOV
    val d = Seq((0L, "b a b c b a"), (1L, "a zz b"), (2L, "  "))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(d, 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(vocab === Seq(("b", 4L, 1L), ("a", 3L, 2L)))
    val enc = TextAnalysis.encodeTokenIds(d, TextAnalysis.buildVocab(d, 2))
      .as[(Long, String)].collect().toMap
    assert(enc === Map(0L -> "1,2,1,0,1,2", 1L -> "2,0,1", 2L -> ""))
  }

  test("pii scrub redacts emails and phone numbers, leaves clean text") {
    val d = Seq(
      (0L, "write to jane.doe+x@corp.example.org today"),
      (1L, "call +1 (555) 010-7788 now"),
      (2L, "nothing sensitive here 42")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(d).orderBy($"doc_id")
      .select("text").as[String].collect()
    assert(out(0) === "write to <EMAIL> today")
    assert(out(1) === "call <PHONE> now")
    assert(out(2) === "nothing sensitive here 42")
  }

  test("bigram LM: known counts, smoothing arithmetic, short-doc totality") {
    val d = Seq(
      (0L, "a b a b"),     // bigrams: "a b", "b a", "a b"
      (1L, "a b c"),       // "a b", "b c"
      (2L, "solo"),        // no bigrams
      (3L, "")             // no tokens at all
    ).toDF("doc_id", "text")
    val counts = TextAnalysis.lmBigramCounts(d)
      .as[(String, Long)].collect().toMap
    assert(counts === Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
    val scores = TextAnalysis.lmDocScores(d)
      .select("doc_id", "n_bigrams", "log_ppl")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(scores.map(r => r._1 -> r._2).toMap ===
      Map(0L -> 3L, 1L -> 2L, 2L -> 0L, 3L -> 0L))
    assert(scores.filter(_._2 === 0L).forall(_._3.isEmpty)) // unscored, not 0.0
    // hand-check doc 1: V=4 (a,b,c,solo); c_ctx(a)=3, c_ctx(b)=2;
    // terms: ln(2*3+4)-ln(2*3+1) and ln(2*2+4)-ln(2*1+1)
    val t1 = math.log(10) - math.log(7)
    val t2 = math.log(8) - math.log(3)
    val q = (math.round(t1 * 1e12) + math.round(t2 * 1e12)).toDouble / (1e12 * 2)
    assert(math.abs(scores(1)._3.get - q) < 1e-15)
  }

  test("trigram stupid backoff: hand-replayed tiers, penalties, totality") {
    // Train corpus: trigrams (a,b,c)=1 (b,c,a)=1 (c,a,b)=1 (a,b,d)=1,
    // ctx12(a,b)=2; bigrams ab=2 bc=1 ca=1 bd=1, ctx2(a)=2; unigrams
    // a=2 b=2 c=1 d=1, N=6. Each scored doc carries exactly ONE
    // trigram so nll_q_sum is the single term.
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val scoreDocs = Seq(
      (1L, "a b c"),  // seen trigram → tier 3: qln(2) − qln(1)
      (3L, "x a b"),  // unseen trigram, seen bigram (a,b) → tier 2: QA + qln(2) − qln(2)
      (5L, "q r s"),  // nothing seen (OOV unigram floors at 1) → tier 1: 2·QA + qln(6)
      (7L, "a b"),    // too short to score → zeros + null score
      (9L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmTrigramDocScores(train, scoreDocs)
      .select("doc_id", "n_trigrams", "n_tri_hit", "n_bg_backoff",
        "n_uni_backoff", "nll_q_sum")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val qln2 = math.round(math.log(2) * 1e12)   // 693147180560
    val qln6 = math.round(math.log(6) * 1e12)   // 1791759469228
    val qa = 916290731874L                      // round(−ln(0.4)·1e12)
    assert(out(1L) === ((1L, 1L, 0L, 0L, qln2)))
    assert(out(3L) === ((1L, 0L, 1L, 0L, qa)))
    assert(out(5L) === ((1L, 0L, 0L, 1L, 2 * qa + qln6)))
    assert(out(7L) === ((0L, 0L, 0L, 0L, 0L)))
    assert(out(9L) === ((0L, 0L, 0L, 0L, 0L)))
    val nullScores = TextAnalysis.lmTrigramDocScores(train, scoreDocs)
      .filter(col("n_trigrams") === 0).select("sb_score")
      .as[Option[Double]].collect()
    assert(nullScores.length === 2 && nullScores.forall(_.isEmpty))
  }

  test("trigram scores are partition-independent; gate is consistent") {
    val docs = tables.Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val a = TextAnalysis.lmTrigramDocScores(train.repartition(3), docs.repartition(5))
      .select("doc_id", "nll_q_sum").as[(Long, Long)].collect().toMap
    val b = TextAnalysis.lmTrigramDocScores(train.repartition(11), docs.repartition(2))
      .select("doc_id", "nll_q_sum").as[(Long, Long)].collect().toMap
    assert(a === b)
    val scored = TextAnalysis.lmTrigramDocScores(train, docs)
      .select("doc_id", "n_trigrams", "sb_score")
      .as[(Long, Long, Option[Double])].collect()
    val kept = TextAnalysis.lmTrigramFilterFrom(docs,
        TextAnalysis.lmTrigramDocScores(train, docs), 3.45)
      .select("doc_id").as[Long].collect().toSet
    val expected = scored.filter(r => r._2 > 0 && r._3.exists(_ <= 3.45))
      .map(_._1).toSet
    assert(kept === expected && kept.nonEmpty && kept.size < scored.length)
  }

  test("bigram LM scores are independent of partitioning; gate is consistent") {
    val docs = tables.Tables.documents(spark, sf)
    val a = TextAnalysis.lmDocScores(docs.repartition(3))
      .select("doc_id", "nll_q_sum").as[(Long, Long)].collect().toMap
    val b = TextAnalysis.lmDocScores(docs.repartition(17))
      .select("doc_id", "nll_q_sum").as[(Long, Long)].collect().toMap
    assert(a === b)
    val kept = TextAnalysis.lmQualityFilter(docs, 3.40)
      .select("doc_id").as[Long].collect().toSet
    val scored = TextAnalysis.lmDocScores(docs)
      .select("doc_id", "n_bigrams", "log_ppl")
      .as[(Long, Long, Option[Double])].collect()
    val expected = scored.filter(r => r._2 > 0 && r._3.exists(_ <= 3.40))
      .map(_._1).toSet
    assert(kept === expected)
  }

  test("card scrub: Luhn decides — valid rewrites, invalid survives, edges total") {
    val docs = Seq(
      // valid (spaces) + invalid (dashes) in one doc
      (1L, "pay 4242 4242 4242 4242 ref 1111-1111-1111-1111 end"),
      // same valid card twice: both occurrences rewrite, counted twice
      (2L, "a 5555555555554444 b 5555555555554444 c"),
      // card at string start and end, no padding
      (3L, "4111-1111-1111-1111 mid 378282246310005"),
      // 12 digits: below the candidate minimum, untouched
      (4L, "order 123456789012 ok"),
      // blank doc: no candidates, text unchanged
      (5L, ""),
      // Luhn-invalid only: left fully intact
      (6L, "num 1234567890123456 here")).toDF("doc_id", "text")
    val got = TextAnalysis.piiCardScrub(docs).orderBy(col("doc_id"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "pay <CARD> ref 1111-1111-1111-1111 end", 1L, 1L),
      (2L, "a <CARD> b <CARD> c", 2L, 0L),
      (3L, "<CARD> mid <CARD>", 2L, 0L),
      (4L, "order 123456789012 ok", 0L, 0L),
      (5L, "", 0L, 0L),
      (6L, "num 1234567890123456 here", 0L, 1L)))
  }

  test("pplBuckets: discrete terciles, unscored isolated, thresholds are corpus values") {
    val scores = (1 to 9).map(i => (i.toLong, 5L, Some(i.toDouble))) :+
      (10L, 0L, Option.empty[Double])
    val df = scores.toDF("doc_id", "n_bigrams", "log_ppl")
    val out = graft.operators.TextAnalysis.pplBuckets(df)
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), r.getDouble(4), r.getDouble(5))).toMap
    // quantile_disc over {1..9}: p=1/3 -> 3.0 (cume 3/9), p=2/3 -> 6.0
    (1L to 3L).foreach(i => assert(out(i)._1 === "head", s"doc $i"))
    (4L to 6L).foreach(i => assert(out(i)._1 === "middle", s"doc $i"))
    (7L to 9L).foreach(i => assert(out(i)._1 === "tail", s"doc $i"))
    assert(out(10L)._1 === "unscored")
    assert(out(1L)._2 === 3.0 && out(1L)._3 === 6.0)
  }
}

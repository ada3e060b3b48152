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

  test("top ngrams: known bigram frequencies, deterministic tie order") {
    val d = Seq((0L, "a b a b c"), (1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.topNgrams(d, n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    // "a b" ×3 (twice in doc 0, once in doc 1); "b a"/"b c" ×1 tie → text order
    assert(out === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
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
}

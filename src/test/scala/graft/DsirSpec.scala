package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Two "domains" with disjoint vocabularies: target-like docs share
  // the en vocabulary, off-domain docs don't overlap it at all.
  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (1L, "the lazy dog sleeps while the quick fox runs far away now", "en"),
    (2L, "der schnelle braune fuchs springt ueber den faulen hund heute", "de"),
    (3L, "el zorro marron salta sobre el perro perezoso cada dia", "es"),
    (4L, "the quick dog and the lazy fox play over the brown field", "en")
  ).toDF("doc_id", "text", "lang")

  test("target-domain docs outrank off-domain docs") {
    val w = Dsir.importanceWeights(docs, docs.filter($"lang" === "en"))
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    val en = Seq(0L, 1L, 4L).map(w)
    val off = Seq(2L, 3L).map(w)
    assert(en.min > off.max,
      s"every en doc should outweigh every off-domain doc: $w")
  }

  test("n_features counts unigram + bigram occurrences") {
    val row = Dsir.importanceWeights(docs, docs.filter($"lang" === "en"))
      .filter($"doc_id" === 0L).select("n_features").as[Long].head()
    // 12 tokens -> 12 unigrams + 11 bigrams
    assert(row === 23L)
  }

  test("importanceWeightsFiltered ≡ importanceWeights on a filtered target (r18)") {
    val full = Dsir.importanceWeights(docs, docs.filter($"lang" === "en"))
      .orderBy($"doc_id").collect().toSeq
    val fused = Dsir.importanceWeightsFiltered(docs, $"lang" === "en")
      .orderBy($"doc_id").collect().toSeq
    assert(fused === full)
  }

  test("select keeps the top-n by importance, deterministically") {
    val top = Dsir.select(docs, docs.filter($"lang" === "en"), 3)
      .select("doc_id").as[Long].collect().toSet
    assert(top === Set(0L, 1L, 4L))
  }

  test("gumbel resample is a deterministic draw biased toward the target") {
    val en = docs.filter($"lang" === "en")
    val draw = Dsir.gumbelResample(docs, en, 3)
      .select("doc_id").as[Long].collect().toSet
    // identical on a second invocation (md5-derived noise, no RNG state)
    assert(draw === Dsir.gumbelResample(docs, en, 3)
      .select("doc_id").as[Long].collect().toSet)
    // with weights this separated the draw still lands on the en docs
    assert((draw intersect Set(0L, 1L, 4L)).size >= 2)
  }

  test("staged weights and From-variants match the unstaged API row for row") {
    val en = docs.filter($"lang" === "en")
    val unstaged = Dsir.importanceWeights(docs, en)
      .orderBy($"doc_id").collect().toSeq
    val staged = Dsir.importanceWeightsStaged(docs, en, key = "dsirspec")
      .orderBy($"doc_id").collect().toSeq
    assert(staged === unstaged)
    // second call returns the memoized relation (same key) with the
    // same contents — the consumer-sharing contract
    val again = Dsir.importanceWeightsStaged(docs, en, key = "dsirspec")
      .orderBy($"doc_id").collect().toSeq
    assert(again === unstaged)
    val w = Dsir.importanceWeightsStaged(docs, en, key = "dsirspec")
    assert(Dsir.selectFrom(w, 3).select("doc_id").as[Long].collect().toSet ===
      Dsir.select(docs, en, 3).select("doc_id").as[Long].collect().toSet)
    assert(Dsir.gumbelResampleFrom(w, 3).select("doc_id").as[Long].collect().toSet ===
      Dsir.gumbelResample(docs, en, 3).select("doc_id").as[Long].collect().toSet)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnigramPieces
import graft.operators.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def enc(word: String, scores: Map[String, Long],
                  maxLen: Int = 8): Seq[String] = {
    val t = UnigramPieces.buildTable(scores)
    UnigramPieces.encode(UTF8String.fromString(word), t, maxLen)
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
  }

  private val toyScores = Map(
    "a" -> -1000000L, "b" -> -2000000L, "c" -> -3000000L,
    "ab" -> -2500000L, "ba" -> -2500000L, "aa" -> -1500000L)

  test("Viterbi picks the max-score path (DuckDB prototype parity)") {
    assert(enc("aaaa", toyScores) === Seq("aa", "aa"))
    assert(enc("abab", toyScores) === Seq("ab", "ab"))
    assert(enc("abc", toyScores) === Seq("ab", "c"))
  }

  test("ties break to fewest pieces, then largest piece; UNK chars never stall") {
    // 'xy' scores exactly x+y: equal score → 2-piece 'xy' beats x|y
    val s = Map("x" -> -1000000L, "y" -> -1000000L, "xy" -> -2000000L)
    assert(enc("xy", s) === Seq("xy"))
    // char absent from the model: UNK penalty, still total, roundtrips
    assert(enc("qzq", Map("q" -> -1000000L)) === Seq("q", "z", "q"))
  }

  test("concatenated pieces always reproduce the word") {
    for (w <- Seq("", "a", "abcabc", "zzz", "aababab"))
      assert(enc(w, toyScores).mkString === w)
  }

  private val docs = Seq(
    (0L, "spark spark shuffle", "en"),
    (1L, "shuffle spark plans", "en"),
    (2L, "plans plans spark", "en")
  ).toDF("doc_id", "text", "lang")

  test("trained vocab: chars always survive; multi-char pieces are used, ranked, capped") {
    val v = Unigram.vocab(docs, "spec1", numPieces = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val chars = v.filter(_._1 == "char")
    val multi = v.filter(_._1 == "piece")
    assert(chars.map(_._3).toSet ===
      "sparkhuflen".toSet.map((c: Char) => c.toString))
    assert(multi.length <= 3 && multi.forall(_._5 > 0))
    // rank order = usage desc, piece asc
    assert(multi.sortBy(_._2).map(_._5).toSeq ===
      multi.map(_._5).toSeq.sorted.reverse)
  }

  test("encodeStats: totals conserve words, signature stable across calls") {
    val a = Unigram.encodeStats(docs, "spec1", numPieces = 3).collect()
    val b = Unigram.encodeStats(docs, "spec1", numPieces = 3).collect()
    assert(a.toSeq === b.toSeq)
    val byId = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId === Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
    a.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // pieces >= words
      assert(r.getLong(4) < 0L)            // log-prob sum is negative
    }
  }
}

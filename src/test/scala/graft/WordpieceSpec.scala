package graft

import org.apache.spark.sql.functions._

import graft.functions.WordpiecePieces
import graft.operators.Wordpiece

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def pieces(word: String, vocab: Seq[String], maxLen: Int = 8): Seq[String] =
    Seq(word).toDF("w")
      .select(WordpiecePieces.wordpiece_pieces($"w", vocab, maxLen).as("p"))
      .as[Seq[String]].collect().head

  test("greedy longest-match: hand cases, fallback, totality") {
    val v = Seq("ab", "abc", "bcd", "x")
    assert(pieces("abcd", v) === Seq("abc", "d"))      // longest wins at 0
    assert(pieces("xabcde", v) === Seq("x", "abc", "d", "e"))
    assert(pieces("zzz", v) === Seq("z", "z", "z"))    // nothing matches: chars
    assert(pieces("ab", v) === Seq("ab"))
    assert(pieces("", v) === Seq.empty)
    // maxLen caps the probe: "abcd" with maxLen 2 can only see "ab"
    assert(pieces("abcd", Seq("abcd", "ab"), maxLen = 2) === Seq("ab", "c", "d"))
    // concatenation always reproduces the word (totality invariant)
    for (w <- Seq("abcdefghij", "aXbXc", "ab"))
      assert(pieces(w, v).mkString === w)
  }

  test("seedVocab: hand-checked freqs, forced chars, rank order") {
    val docs = Seq((0L, "ab ab b")).toDF("doc_id", "text")
    val rows = Wordpiece.seedVocab(docs, numPieces = 10, minFreq = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // chars a (freq 2), b (freq 2 from 'ab' + 1 alone = 3)
    assert(rows.filter(_._1 == "char").map(r => (r._3, r._5)).toSeq ===
      Seq(("a", 2L), ("b", 3L)))
    // one multi piece: "ab" freq 2, score 4
    assert(rows.filter(_._1 == "piece").map(r => (r._3, r._5, r._6)).toSeq ===
      Seq(("ab", 2L, 4L)))
  }

  test("encodeStats: counts, fertility, signature stable under repartition") {
    val docs = Seq(
      (0L, "window window stream"),
      (1L, "win"),
      (2L, "")
    ).toDF("doc_id", "text")
    val v = Seq("win", "dow", "st") // window -> win|dow, stream -> st|r|e|a|m
    val out = Wordpiece.encodeStats(docs, v).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3), r.getLong(4))).toMap
    assert(out(0L)._1 === 3L && out(0L)._2 === 9L) // 2+2+5 pieces
    assert(out(0L)._3 === 3.0)
    assert(out(1L) === ((1L, 1L, 1.0, out(1L)._4)))
    assert(out(2L)._1 === 0L && out(2L)._2 === 0L && out(2L)._3 == null)
    // determinism: different partitioning, same signature
    val re = Wordpiece.encodeStats(docs.repartition(7), v).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(re === out.map { case (k, v2) => k -> v2._4 })
    // empty vocab: every word falls back to chars, still total
    val chars = Wordpiece.encodeStats(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chars(0L) === ("windowwindowstream".length.toLong))
  }

  test("pieceUsage: freq-weighted greedy counts, mass conservation") {
    val docs = Seq(
      (0L, "window window"),
      (1L, "window win")
    ).toDF("doc_id", "text")
    val v = Seq("win", "dow")
    val rows = Wordpiece.pieceUsage(docs, v).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "window" x3 -> win|dow each 3 uses; "win" x1 -> win once more
    assert(rows("win") === ((3L, 4L, 2L)))  // len 3, 4 uses, 2 distinct words
    assert(rows("dow") === ((3L, 3L, 1L)))
    // piece-use mass == total pieces emitted over all word occurrences
    val totalUses = rows.values.map(_._2).sum
    val enc = Wordpiece.encodeStats(docs, v).collect().map(_.getLong(2)).sum
    assert(totalUses === enc)
  }

  test("vocab is code-point sliced like SQL substr (multibyte safe)") {
    // 'é' is 2 UTF-8 bytes / 1 code point: a 2-piece vocab entry must
    // match by code points, as DuckDB substr does
    assert(pieces("éab", Seq("éa")) === Seq("éa", "b"))
    assert(pieces("éé", Seq.empty) === Seq("é", "é"))
  }
}

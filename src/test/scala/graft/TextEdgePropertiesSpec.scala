package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, TextAnalysis}

/** Edge-document totality properties for the text operators: the
  * driver fixtures carry no blank/1-char/huge-token docs (min length
  * 44), so parity there never exercises these paths — this suite pins
  * the contracts directly. Generated docs use only the whitespace the
  * native tokenizers recognize (space/tab/nl/cr), matching
  * `WordShingleHashes.isSpace` and `trim`.
  *
  * Pinned contracts:
  *  - every operator is total (no throw, one output row per input doc
  *    unless the operator's contract drops it);
  *  - blank docs (no tokens) are EXCLUDED from simhash (documented in
  *    [[Dedup.simhash]]) and produce empty shingle sets;
  *  - blank docs score 0 tokens / empty fingerprints, never null;
  *  - langId on a zero-signal doc predicts the tie-break language
  *    ("zh", the largest lang string under array_max) with
  *    confidence 0.0;
  *  - sketch outputs are deterministic across runs.
  */
class TextEdgePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    0L -> "",
    1L -> " ",
    2L -> " \t\n\r ",
    3L -> "a",
    4L -> ".",
    5L -> ("a" * 5000),                // one huge token
    6L -> (("tok " * 2000).trim),      // many identical tokens
    7L -> "\n\n\n",
    8L -> "alpha beta gamma delta",
    9L -> "alpha beta gamma delta")    // identical twin of 8

  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 120)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('\t', '\n', '\r'),
      1 -> Gen.oneOf('.', ',', '@', '0', '9')))
  } yield cs.mkString

  private val generated: Seq[(Long, String)] =
    (0 until 40).map(i =>
      (100L + i, docGen.apply(Gen.Parameters.default, Seed(i.toLong)).get))

  private lazy val docs = (edge ++ generated)
    .toDF("doc_id", "text")
    .withColumn("lang", lit("en"))
    .withColumn("n_chars", length(col("text")).cast("long"))

  private lazy val nDocs = edge.size + generated.size
  private lazy val blankIds =
    (edge ++ generated).filter(_._2.trim.isEmpty).map(_._1).toSet

  test("qualityScore is total: one row per doc, zero tokens on blanks, no nulls") {
    val rows = TextAnalysis.qualityScore(docs).collect()
    assert(rows.length === nDocs)
    assert(rows.forall(r => !r.anyNull))
    rows.filter(r => blankIds(r.getAs[Long]("doc_id")))
      .foreach(r => assert(r.getAs[Long]("n_tokens") === 0L))
  }

  test("tokenCounts is total and zero on blanks") {
    val rows = TextAnalysis.tokenCounts(docs).collect()
    assert(rows.length === nDocs)
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))).toMap
    blankIds.foreach(id => assert(byId(id) === ((0L, 0L)), s"doc $id"))
    assert(byId(3L) === ((1L, 1L)))
    assert(byId(5L) === ((1L, 1L)))     // one 5000-char letter run
    assert(byId(6L)._1 === 2000L)
  }

  test("repetitionSignals is total on edge docs: blanks all-zero, no nulls") {
    val rows = TextAnalysis.repetitionSignals(docs).collect()
    assert(rows.length === nDocs)
    assert(rows.forall(r => !r.anyNull))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // Line contract: split on '\n', keep lines <> '' — a whitespace-
    // only line IS a line (both engine and oracle agree); blank docs
    // still have no tokens, hence no top bigram.
    val texts = (edge ++ generated).toMap
    rows.foreach { r =>
      val expected = texts(r.getAs[Long]("doc_id"))
        .split("\n", -1).count(_.nonEmpty).toLong
      assert(r.getAs[Long]("n_lines") === expected, s"doc ${r.get(0)}")
    }
    blankIds.foreach(id => assert(byId(id).getAs[String]("top_bigram") === "", s"doc $id"))
    // doc 6 ("tok " x2000): top bigram "tok tok" x1999 of 1999 bigrams
    assert(byId(6L).getAs[String]("top_bigram") === "tok tok")
    // doc 7 ("\n\n\n"): lines exist but are empty → excluded → 0 lines
    assert(byId(7L).getAs[Long]("n_lines") === 0L)
  }

  test("duplicateSpans is total on edge docs; identical twins fully overlap") {
    val rows = Dedup.duplicateSpans(docs, k = 3).collect()
    assert(rows.length === nDocs)
    assert(rows.forall(r => !r.anyNull))
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_spans"), r.getAs[Double]("dup_span_frac"))).toMap
    blankIds.foreach(id => assert(byId(id) === ((0L, 0.0)), s"doc $id"))
    assert(byId(8L) === ((2L, 1.0)))   // twin of 9: every span recurs
    assert(byId(9L) === ((2L, 1.0)))
  }

  test("chunkDocuments is total on edge docs: blanks dropped, tokens conserved") {
    val rows = TextAnalysis.chunkDocuments(docs, chunkTokens = 8, overlap = 2)
      .collect()
    assert(rows.forall(r => !r.anyNull))
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    blankIds.foreach(id => assert(!byDoc.contains(id), s"doc $id chunked"))
    // stride-6 windows of width 8: chunk n_tokens sums to
    // n + overlap * (chunks - 1) — token conservation incl. overlap
    val texts = (edge ++ generated).toMap
    byDoc.foreach { case (id, chunks) =>
      val n = texts(id).split("\\s+").count(_.nonEmpty).toLong
      val total = chunks.map(_.getAs[Long]("n_tokens")).sum
      assert(total === n + 2L * (chunks.length - 1), s"doc $id")
    }
  }

  test("contaminationScore is total on edge docs; blanks score 0") {
    val bench = docs.filter(col("doc_id") === 8L) // "alpha beta gamma delta"
    val rows = TextAnalysis.contaminationScore(docs, bench, k = 4).collect()
    assert(rows.length === nDocs)
    assert(rows.forall(r => !r.anyNull))
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("contamination_frac")).toMap
    blankIds.foreach(id => assert(byId(id) === 0.0, s"doc $id"))
    assert(byId(8L) === 1.0 && byId(9L) === 1.0) // twin of the benchmark doc
  }

  test("fingerprints are total, deterministic, and empty-set on blanks") {
    val a = TextAnalysis.fingerprints(docs).collect()
    val b = TextAnalysis.fingerprints(docs).collect()
    assert(a.length === nDocs)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.forall(r => !r.anyNull))
    a.filter(r => blankIds(r.getAs[Long]("doc_id")))
      .foreach(r => assert(r.getAs[String]("fp_bottomk") === "")) // no shingles
    // rolling hash is a BYTE fingerprint: exactly-empty input pins 0,
    // whitespace-only docs hash their (real) whitespace bytes
    val empty = a.find(_.getAs[Long]("doc_id") === 0L).get
    assert(empty.getAs[Long]("fp_rolling") === 0L)
  }

  test("simhash drops exactly the blank docs, deterministically") {
    val out1 = Dedup.simhash(docs).collect()
    val out2 = Dedup.simhash(docs).collect()
    assert(out1.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      out2.map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(out1.map(_.getLong(0)).toSet ===
      (edge ++ generated).map(_._1).toSet -- blankIds)
  }

  test("minhashPairs is total on edge docs; identical docs pair at jaccard 1") {
    val pairs = Dedup.minhashPairs(docs).collect()
    assert(pairs.forall(r => r.getAs[Long]("doc_id_a") < r.getAs[Long]("doc_id_b")))
    assert(pairs.forall(r => r.getAs[Double]("jaccard") >= 0.5))
    val twin = pairs.find(r =>
      r.getAs[Long]("doc_id_a") === 8L && r.getAs[Long]("doc_id_b") === 9L)
    assert(twin.isDefined && twin.get.getAs[Double]("jaccard") === 1.0)
  }

  test("simhashPairs is total on edge docs; identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(docs).collect()
    assert(pairs.forall(r => r.getAs[Long]("doc_id_a") < r.getAs[Long]("doc_id_b")))
    val twin = pairs.find(r =>
      r.getAs[Long]("doc_id_a") === 8L && r.getAs[Long]("doc_id_b") === 9L)
    assert(twin.isDefined && twin.get.getAs[Long]("hamming") === 0L)
  }

  test("ngramJaccardPairs is total on edge docs (blanks never pair)") {
    val pairs = Dedup.ngramJaccardPairs(docs).collect()
    assert(pairs.forall(r => r.getAs[Double]("jaccard") >= 0.5))
    val ids = pairs.flatMap(r => Seq(r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b")))
    assert(ids.toSet.intersect(blankIds) === Set.empty)
  }

  test("supplementary-plane text: code-point counting end to end, no crashes") {
    // U+1F600 is a surrogate PAIR in the JVM's UTF-16 — a code-unit
    // (String.length-based) counter would double-count every emoji.
    // Both the engine kernels and DuckDB len() count CODE POINTS.
    val e = "😀" // 😀
    val text = s"$e$e $e$e\n$e$e $e$e"
    val docs2 = Seq((0L, text, "xx", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = TextAnalysis.repetitionSignals(docs2).head()
    assert(rep.getLong(1) === 2L)                       // two identical lines
    assert(math.abs(rep.getDouble(2) - 0.5) < 1e-12)    // dup_line_frac
    assert(math.abs(rep.getDouble(3) - 0.5) < 1e-12)    // 5 of 10 cp dup
    assert(rep.getString(4) === s"$e$e $e$e")           // top bigram
    // 4 tokens → 3 (overlapping) occurrences of the one bigram; cp len
    // 5 — the frac legitimately exceeds 1 on degenerate repetition
    assert(math.abs(rep.getDouble(5) - 3 * 5.0 / 11) < 1e-12)
    val chunks = TextAnalysis.chunkDocuments(docs2, chunkTokens = 3, overlap = 1)
      .collect()
    assert(chunks.length === 2 &&
      chunks(0).getString(3) === s"$e$e $e$e $e$e")     // 4 ws-tokens → 2 chunks
    val tok = TextAnalysis.tokenCounts(docs2).head()
    assert(tok.getLong(1) === 4L)                       // ws tokens
  }

  test("langId on zero-signal docs predicts the tie-break lang with confidence 0") {
    val rows = TextAnalysis.langId(docs).collect()
    assert(rows.length === nDocs)
    rows.filter(r => blankIds(r.getAs[Long]("doc_id"))).foreach { r =>
      assert(r.getAs[String]("predicted_lang") === "zh")
      assert(r.getAs[Double]("confidence") === 0.0)
    }
  }

  test("containmentPairs is total on edge docs; identical twins contain both ways") {
    val out = graft.operators.Dedup.containmentPairs(docs, threshold = 0.99)
      .collect()
    out.foreach { r =>
      assert(!r.anyNull)
      val c = r.getAs[Double]("containment")
      assert(c >= 0.99 && c <= 1.0 && !c.isNaN)
    }
    // the identical twins (8, 9) contain each other exactly
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((8L, 9L)) && pairs.contains((9L, 8L)))
    // blank docs (empty shingle sets) never pair — the na>0 guard
    out.foreach { r =>
      assert(!blankIds(r.getLong(0)) && !blankIds(r.getLong(1)))
    }
  }

  test("vocab + token-id encode are total on edge docs; id conservation holds") {
    val vocab = TextAnalysis.buildVocab(docs, 50)
    val v = vocab.collect()
    assert(v.length <= 50)
    assert(v.forall(r => r.getAs[String]("term").nonEmpty)) // no empty terms
    val enc = TextAnalysis.encodeTokenIds(docs, vocab).collect()
    assert(enc.length === nDocs)                            // every doc present
    enc.foreach { r =>
      val ids = r.getAs[String]("token_ids")
      assert(ids != null)
      if (blankIds(r.getAs[Long]("doc_id"))) assert(ids === "")
    }
    // conservation: encoded length == whitespace token count, per doc
    val tokCounts = TextAnalysis.tokenCounts(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ws_tokens")).toMap
    enc.foreach { r =>
      val n = r.getAs[String]("token_ids") match {
        case "" => 0L
        case s => s.count(_ == ',').toLong + 1L
      }
      assert(n === tokCounts(r.getAs[Long]("doc_id")))
    }
  }

  test("tfidf is total on edge docs: no nulls, every score positive and finite") {
    val rows = TextAnalysis.tfidfTopTerms(docs, k = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.anyNull)
      val s = r.getAs[Double]("tfidf")
      assert(s > 0.0 && !s.isNaN && !s.isInfinite)
      assert(r.getAs[Long]("tf") >= 1L && r.getAs[Long]("df") >= 1L)
    }
  }
}

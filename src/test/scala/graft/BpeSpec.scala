package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("classic fixture: merges follow frequency with deterministic ties") {
    // 'lo' appears in low(x5), lower(x2), lowest(x1) → pair (l,o) freq 8
    // beats everything; then (lo,w) freq 8; then 'er' in lower+newer...
    val docs = docsOf(
      "low low low low low",
      "lower lower newer newer newer",
      "lowest wider")
    val merges = Bpe.bpeTrain(docs, 4)
      .orderBy($"merge_rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // pair counts round 1: (l,o)=8 [5 low + 2 lower + 1 lowest],
    // (o,w)=8, (w,e)=4 [2 lower,1 lowest? lowest=l o w e s t yes, +newer? n e w e r: (w,e)=1 ×3 = 3 → total 2+1+3=6],
    // (e,r)=5 [2 lower + 3 newer], (n,e)=3, (e,w)=3, (e,s)=1,(s,t)=1,
    // (w,i)=1,(i,d)=1,(d,e)=1
    // → best = (l,o) 8, tie with (o,w) 8 → (l,o) wins on left asc.
    assert(merges(0)._2 === "l" && merges(0)._3 === "o" && merges(0)._5 === 8L)
    // round 2: (lo,w)=8 best
    assert(merges(1)._2 === "lo" && merges(1)._3 === "w" && merges(1)._5 === 8L)
    // round 3: (e,r)=6 best [2 lower + 3 newer + 1 wider]
    assert(merges(2)._2 === "e" && merges(2)._3 === "r" && merges(2)._5 === 6L)
  }

  test("abutting occurrences merge in one round (double-delimiter replace)") {
    val docs = docsOf("abab abab abab")
    val merges = Bpe.bpeTrain(docs, 2)
      .orderBy($"merge_rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // round 1: (a,b)=6, (b,a)=3 → (a,b) merges BOTH occurrences per word
    assert(merges(0)._2 === "a" && merges(0)._3 === "b" && merges(0)._5 === 6L)
    // round 2: state is [ab, ab] ×3 words→1 distinct (freq 3): (ab,ab)=3
    assert(merges(1)._2 === "ab" && merges(1)._3 === "ab" && merges(1)._5 === 3L)
  }

  test("overlapping same-symbol runs merge leftmost non-overlapping") {
    val docs = docsOf("aaa aaa")
    val merges = Bpe.bpeTrain(docs, 1)
      .orderBy($"merge_rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // (a,a) count: per word [a,a,a] has 2 adjacent pairs ×2 words = 4
    assert(merges(0)._2 === "a" && merges(0)._3 === "a" && merges(0)._5 === 4L)
    // after merge: [aa, a] — verify via encode vocabulary
    val syms = Bpe.wordSymbols(docs, Seq(("a", "a")))
      .as[(String, Seq[String])].collect().toMap
    assert(syms("aaa") === Seq("aa", "a"))
  }

  test("encode: ids dense by symbol order, doc reassembled in order") {
    val docs = docsOf("low lower", "low")
    val merges = Seq(("l", "o"), ("lo", "w"))
    // word symbols: low → [low]; lower → [low, e, r]
    // vocab sorted: e→1, low→2, r→3
    val enc = Bpe.bpeEncode(docs, merges)
      .as[(Long, String)].collect().toMap
    assert(enc(0L) === "2,2,1,3")
    assert(enc(1L) === "2")
  }

  test("early stop: no pair reaches minFreq on all-distinct chars") {
    val docs = docsOf("ab cd")
    val merges = Bpe.bpeTrain(docs, 5, minFreq = 2L).collect()
    assert(merges.isEmpty)
  }

  test("edge docs are total: blank text, 1-char words, whitespace runs") {
    val docs = docsOf("", "a b a b a", "  \t\n  ", "x")
    val merges = Bpe.bpeTrain(docs, 4)
      .orderBy($"merge_rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // only 1-char words exist → no intra-word pairs → no merges at all
    assert(merges.isEmpty)
    val enc = Bpe.bpeEncode(docs, Seq.empty).as[(Long, String)].collect().toMap
    assert(enc(0L) === "" && enc(2L) === "")       // blank docs → empty
    assert(enc(3L).nonEmpty)                        // 1-char doc encodes
    // vocab: distinct syms = {a, b, x} sorted → a=1, b=2, x=3
    assert(enc(1L) === "1,2,1,2,1")
  }

  test("grouped training: each group matches its own solo trainer run") {
    val docs = Seq(
      (0L, "en", "low low low lower lowest"),
      (1L, "en", "low lower newer"),
      (2L, "de", "baum baum baume"),
      (3L, "zz", "q w e r t y")  // all 1-char words: exhausts at once
    ).toDF("doc_id", "lang", "text")
    val grouped = Bpe.bpeTrainGrouped(docs, "lang", 5)
      .as[(String, Long, String, String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t =>
        (t._2, t._3, t._4, t._5, t._6)).sortBy(_._1).toSeq).toMap
    for (lang <- Seq("en", "de")) {
      val solo = Bpe.bpeTrain(docs.filter($"lang" === lang), 5)
        .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
      assert(grouped(lang) === solo, lang)
    }
    assert(!grouped.contains("zz")) // no intra-word pairs → no merges
  }

  test("fertility: counts add up per language, ratios are the count quotients") {
    val docs = Seq(
      (0L, "low low lower", "en"),
      (1L, "newer newer", "en"),
      (2L, "ab ab ab", "de"),
      (3L, "", "fr") // words-free language: ratios must be 0, not NaN/error
    ).toDF("doc_id", "text", "lang")
    val merges = Bpe.bpeTrain(docs, 3).orderBy($"merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val wsyms = Bpe.wordSymbols(docs, merges)
      .as[(String, Seq[String])].collect().toMap
    val out = Bpe.fertilityByLang(docs, merges)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set("en", "de", "fr"))
    // hand-recomputed per-lang totals from the word symbol table
    val words = Map("en" -> Seq("low", "low", "lower", "newer", "newer"),
      "de" -> Seq("ab", "ab", "ab"), "fr" -> Seq.empty[String])
    words.foreach { case (lang, ws) =>
      val (_, nDocs, nWords, nBpe, nChars, tpw, cpt) = out(lang)
      assert(nWords === ws.length.toLong)
      assert(nBpe === ws.map(w => wsyms(w).length.toLong).sum)
      assert(nChars === ws.map(_.length.toLong).sum)
      if (ws.isEmpty) { assert(tpw === 0.0 && cpt === 0.0 && nDocs === 1L) }
      else {
        assert(tpw === nBpe.toDouble / nWords)
        assert(cpt === nChars.toDouble / nBpe)
      }
    }
    // merged languages compress: 'ab' merged once → 1 symbol per word
    assert(out("de")._4 === 3L && out("de")._7 === 2.0)
  }

  test("training is stable under repartitioning") {
    val docs = docsOf(
      "the cat sat on the mat", "the bat and the rat", "cats bats rats")
    val a = Bpe.bpeTrain(docs, 8).collect().toSeq
    val b = Bpe.bpeTrain(docs.repartition(7), 8).collect().toSeq
    assert(a === b)
  }

  test("persisted model: reloaded merges reproduce in-flight encode exactly") {
    val docs = docsOf(
      "the cat sat on the mat", "the bat and the rat", "cats bats rats")
    val dir = java.nio.file.Files.createTempDirectory("bpemodel_spec_").toString
    graft.tables.BpeModel.write(docs, dir, numMerges = 8)
    val trained = Bpe.bpeTrain(docs, 8).collect().toSeq
      .map(r => (r.getString(1), r.getString(2)))
    // the artifact survives the parquet round trip in rank order …
    assert(graft.tables.BpeModel.merges(spark, dir) === trained)
    // … and encoding from it is bit-identical to the in-flight path
    val fromModel = graft.tables.BpeModel.encode(spark, dir, docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val inFlight = Bpe.bpeEncode(docs, trained)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(fromModel === inFlight)
  }

  test("staged word symbols: same rows as unstaged, shared across consumers") {
    val docs = docsOf(
      "the cat sat on the mat", "the bat and the rat", "cats bats rats")
    val merges = Bpe.bpeTrain(docs, 6).collect().toSeq
      .map(r => (r.getString(1), r.getString(2)))
    val unstaged = Bpe.wordSymbols(docs, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val staged = Bpe.wordSymbolsStaged(docs, "bpespec", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(staged === unstaged)
    // second consumer with the same (key, inputs, merges) gets the SAME
    // staged relation (the artifact contract encode/fertility/pack rely
    // on); a different merge list must NOT share it
    assert(Bpe.wordSymbolsStaged(docs, "bpespec", merges) eq
      Bpe.wordSymbolsStaged(docs, "bpespec", merges))
    assert(!(Bpe.wordSymbolsStaged(docs, "bpespec", merges.take(1)) eq
      Bpe.wordSymbolsStaged(docs, "bpespec", merges)))
  }
}

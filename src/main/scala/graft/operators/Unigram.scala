package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.functions.UnigramPieces
import graft.functions.UnigramPieces.unigram_pieces

/** Unigram-LM (SentencePiece) subword tokenizer — Kudo 2018 "Subword
  * Regularization": the third production tokenizer family after
  * [[Bpe]] (learned merges) and [[Wordpiece]] (piece inventory +
  * greedy MaxMatch). Training is hard-EM (Viterbi-EM): seed with all
  * frequent substrings, E-step = Viterbi-segment every distinct word
  * under current piece scores, M-step = re-estimate scores from
  * freq-weighted piece usage, prune to the vocab budget. One EM round
  * ships (the round that does the real pruning work — Kudo's
  * production setup runs 2; each additional round is the same
  * Spark job and the same oracle CTE pair repeated), with add-1
  * smoothing on the re-estimated counts so every ln argument stays an
  * exact positive integer (the `round(ln·1e12)` quantized-long
  * discipline end to end — scores are integers everywhere, and the
  * DuckDB oracle replays seed, Viterbi DP, backtrace, re-estimate,
  * prune, and re-encode bit-for-bit).
  *
  * Scale shape (the [[Bpe]]/[[Wordpiece]] argument): the corpus is
  * scanned once into the vocabulary-sized (word, freq) relation;
  * seeding, the E-step, and encoding all run over DISTINCT words with
  * the model as a codegen reference object; the driver holds only
  * vocabulary-substring-sized state (the memoized-collect contract —
  * minFreq ≥ 2 prunes hapax substrings before anything is collected).
  * Encoding joins the skinny per-word stats back to occurrences.
  */
object Unigram {

  private def qln(x: Long): Long = {
    require(x > 0, s"qln argument must be positive, got $x")
    Math.round(Math.log(x.toDouble) * 1e12)
  }

  /** Seed candidates: every 1..`maxPieceLen`-code-point substring of
    * every word, occurrence-weighted by word frequency (the
    * [[Wordpiece.seedVocab]] counting semantics); single chars always
    * kept (they make inference total), multi-char pieces at
    * freq ≥ `minFreq`. Output (piece, piece_len, freq).
    */
  def seedCounts(docs: DataFrame, maxPieceLen: Int = 8,
                 minFreq: Long = 2L): DataFrame = {
    val wordFreq = docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c_w"))
    wordFreq.select(col("c_w"), explode(expr(
        s"""flatten(transform(sequence(1, char_length(word)),
              p -> transform(sequence(1, least($maxPieceLen, char_length(word) - p + 1)),
                             l -> substr(word, p, l))))""")).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("c_w")).as("freq"))
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("freq"))
      .filter(col("piece_len") === 1L || col("freq") >= minFreq)
  }

  /** One trained model: the pruned vocab rows
    * (kind, rnk, piece, piece_len, freq) and the inference score map.
    * Memoized per (process, key, params) — the
    * [[Wordpiece.vocabPieces]] discipline.
    */
  private val models = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[(String, Long, String, Long, Long)], Map[String, Long])]

  def trainedModel(docs: DataFrame, key: String, numPieces: Int = 12,
                   maxPieceLen: Int = 8, minFreq: Long = 2L)
      : (Seq[(String, Long, String, Long, Long)], Map[String, Long]) =
    models.getOrElseUpdate(s"$key#$numPieces#$maxPieceLen#$minFreq", {
      // Seed scores: sc0(p) = qln(freq) − qln(Σ freq) — every ln
      // argument an exact integer.
      val seed = seedCounts(docs, maxPieceLen, minFreq)
        .select(col("piece"), col("piece_len"), col("freq"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val total0 = seed.map(_._3).sum
      val sc0 = seed.map { case (p, _, f) => p -> (qln(f) - qln(total0)) }.toMap
      // E-step: Viterbi-segment each distinct word under sc0, weight
      // piece uses by word frequency.
      val wordFreq = docs
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("c_w"))
      val counts1 = wordFreq
        .select(col("c_w"),
          explode(unigram_pieces(col("word"), sc0, maxPieceLen)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("c_w")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step + prune: chars always survive (with their observed
      // usage, possibly 0 — greedy-shadowed); multi-char pieces keep
      // the top numPieces actually USED, ranked (usage desc, piece).
      val chars = seed.filter(_._2 == 1L).map(_._1).sorted.zipWithIndex
        .map { case (p, i) =>
          ("char", (i + 1).toLong, p, 1L, counts1.getOrElse(p, 0L)) }
      val multi = counts1.toSeq
        .filter { case (p, c) => p.codePointCount(0, p.length) >= 2 && c > 0 }
        .sortBy { case (p, c) => (-c, p) }.take(numPieces).zipWithIndex
        .map { case ((p, c), i) =>
          ("piece", (i + 1).toLong, p, p.codePointCount(0, p.length).toLong, c) }
      val vocab = chars ++ multi
      // Inference scores with add-1 smoothing: counts can be 0 for
      // shadowed chars, so sc1(p) = qln(freq+1) − qln(total+|V|)
      // keeps every ln argument a positive exact integer.
      val total1 = vocab.map(_._5).sum + vocab.length
      val sc1 = vocab.map { case (_, _, p, _, f) =>
        p -> (qln(f + 1L) - qln(total1)) }.toMap
      (vocab, sc1)
    })

  /** The pruned vocabulary as a relation — (kind, rnk, piece,
    * piece_len, freq), freq = hard-EM round-1 usage.
    */
  def vocab(docs: DataFrame, key: String, numPieces: Int = 12,
            maxPieceLen: Int = 8, minFreq: Long = 2L): DataFrame = {
    val (rows, _) = trainedModel(docs, key, numPieces, maxPieceLen, minFreq)
    docs.sparkSession.createDataFrame(rows)
      .toDF("kind", "rnk", "piece", "piece_len", "freq")
      .orderBy(col("kind"), col("rnk"))
  }

  /** Per-doc Viterbi-encode statistics under the trained model: word
    * and piece counts, fertility, the exact path score
    * (Σ score_q over piece uses — the Viterbi objective the DP
    * maximized, integer), and the position-weighted md5 signature
    * (Σ md5Bucket(piece)·end_boundary — any piece OR boundary drift
    * moves it). Distinct words encode once; occurrences hash-join the
    * skinny stats back (the [[Wordpiece.encodeStats]] shape).
    */
  def encodeStats(docs: DataFrame, key: String, numPieces: Int = 12,
                  maxPieceLen: Int = 8, minFreq: Long = 2L): DataFrame = {
    val (vocabRows, sc1) =
      trainedModel(docs, key, numPieces, maxPieceLen, minFreq)
    val scDf = docs.sparkSession
      .createDataFrame(sc1.toSeq.sorted).toDF("piece", "sc")
    val words = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    val pieces = words.select(col("word")).distinct()
      .select(col("word"),
        posexplode(unigram_pieces(col("word"), sc1, maxPieceLen))
          .as(Seq("ppos", "piece")))
      .withColumn("endpos",
        sum(length(col("piece")).cast("long"))
          .over(Window.partitionBy(col("word")).orderBy(col("ppos"))))
    val enc = pieces
      .join(broadcast(scDf), Seq("piece"), "left")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_pieces"),
        sum(coalesce(col("sc"), lit(UnigramPieces.UnkScore))).as("score_q"),
        sum(Sampling.hashBucket(col("piece"), 8192) * col("endpos"))
          .as("word_sig"))
    val perDoc = words.join(enc, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"),
        sum(col("score_q")).as("score_q_sum"), sum(col("word_sig")).as("sig"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        when(col("n_words") > 0,
          col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        coalesce(col("score_q_sum"), lit(0L)).as("score_q_sum"),
        coalesce(col("sig"), lit(0L)).as("sig"))
      .orderBy(col("doc_id"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.functions.WordpiecePieces.wordpiece_pieces

/** WordPiece-style subword tokenizer: a SentencePiece SEED vocabulary
  * (Kudo 2018 §3.2 seeds from frequent substrings scored by
  * freq·length before EM pruning — we ship the seed stage, the part
  * that is one aggregation, and document the EM rounds as out of
  * scope) plus greedy longest-match-first inference (Devlin et al.
  * 2019 BERT; Song et al. 2021 "Fast WordPiece Tokenization").
  * Complements [[Bpe]]: BPE learns MERGES iteratively; this learns a
  * PIECE INVENTORY in one pass — the cheap-to-train tokenizer a
  * corpus-survey stage wants before committing to a full train.
  *
  * Scale design, same argument as [[Bpe]]: the corpus is scanned ONCE
  * into the (word, freq) relation — vocabulary-sized, the thing that
  * stays small while the corpus grows — and everything downstream
  * (substring candidates, scores, ranking, even encoding) runs over
  * that relation, joined back to the corpus only for the per-doc
  * roll-up. Encoding computes each DISTINCT word's segmentation once
  * and hash-joins it to occurrences; the corpus text crosses no
  * extra exchange.
  *
  * Precondition (shared with [[Bpe]]): ASCII-ish text — `substring`
  * slicing and the expression's code-point walk agree on anything
  * without astral-plane characters; pre-segment graphemes upstream
  * for full Unicode.
  */
object Wordpiece {

  /** Seed vocabulary: every single character seen (kind='char' —
    * force-included so greedy inference is total), plus the top
    * `numPieces` multi-char substrings (2..`maxPieceLen` code points,
    * corpus frequency ≥ `minFreq`) by score = freq · len, ties by
    * piece text. Frequency counts EVERY occurrence position in every
    * word, weighted by the word's corpus count — the suffix-array
    * seed-count semantics.
    *
    * Output: (kind, rank, piece, piece_len, freq, score), rank dense
    * within kind. The ranking window runs over the candidate-piece
    * relation — bounded by distinct-substring count of the VOCABULARY,
    * not the corpus (the [[Bpe]] boundedness argument).
    */
  def seedVocab(docs: DataFrame, numPieces: Int = 200,
                maxPieceLen: Int = 8, minFreq: Long = 2L): DataFrame = {
    val wordFreq = docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c_w"))
    val subs = wordFreq.select(col("c_w"), explode(expr(
      s"""flatten(transform(sequence(1, char_length(word)),
            p -> transform(sequence(1, least($maxPieceLen, char_length(word) - p + 1)),
                           l -> substr(word, p, l))))""")).as("piece"))
    val pieceFreq = subs.groupBy(col("piece"))
      .agg(sum(col("c_w")).as("freq"))
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("freq"), (col("freq") * length(col("piece"))).cast("long").as("score"))
    val chars = pieceFreq.filter(col("piece_len") === 1L)
      .select(lit("char").as("kind"),
        row_number().over(Window.orderBy(col("piece"))).cast("long").as("rnk"),
        col("piece"), col("piece_len"), col("freq"), col("score"))
    val multi = pieceFreq
      .filter(col("piece_len") >= 2L && col("freq") >= minFreq)
      .select(lit("piece").as("kind"),
        row_number().over(Window.orderBy(col("score").desc, col("piece")))
          .cast("long").as("rnk"),
        col("piece"), col("piece_len"), col("freq"), col("score"))
      .filter(col("rnk") <= numPieces)
    chars.unionByName(multi).orderBy(col("kind"), col("rnk"))
  }

  /** Memoized vocab PIECE LIST (chars + ranked multi-char pieces) —
    * the one bounded driver action, per (process, key, params); the
    * [[Bpe.trainedMergeRows]] discipline.
    */
  private val vocabs = scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  def vocabPieces(docs: DataFrame, key: String, numPieces: Int = 200,
                  maxPieceLen: Int = 8, minFreq: Long = 2L): Seq[String] =
    vocabs.getOrElseUpdate(s"$key#$numPieces#$maxPieceLen#$minFreq",
      seedVocab(docs, numPieces, maxPieceLen, minFreq)
        .select(col("piece")).orderBy(col("piece"))
        .collect().map(_.getString(0)).toSeq)

  /** Per-doc encode statistics under `pieces`: word count, piece
    * count, fertility (pieces per word — THE tokenizer-quality
    * number), and an order-pinning integer signature: per word,
    * Σ (position+1)·md5Bucket(piece); per doc, the sum over word
    * occurrences. Any segmentation drift — different pieces OR
    * different order — moves the signature; md5 is the engine-portable
    * hash, so the oracle replays it exactly.
    *
    * Scale shape: each DISTINCT word encodes once (the greedy walk is
    * a codegen'd expression over the vocabulary-sized word relation);
    * occurrences hash-join the skinny (word, n_pieces, sig) relation
    * back; the roll-up is one doc-keyed aggregation.
    */
  def encodeStats(docs: DataFrame, pieces: Seq[String],
                  maxPieceLen: Int = 8): DataFrame = {
    val words = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    val enc = words.select(col("word")).distinct()
      .select(col("word"),
        posexplode(wordpiece_pieces(col("word"), pieces, maxPieceLen))
          .as(Seq("ppos", "piece")))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_pieces"),
        sum((col("ppos") + 1L) * Sampling.hashBucket(col("piece"), 8192))
          .as("word_sig"))
    val perDoc = words.join(enc, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"),
        sum(col("word_sig")).as("sig"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        when(col("n_words") > 0,
          col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        coalesce(col("sig"), lit(0L)).as("sig"))
      .orderBy(col("doc_id"))
  }

  /** Which pieces EARN their vocab slot: per piece, total greedy-walk
    * uses (every occurrence position, weighted by word frequency) and
    * the distinct words using it — the signal that tunes the vocab
    * budget (a piece with n_uses ≈ its own training freq is paying
    * rent; one greedy-shadowed by longer pieces is dead weight).
    *
    * Scale shape: the walk runs once per DISTINCT word; usage joins
    * the vocabulary-sized (word, freq) relation and aggregates on the
    * piece — nothing corpus-sized moves.
    */
  def pieceUsage(docs: DataFrame, pieces: Seq[String],
                 maxPieceLen: Int = 8): DataFrame = {
    val wordFreq = docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c_w"))
    wordFreq.select(col("word"), col("c_w"),
        explode(wordpiece_pieces(col("word"), pieces, maxPieceLen)).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("c_w")).as("n_uses"),
        count_distinct(col("word")).as("n_words"))
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("n_uses"), col("n_words"))
      .orderBy(col("piece"))
  }

  /** Tokenizer QA per language: fertility (pieces/word) and
    * compression (chars/piece) under `pieces` — the two numbers a
    * tokenizer review reads first (the [[Bpe.fertilityByLang]] twin).
    * Groups derive from the words relation, so a language appears iff
    * it has at least one token — divisions are safe by construction.
    */
  def fertilityByLang(docs: DataFrame, pieces: Seq[String],
                      maxPieceLen: Int = 8): DataFrame = {
    val words = docs.select(col("lang"), explode(tokens(col("text"))).as("word"))
    val enc = words.select(col("word")).distinct()
      .select(col("word"), length(col("word")).cast("long").as("n_chars"),
        size(wordpiece_pieces(col("word"), pieces, maxPieceLen))
          .cast("long").as("n_pieces"))
    words.join(enc, "word")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_pieces"), col("n_chars"),
        (col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"))
      .orderBy(col("lang"))
  }
}

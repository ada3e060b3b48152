package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Persisted bigram language model — train once, score many: the LM
  * lifecycle a 100 TB quality-filter deployment actually runs
  * (retraining the counts per scoring batch would rescan the corpus;
  * here scoring a fresh batch reads only the count relations, which
  * are vocabulary-sized, not corpus-sized).
  *
  * Layout: `dir/bigram_counts` (bigram, c_bg), `dir/context_counts`
  * (w1, c_ctx), `dir/vocab` (the 1-row v_size). The context counts
  * and vocab are derived once at write time so scorers never touch
  * the training corpus at all.
  */
object LmModel {

  def write(docs: DataFrame, dir: String): Unit = {
    TextAnalysis.lmBigramCounts(docs)
      .write.mode("overwrite").parquet(s"$dir/bigram_counts")
    TextAnalysis.lmContextCounts(docs)
      .write.mode("overwrite").parquet(s"$dir/context_counts")
    TextAnalysis.lmVocabSize(docs)
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Score a doc batch against the RELOADED model. */
  def score(spark: SparkSession, dir: String, docs: DataFrame): DataFrame =
    TextAnalysis.lmDocScoresWith(docs,
      spark.read.parquet(s"$dir/bigram_counts"),
      spark.read.parquet(s"$dir/context_counts"),
      spark.read.parquet(s"$dir/vocab"))

  /** Persist the trigram stupid-backoff model: trigram, bigram, and
    * unigram counts plus the 1-row token total. Contexts derive from
    * the counts at scoring time (they are smaller than their parents),
    * so four relations fully specify the model — same layout
    * discipline as the bigram model above.
    */
  def writeTrigram(train: DataFrame, dir: String): Unit = {
    TextAnalysis.lmTrigramCounts(train)
      .write.mode("overwrite").parquet(s"$dir/trigram_counts")
    TextAnalysis.lmBigramCounts(train)
      .write.mode("overwrite").parquet(s"$dir/bigram_counts")
    TextAnalysis.lmUnigramCounts(train)
      .write.mode("overwrite").parquet(s"$dir/unigram_counts")
    TextAnalysis.lmTokenTotal(train)
      .write.mode("overwrite").parquet(s"$dir/total")
  }

  /** Score a doc batch against the RELOADED trigram model — never
    * rescans the training corpus.
    */
  def scoreTrigram(spark: SparkSession, dir: String,
                   docs: DataFrame): DataFrame =
    TextAnalysis.lmTrigramDocScoresWith(docs,
      spark.read.parquet(s"$dir/trigram_counts"),
      spark.read.parquet(s"$dir/bigram_counts"),
      spark.read.parquet(s"$dir/unigram_counts"),
      spark.read.parquet(s"$dir/total"))
}

package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Bpe

/** Persisted BPE tokenizer — train once, encode many: the tokenizer
  * lifecycle a 100 TB pipeline actually runs (the merge table ships
  * with the dataset the way a tokenizer.json's `merges` section does;
  * retraining per encode batch would rescan the corpus and could
  * silently DRIFT the vocabulary between batches).
  *
  * Layout: `dir/merges` (merge_rank, left, right, merged, n) — the
  * complete artifact. The word→symbols map deliberately does NOT
  * persist: it is a function of the TARGET batch's words under these
  * merges, derived per encoded dataset (and staged there —
  * [[graft.operators.Bpe.wordSymbolsStaged]]); persisting the
  * training corpus's map would silently miss every unseen word.
  */
object BpeModel {

  def write(train: DataFrame, dir: String, numMerges: Int): Unit =
    Bpe.bpeTrain(train, numMerges)
      .write.mode("overwrite").parquet(s"$dir/merges")

  /** The reloaded merge list in rank order — a driver action bounded
    * by the vocabulary budget (≤ numMerges rows), the same contract
    * as the in-flight trainer's memoized merge rows.
    */
  def merges(spark: SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(s"$dir/merges")
      .orderBy(col("merge_rank")).collect().toSeq
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))

  /** Encode a doc batch under the RELOADED merges — never re-trains.
    * Passing `stageKey` shares the word→symbols artifact with any
    * other consumer of an IDENTICAL merge list on the same dataset
    * (the stage key fingerprints the merges, so a model that did not
    * survive the round trip intact would NOT share — content, not
    * provenance, decides reuse).
    */
  def encode(spark: SparkSession, dir: String, docs: DataFrame,
             stageKey: Option[String] = None): DataFrame =
    Bpe.bpeEncode(docs, merges(spark, dir), stageKey)
}

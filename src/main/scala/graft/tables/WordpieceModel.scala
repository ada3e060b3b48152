package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Wordpiece

/** Persisted WordPiece vocabulary — train once, encode many (the
  * [[BpeModel]] lifecycle for the piece-inventory tokenizer: the
  * vocab ships with the dataset the way a tokenizer.json's `vocab`
  * section does; re-deriving it per encode batch would rescan the
  * corpus and could silently drift the inventory between batches).
  *
  * Layout: `dir/vocab` (kind, rnk, piece, piece_len, freq, score) —
  * the complete artifact, including the force-included single chars
  * that make greedy inference total.
  */
object WordpieceModel {

  def write(train: DataFrame, dir: String, numPieces: Int = 200,
            maxPieceLen: Int = 8, minFreq: Long = 2L): Unit =
    Wordpiece.seedVocab(train, numPieces, maxPieceLen, minFreq)
      .write.mode("overwrite").parquet(s"$dir/vocab")

  /** The reloaded piece list — a driver action bounded by the vocab
    * budget (chars + numPieces rows), the in-flight trainer's
    * memoized-collect contract.
    */
  def pieces(spark: SparkSession, dir: String): Seq[String] =
    spark.read.parquet(s"$dir/vocab")
      .select(col("piece")).orderBy(col("piece"))
      .collect().map(_.getString(0)).toSeq

  /** Encode stats under the RELOADED vocab — never re-trains. */
  def encodeStats(spark: SparkSession, dir: String, docs: DataFrame,
                  maxPieceLen: Int = 8): DataFrame =
    Wordpiece.encodeStats(docs, pieces(spark, dir), maxPieceLen)
}

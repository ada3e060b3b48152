package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.operators.Wordpiece

/** Persisted WordPiece vocabulary — train once, encode many (the
  * [[BpeModel]] lifecycle for the piece-inventory tokenizer: the
  * vocab ships with the dataset the way a tokenizer.json's `vocab`
  * section does; re-deriving it per encode batch would rescan the
  * corpus and could silently drift the inventory between batches).
  *
  * Layout: `dir/vocab` (kind, rnk, piece, piece_len, freq, score) —
  * the complete artifact, including the force-included single chars
  * that make greedy inference total — plus `dir/params`
  * (num_pieces, max_piece_len, min_freq): the TRAINING params ride
  * with the vocab, because inference depends on one of them. The
  * greedy walk probes candidate pieces longest-first up to
  * max_piece_len; a vocab trained with a larger cap but decoded with
  * the default would silently make its longest pieces unreachable,
  * breaking the bit-for-bit train-once/encode-many contract.
  * [[encodeStats]] therefore takes NO length parameter — the
  * artifact is the only source of truth.
  */
object WordpieceModel {

  def write(train: DataFrame, dir: String, numPieces: Int = 200,
            maxPieceLen: Int = 8, minFreq: Long = 2L): Unit = {
    Wordpiece.seedVocab(train, numPieces, maxPieceLen, minFreq)
      .write.mode("overwrite").parquet(s"$dir/vocab")
    train.sparkSession.range(1)
      .select(lit(numPieces).as("num_pieces"),
        lit(maxPieceLen).as("max_piece_len"),
        lit(minFreq).as("min_freq"))
      .write.mode("overwrite").parquet(s"$dir/params")
  }

  /** The reloaded piece list — a driver action bounded by the vocab
    * budget (chars + numPieces rows), the in-flight trainer's
    * memoized-collect contract.
    */
  def pieces(spark: SparkSession, dir: String): Seq[String] =
    spark.read.parquet(s"$dir/vocab")
      .select(col("piece")).orderBy(col("piece"))
      .collect().map(_.getString(0)).toSeq

  /** The persisted training params — one row by construction. */
  def params(spark: SparkSession, dir: String): (Int, Int, Long) = {
    val r = spark.read.parquet(s"$dir/params")
      .select(col("num_pieces"), col("max_piece_len"), col("min_freq"))
      .collect().head
    (r.getInt(0), r.getInt(1), r.getLong(2))
  }

  /** Encode stats under the RELOADED vocab — never re-trains, and
    * reads the probe cap from the artifact (not a caller default).
    */
  def encodeStats(spark: SparkSession, dir: String,
                  docs: DataFrame): DataFrame =
    Wordpiece.encodeStats(docs, pieces(spark, dir), params(spark, dir)._2)
}

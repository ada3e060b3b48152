package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Sampling}

/** PERSISTED inverted index, term-bucketed on disk — the stored form
  * of [[graft.operators.Retrieval.postingsStaged]]'s contract that "a
  * query touches only its own terms' buckets". Layout:
  *
  *   root/postings/__tb=<b>/   posting rows (term, doc_id, dl, tf)
  *   root/termstats/           per-term df (vocabulary-sized)
  *   root/corpus/              1 row (n_docs, sum_dl)
  *   root/_index.json          bucket count
  *
  * The bucket of a term is the engine-portable md5 bucket
  * ([[Sampling.hashBucket]]) — the same 32-hex-bit idiom every
  * oracle-checked hash in the engine uses, so the skip-count check
  * can derive expected bucket sets in SQL. Queries resolve their
  * terms' buckets DRIVER-SIDE (a few md5s) and open only those
  * partition directories: at 100 TB a 3-term query reads 3/|buckets|
  * of the index, never the corpus and never the full posting set.
  */
object InvertedIndex {

  def write(docs: DataFrame, root: String, buckets: Int = 64): Unit = {
    require(!Files.exists(Paths.get(s"$root/_index.json")),
      s"index already exists at $root")
    val postings = Retrieval.postingsStaged(docs)
      .withColumn("__tb", Sampling.hashBucket(col("term"), buckets))
    postings.write.partitionBy("__tb").parquet(s"$root/postings")
    Retrieval.termStatsStaged(docs).write.parquet(s"$root/termstats")
    Retrieval.corpusStatsStaged(docs).write.parquet(s"$root/corpus")
    Files.write(Paths.get(s"$root/_index.json"),
      s"""{"buckets": $buckets}""".getBytes("UTF-8")): Unit
  }

  def bucketCount(root: String): Int = {
    val body = new String(
      Files.readAllBytes(Paths.get(s"$root/_index.json")), "UTF-8")
    """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"bad _index.json at $root"))
  }

  /** Driver-side md5 bucket of a term — bit-identical to
    * [[Sampling.hashBucket]]'s Column form (first 8 hex chars of md5,
    * parsed base-16, mod buckets). */
  def bucketOf(term: String, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  /** Postings for `terms`, reading ONLY their buckets. Returns
    * (postings, bucketsRead, bucketsSkipped); a requested bucket with
    * no directory (no corpus term hashed there) prunes to zero rows
    * and still counts as read — the counts derive purely from the
    * term→bucket rule, which is what the skip check pins. */
  def postingsFor(spark: SparkSession, root: String,
                  terms: Seq[String]): (DataFrame, Int, Int) = {
    val nb = bucketCount(root)
    val want = terms.distinct.map(bucketOf(_, nb)).distinct.sorted
    val paths = want.map(b => s"$root/postings/__tb=$b")
      .filter(p => Files.exists(Paths.get(p)))
    val df =
      if (paths.isEmpty)
        spark.read.parquet(s"$root/postings").limit(0).drop("__tb")
      else spark.read.parquet(paths: _*)
    (df.filter(col("term").isin(terms.distinct: _*)),
      want.length, nb - want.length)
  }

  /** BM25 over the persisted index: identical scoring plan to
    * [[Retrieval.bm25TopK]], inputs read from the index tree (postings
    * bucket-pruned; term/corpus stats are vocabulary-/1-row-sized). */
  def bm25TopK(spark: SparkSession, root: String,
               queries: Seq[(Long, Seq[String])], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (p, _, _) = postingsFor(spark, root, queries.flatMap(_._2))
    Retrieval.scoreBm25(p,
      spark.read.parquet(s"$root/termstats"),
      spark.read.parquet(s"$root/corpus"),
      queries, k, k1, b)
  }
}

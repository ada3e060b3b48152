package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.{Retrieval, Sampling}
import graft.tables.InvertedIndex

/** Persisted term-bucketed inverted index: driver-side bucket ≡ the
  * Column-form md5 bucket, pruned reads return exactly the terms'
  * postings, the skip arithmetic, absent-term edges, and score parity
  * with the in-process BM25.
  */
class InvertedIndexSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_invidx_spec_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("bucketOf matches Sampling.hashBucket bit-for-bit") {
    val terms = Seq("vector", "stream", "hash", "customer", "order", "dup",
      "join", "a", "the", "zzz", "Ünïcode", "x" * 100)
    val viaCol = terms.toDF("term")
      .select(col("term"), Sampling.hashBucket(col("term"), 64).as("b"))
      .as[(String, Long)].collect().toMap
    terms.foreach { t =>
      InvertedIndex.bucketOf(t, 64) shouldBe viaCol(t)
    }
  }

  test("write/read: pruned postings ≡ staged postings for the terms") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64)
    val terms = Seq("vector", "dup", "join")
    val (pruned, read, skipped) =
      InvertedIndex.postingsFor(spark, root, terms)
    read shouldBe terms.map(InvertedIndex.bucketOf(_, 64)).distinct.length
    (read + skipped) shouldBe 64
    val got = pruned.select("term", "doc_id", "dl", "tf")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = Retrieval.postingsStaged(docs)
      .filter(col("term").isin(terms: _*))
      .select("term", "doc_id", "dl", "tf")
      .as[(String, Long, Long, Long)].collect().toSet
    got shouldBe want
    // a second write must refuse (create-once like every artifact)
    intercept[IllegalArgumentException] {
      InvertedIndex.write(docs, root)
    }
  }

  test("terms absent from the corpus prune to empty, counts still derive from the rule") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64)
    val (p, read, skipped) =
      InvertedIndex.postingsFor(spark, root, Seq("qqqqq", "wwwww"))
    p.count() shouldBe 0L
    read shouldBe Seq("qqqqq", "wwwww")
      .map(InvertedIndex.bucketOf(_, 64)).distinct.length
    (read + skipped) shouldBe 64
  }

  test("indexed BM25 ≡ in-process BM25, score_q bit-for-bit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = freshRoot()
    InvertedIndex.write(docs, root, buckets = 64)
    val qs = Seq((0L, Seq("vector", "stream")), (1L, Seq("dup", "join")))
    val direct = Retrieval.bm25TopK(docs, qs, k = 8).collect().toSeq
    val indexed = InvertedIndex.bm25TopK(spark, root, qs, k = 8)
      .collect().toSeq
    indexed shouldBe direct
  }
}

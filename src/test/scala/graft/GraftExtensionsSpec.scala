package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("native kernels are callable from SQL") {
    Seq((1L, "a b a b c")).toDF("doc_id", "text").createOrReplaceTempView("ext_docs")
    val grams = spark.sql(
      "SELECT word_ngrams(text, 2) AS g FROM ext_docs")
      .as[Seq[String]].head()
    assert(grams === Seq("a b", "b a", "a b", "b c"))

    val cos = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-9)

    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS n")
      .as[Long].head()
    assert(n === 2L)
  }

  test("SQL functions agree with the Column API") {
    val docs = tables.Tables.documents(spark, sf).limit(50)
    docs.createOrReplaceTempView("ext_corpus")
    val viaSql = spark.sql(
      "SELECT doc_id, word_shingle_hashes(text, 3) AS sh FROM ext_corpus ORDER BY doc_id")
      .as[(Long, Seq[Long])].collect().toSeq
    val viaCol = docs.select(col("doc_id"),
        graft.functions.WordShingleHashes.word_shingle_hashes(col("text"), 3).as("sh"))
      .orderBy(col("doc_id"))
      .as[(Long, Seq[Long])].collect().toSeq
    assert(viaSql === viaCol)

    val emb = tables.Tables.embeddings(spark, sf).limit(20)
    emb.createOrReplaceTempView("ext_emb")
    val bucketsSql = spark.sql(
      "SELECT vec_id, srp_buckets(embedding, 6, 4, 64, 42L) AS b FROM ext_emb ORDER BY vec_id")
      .as[(Long, Seq[Long])].collect().toSeq
    val bucketsCol = emb.select(col("vec_id"),
        graft.functions.SrpBuckets.srp_buckets(col("embedding"), 6, 4, 64, 42L).as("b"))
      .orderBy(col("vec_id"))
      .as[(Long, Seq[Long])].collect().toSeq
    assert(bucketsSql === bucketsCol)
  }

  test("extensions class exposes the same registration list") {
    assert(GraftExtensions.registrations.map(_._1.funcName).sorted === Seq(
      "cosine_similarity", "minhash_band_keys", "rolling_hash",
      "sorted_intersect_count", "srp_buckets", "word_ngrams",
      "word_shingle_hashes"))
    // the injection class instantiates cleanly (deployment path:
    // --conf spark.sql.extensions=graft.GraftExtensions)
    new GraftExtensions()
  }
}

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

    val nc = spark.sql(
      "SELECT nearest_centroid(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(named_struct('centroid_id', 3L, 'centroid', array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))," +
        "      named_struct('centroid_id', 9L, 'centroid', array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))))) AS c")
      .as[Long].head()
    assert(nc === 9L)

    // decomposed e + U+0301 in, composed \u00e9 out
    val nfc = spark.sql("SELECT nfc_normalize('e\u0301') AS t").as[String].head()
    assert(nfc === "\u00e9")

    val sh = spark.sql(
      "SELECT simhash64(word_shingle_hashes('a b c d', 3)) AS h").as[Long].head()
    val sh2 = spark.sql(
      "SELECT simhash64(word_shingle_hashes('a b c d', 3)) AS h").as[Long].head()
    assert(sh === sh2)

    val rep = spark.sql(
      "SELECT repetition_stats('x y\nx y') AS r").select("r.n_lines", "r.top_gram")
      .collect().head
    assert(rep.getLong(0) === 2L && rep.getString(1) === "x y")

    val cu = spark.sql(
      "SELECT canonical_url('HTTPS://WWW.Ex.com:443/a/?utm_source=1&b=2#f') AS c")
      .as[String].head()
    assert(cu === "https://ex.com/a?b=2")
    val rd = spark.sql(
      "SELECT psl_registered_domain('a.b.site.co.uk') AS d").as[String].head()
    assert(rd === "site.co.uk")

    val dz = spark.sql(
      "SELECT deflate_size(repeat('ab', 128)) AS z").as[Long].head()
    assert(dz === graft.functions.DeflateSize.compressedSize(
      ("ab" * 128).getBytes("UTF-8")))
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
      "bloom_agg", "bloom_might_contain", "canonical_url",
      "cosine_similarity", "deflate_size", "minhash_band_keys",
      "nearest_centroid", "nfc_normalize", "polyline_decode",
      "polyline_encode", "psl_registered_domain", "repetition_stats",
      "rolling_hash", "simhash64", "sorted_intersect_count",
      "srp_buckets", "word_ngrams", "word_shingle_hashes"))
    // the injection class instantiates cleanly (deployment path:
    // --conf spark.sql.extensions=graft.GraftExtensions)
    new GraftExtensions()
  }
}

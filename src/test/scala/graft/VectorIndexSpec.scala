package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Similarity
import graft.tables.VectorIndex

/** Persisted IVF index: faceted (filter-context) probes, carry
  * columns on cell rows, recluster-on-compact invariance + depth
  * rebalance, and the delete existence guard.
  */
class VectorIndexSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def freshDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_vindex_spec_")
    dir.toFile.deleteOnExit()
    s"${dir.toString}/idx"
  }

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("topKFiltered at full probe ≡ brute force over the filtered corpus; cosines bit-identical to unfiltered") {
    val dir = freshDir()
    VectorIndex.write(emb, dir, nlist = 16)
    val queries = emb.filter(col("vec_id") < 3)
    val got = VectorIndex.topKFiltered(spark, dir, queries, 8, nprobe = 16,
      filter = col("label") % 2 === 1).collect().toSeq
    val want = Similarity.bruteForceTopK(
      emb.filter(col("label") % 2 === 1), queries, 8).collect().toSeq
    got shouldBe want
    // filter-context: a surviving (query, vec) pair's cosine equals
    // its unfiltered value exactly — nothing re-weighs
    val unfiltered = VectorIndex.topK(spark, dir, queries, 1000, nprobe = 16)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      unfiltered(key) shouldBe r.getAs[Double]("cosine")
    }
  }

  test("carry columns ride cell rows and filter on them — facet from a build-time join, probe never joins the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = freshDir()
    val faceted = emb.join(
      docs.select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id"))
    VectorIndex.write(faceted, dir, nlist = 16, carry = Seq("source"))
    val queries = emb.filter(col("vec_id") < 3)
    val got = VectorIndex.topKFiltered(spark, dir, queries, 8, nprobe = 16,
      filter = col("source").isin("src1", "src2", "src3")).collect().toSeq
    val want = Similarity.bruteForceTopK(
      faceted.filter(col("source").isin("src1", "src2", "src3")),
      queries, 8).collect().toSeq
    got shouldBe want
  }

  test("recluster-on-compact: full probe invariant, stale centroids refit the drifted distribution") {
    // distribution drift: batch A clusters near +e0, batch B near −e0
    // — centroids seeded from A alone leave every B vector in a cell
    // whose centroid points the WRONG way (cosine ≈ −1): the stale-fit
    // state a skewed append series produces
    def mk(ids: Range, sign: Float) = ids.map { i =>
      val v = Array.fill(8)(0.0f)
      v(0) = sign * 10.0f
      v(i % 4 + 1) = 1.0f + (i % 7) * 0.1f
      (i.toLong, v.toSeq, i % 3)
    }.toDF("vec_id", "embedding", "label")
    val a = mk(0 until 64, 1.0f)
    val b = mk(64 until 128, -1.0f)
    val dir = freshDir()
    VectorIndex.write(a, dir, nlist = 8)
    VectorIndex.append(b, dir, batch = Some("skew"))
    // quantization fit: mean cosine of each vector to its OWN cell's
    // centroid — the k-means objective the audit watches
    def fit(d: String): Double = {
      val cents = spark.read.parquet(s"$d/centroids")
      VectorIndex.cells(spark, d)
        .join(broadcast(cents), Seq("centroid_id"))
        .select(graft.functions.CosineSimilarity.cosine_similarity(
          col("embedding"), col("centroid")).as("c"))
        .agg(avg(col("c"))).as[Double].head()
    }
    val fitBefore = fit(dir)
    fitBefore should be < 0.2 // half the corpus sits in wrong-way cells
    val queries = a.filter(col("vec_id") < 2)
    val before = VectorIndex.topK(spark, dir, queries, 6, nprobe = 8)
      .collect().toSeq
    val dst = freshDir()
    VectorIndex.compactTo(spark, dir, dst, recluster = 3)
    // full-probe retrieval is recluster-invariant (every live vector
    // still scores) ...
    VectorIndex.topK(spark, dst, queries, 6, nprobe = 8)
      .collect().toSeq shouldBe before
    // ... and the refreshed centroids FIT the drifted distribution:
    // some centroid migrated into the B mode, so every vector now
    // sits in a cell pointing its way
    fit(dst) should be > 0.9
    // the audit relation itself: nlist-sized, total preserved
    VectorIndex.cellDepths(spark, dst).select("n_vecs").as[Long]
      .collect().sum shouldBe 128L
    // recluster refuses a PQ-bearing index (codebooks would go stale)
    val pqDir = freshDir()
    VectorIndex.write(emb, pqDir, nlist = 16)
    VectorIndex.writePq(emb, pqDir, nlist = 16)
    intercept[IllegalArgumentException] {
      VectorIndex.compactTo(spark, pqDir, freshDir(), recluster = 1)
    }
  }

  test("versioned updates: supersede + append re-embeds a vector; full probe ≡ brute force on the updated corpus; compaction folds") {
    val dir = freshDir()
    VectorIndex.write(emb, dir, nlist = 16, ver = 1L)
    // UPDATE %5==1: old version superseded, new (reversed) vector
    // appended at the new version — an id-level delete would kill the
    // re-append too, which is exactly what versions exist to avoid
    val updated = emb.filter(col("vec_id") % 5 === 1)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
        col("label"))
    VectorIndex.supersede(updated.select(col("vec_id"),
      lit(2L).as("kill_below")), dir)
    VectorIndex.append(updated, dir, ver = 2L)
    val queries = emb.filter(col("vec_id") < 3)
    val finalCorpus = emb.withColumn("embedding",
      when(col("vec_id") % 5 === 1, reverse(col("embedding")))
        .otherwise(col("embedding")))
    val want = Similarity.bruteForceTopK(finalCorpus, queries, 8)
      .collect().toSeq
    VectorIndex.topK(spark, dir, queries, 8, nprobe = 16)
      .collect().toSeq shouldBe want
    // compaction folds the versioned kills; probe unmoved, and the
    // compacted root carries no tombstone/supersede sets
    val cmp = s"${freshDir()}_cmp"
    VectorIndex.compactTo(spark, dir, cmp)
    VectorIndex.topK(spark, cmp, queries, 8, nprobe = 16)
      .collect().toSeq shouldBe want
    assert(!new java.io.File(cmp).listFiles().exists(f =>
      f.getName.contains("_batch_")))
  }

  test("applyChanges consumes an embedding change feed: updates re-embed, inserts append, deletes kill; exact vs brute force") {
    val dir = freshDir()
    val base = emb.filter(col("vec_id") % 3 =!= 2)
    VectorIndex.write(base, dir, nlist = 16, ver = 1L)
    // hand-built feed (CowTable.changesSince shape): v2 re-embeds
    // %5==1 of base + inserts the remaining third, v3 deletes %10==4
    val upd = base.filter(col("vec_id") % 5 === 1)
      .select(col("vec_id"), lit("update").as("op"),
        reverse(col("embedding")).as("new_embedding"),
        col("label").as("new_label"), lit(2L).as("version"))
    val ins = emb.filter(col("vec_id") % 3 === 2)
      .select(col("vec_id"), lit("insert").as("op"),
        col("embedding").as("new_embedding"),
        col("label").as("new_label"), lit(2L).as("version"))
    val del = emb.filter(col("vec_id") % 10 === 4)
      .select(col("vec_id"), lit("delete").as("op"),
        lit(null).cast("array<float>").as("new_embedding"),
        lit(null).cast("int").as("new_label"), lit(3L).as("version"))
    VectorIndex.applyChanges(upd.unionByName(ins).unionByName(del), dir)
    val queries = emb.filter(col("vec_id") < 3)
    val finalCorpus = emb
      .withColumn("embedding",
        when(col("vec_id") % 3 =!= 2 && col("vec_id") % 5 === 1,
          reverse(col("embedding"))).otherwise(col("embedding")))
      .filter(col("vec_id") % 10 =!= 4)
    VectorIndex.topK(spark, dir, queries, 8, nprobe = 16)
      .collect().toSeq shouldBe
      Similarity.bruteForceTopK(finalCorpus, queries, 8).collect().toSeq
    // a compressed index refuses versioned CDC (codes carry no ver)
    val pqDir = s"${freshDir()}_pq"
    VectorIndex.writePq(emb, pqDir, nlist = 16)
    intercept[IllegalArgumentException] {
      VectorIndex.applyChanges(upd, pqDir)
    }
  }

  test("delete requires an existing index — a mistyped dir fails loudly") {
    intercept[IllegalArgumentException] {
      VectorIndex.delete(Seq(1L).toDF("vec_id"), "/tmp/graft_no_such_index")
    }
  }
}

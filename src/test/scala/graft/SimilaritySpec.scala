package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 2),  // opposite of 0
    (4L, Array(0.7f, 0.7f, 0.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: known geometry") {
    val c = vecs.filter($"vec_id" === 0L)
      .crossJoin(vecs.filter($"vec_id" === 3L).select($"embedding".as("other")))
      .select(Similarity.cosine($"embedding", $"other").as("c"))
      .as[Double].head()
    assert(math.abs(c - (-1.0)) < 1e-6)
  }

  test("brute-force top-k ranks by cosine, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 4L, 2L)) // 0.994, 0.707, 0.0 (vec 3 = -1 excluded by k)
  }

  test("lsh: identical vectors share a bucket; top-k recall on real data") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, q, 5, planes = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // 4 planes → 16 buckets over 500 vecs: recall needn't be 1 but the
    // probe must return results and they must be a subset ranked by
    // true cosine (each approx hit is a real vector, self excluded).
    assert(approx.nonEmpty)
    assert(approx.forall { case (qid, vid) => qid != vid })
    // at least some overlap with the exact top-5
    assert((approx intersect exact).nonEmpty)
  }

  test("ivf: probes return valid ranked neighbours with decent recall") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, 5, nlist = 8, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (qid, vid) => qid != vid })
    assert((ivf intersect exact).nonEmpty)
  }
}

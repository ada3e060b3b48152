package graft

import org.apache.spark.sql.functions._

import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components incl. chains and singletons") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3, pair 5-6, singletons 4 and 7
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val out = Components.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("converges on a long path within the diameter bound") {
    val n = 15L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val out = Components.connectedComponents(nodes, edges, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(1L)) // one path component, min id 1
  }

  test("large-star/small-star agrees with label propagation on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30L
      val nodes = (1L to n).toDF("id")
      val edges = Seq.fill(25)((rnd.nextLong(n) + 1, rnd.nextLong(n) + 1))
        .filter { case (a, b) => a != b }
        .toDF("a", "b")
      val prop = Components.connectedComponents(nodes, edges, maxIter = 40)
        .as[(Long, Long)].collect().toMap
      val star = Components.connectedComponentsStar(nodes, edges)
        .as[(Long, Long)].collect().toMap
      assert(star === prop, s"trial $trial")
    }
  }

  test("incremental labeling equals full recomputation on random graph growth") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nCorpus = 20L
      val nAll = 35L
      val allNodes = (1L to nAll).toDF("id")
      // corpus-internal edges, then an increment whose edges all touch
      // a fresh node (the incremental pair-gen contract: b is fresh)
      val corpusEdges = Seq.fill(15)((rnd.nextLong(nCorpus) + 1, rnd.nextLong(nCorpus) + 1))
        .filter { case (a, b) => a != b }.toDF("a", "b")
      val freshEdges = Seq.fill(12)((rnd.nextLong(nAll) + 1, rnd.nextLong(nAll - nCorpus) + nCorpus + 1))
        .filter { case (a, b) => a != b }.toDF("a", "b")
      val prior = Components.connectedComponentsStar(
        (1L to nCorpus).toDF("id"), corpusEdges)
      val incr = Components.connectedComponentsIncremental(
          allNodes, prior, freshEdges)
        .as[(Long, Long)].collect().toMap
      val full = Components.connectedComponentsStar(
          allNodes, corpusEdges.unionByName(freshEdges))
        .as[(Long, Long)].collect().toMap
      assert(incr === full, s"trial $trial")
    }
  }

  test("star variant converges on a long path in O(log n) rounds") {
    // diameter 63 — label-prop needs ~63 rounds, star must land the
    // single min-rooted component well inside its default maxIter=16.
    val n = 64L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val out = Components.connectedComponentsStar(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out.size === 64 && out.values.toSet === Set(1L))
  }

  test("star variant: empty edge set labels every node as itself") {
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = Components.connectedComponentsStar(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out === (1L to 5L).map(i => i -> i).toMap)
  }

  test("nearDupClusters: every doc labeled; cluster id is the min member") {
    val docs = tables.Tables.documents(spark, sf)
    val out = Components.nearDupClusters(docs)
      .as[(Long, Long)].collect()
    assert(out.length === docs.count())
    assert(out.forall { case (id, c) => c <= id }) // representative = min
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.map(_._1).min === c) // min member IS the label
    }
  }

  test("cross-modal clusters merge families neither signal merges alone") {
    // doc 0 ~ doc 1 lexically (shared text, disjoint embeddings);
    // doc 1 ~ doc 2 semantically (identical embeddings, disjoint text)
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different words about gardening and soup recipes"),
      (3L, "an unrelated singleton that matches nothing at all here")
    ).toDF("doc_id", "text").withColumn("n_chars", length($"text"))
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),  // identical to 1
      (3L, Array(0.0f, 0.0f, 0.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val cross = Components.crossModalClusters(docs, embs)
      .as[(Long, Long)].collect().toMap
    assert(cross === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L))
    // each single-signal pass keeps a transitive duplicate
    val lexOnly = Components.nearDupClusters(docs)
      .as[(Long, Long)].collect().toMap
    assert(lexOnly(2L) === 2L) // semantics-only dup survives lexical pass
    assert(lexOnly(1L) === 0L)
  }
}

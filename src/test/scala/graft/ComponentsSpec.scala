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
}

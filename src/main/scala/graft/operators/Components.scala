package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the clustering pass
  * near-dedup needs when similarity is transitive-ish: pairwise
  * drop-the-higher-id over-drops on chains (A~B, B~C, A≁C drops B AND
  * C; one representative per COMPONENT keeps A and exactly one of the
  * rest... keeps A only — the component collapses to its minimum id),
  * and cluster ids let downstream stages weight or sample per
  * duplicate family instead of blindly deleting.
  *
  * Scale shape: each iteration is one join + one partial-aggregated
  * min — data-sized but shuffle-clean — and converges in
  * ≤ component-diameter iterations (dup families are shallow; the
  * driver-side loop is bounded by the diameter and one `count()`
  * action per iteration, the standard shape of distributed CC — the
  * DATA never collects). `localCheckpoint` truncates the iterative
  * lineage, without which the plan doubles per round.
  */
object Components {

  /** (id) nodes + (a, b) undirected edges → (id, component) where
    * component = min node id reachable. `maxIter` bounds runaway
    * graphs; convergence usually lands in a handful of rounds.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("component"))
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val nbr = sym
        .join(labels.withColumnRenamed("id", "b_id"), col("b") === col("b_id"))
        .select(col("a").as("id"), col("component"))
      val next = labels.unionByName(nbr)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("component", "__old"), "id")
        .filter(col("component") =!= col("__old"))
        .isEmpty
      labels = next
      i += 1
    }
    labels
  }

  /** Near-duplicate families over the exact n-gram pair graph:
    * (doc_id, cluster_id) for EVERY doc — singletons are their own
    * cluster; cluster_id is the component's minimum doc_id, i.e. the
    * representative a keep-one policy retains.
    */
  def nearDupClusters(docs: DataFrame, shingleK: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    val edges = Dedup.ngramJaccardPairs(docs, shingleK, threshold)
      .select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
    connectedComponents(docs.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }
}

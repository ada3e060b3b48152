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
    *
    * Test-scope only (`private[graft]`): ComponentsSpec cross-checks
    * [[connectedComponentsStar]] against it on random graphs. The
    * O(diameter) round count and per-iteration join+isEmpty make it
    * the wrong production path — no query should reach it.
    */
  private[graft] def connectedComponents(nodes: DataFrame, edges: DataFrame,
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

  /** Connected components by alternating large-star / small-star
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014) — the production path. Converges in
    * O(log n) rounds regardless of component diameter, where
    * min-label propagation needs O(diameter) rounds, and uses ONE
    * driver action per round pair (a (count, hash-sum) signature
    * aggregate) instead of a join + isEmpty — the two scale concerns
    * the label-prop variant documents. Kept alongside label-prop,
    * which ComponentsSpec cross-checks it against on random graphs.
    *
    * Each round is two rewrites of the edge list: large-star hangs
    * every strictly-larger neighbor of u onto min(Γ(u) ∪ u);
    * small-star re-points every smaller neighbor (and u itself) to
    * that minimum. The fixed point is a star per component rooted at
    * the component's minimum id.
    */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
                              maxIter: Int = 16): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionByName(e.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("mm"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("mm").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val mins = dir.groupBy(col("u")).agg(min(col("v")).as("mm"))
      val hung = dir.join(mins, "u")
        .filter(col("v") =!= col("mm"))
        .select(col("v").as("u"), col("mm").as("v"))
      hung.unionByName(mins.select(col("u"), col("mm").as("v"))).distinct()
    }
    // Stability signature: same row count + same order-independent
    // hash-xor ⇒ same edge set (whp; the edge list is distinct, so
    // xor never self-cancels) — one aggregate action per round pair,
    // no exceptAll join. bit_xor, not sum: ANSI mode makes a long
    // overflow in sum() a job-killing error.
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var e = edges.select(col("a").as("u"), col("b").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var last = sig(e)
    var i = 0
    var converged = e.isEmpty
    while (!converged && i < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val cur = sig(e)
      converged = cur == last
      last = cur
      i += 1
    }
    // Fixed point: every non-root member has exactly one edge to its
    // component min (groupBy-min is belt-and-braces for the maxIter
    // cutoff); roots and singletons label themselves.
    val labels = e.groupBy(col("u").as("id")).agg(min(col("v")).as("__c"))
    nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("__c"), col("id")).as("component"))
  }

  /** Incremental connected components — the continuous-ingest flow:
    * extend a previously-computed labeling with a fresh increment
    * WITHOUT re-pairing the standing corpus. The prior labels are an
    * already-contracted star (one `id → component` edge per non-root
    * member preserves every prior connection), so the input graph is
    * |corpus| contracted edges plus only the NEW pairs the increment
    * generates — the star rounds then run over a graph that is already
    * mostly collapsed, and at 100 TB the labeling is the thing you
    * store and roll forward batch over batch.
    *
    * Equivalence: components of (prior-label edges ∪ new edges) equal
    * components of (all original edges ∪ new edges), because label
    * edges and original edges induce identical connectivity on the
    * corpus; min-ids are preserved since the node set is unchanged.
    * ComponentsSpec pins incremental ≡ full recomputation on random
    * graph sequences.
    *
    * @param nodes       (id) — corpus ∪ fresh
    * @param priorLabels (id, component) for the standing corpus
    * @param newEdges    (a, b) pairs involving the increment
    */
  def connectedComponentsIncremental(nodes: DataFrame, priorLabels: DataFrame,
                                     newEdges: DataFrame,
                                     maxIter: Int = 16): DataFrame = {
    val priorEdges = priorLabels
      .filter(col("id") =!= col("component"))
      .select(col("id").as("a"), col("component").as("b"))
    connectedComponentsStar(nodes, priorEdges.unionByName(newEdges), maxIter)
  }

  /** Standing corpus labeling, staged per (process, `key`): at 100 TB
    * the labeling is the stored artifact the incremental flow rolls
    * forward (see [[connectedComponentsIncremental]]) — no batch
    * recomputes it. Same memo discipline as the staged pair sets
    * (Dedup.scala) and the BPE merge tables (Bpe.scala); the first
    * caller pays sketch pair-gen + star rounds, later consumers read
    * the checkpointed (id, component) relation.
    */
  private val labelStage =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def nearDupLabelsStaged(docs: DataFrame, key: String,
                          shingleK: Int = 3, threshold: Double = 0.5): DataFrame =
    labelStage.getOrElseUpdate(
      s"${System.identityHashCode(docs.sparkSession)}|$key|$shingleK|$threshold",
      nearDupClusters(docs, shingleK, threshold, sketch = true,
          stageKey = Some(s"$key|labels"))
        .localCheckpoint())

  /** Near-duplicate families over the n-gram Jaccard pair graph:
    * (doc_id, cluster_id) for EVERY doc — singletons are their own
    * cluster; cluster_id is the component's minimum doc_id, i.e. the
    * representative a keep-one policy retains.
    *
    * `sketch = true` (the 100 TB path) generates the pair graph with
    * the verified MinHash sketch — O(corpus)+O(candidates) — instead
    * of the O(block²) capped brute baseline; every candidate is still
    * exact-Jaccard verified, so the edge set equals the uncapped
    * blocked-exact pair set wherever the sketch's recall holds
    * (measured 1.0 at all driver SFs).
    */
  def nearDupClusters(docs: DataFrame, shingleK: Int = 3,
                      threshold: Double = 0.5,
                      sketch: Boolean = false,
                      stageKey: Option[String] = None): DataFrame = {
    val pairs = (sketch, stageKey) match {
      case (true, Some(k)) =>
        Dedup.minhashPairsStaged(docs, k, shingleK, threshold = threshold)
      case (true, None) =>
        Dedup.minhashPairs(docs, shingleK, threshold = threshold)
      case (false, _) => Dedup.ngramJaccardPairs(docs, shingleK, threshold)
    }
    val edges = pairs.select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
    connectedComponentsStar(docs.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  /** Cross-signal dup families — the realistic corpus-dedup policy:
    * lexical near-dups (n-gram Jaccard — boilerplate, templated spins)
    * and semantic near-dups (embedding cosine — paraphrases the
    * shingles miss) are ONE equivalence relation, so the edge sets
    * UNION before the components run. A doc lexically tied to one
    * neighbour and semantically to another collapses all three into a
    * single keep-one family — running the two dedups separately keeps
    * a transitive duplicate either pass alone would keep. Both pair
    * generators keep their own scale shapes (capped blocks / block
    * triangle); the union adds nothing but the edge concat.
    */
  def crossModalClusters(docs: DataFrame, embeddings: DataFrame,
                         shingleK: Int = 3, jaccard: Double = 0.5,
                         cosine: Double = 0.45,
                         sketch: Boolean = false,
                         stageKey: Option[String] = None): DataFrame = {
    val textPairs = (sketch, stageKey) match {
      case (true, Some(k)) =>
        // reuse the staged verified pair set every other dedup
        // consumer reads (same key ⇒ same artifact, built once)
        Dedup.minhashPairsStaged(docs, k, shingleK, threshold = jaccard)
      case (true, None) => Dedup.minhashPairs(docs, shingleK, threshold = jaccard)
      case (false, _) => Dedup.ngramJaccardPairs(docs, shingleK, jaccard)
    }
    val textEdges = textPairs
      .select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
    val embPairs = stageKey match {
      case Some(k) =>
        graft.operators.Similarity.cosinePairsStaged(embeddings, k, cosine)
      case None =>
        graft.operators.Similarity.cosinePairsBrute(embeddings, cosine)
    }
    val embEdges = embPairs
      .select(col("vec_id_a").as("a"), col("vec_id_b").as("b"))
    connectedComponentsStar(docs.select(col("doc_id").as("id")),
        textEdges.unionByName(embEdges))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the extension contract:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *    query set, one codegen'd pass over the corpus, per-query top-k.
  *    O(Q·N·d) compute, no candidate loss; the correctness baseline.
  *  - [[lshTopK]] — signed-random-projection LSH: each vector lands in
  *    a 2^planes-bucket; queries only score their own bucket.
  *    Deterministic hyperplanes (fixed seed) keep it reproducible.
  *    At 100 TB this turns a full corpus scan per query into a bucket
  *    probe (~N/2^planes rows), trading recall for cost; the bucket
  *    join shuffles on bucket id, with AQE handling hot buckets.
  *
  * All vector math runs in native codegen'd expressions
  * ([[graft.functions.CosineSimilarity]], [[graft.functions.SrpBuckets]])
  * — no UDFs, no interpreted higher-order functions on the hot path.
  */
object Similarity {

  /** Cosine similarity of two float vectors, accumulated in double.
    * Backed by the native codegen'd [[graft.functions.CosineSimilarity]]
    * expression (the equivalent zip_with/aggregate HOF chain evaluates
    * interpreted — ~20× slower on the ANN hot path).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine_similarity(a, b)

  /** Exact top-k nearest neighbours by cosine for each query vector.
    * `queries` must be small (it is broadcast); self-matches are
    * excluded. Output: (query_id, vec_id, label, cosine), k rows per
    * query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("query_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer of
    * `nlist` centroids partitions the corpus into cells; each query
    * scores only the `nprobe` cells whose centroids it is closest to.
    *
    * Centroids here are a deterministic pseudo-random sample of the
    * corpus itself: the nlist vectors with the smallest xxhash64 of
    * their id — a uniform draw that is stable across runs and
    * partitionings, selected by TakeOrderedAndProject (per-partition
    * top-nlist + an nlist-row driver merge; no count() action, no full
    * sort, one corpus pass shared with the assignment scan). `refine`
    * optional Lloyd sweeps ([[refineCentroids]]) tighten the cells;
    * both paths are deterministic — what a verifiable engine op needs
    * most. Scale shape:
    * the centroid set is packed into ONE broadcast row of
    * (centroid_id, centroid) structs and assignment is the row-local
    * native argmin [[graft.functions.NearestCentroid]] — the corpus is
    * never exchanged at all (the previous crossJoin + window-argmin
    * formulation shuffled corpus × nlist rows carrying the embedding
    * column); the probe join then touches ~N·nprobe/nlist rows per
    * query instead of N, and only skinny scored rows reach the final
    * top-k exchange.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 2, refine: Int = 0): DataFrame = {
    val centroids = ivfCentroids(corpus, nlist, refine)
    ivfProbe(centroids, ivfAssign(corpus, centroids), queries, k, nprobe)
  }

  /** IVF coarse quantizer: `nlist` deterministic pseudo-random seed
    * centroids (smallest xxhash64 of vec_id) plus optional Lloyd
    * sweeps. Public so a persisted index ([[graft.tables.VectorIndex]])
    * can build once and query many times.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int = 16,
                   refine: Int = 0): DataFrame = {
    val sampled = corpus
      // a null embedding sampled as a seed would be a dead centroid (it
      // can never win the argmin) — and its cell id would NPE-bait every
      // consumer that dereferences the centroid vector
      .filter(col("embedding").isNotNull)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    (1 to refine).foldLeft(sampled)((c, _) => refineCentroids(corpus, c))
  }

  /** Assign every corpus vector to its nearest centroid: the nlist
    * centroids collapse to a single broadcast row and the argmin runs
    * row-locally in codegen (NearestCentroid is order-independent, so
    * collect_list's nondeterministic ordering is immaterial). The
    * coalesce(-1) makes the output non-nullable, so the probe join
    * infers no isnotnull(centroid_id) — which would be pushed below
    * this projection and re-run the argmin kernel per filter eval;
    * null-embedding rows get cell -1, which no probe ever matches.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignWith(corpus, centroids, Nil)

  /** [[ivfAssign]] with FACET columns riding each assigned row — the
    * [[graft.operators.Retrieval.postingsStagedWith]] discipline on
    * the dense side: a filtered probe then prunes cells by a pushed
    * predicate on its own scan instead of joining a corpus-sized
    * metadata relation. */
  def ivfAssignWith(corpus: DataFrame, centroids: DataFrame,
                    carry: Seq[String]): DataFrame =
    corpus.crossJoin(packedCentroids(centroids))
      .select(Seq(col("vec_id"), col("label"), col("embedding")) ++
        carry.map(col) :+
        coalesce(graft.functions.NearestCentroid
          .nearest_centroid(col("embedding"), col("cents")), lit(-1L))
          .as("centroid_id"): _*)

  /** Probe half of the IVF search, over any (centroids, assigned)
    * pair — in-flight or reloaded from a persisted index.
    */
  def ivfProbe(centroids: DataFrame, assigned: DataFrame,
               queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    // Each query probes its nprobe nearest cells (query side is tiny —
    // the window shuffles only Q·nlist rows; centroid_id breaks exact
    // cosine ties so the probe set is partitioning-independent).
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qdist").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("query_emb"), col("centroid_id"),
        cosine(col("query_emb"), col("centroid")).as("qdist"))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("query_emb"), col("centroid_id"))

    val scored = assigned.join(broadcast(probes), "centroid_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("query_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  /** Pack a (small) centroid relation into ONE broadcastable row
    * holding the whole set as an array of (centroid_id, centroid)
    * structs — the shape [[graft.functions.NearestCentroid]] consumes.
    * The packing aggregation itself exchanges at most one partial row
    * per input partition (nlist structs total), never corpus data.
    */
  private def packedCentroids(centroids: DataFrame): DataFrame =
    broadcast(centroids.agg(
      collect_list(struct(col("centroid_id"), col("centroid"))).as("cents")))

  /** One Lloyd (k-means) refinement sweep: assign every corpus vector
    * to its nearest current centroid, then replace each centroid with
    * its cell's element-wise mean. Tightens the IVF cells over the
    * hash-sampled seed centroids; fully deterministic (the row-local
    * argmin breaks exact-cosine ties on centroid_id, so assignment is
    * independent of partitioning AND of centroid-array order).
    *
    * Scale shape: assignment is the same zero-exchange row-local pass
    * ivfTopK does; the mean computes over the EXPLODED skinny
    * (centroid_id, pos, component) relation — partial aggregation
    * reduces every map partition to at most nlist·dim rows before the
    * shuffle, so the exchange carries ~partitions·nlist·dim tiny rows
    * regardless of corpus size, never the embeddings themselves.
    */
  def refineCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = corpus.crossJoin(packedCentroids(centroids))
      .select(col("vec_id"), col("embedding"),
        coalesce(graft.functions.NearestCentroid
          .nearest_centroid(col("embedding"), col("cents")), lit(-1L))
          .as("centroid_id"))
    // (no filter on the -1 null-embedding cell: posexplode of a null
    // embedding emits no rows, and a pushed-down filter would re-run
    // the argmin kernel below this projection)
    assigned
      .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "c")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(avg(col("c")).as("mean_c"))
      .groupBy(col("centroid_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean_c")))),
        s => s.getField("mean_c").cast("float")).as("centroid"))
  }

  // ---- k-means / semantic (SemDeDup) dedup -----------------------------

  /** Deterministic, engine-portable k-means seeding: the k live
    * vectors with the smallest (md5(vec_id), vec_id). md5 — not
    * xxhash64 — on purpose: Spark's xxhash64 is engine-specific, so a
    * DuckDB oracle could never reproduce [[ivfCentroids]]' seed set;
    * md5 is universal (the same reasoning as
    * [[Sampling.hashBucket]]). orderBy+limit plans as
    * TakeOrderedAndProject — per-partition top-k, never a global sort.
    */
  def kmeansSeeds(corpus: DataFrame, k: Int): DataFrame =
    corpus.filter(col("embedding").isNotNull)
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  /** One Lloyd sweep with EXACT integer-domain means: components
    * quantize to round(v·1e7) longs, sum order-free, then ONE double
    * division and ONE float cast — so the refined centroids are
    * bit-identical under any partitioning AND reproducible by the
    * DuckDB oracle (HUGEINT sums, same division) — the
    * `label_centroid_sim` trick applied to Lloyd iteration.
    * [[refineCentroids]] (plain double avg) stays the IVF production
    * path; this variant is what makes refined k-means oracle-checkable.
    *
    * Scale shape: identical to [[refineCentroids]] — row-local argmin
    * assignment, then the skinny exploded (centroid, pos) aggregate
    * with map-side partials; the corpus never shuffles.
    */
  def refineCentroidsExact(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(corpus.filter(col("embedding").isNotNull), centroids)
      .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "c")))
      .select(col("centroid_id"), col("pos"),
        round(col("c").cast("double") * 1e7d).cast("long").as("q"))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .select(col("centroid_id"), col("pos"),
        (col("sq").cast("double") / (lit(1e7d) * col("n").cast("double")))
          .cast("float").as("mean_c"))
      .groupBy(col("centroid_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean_c")))),
        s => s.getField("mean_c")).as("centroid"))

  /** Exact-reproducible k-means: md5 seeds + `sweeps` integer-domain
    * Lloyd iterations. Returns the centroid relation.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, sweeps: Int): DataFrame =
    (1 to sweeps).foldLeft(kmeansSeeds(corpus, k))(
      (c, _) => refineCentroidsExact(corpus, c))

  /** Per-vector assignment report against a centroid set: the
    * row-local argmax plus the winning cosine (centroids ride back in
    * by broadcast — the corpus side never exchanges).
    */
  def kmeansAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(corpus.filter(col("embedding").isNotNull), centroids)
      .join(broadcast(centroids), "centroid_id")
      .select(col("vec_id"), col("label"), col("centroid_id"),
        cosine(col("embedding"), col("centroid")).as("cos"))

  /** Prototypicality pruning (Sorscher et al., NeurIPS 2022 "Beyond
    * neural scaling laws"): self-supervised prototypes = k-means
    * centroids; an example's prototypicality is its cosine to its
    * winning centroid. In the data-abundant regime you PRUNE the
    * prototypical mode and KEEP the hard tail (`keepHard = true`);
    * with scarce data you keep the easy examples instead — the
    * paper's central asymmetry, exposed as the flag.
    *
    * Keeps ceil(keepFrac · n_c) examples PER CLUSTER (proportional
    * quotas, so no cell is emptied and the kept set preserves the
    * cluster mix — the paper's class-balanced refinement) by
    * (cos asc|desc, vec_id) with deterministic ties.
    *
    * Scale shape: assignment is row-local against broadcast
    * centroids; both windows share the one hash partitioning by
    * centroid_id, so the skinny (vec_id, centroid_id, cos) relation
    * shuffles ONCE and embeddings never do. The rank bound is
    * data-dependent (ceil of the cell count) so WindowGroupLimit
    * can't pre-prune — the window input is already skinny.
    */
  def prototypicalityPrune(corpus: DataFrame, k: Int, sweeps: Int,
                           keepFrac: Double,
                           keepHard: Boolean = true): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, "keepFrac in (0, 1]")
    val assigned = kmeansAssign(corpus,
      kmeansCentroids(corpus.filter(col("embedding").isNotNull), k, sweeps))
    val order = if (keepHard) col("cos").asc else col("cos").desc
    val w = Window.partitionBy(col("centroid_id")).orderBy(order, col("vec_id"))
    val wc = Window.partitionBy(col("centroid_id"))
    assigned
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nc", count(lit(1)).over(wc))
      .filter(col("__rn") <= ceil(col("__nc") * keepFrac))
      .drop("__rn", "__nc")
  }

  /** SemDeDup (Abbas et al. 2023): cluster the embedding space with
    * k-means, then near-dedup WITHIN clusters only — the cluster
    * granularity bounds the quadratic, turning O(N²) cosine dedup
    * into O(N²/k) with negligible recall loss (near-dups land in the
    * same cell by construction). Survivors keep the smallest vec_id of
    * each detected pair — the same lower-id rule every other dedup
    * path uses.
    *
    * Scale shape: assignment is row-local; the only data-sized
    * exchange is ONE shuffle of the corpus by centroid_id for the
    * within-cluster self-join (the canonical SemDeDup layout). `k`
    * scales with the corpus: k ≤ 0 (the default path) picks the
    * [[autoNlist]] N-proportional cluster count, pinning the expected
    * cell depth so the per-cell pair work stays flat in N.
    */
  def semanticDedup(corpus: DataFrame, k: Int, threshold: Double,
                    sweeps: Int = 1): DataFrame = {
    val live = corpus.filter(col("embedding").isNotNull)
    val assigned = ivfAssign(live, kmeansCentroids(live, resolveNlist(live, k), sweeps))
    val a = assigned.select(col("centroid_id"),
      col("vec_id").as("vec_id_a"), col("embedding").as("emb_a"))
    val b = assigned.select(col("centroid_id"),
      col("vec_id").as("vec_id_b"), col("embedding").as("emb_b"))
    val victims = a.join(b, "centroid_id")
      .filter(col("vec_id_a") < col("vec_id_b") &&
        cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("vec_id_b").as("vec_id")).distinct()
    live.join(victims, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"))
  }

  // ---- Johnson–Lindenstrauss random projection -------------------------

  /** Deterministic ±1 JL sign matrix as ONE broadcastable row: entry
    * (j, i) = +1 iff the md5 bucket of "j:i" is even — md5 (not
    * xxhash64) so the DuckDB oracle reproduces every sign (the
    * [[Sampling.hashBucket]] convention). Flattened in (j, i) order:
    * signs[j·dimIn + i].
    */
  private def jlSigns(spark: SparkSession, dimIn: Int, dimOut: Int): DataFrame =
    broadcast(spark.range(dimIn.toLong * dimOut)
      .select(col("id"),
        when(Sampling.hashBucket(
          concat_ws(":", (col("id") / dimIn).cast("long"),
            col("id") % dimIn), 2) === 0, lit(1.0d))
          .otherwise(lit(-1.0d)).as("s"))
      .agg(transform(array_sort(collect_list(struct(col("id"), col("s")))),
        e => e.getField("s")).as("signs")))

  /** Johnson–Lindenstrauss projection to `dimOut` dims with the ±1
    * (Achlioptas 2003) construction: proj[j] = Σ_i v[i]·sign(j,i) /
    * √dimOut. Distances are preserved within (1±ε) w.h.p. — the
    * cheap front half of a project-then-search ANN pipeline (16 dims
    * scan 4× less than 64).
    *
    * Scale + exactness: the sign matrix rides in as one broadcast row;
    * the projection is a row-local sequential fold per output dim (no
    * shuffle, no UDF), and with `dimOut` a perfect square the √ scale
    * is exact — every output float is bit-reproducible by the oracle's
    * identical left-to-right fold.
    */
  def jlProject(corpus: DataFrame, dimIn: Int = 64, dimOut: Int = 16): DataFrame = {
    require(math.sqrt(dimOut).isWhole, "dimOut must be a perfect square")
    val scale = math.sqrt(dimOut) // exact for perfect squares
    corpus.filter(col("embedding").isNotNull)
      .crossJoin(jlSigns(corpus.sparkSession, dimIn, dimOut))
      .select(col("vec_id"), col("label"),
        // native codegen fold — same IEEE op sequence as the HOF
        // composition it replaced, so every float is bit-unchanged
        // (see JlProjectFold). Sealed (r17): downstream explode-inferred
        // size/notnull constraints otherwise push the whole fold into
        // the broadcast-cross condition — see [[graft.functions.Sealed]].
        graft.functions.Sealed.sealedCol(graft.functions.JlProjectFold
          .jl_project_fold(
            col("embedding"), col("signs"), dimIn, dimOut, scale)).as("proj"))
  }

  /** JL distortion report over the planted query set: for each (query,
    * corpus) pair, the ratio of projected to original squared L2
    * distance — identical sequential-fold arithmetic on both engines,
    * so the counts and extremes are EXACT, not a sampled floor.
    */
  def jlDistortion(corpus: DataFrame, nQueries: Int,
                   dimIn: Int = 64, dimOut: Int = 16): DataFrame = {
    val proj = jlProject(corpus, dimIn, dimOut)
    val live = corpus.filter(col("embedding").isNotNull)
      .join(proj.select(col("vec_id"), col("proj")), "vec_id")
    val q = live.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("proj").as("q_proj"))
    def d2(a: Column, b: Column, n: Int): Column =
      aggregate(sequence(lit(1), lit(n)), lit(0.0d), (acc, i) => {
        val diff = element_at(a, i).cast("double") - element_at(b, i).cast("double")
        acc + diff * diff
      })
    live.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(
        d2(col("embedding"), col("q_emb"), dimIn).as("orig_d2"),
        d2(col("proj"), col("q_proj"), dimOut).as("proj_d2"))
      .filter(col("orig_d2") > 0.0d)
      .select((col("proj_d2") / col("orig_d2")).as("ratio"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(abs(col("ratio") - 1.0d) <= 0.5d, 1L).otherwise(0L))
          .as("n_within_half"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
  }

  /** Project-then-search ANN: coarse top-`candidates` by squared L2 in
    * the 16-dim JL space (a 4× cheaper scan than 64-dim), then exact
    * cosine re-rank of the survivors — the same two-tier shape as
    * [[pqTopKReranked]], with JL instead of PQ as the cheap tier.
    * Both tiers rank with deterministic tie-breaks over bit-exact
    * values, so the FULL pipeline (candidates included) is
    * oracle-reproducible — no recall floor needed.
    */
  def jlTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int,
                     candidates: Int, dimIn: Int = 64,
                     dimOut: Int = 16): DataFrame = {
    val proj = jlProject(corpus, dimIn, dimOut)
    val live = corpus.filter(col("embedding").isNotNull)
      .join(proj.select(col("vec_id"), col("proj")), "vec_id")
    val q = queries.filter(col("embedding").isNotNull)
      .join(proj.select(col("vec_id"), col("proj")), "vec_id")
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("proj").as("q_proj"))
    def d2(a: Column, b: Column, n: Int): Column =
      aggregate(sequence(lit(1), lit(n)), lit(0.0d), (acc, i) => {
        val diff = element_at(a, i).cast("double") - element_at(b, i).cast("double")
        acc + diff * diff
      })
    val coarse = live.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("vec_id"), col("label"),
        col("embedding"), d2(col("proj"), col("q_proj"), dimOut).as("jl_d2"))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("jl_d2"), col("vec_id"))
    val wFine = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    coarse.withColumn("__rc", row_number().over(wCoarse))
      .filter(col("__rc") <= candidates)
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .withColumn("__rn", row_number().over(wFine))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  /** Matryoshka-style prefix-dimension rerank (Kusupati et al. 2022,
    * "Matryoshka Representation Learning"): coarse-rank by cosine
    * over the FIRST `dimPrefix` dimensions — the cheap tier an
    * MRL-trained encoder concentrates signal into, and for any
    * encoder a dimIn/dimPrefix-fold compute+IO cut — then exact
    * full-dimension cosine re-ranks the top `candidates` to top-k.
    * The [[jlTopKReranked]] shape with a SLICE instead of a
    * projection: no transform artifact to store or apply, the prefix
    * IS the compressed vector (what a production store keeps as its
    * head-dims column / separate cheap index).
    *
    * Both tiers rank bit-exact deterministic values (native clamped
    * cosine over the slice ≡ DuckDB over the double-cast slice), so
    * the FULL pipeline — candidate set included — is
    * oracle-reproducible with no recall floor.
    */
  def matryoshkaTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int,
                             candidates: Int, dimPrefix: Int = 16): DataFrame = {
    val live = corpus.filter(col("embedding").isNotNull)
    val q = queries.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val pre = cosine(slice(col("embedding"), 1, dimPrefix),
      slice(col("q_emb"), 1, dimPrefix))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("pre_cos").desc, col("vec_id"))
    val wFine = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    live.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("vec_id"), col("label"),
        col("embedding"), pre.as("pre_cos"))
      .withColumn("__rc", row_number().over(wCoarse))
      .filter(col("__rc") <= candidates)
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .withColumn("__rn", row_number().over(wFine))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  /** Single-table SRP bucket id: bit i = sign(v · plane_i). Native
    * codegen'd [[graft.functions.SrpBuckets]] — the HOF chain this
    * replaces (`aggregate(zip_with(...))` per plane) re-walked the
    * embedding once per plane, interpreted; bucket values are
    * bit-identical (same plane PRNG, same accumulation order).
    */
  def srpBucket(emb: Column, planes: Int, dim: Int = 64, seed: Long = 42L): Column =
    element_at(graft.functions.SrpBuckets.srp_buckets(emb, planes, 1, dim, seed), 1)

  /** Embedding-cosine near-duplicate pairs, brute force: every
    * (a, b) with a.vec_id < b.vec_id and cosine ≥ `threshold`.
    * O(N²·d) compute — the oracle-checkable validation baseline for
    * [[cosinePairsLsh]], same role [[Dedup.ngramJaccardPairs]] plays
    * for MinHash.
    *
    * Shape: block-triangle join. A naive `a.vec_id < b.vec_id` theta
    * join plans as BroadcastNestedLoopJoin — broadcasting the corpus,
    * which caps the operator at driver memory. Instead each vector is
    * hashed into one of `blocks` blocks, the B(B+1)/2 block PAIRS are
    * broadcast (tiny), and both corpus sides shuffle by block id —
    * every executor handles its block pairs with plain hash joins, so
    * the quadratic compute distributes and nothing large is ever
    * broadcast. Shuffle volume is B·N rows (replication factor = the
    * block count), the standard trade for a shuffle-parallel triangle.
    *
    * `blocks` defaults to cluster-proportional: B(B+1)/2 block pairs
    * ≈ 2× the scheduler's parallelism, so every core gets work at any
    * cluster size (a fixed B=8 caps the job at 36 tasks on a
    * 1000-executor cluster). The pair set is identical for ANY block
    * count — B only shapes distribution.
    */
  def cosinePairsBrute(corpus: DataFrame, threshold: Double,
                       blocks: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val b = if (blocks > 0) blocks
      else math.min(64, math.max(8,
        math.ceil(math.sqrt(4.0 * spark.sparkContext.defaultParallelism)).toInt))
    val blockPairs = spark.range(b.toLong).select(col("id").as("block_a"))
      .join(spark.range(b.toLong).select(col("id").as("block_b")),
        col("block_a") <= col("block_b"))
    val lhs = corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      pmod(xxhash64(col("vec_id")), lit(b)).as("block_a"))
    val rhs = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      pmod(xxhash64(col("vec_id")), lit(b)).as("block_b"))
    lhs.join(broadcast(blockPairs), "block_a")
      .join(rhs, "block_b")
      // each unordered pair survives exactly once: a cross-block pair
      // only ever joins via its (min_block, max_block) ordering, and a
      // same-block pair keeps its id-ordered representative; ids are
      // then normalized so vec_id_a < vec_id_b in the output.
      .filter(col("block_a") < col("block_b") || col("id_a") < col("id_b"))
      // Sealed: the threshold filter otherwise pushes the cosine into
      // the join condition, re-evaluating it there per pair and again
      // in this projection — see [[graft.functions.Sealed]].
      .select(least(col("id_a"), col("id_b")).as("vec_id_a"),
        greatest(col("id_a"), col("id_b")).as("vec_id_b"),
        graft.functions.Sealed.sealedCol(
          cosine(col("emb_a"), col("emb_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127,
    * q_i = round(x_i/scale) — 4× smaller embedding storage, the
    * standard first compression step before ANN at 100 TB (recall the
    * IVF/LSH candidates with int8, re-rank survivors with the float
    * originals). Zero vectors get scale 0 / all-zero codes. The scale
    * is materialized as an ATTRIBUTE before the transform — an inline
    * `aggregate(...)` producer inside the lambda would re-evaluate the
    * max|x| pass once per element (see TextFunctions' evaluation
    * contract).
    */
  def quantizeInt8(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df
      .withColumn("q_scale",
        (aggregate(col(embCol), lit(0.0d),
          (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0d)
          .cast("float"))
      .withColumn("q_emb",
        when(col("q_scale") === 0.0f,
          transform(col(embCol), _ => lit(0).cast("byte")))
          .otherwise(transform(col(embCol),
            x => round(x.cast("double") / col("q_scale")).cast("byte"))))

  /** Reconstruct float embeddings from int8 codes. */
  def dequantizeInt8(df: DataFrame, qCol: String = "q_emb",
                     scaleCol: String = "q_scale"): Column =
    transform(col(qCol), q => (q.cast("float") * col(scaleCol)).cast("float"))

  /** Product-quantization codebooks (Jégou et al. 2011): the embedding
    * splits into `m` subspaces of dim/m components; each subspace gets
    * a `ksub`-entry codebook. Codebook entries are the sub-slices of
    * the same deterministic hash sample [[ivfCentroids]] uses (smallest
    * xxhash64(vec_id) — stable across runs, partitionings, and engines),
    * with dense codes 0..ksub-1 in hash order. Output: (sub_idx,
    * centroid_id, centroid) — m·ksub rows, broadcastable by nature.
    */
  def pqCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
                  dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sd = dim / m
    val seeds = corpus.filter(col("embedding").isNotNull)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(ksub)
      .select(col("vec_id"), col("embedding"))
    // dense 0-based codes in the same hash order (ksub rows — the
    // window is trivial and never sees corpus data)
    val coded = seeds.select(col("embedding"),
      (row_number().over(Window.orderBy(xxhash64(col("vec_id")), col("vec_id")))
        .cast("long") - 1L).as("centroid_id"))
    coded
      .select(col("centroid_id"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("sub_idx"))
      .select(col("sub_idx"), col("centroid_id"),
        slice(col("embedding"), col("sub_idx") * sd + 1, lit(sd)).as("centroid"))
  }

  /** PQ-encode the corpus: each vector becomes `m` codebook codes —
    * 8 bytes of codes per 256-byte float64-dim vector (32× smaller
    * storage, the memory tier below [[quantizeInt8]]'s 4×). All m
    * codebooks pack into ONE broadcast map row and each subspace code
    * is the row-local native [[graft.functions.NearestCentroid]] argmin
    * over that subspace's entries — the corpus is never exchanged,
    * exactly the IVF-assignment shape. Null embeddings encode as all
    * -1 (no codebook entry matches them downstream).
    */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int = 8,
               dim: Int = 64, carry: Seq[String] = Nil): DataFrame = {
    val sd = dim / m
    val packed = broadcast(codebooks
      .groupBy(col("sub_idx"))
      .agg(collect_list(struct(col("centroid_id"), col("centroid"))).as("cents"))
      .agg(map_from_entries(collect_list(struct(col("sub_idx"), col("cents"))))
        .as("__cb")))
    // Sealed (r17): downstream explodes of `codes` infer size/notnull
    // constraints that otherwise push below this projection INTO the
    // broadcast-cross condition, re-running all m argmins per row there
    // and again here — see [[graft.functions.Sealed]].
    corpus.crossJoin(packed).select(
      (Seq(col("vec_id"), col("label")) ++ carry.map(col) :+
        graft.functions.Sealed.sealedCol(array((0 until m).map { j =>
          coalesce(graft.functions.NearestCentroid.nearest_centroid(
            slice(col("embedding"), j * sd + 1, sd),
            element_at(col("__cb"), lit(j))), lit(-1L))
        }: _*)).as("codes")): _*)
  }

  /** PQ top-k by asymmetric distance computation (ADC): the query
    * stays float; each encoded vector scores as cos(query,
    * reconstruction) assembled from per-subspace partial dot products
    * and centroid norms looked up in a per-query table.
    *
    * Scale shape — the point of PQ at 100 TB: retrieval NEVER touches
    * the original embeddings. The LUT (query × subspace × code:
    * Q·m·ksub rows of two doubles) computes from the broadcast
    * codebooks and BROADCASTS; the corpus side is the skinny exploded
    * (vec_id, sub_idx, code) relation joining that LUT, and partial
    * aggregation folds each vector's m terms back together map-side —
    * the shuffle carries Q skinny partial rows per vector, no arrays.
    * Exact cosine re-ranking of the survivors (the standard second
    * stage) is [[bruteForceTopK]] over the top-k ∪ query set.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
             ksub: Int = 16, dim: Int = 64): DataFrame = {
    val sd = dim / m
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (acc, v) => acc + v)
    // localCheckpoint (r17): the codebook relation feeds both the
    // encode pass and the per-query LUT — unpinned, the seed
    // sample+window chain re-ran per reference. m·ksub rows.
    val codebooks = pqCodebooks(corpus, m, ksub, dim).localCheckpoint()
    val enc = pqEncode(corpus, codebooks, m, dim)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    // interpreted HOF math is fine here: Q·m·ksub rows, not the corpus
    val lut = q.crossJoin(broadcast(codebooks))
      .select(col("query_id"), col("sub_idx"),
        col("centroid_id").as("code"),
        dot(slice(col("query_emb"), col("sub_idx") * sd + 1, lit(sd)),
          col("centroid")).as("pdot"),
        dot(col("centroid"), col("centroid")).as("pnorm"))
    val qnorm = q.select(col("query_id"),
      sqrt(dot(col("query_emb"), col("query_emb"))).as("__qn"))
    val skinny = enc.select(col("vec_id"), col("label"),
      posexplode(col("codes")).as(Seq("sub_idx", "code")))
    val scored = skinny.join(broadcast(lut), Seq("sub_idx", "code"))
      .groupBy(col("query_id"), col("vec_id"), col("label"))
      .agg(sum(col("pdot")).as("__dot"), sum(col("pnorm")).as("__n2"))
      .join(broadcast(qnorm), "query_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        when(col("__qn") > 0 && col("__n2") > 0,
          col("__dot") / (col("__qn") * sqrt(col("__n2"))))
          .otherwise(lit(0.0)).as("cosine_adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_adc").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine_adc").desc, col("vec_id"))
  }

  /** The full two-stage PQ pipeline: ADC over codes generates
    * `candidates` per query, then ONLY those rows fetch their original
    * float vectors (a broadcast of the Q·candidates id set onto the
    * corpus scan — no corpus shuffle) and exact cosine re-ranks the
    * top-k. This is how PQ actually deploys at 100 TB: the 32×-smaller
    * code table absorbs the scan, the float tier serves point reads
    * for a few hundred rows per query.
    */
  def pqTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int,
                     candidates: Int = 200, m: Int = 16, ksub: Int = 64,
                     dim: Int = 64): DataFrame = {
    val cand = pqTopK(corpus, queries, candidates, m, ksub, dim)
      .select(col("query_id"), col("vec_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val rescored = corpus.join(broadcast(cand), "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("query_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  /** Deterministic auto-nlist for the cell-blocked quadratic
    * operators: nlist = max(minNlist, ceil(N / targetCell)), so the
    * expected cell depth stays ≈ `targetCell` as the corpus grows and
    * the Σ|cell|² pair work is ≈ N·targetCell — LINEAR in N. The r10
    * scale-curve measured the fixed-nlist default at tail slope 1.62
    * (exactly the predicted Σ|cell|²/nlist at constant nlist); tying
    * nlist to N is what turns the exponent back to ~1 without the
    * caller knowing the contract. Replayable by any engine: the input
    * is one COUNT of the live corpus — the oracle computes the same
    * `greatest(minNlist, ceil(n/targetCell))` from a window count.
    */
  def autoNlist(n: Long, targetCell: Int = 64, minNlist: Int = 16): Int =
    math.max(minNlist, math.ceil(n.toDouble / targetCell).toInt)

  /** nlist ≤ 0 means "auto" — one bounded driver-side count() action
    * at plan construction (the [[Analytics]].certainTopK class of
    * documented eagerness: building the plan triggers a count job;
    * pass an explicit nlist to stay fully lazy). */
  private def resolveNlist(live: DataFrame, nlist: Int): Int =
    if (nlist > 0) nlist else autoNlist(live.count())

  /** Approximate kNN GRAPH: top-k neighbours for EVERY corpus vector
    * (not a handful of query probes) — the input a graph-based
    * curation stage consumes (near-dup components over embeddings,
    * graph diversity sampling, label propagation). Blocking is IVF
    * cells: each vector scores only its own cell, so compute is
    * Σ|cell|² ≈ N²/nlist instead of N², distributed by cell; nlist
    * defaults to the [[autoNlist]] N-proportional choice, which pins
    * the per-cell depth and keeps total pair work linear in N.
    *
    * Fully oracle-checkable by construction — every ingredient is
    * engine-portable: centroid sampling orders by md5(vec_id) (NOT
    * xxhash64, which no other engine reproduces), assignment is the
    * deterministic native argmax (ties to the smaller centroid_id —
    * the exact rule `row_number() OVER (ORDER BY cos DESC, id)`
    * replays), and the cosine kernel matches DuckDB's
    * `list_cosine_similarity` bit-for-bit on every probed input —
    * with the known 1+1ulp caveat at the identical-vector boundary:
    * the engine clamps to [-1, 1], and DuckDB has not been observed
    * to exceed 1 there (20k-probe measurement), but an engine that
    * DID emit 1+1ulp would diverge on fixtures with exact duplicate
    * vectors (driver data has none; planted-twin fixtures do). Vectors alone in their cell emit no rows
    * (documented; a production run uses nlist « N/k so cells are
    * hundreds deep).
    *
    * Scale shape: assignment is the row-local broadcast argmin; the
    * within-cell self-join is an equi join on centroid_id — with the
    * assignment persisted PARTITIONED BY centroid_id (the
    * [[graft.tables.VectorIndex]] layout) both sides are co-located
    * and the join is zero-exchange; the top-k window prunes per map
    * partition (WindowGroupLimit) before its skinny exchange.
    */
  def knnGraphIvf(corpus: DataFrame, k: Int = 5, nlist: Int = 0): DataFrame = {
    val live = corpus.filter(col("embedding").isNotNull)
    val nl = resolveNlist(live, nlist)
    val centroids = live
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nl)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val assigned = ivfAssign(live, centroids)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val nb = assigned.select(col("centroid_id"),
      col("vec_id").as("nb_id"), col("embedding").as("nb_emb"))
    val scored = assigned.join(nb, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("nb_id"))
      .select(col("vec_id"), col("centroid_id"), col("nb_id"),
        cosine(col("embedding"), col("nb_emb")).as("cosine"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nb_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Graph centrality over the kNN graph — the "representative
    * documents first" signal graph-based data selection ranks by:
    * `iters` rounds of PageRank with damping 0.85 over the directed
    * top-k neighbour edges. EVERY arithmetic step is integer: ranks
    * live as 1e12-scaled longs, per-edge contributions are truncating
    * long division `rank div deg`, and the damped update is
    * `0.15·SCALE + (85·Σcontrib) div 100` — so the scores (not just
    * the ordering) are bit-identical on any engine, no float
    * accumulation anywhere. Unnormalized per-node base (the common
    * practical variant); overflow bound: 85·Σcontrib stays under
    * Long.Max while in-neighbour rank mass < ~1e17, far past any
    * realistic in-degree at SCALE=1e12.
    *
    * Scale shape: each round is one skinny (src, dst, long) join +
    * partial-agg'd sum per dst — the standard distributed PageRank
    * step; the graph generation cost dominates and is cell-bounded.
    */
  def knnPageRank(corpus: DataFrame, iters: Int = 3, k: Int = 5,
                  nlist: Int = 0): DataFrame = {
    // localCheckpoint (r17): every power iteration references the edge
    // relation (and its degree aggregate), and Spark re-derives the
    // WHOLE kNN-graph build (centroids → assignment → cell pair-gen →
    // top-k) per reference — the measured plan carried 56 parquet
    // scans for iters = 3. Pin the graph once; iterations then join
    // against the pinned rows. Each run still computes from parquet.
    val edges = knnGraphIvf(corpus, k, nlist)
      .select(col("vec_id").as("src"), col("nb_id").as("dst"))
      .localCheckpoint()
    val nodes = corpus.filter(col("embedding").isNotNull).select(col("vec_id"))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val Scale = 1000000000000L
    var ranks = nodes.select(col("vec_id"), lit(Scale).as("rank_q"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("vec_id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank_q div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_q"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(Scale / 100L * 15L) +
            expr("(85 * coalesce(in_q, 0)) div 100")).as("rank_q"))
    }
    ranks.orderBy(col("rank_q").desc, col("vec_id"))
  }

  /** One deterministic round of kNN label propagation over
    * [[knnGraphIvf]] — the semi-supervised auto-labeling step: seed
    * vectors (vec_id % seedMod == 0, modeling the hand-labeled subset)
    * keep their label; every other vector takes the MAJORITY label
    * among its seed neighbours, ties to the smaller label id, null if
    * no neighbour is a seed. Majority is by vote count (not cosine
    * sum) so the aggregate is integer-exact and the oracle replays it
    * with a plain count + window rule.
    *
    * Scale shape: inherits the graph's (cell-bounded pair compute);
    * the vote aggregate partial-reduces to ≤ǀlabelsǀ rows per vector
    * and the argmax window shuffles only those skinny rows.
    */
  def labelPropagate(corpus: DataFrame, k: Int = 5, nlist: Int = 0,
                     seedMod: Int = 10): DataFrame = {
    val g = knnGraphIvf(corpus, k, nlist)
    val base = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"),
        (col("vec_id") % seedMod === 0).as("is_seed"))
    val votes = g
      .join(base.filter(col("is_seed"))
        .select(col("vec_id").as("nb_id"), col("label").as("nb_label")), "nb_id")
      .groupBy(col("vec_id"), col("nb_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("votes").desc, col("nb_label"))
    val inferred = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("nb_label"), col("votes"))
    base.join(inferred, Seq("vec_id"), "left")
      .select(col("vec_id"), col("is_seed"),
        when(col("is_seed"), col("label")).otherwise(col("nb_label"))
          .as("pred_label"),
        coalesce(col("votes"), lit(0L)).as("votes"))
      .orderBy(col("vec_id"))
  }

  /** Per-vector residual against its IVF cell centroid, emitted under
    * the `embedding` column name so the PQ stages ([[pqCodebooks]] /
    * [[pqEncode]]) consume it unchanged — the composition that turns
    * coarse IVF + fine PQ into the combined IVF-PQ index (Jégou et al.
    * 2011 §IV). Rows whose embedding is null (cell −1) keep a null
    * residual and encode as all −1 codes, invisible downstream.
    *
    * Scale shape: the assignment argmin is row-local over the ONE
    * broadcast centroid row, the centroid join is a broadcast of nlist
    * rows, and the subtraction is a row-local zip_with — the corpus is
    * never exchanged to build residuals.
    */
  def ivfpqResiduals(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(corpus, centroids)
      .join(broadcast(centroids), Seq("centroid_id"), "left")
      .select(col("vec_id"), col("label"), col("centroid_id"),
        when(col("centroid").isNotNull,
          zip_with(col("embedding"), col("centroid"),
            (x, y) => (x.cast("float") - y.cast("float")).cast("float")))
          .as("embedding"))

  /** IVF-PQ retrieval (the FAISS `IVFx,PQy` production index): coarse
    * IVF cells prune the corpus to `nprobe` cells per query, and within
    * a cell vectors score by asymmetric distance over PQ codes of their
    * RESIDUALS — cos(query, centroid + residual_reconstruction),
    * assembled per subspace from three lookup sums:
    * dot(q, c+r̂) = dot(q,c) + Σ_sub dot(q_sub, r̂_sub) and
    * |c+r̂|² = |c|² + 2·Σ_sub dot(c_sub, r̂_sub) + Σ_sub |r̂_sub|²,
    * every term a per-(query, cell, subspace, code) constant.
    *
    * Scale shape — both halves keep their parents' contracts: the LUT
    * factors on its true dependencies (a Q·m·ksub query half and an
    * nlist·m·ksub cell half, each broadcast, joined only against the
    * skinny code stream) and the per-(query, cell) constants
    * broadcast; the corpus side is the skinny exploded
    * (vec_id, cell, sub, code) relation of the PROBED cells only —
    * with the code table partitioned by centroid_id (the
    * [[graft.tables.VectorIndex]] layout) the scan itself prunes to
    * nprobe/nlist of the data, and no exchange ever carries an
    * embedding array. With `nprobe = nlist` the cell pruning is
    * lossless and the only approximation is PQ quantization of
    * residuals (what `ann_ivfpq_recall` pins); smaller nprobe trades
    * recall for the scan cut (rows-only `ann_ivfpq_topk`).
    */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8,
                ksub: Int = 16, dim: Int = 64,
                stageKey: Option[String] = None): DataFrame = {
    // With a stageKey the index artifacts (centroids, codebooks, code
    // table) memoize per (session, key, corpus fingerprint, params) —
    // the IVF-PQ index IS the stored artifact a deployment builds once
    // and queries many times (same discipline as the staged DSIR
    // weights and LM counts); without one, everything stays in-flight.
    def staged(name: String)(df: => DataFrame): DataFrame = stageKey match {
      case Some(kk) =>
        Stage.relation(s"ivfpq-$name|$kk|$nlist|$m|$ksub|$dim", Seq(corpus))(df)
      case None => df
    }
    val centroids = staged("cent")(ivfCentroids(corpus, nlist))
    val resid = ivfpqResiduals(corpus, centroids)
    val codebooks = staged("cb")(pqCodebooks(resid, m, ksub, dim))
    val enc = staged("enc")(
      pqEncode(resid, codebooks, m, dim, carry = Seq("centroid_id")))
    ivfpqProbe(centroids, codebooks, enc, queries, k, nprobe, m, dim)
  }

  /** IVF-PQ retrieval against PREBUILT index artifacts — the probe
    * half of [[ivfpqTopK]] factored out so a persisted index
    * ([[graft.tables.VectorIndex.writePq]]) queries without
    * rebuilding anything. `centroids`/`codebooks`/`enc` are exactly
    * the relations [[ivfCentroids]] / [[pqCodebooks]] /
    * [[pqEncode]](residuals, carry=centroid_id) produce, whether
    * in-flight or reloaded from parquet.
    */
  def ivfpqProbe(centroids: DataFrame, codebooks: DataFrame, enc: DataFrame,
                 queries: DataFrame, k: Int, nprobe: Int, m: Int = 8,
                 dim: Int = 64): DataFrame = {
    val sd = dim / m
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (acc, v) => acc + v)

    // Probe: each query keeps its nprobe nearest cells (Q·nlist window
    // rows; centroid_id breaks exact-cosine ties).
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qdist").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("query_emb"), col("centroid_id"),
        col("centroid"), cosine(col("query_emb"), col("centroid")).as("qdist"))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("query_emb"), col("centroid_id"),
        col("centroid"))

    // Per-(query, cell) constants, plus the LUT FACTORED on its true
    // dependencies — qdot varies per (query, sub, code) and cdot/n2
    // per (cell, sub, code), so building one fused per-(query, cell,
    // sub, code) table would redo each interpreted dot nprobe× / Q×.
    // Q·m·ksub + nlist·m·ksub rows instead of Q·nprobe·m·ksub.
    val cellConst = probes.select(col("query_id"), col("centroid_id"),
      dot(col("query_emb"), col("centroid")).as("__qc"),
      dot(col("centroid"), col("centroid")).as("__c2"),
      sqrt(dot(col("query_emb"), col("query_emb"))).as("__qn"))
    val cb = codebooks.select(col("sub_idx"), col("centroid_id").as("code"),
      col("centroid").as("cb_vec"))
    val qlut = q.crossJoin(broadcast(cb))
      .select(col("query_id"), col("sub_idx"), col("code"),
        dot(slice(col("query_emb"), col("sub_idx") * sd + 1, lit(sd)),
          col("cb_vec")).as("qdot"))
    val clut = centroids.crossJoin(broadcast(cb))
      .select(col("centroid_id"), col("sub_idx"), col("code"),
        dot(slice(col("centroid"), col("sub_idx") * sd + 1, lit(sd)),
          col("cb_vec")).as("cdot"),
        dot(col("cb_vec"), col("cb_vec")).as("n2"))

    val skinny = enc
      .join(broadcast(probes.select(col("query_id"), col("centroid_id"))),
        "centroid_id")
      .select(col("query_id"), col("centroid_id"), col("vec_id"), col("label"),
        posexplode(col("codes")).as(Seq("sub_idx", "code")))
    val scored = skinny
      .join(broadcast(clut), Seq("centroid_id", "sub_idx", "code"))
      .join(broadcast(qlut), Seq("query_id", "sub_idx", "code"))
      .groupBy(col("query_id"), col("centroid_id"), col("vec_id"), col("label"))
      .agg(sum(col("qdot")).as("__qdot"), sum(col("cdot")).as("__cdot"),
        sum(col("n2")).as("__n2"))
      .join(broadcast(cellConst), Seq("query_id", "centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        when(col("__qn") > 0 &&
            col("__c2") + col("__cdot") * 2.0d + col("__n2") > 0,
          (col("__qc") + col("__qdot")) /
            (col("__qn") *
              sqrt(col("__c2") + col("__cdot") * 2.0d + col("__n2"))))
          .otherwise(lit(0.0)).as("cosine_adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_adc").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine_adc").desc, col("vec_id"))
  }

  /** Two-stage IVF-PQ: ADC over residual codes nominates `candidates`
    * per query, then ONLY those rows fetch their float vectors for the
    * exact re-rank — the [[pqTopKReranked]] deployment shape with the
    * IVF scan cut on top.
    */
  def ivfpqTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int,
                        candidates: Int = 200, nlist: Int = 16,
                        nprobe: Int = 16, m: Int = 16, ksub: Int = 64,
                        dim: Int = 64,
                        stageKey: Option[String] = None): DataFrame = {
    val cand = ivfpqTopK(corpus, queries, candidates, nlist, nprobe, m, ksub,
        dim, stageKey)
      .select(col("query_id"), col("vec_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val rescored = corpus.join(broadcast(cand), "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("query_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  /** [[cosinePairsBrute]] staged per (session, key, corpus
    * fingerprint, threshold, blocks) — the verified embedding
    * near-dup pair set is a stored artifact shared by every consumer
    * (negative mining, crossmodal clustering, recall pins): the
    * lexical `Dedup.minhashPairsStaged` twin. The definitional
    * `dedup_embedding_pairs` row stays unstaged so the generator
    * itself remains live-measured.
    */
  def cosinePairsStaged(corpus: DataFrame, key: String, threshold: Double,
                        blocks: Int = 0): DataFrame =
    Stage.relation(s"cospairs|$key|$threshold|$blocks", Seq(corpus))(
      cosinePairsBrute(corpus, threshold, blocks))

  /** Incremental embedding near-dedup, exact: drop every FRESH vector
    * within `threshold` cosine of a lower-id vector (standing corpus
    * or earlier fresh). The corpus NEVER self-pairs: compute is the
    * corpus-block × fresh-block rectangle plus the fresh-only
    * triangle — O(|corpus|·|fresh| + |fresh|²) distributed over
    * broadcast block pairs, not O((N+M)²); at 100 TB the increment is
    * what's small, and that's the only side that multiplies.
    */
  def cosineIncremental(corpus: DataFrame, fresh: DataFrame,
                        threshold: Double, blocks: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val b = if (blocks > 0) blocks
      else math.min(64, math.max(8,
        math.ceil(math.sqrt(4.0 * spark.sparkContext.defaultParallelism)).toInt))
    val grid = spark.range(b.toLong).select(col("id").as("block_a"))
      .join(spark.range(b.toLong).select(col("id").as("block_b")))
    val c = corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      pmod(xxhash64(col("vec_id")), lit(b)).as("block_a"))
    val f = fresh.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      pmod(xxhash64(col("vec_id")), lit(b)).as("block_b"))
    val rectVictims = c.join(broadcast(grid), "block_a")
      .join(f, "block_b")
      .filter(col("id_a") < col("id_b") &&
        cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("id_b").as("vec_id"))
    val triVictims = cosinePairsBrute(fresh, threshold, blocks)
      .select(col("vec_id_b").as("vec_id"))
    fresh.join(rectVictims.unionByName(triVictims).distinct(),
      Seq("vec_id"), "left_anti")
  }

  /** Embedding-cosine near-dup pairs, LSH-bucketed (the scale path):
    * candidates are pairs sharing an SRP bucket under at least one of
    * `tables` independent hyperplane sets (classic OR-amplification —
    * more tables, higher recall), then verified with exact cosine.
    * Cost is O(corpus · tables) + O(candidates), never O(N²): only the
    * skinny (table_idx, bucket, vec_id) relation is shuffled, and the
    * embeddings re-join the candidate pairs for the verify pass.
    */
  def cosinePairsLsh(corpus: DataFrame, threshold: Double, planes: Int = 6,
                     tables: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    // outer explode: stops the join's inferred null filters from being
    // rewritten below the projection (re-running srp_buckets per
    // filter evaluation) — see Dedup.minhashPairs' buckets comment
    val skinny = corpus.select(col("vec_id"),
      posexplode_outer(graft.functions.SrpBuckets
        .srp_buckets(col("embedding"), planes, tables, dim, seed))
        .as(Seq("table_idx", "bucket")))
    val candidates = skinny.as("a")
      .join(skinny.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"))
      .distinct()
    val ea = corpus.select(col("vec_id").as("vec_id_a"), col("embedding").as("emb_a"))
    val eb = corpus.select(col("vec_id").as("vec_id_b"), col("embedding").as("emb_b"))
    candidates.join(ea, "vec_id_a").join(eb, "vec_id_b")
      .select(col("vec_id_a"), col("vec_id_b"),
        cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Approximate top-k: score only corpus vectors sharing the query's
    * SRP bucket. Recall < 1 by design; increase `planes` for smaller
    * buckets (faster, lower recall) or decrease for the reverse.
    *
    * `probeHamming` enables multi-probe: each query also scores the
    * buckets whose id differs in ≤ that many plane bits — the
    * standard trick for recall without coarser buckets (r=1 probes
    * planes+1 buckets: scan cost ×(planes+1)/1, bucket granularity
    * unchanged). Only the QUERY side fans out; the corpus is bucketed
    * once either way.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, dim: Int = 64, seed: Long = 42L,
              probeHamming: Int = 0): DataFrame = {
    val bucketed = corpus.withColumn("bucket",
      srpBucket(col("embedding"), planes, dim, seed))
    val base = srpBucket(col("query_emb"), planes, dim, seed)
    val probes: Column = probeHamming match {
      case 0 => array(base)
      case 1 => array(base +: (0 until planes).map(i =>
        base.bitwiseXOR(shiftleft(lit(1L), i))): _*)
      case r => throw new IllegalArgumentException(
        s"probeHamming ≤ 1 supported (got $r); deeper probes explode combinatorially")
    }
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
      .withColumn("bucket", explode(probes))
    val scored = bucketed.join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("query_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }
}

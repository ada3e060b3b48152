package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splits — the
  * reproducibility ops a training-data pipeline needs at 100 TB, where
  * `rand()`-based sampling is useless: it changes under retries,
  * repartitioning, and backfills, and can't be reproduced by another
  * engine auditing the split.
  *
  * Everything here is a row-local projection over an md5 prefix of the
  * row's key: no shuffle, no state, no seed coordination across
  * executors, stable under any partitioning, and reproducible by ANY
  * system with md5 (the DuckDB oracles recompute the buckets
  * independently). md5 rather than xxhash64 is deliberate — Spark's
  * xxhash64 seeds/variant are engine-specific, md5 is universal.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the first 8 hex chars of
    * md5(key) — 32 bits of hash, far past birthday noise for bucket
    * counts in the hundreds.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Split label ("train"/"val"/"test"/…) by cumulative integer
    * percents over the hash bucket. Total partition: every row gets
    * exactly one label, the same one on every run and every engine.
    */
  def splitColumn(key: Column,
                  weights: Seq[(String, Int)] =
                    Seq("train" -> 80, "val" -> 10, "test" -> 10)): Column = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      "split weights must sum to 100")
    val b = hashBucket(key, 100)
    val cums = weights.map(_._2).scanLeft(0)(_ + _).tail
    val first = when(b < cums.head, lit(weights.head._1))
    weights.tail.zip(cums.tail).foldLeft(first) {
      case (acc, ((name, _), cum)) => acc.when(b < cum, lit(name))
    }
  }

  /** Leakage-safe split assignment: every doc inherits the split of
    * its near-dup COMPONENT (hash of the cluster representative, not
    * of the doc), so a near-duplicate pair can never straddle
    * train/test — the failure mode `split_leakage` audits for is
    * structurally impossible, not just measured-zero. `labels` is the
    * (doc_id, cluster_id) standing labeling
    * ([[graft.operators.Components.nearDupLabelsStaged]] — at 100 TB
    * the stored artifact the dedup flow already maintains); singletons
    * are their own cluster, so the inner join is total. Within-split
    * proportions stay ≈ the weights because component hashes are as
    * uniform as doc hashes (big families skew counts only as far as
    * they skew the corpus itself).
    *
    * Scale shape: one doc_id-keyed equi join against the label
    * artifact (zero-exchange when both sides are bucketed by doc_id,
    * the layout the labeling is stored in) + a row-local md5
    * projection. No new corpus-sized shuffle.
    */
  def splitByComponent(docs: DataFrame, labels: DataFrame,
                       weights: Seq[(String, Int)] =
                         Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame =
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"),
        splitColumn(col("cluster_id"), weights).as("split"))

  /** Epoch-seeded deterministic shuffle order: sort by
    * md5(epoch ":" key). Each epoch is a different but fully
    * reproducible permutation — what multi-epoch training needs
    * (`rand()` orders differ per retry; this one is bit-stable and any
    * engine with md5 reproduces it). At scale the SORT is the product
    * (`repartitionByRange` on the shuffle key when writing epochs);
    * [[epochShuffleRank]] additionally materializes the position via
    * the same TWO-LEVEL rank as [[Packing.packBinsCounted]] (r18 —
    * was a single global `Window.orderBy`, the one declared-query
    * shape that funneled the corpus through one partition): one range
    * shuffle puts rows in (shuffle key, key) order, per-partition row
    * counts get a cumulative offset via a window over the
    * partitions-sized relation, and each row's global rank is its
    * partition offset plus a row_number WITHIN its partition —
    * bit-identical ranks (row_number over a total order commutes with
    * range partitioning on the same order), no data-sized single
    * partition anywhere.
    */
  def epochShuffleKey(key: Column, epoch: Int): Column =
    md5(concat(lit(s"$epoch:"), key.cast("string")))

  def epochShuffleRank(df: DataFrame, keyCol: String, epoch: Int,
                       partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = df
      .select(col(keyCol), epochShuffleKey(col(keyCol), epoch).as("__ek"))
      .repartitionByRange(partitions, col("__ek"), col(keyCol))
      .sortWithinPartitions(col("__ek"), col(keyCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val offsets = parts.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pn"))
      .withColumn("__off",
        coalesce(sum(col("__pn")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pn")
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(col("__ek"), col(keyCol))
    parts.join(broadcast(offsets), "__pid")
      .select(col(keyCol),
        (col("__off") + row_number().over(wLocal)).as("shuffle_rank"))
  }

  /** Deterministic exact-N uniform sample: order by md5(key), take N.
    * The plan is a TakeOrderedAndProject — each partition keeps its
    * local top-N by hash and the driver merges partition heads — never
    * a global sort, so "give me exactly 200k uniformly sampled docs
    * from 100 TB" costs one scan plus an N-row merge. Because the
    * order key is a content hash, the prefix of the hash order IS a
    * uniform sample, and the same N rows come back on every run and
    * every engine (the DuckDB oracle recomputes the identical set).
    */
  def uniformSampleN(df: DataFrame, keyCol: String, n: Int): DataFrame =
    df.withColumn("sample_key", md5(col(keyCol).cast("string")))
      .orderBy(col("sample_key"))
      .limit(n)

  /** Exactly-n-PER-GROUP uniform sample (balanced eval sets, per-class
    * calibration sets): within each group, the n rows with the
    * smallest md5(key) — same hash-prefix-is-a-uniform-sample argument
    * as [[uniformSampleN]], same determinism (any engine reproduces
    * the exact row set from md5 alone). Groups smaller than n keep all
    * their rows.
    *
    * Scale shape: a rank window PARTITION BY group ORDER BY hash —
    * Spark's rank-limit pushdown (WindowGroupLimit) prunes every map
    * partition to its local top-n per group BEFORE the exchange, so
    * the shuffle carries ~n rows per (partition, group), never the
    * corpus. No global sort, no driver action.
    */
  def uniformSampleNPerGroup(df: DataFrame, groupCol: String,
                             keyCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Token/char-budget mixture sampling — the "data mixing" step of a
    * training run: per domain, keep documents until the domain's cost
    * budget (`fraction` × its total cost) is reached, deterministically
    * and reproducibly. The mechanism is hash-threshold sampling at
    * bucket granularity:
    *
    *   1. one small aggregate: cost per (domain, hash-bucket);
    *   2. a window cumsum over that DOMAINS×BUCKETS-row relation picks,
    *      per domain, the set of buckets whose preceding cumulative
    *      cost is still under budget;
    *   3. the corpus keeps a row iff its (domain, bucket) is selected —
    *      a broadcast semi-join, so the corpus is scanned once and
    *      never shuffled.
    *
    * Budget adherence is exact at bucket granularity (±1 bucket ≈
    * 1/`buckets` of a domain); membership is a pure function of the
    * key hash, so retries, repartitioning, and other engines (the
    * oracle) reproduce the exact row set. This is the 100 TB shape:
    * the only window runs over the tiny bucket relation, never the
    * corpus — contrast a per-domain cumsum over documents, which would
    * range-shuffle the corpus into per-domain ordered partitions.
    */
  def mixtureByBudget(df: DataFrame, domainCol: String, keyCol: String,
                      costCol: String, fractions: Map[String, Double],
                      buckets: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0))
    val withB = df.withColumn("__b", hashBucket(col(keyCol), buckets))
    val perBucket = withB.groupBy(col(domainCol), col("__b"))
      .agg(sum(col(costCol)).as("__cost"))
    val cumBefore = Window.partitionBy(col(domainCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val domainTotal = Window.partitionBy(col(domainCol))
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (dom, f)) => when(col(domainCol) === dom, lit(f)).otherwise(acc)
    }
    val kept = perBucket
      .withColumn("__before", coalesce(sum(col("__cost")).over(cumBefore), lit(0L)))
      .withColumn("__total", sum(col("__cost")).over(domainTotal))
      // Same single-rounding comparison on both engines: each side is
      // one int→double cast (exact below 2^53) and one IEEE multiply.
      .filter(col("__before").cast("double") < frac * col("__total").cast("double"))
      .select(col(domainCol), col("__b"))
    withB.join(broadcast(kept), Seq(domainCol, "__b")).drop("__b")
  }

  /** Deterministic negative sampling for contrastive training: each
    * anchor draws `k` negatives as the candidates with the smallest
    * md5(anchor ":" candidate) — a per-anchor-independent uniform draw
    * that any engine reproduces, with `exclude` (typically the
    * near-duplicate pair set) anti-joined out first so a semantic
    * POSITIVE can never be sampled as a negative.
    *
    * Scale shape: anchors broadcast (a training batch, small by
    * nature); the corpus contributes one skinny (anchor, candidate,
    * hash) row per pair, and the per-anchor top-k runs as a
    * WindowGroupLimit — per-partition pruning to k before the
    * exchange, so the shuffle carries ~partitions·anchors·k rows, not
    * anchors·N.
    */
  def negativeSamples(corpus: DataFrame, anchors: DataFrame, k: Int,
                      idCol: String = "vec_id",
                      exclude: DataFrame = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = broadcast(anchors.select(col(idCol).as("anchor_id")))
    val base = corpus.select(col(idCol).as("candidate_id"))
      .crossJoin(a)
      .filter(col("candidate_id") =!= col("anchor_id"))
    val eligible = if (exclude == null) base else {
      // exclude is an unordered pair set (id_a < id_b); anti-join both
      // orientations via the normalized key
      val ex = broadcast(exclude.select(
        least(col("id_a"), col("id_b")).as("__lo"),
        greatest(col("id_a"), col("id_b")).as("__hi")))
      base.join(ex,
        least(col("anchor_id"), col("candidate_id")) === col("__lo") &&
          greatest(col("anchor_id"), col("candidate_id")) === col("__hi"),
        "left_anti")
    }
    val key = md5(concat(col("anchor_id").cast("string"), lit(":"),
      col("candidate_id").cast("string")))
    val w = Window.partitionBy(col("anchor_id")).orderBy(key)
    eligible
      .withColumn("sample_key", key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("anchor_id"), col("candidate_id"),
        col("__rn").cast("long").as("rank"))
      .orderBy(col("anchor_id"), col("rank"))
  }

  /** Deterministic stratified sample: keep a row iff its hash bucket
    * falls under its stratum's fraction. Strata missing from
    * `fractions` are dropped (fraction 0). One codegen'd filter —
    * the 100 TB path for building fixed-mix training subsets.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fractions: Map[String, Double],
                       buckets: Int = 100): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0))
    val thresh = fractions.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (k, f)) => when(col(stratumCol) === k, lit(f * buckets)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), buckets) < thresh)
  }

  /** [[mixtureByBudget]] with the per-domain fractions supplied as a
    * RELATION (domain, target_frac) instead of a literal map — the
    * entry point that applies a COMPUTED recipe (e.g.
    * [[mixtureTemperature]]'s weight table). Same deterministic
    * md5-bucket cumsum, same single-rounding comparison; the weight
    * relation broadcasts (domain-sized).
    */
  def mixtureByBudgetWeighted(df: DataFrame, domainCol: String,
                              keyCol: String, costCol: String,
                              weights: DataFrame,
                              buckets: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = df.withColumn("__b", hashBucket(col(keyCol), buckets))
    val perBucket = withB.groupBy(col(domainCol), col("__b"))
      .agg(sum(col(costCol)).as("__cost"))
    val cumBefore = Window.partitionBy(col(domainCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val domainTotal = Window.partitionBy(col(domainCol))
    val kept = perBucket
      .join(broadcast(weights), domainCol)
      .withColumn("__before", coalesce(sum(col("__cost")).over(cumBefore), lit(0L)))
      .withColumn("__total", sum(col("__cost")).over(domainTotal))
      .filter(col("__before").cast("double") <
        col("target_frac") * col("__total").cast("double"))
      .select(col(domainCol), col("__b"))
    withB.join(broadcast(kept), Seq(domainCol, "__b")).drop("__b")
  }

  /** Temperature-scaled mixture weights (the multilingual rebalancing
    * rule): target share ∝ available^α with α = ½ — i.e. √-scaled, the
    * τ=2 temperature that lifts low-resource domains without letting
    * the head dominate. α is fixed at ½ ON PURPOSE: sqrt is IEEE
    * correctly-rounded in every engine (pow(x, α) for general α is
    * not), and the per-domain √tokens quantizes to round(√·1e6) longs
    * so the normalizing sum is order-free integer arithmetic — the
    * whole weight table is bit-reproducible. One aggregate over the
    * corpus, then arithmetic on the domain-sized relation.
    */
  def mixtureTemperature(docs: DataFrame, domainCol: String,
                         budgetTokens: Long): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    val perDomain = docs
      .select(col(domainCol).as("domain"),
        size(tokens(col("text"))).cast("long").as("__nt"))
      .groupBy(col("domain")).agg(sum(col("__nt")).as("available_tokens"))
      .withColumn("__wq",
        round(sqrt(col("available_tokens").cast("double")) * 1e6d)
          .cast("long"))
    // the normalizer runs over the domain-sized relation (a handful of
    // rows) — the same bounded single-partition trade every vocab/
    // checkpoint aggregate makes
    perDomain
      .withColumn("__tot", sum(col("__wq")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("domain"), col("available_tokens"),
        (col("__wq").cast("double") / col("__tot").cast("double"))
          .as("target_frac"))
      .withColumn("target_tokens",
        round(col("target_frac") * budgetTokens).cast("long"))
      .withColumn("repeat_factor",
        col("target_tokens").cast("double") /
          col("available_tokens").cast("double"))
      .orderBy(col("domain"))
  }

  /** Repeat-factor mixture planner — the data-recipe report a
    * multi-epoch training run is configured from: given per-domain
    * target fractions of a global token budget, each domain's
    * available tokens, its target share, the repeat factor
    * (target/available — >1 means the domain up-samples across
    * epochs, <1 down-samples), and the whole-epoch count that
    * covers it. One map-side-combined aggregate plus row-local
    * arithmetic; single-rounding double ops so the oracle reproduces
    * every value bit-for-bit.
    */
  def mixturePlan(docs: DataFrame, domainCol: String,
                  fractions: Map[String, Double],
                  budgetTokens: Long): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (dom, f)) => when(col("domain") === dom, lit(f)).otherwise(acc)
    }
    docs
      .select(col(domainCol).as("domain"),
        size(tokens(col("text"))).cast("long").as("__nt"))
      .groupBy(col("domain")).agg(sum(col("__nt")).as("available_tokens"))
      .withColumn("target_tokens",
        round(frac * budgetTokens).cast("long"))
      .filter(col("target_tokens").isNotNull)
      .withColumn("repeat_factor",
        col("target_tokens").cast("double") /
          col("available_tokens").cast("double"))
      .withColumn("n_epochs", ceil(col("repeat_factor")).cast("long"))
      .orderBy(col("domain"))
  }
}

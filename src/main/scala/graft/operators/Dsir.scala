package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
  * — the counts-based pretraining-data selector: score every source
  * document by how much more likely its hashed n-gram features are
  * under a TARGET domain's bag-of-ngrams model than under the raw
  * source model, then keep the top of the importance ranking.
  *
  * Model: unigram + bigram word features hashed into `buckets` slots
  * (the paper's hashed n-gram generative model); add-1 smoothed
  * occurrence models p_target / p_source over the slots; a doc's log
  * importance weight is Σ_f [ln p_t(f) − ln p_s(f)] over its feature
  * OCCURRENCES.
  *
  * Exactness contract: every ln argument is an INTEGER (count+1,
  * total+buckets), so each ln quantizes independently to
  * round(ln·1e12) longs — the per-ln discipline [[TextAnalysis
  * .lmDocScoresByLang]] uses — and the per-doc sum of integer terms is
  * order-free and engine-portable; ONE double division at the end.
  * The hash is the md5 bucket idiom ([[Sampling.hashBucket]]), the
  * only engine-portable hash.
  *
  * Scale shape: both models are `buckets`-sized relations built by one
  * map-side-combined groupBy each and BROADCAST into the scoring join;
  * the only data-sized exchange is the skinny (doc_id, bucket) feature
  * stream's final groupBy(doc_id). The corpus text never shuffles.
  */
object Dsir {

  /** Unigram + bigram feature occurrences per doc: (doc_id, feat).
    * Multiplicity-preserving (a generative model counts occurrences);
    * docs under one token emit their unigrams only, empty docs none.
    */
  private def features(docs: DataFrame): DataFrame =
    Par.widen(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(concat(
        col("toks"),
        when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ",
              element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .otherwise(array()))).as("feat"))

  /** round(ln(n)·1e12) as a long — n must be an integer-valued column
    * (the measured flip-free quantization domain).
    */
  private def lnq(n: Column): Column =
    round(log(n.cast("double")) * 1e12d).cast("long")

  /** Per-source-doc importance weights against `target`'s hashed
    * n-gram model: (doc_id, lang, n_features, logw_q_sum, log_weight).
    * Docs with no features score 0 (vacuous — neither model prefers
    * them).
    */
  /** [[importanceWeights]] when the target is a FILTER of the source
    * corpus (the standard DSIR setup: target = the in-domain slice of
    * the crawl): the target bucket model derives from the SAME pinned
    * feature stream via a doc-keyed semi-join on the target ids — one
    * feature pass (tokenize + bigram assembly + md5) total instead of
    * two. `features` is row-local, so
    * features(source.filter(p)) ≡ features(source) restricted to p's
    * doc set — bit-identical counts, oracle hash re-proved.
    */
  def importanceWeightsFiltered(source: DataFrame,
                                targetPred: Column,
                                buckets: Int = 4096): DataFrame = {
    val fs = features(source)
      .select(col("doc_id"), Sampling.hashBucket(col("feat"), buckets).as("b"))
      .localCheckpoint()
    val ft = fs.join(source.filter(targetPred).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    importanceWeightsFrom(source, fs, ft, buckets)
  }

  def importanceWeights(source: DataFrame, target: DataFrame,
                        buckets: Int = 4096): DataFrame = {
    // localCheckpoint (r18): fs feeds BOTH the source bucket model and
    // the per-doc scoring join — unpinned, the full source feature
    // pass (tokenize + bigram assembly + md5 per occurrence, the
    // dominant cost) re-ran per consumer; dsir_weights measured
    // 4.06 s/rep with the rebuild vs 1.9 s pinned. Per-invocation pin
    // of a skinny (doc_id, bucket) relation — plan-shape
    // materialization inside the timed region, not cross-run caching.
    val fs = features(source)
      .select(col("doc_id"), Sampling.hashBucket(col("feat"), buckets).as("b"))
      .localCheckpoint()
    val ft = features(target)
      .select(Sampling.hashBucket(col("feat"), buckets).as("b"))
    importanceWeightsFrom(source, fs, ft, buckets)
  }

  /** Core scoring over already-built feature streams: `fs` the pinned
    * source stream (doc_id, b), `ft` the target stream (…, b). */
  private def importanceWeightsFrom(source: DataFrame, fs: DataFrame,
                                    ft: DataFrame,
                                    buckets: Int): DataFrame = {
    val ctCounts = ft.groupBy(col("b")).agg(count(lit(1)).as("c_t"))
    val csCounts = fs.groupBy(col("b")).agg(count(lit(1)).as("c_s"))
    val totals = ctCounts.agg(sum(col("c_t")).as("t_total")).crossJoin(
      csCounts.agg(sum(col("c_s")).as("s_total")))
    val termQ = lnq(coalesce(col("c_t"), lit(0L)) + 1) -
      lnq(col("t_total") + buckets) -
      lnq(col("c_s") + 1) +
      lnq(col("s_total") + buckets)
    val perDoc = fs
      .join(broadcast(ctCounts), Seq("b"), "left")
      .join(broadcast(csCounts), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), termQ.as("t_q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_features"), sum(col("t_q")).as("logw_q_sum"))
    source.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("logw_q_sum"), lit(0L)).as("logw_q_sum"),
        (coalesce(col("logw_q_sum"), lit(0L)).cast("double") / 1e12d)
          .as("log_weight"))
  }

  // --- Staged weights ---------------------------------------------------
  //
  // The weight relation is the DSIR artifact a 100 TB deployment
  // stores: weights are computed ONCE per (source, target, buckets)
  // and every selector (argmax, Gumbel draw, per-lang quotas) reads
  // the stored relation — recomputing the two bucket models plus the
  // full feature stream per consumer triples the dominant cost. Same
  // staging discipline as the minhash pair sets (Dedup
  // .minhashPairsStaged) and the persisted LM counts (tables/LmModel),
  // via the shared [[Stage]] memo (session + key + input-plan
  // fingerprint, lazy localCheckpoint).

  /** [[importanceWeights]], staged per (session, `key`, source/target
    * plan fingerprint, buckets) — see [[Stage.relation]] for the key
    * and lifetime contract.
    */
  def importanceWeightsStaged(source: DataFrame, target: DataFrame,
                              key: String, buckets: Int = 4096): DataFrame =
    Stage.relation(s"dsir|$key|$buckets", Seq(source, target))(
      importanceWeights(source, target, buckets))

  /** Deterministic importance selection: the top-`n` source docs by
    * (importance desc, doc_id) — the temperature-0 variant of the
    * paper's Gumbel resampling (the stochastic draw adds per-doc
    * Gumbel noise to the same log-weights; the argmax path keeps the
    * ranking engine-exact). Plans to TakeOrderedAndProject — no
    * global sort at any corpus size.
    */
  def selectFrom(weights: DataFrame, n: Int): DataFrame =
    weights
      .orderBy(col("logw_q_sum").desc, col("doc_id"))
      .limit(n)

  def select(source: DataFrame, target: DataFrame, n: Int,
             buckets: Int = 4096): DataFrame =
    selectFrom(importanceWeights(source, target, buckets), n)

  /** The paper's STOCHASTIC draw, engine-exact: Gumbel-top-k sampling
    * without replacement ∝ exp(log_weight) — key_i = log w_i + G_i
    * with G_i = −ln(−ln(u_i)) and u_i the md5-derived uniform
    * (h+0.5)/2^32 (a dyadic rational + exact constant division: both
    * engines compute the identical double). The Gumbel itself is two
    * nested transcendentals on an arbitrary double — a few ulps of
    * cross-engine drift — so the SORT KEY quantizes to
    * round(key·1e6) longs (drift ~5e-15 against a 1e-6 quantum ⇒ a
    * flip is a ~1e-8-per-doc event) with doc_id breaking quantized
    * ties deterministically. Top-n by (key_q desc, doc_id) is a
    * TakeOrderedAndProject like the argmax path.
    */
  def gumbelResampleFrom(weights: DataFrame, n: Int): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (h.cast("double") + 0.5d) / 4294967296.0d
    val gumbel = -log(-log(u))
    weights
      .select(col("doc_id"), col("lang"), col("logw_q_sum"),
        round((col("log_weight") + gumbel) * 1e6d).cast("long").as("key_q"))
      .orderBy(col("key_q").desc, col("doc_id"))
      .limit(n)
  }

  def gumbelResample(source: DataFrame, target: DataFrame, n: Int,
                     buckets: Int = 4096): DataFrame =
    gumbelResampleFrom(importanceWeights(source, target, buckets), n)
}

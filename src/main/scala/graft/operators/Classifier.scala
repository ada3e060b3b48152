package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Hashed-feature linear quality classifier — the "train a cheap
  * model on provenance labels, score the whole crawl" pattern of
  * GPT-3's WebText-vs-CommonCrawl logistic filter (Brown et al. 2020
  * §A) and CCNet/fastText-style quality models, as distributed
  * dataflow: a multinomial Naive Bayes over hashed unigram buckets.
  *
  * Why NB and not SGD: training IS one aggregation — per-bucket class
  * counts — so the model falls out of a single groupBy over the
  * labeled set (map-side partial counts, a buckets-sized shuffle) with
  * no iterative driver loop, and scoring is a broadcast join plus one
  * per-doc sum. Both halves are the cheapest shapes Spark has; at
  * 100 TB the model relation (≤ `buckets` rows) broadcasts like any
  * other vocabulary-sized artifact.
  *
  * Cross-engine float discipline (verify-skill rule): every log term
  * is quantized to round(ln·1e12) LONGS at the leaves — ln of
  * INTEGER-domain smoothed counts only — summed in the integer
  * domain, and cast to double exactly once at the end. Scores are
  * bit-identical on any engine that can take ln of an integer.
  *
  * Feature hashing is the md5 bucket idiom ([[Sampling.hashBucket]]),
  * the engine-portable hash (xxhash64 never appears in an
  * oracle-checked value).
  */
object Classifier {

  /** Quantized log: round(ln(x)·1e12) as a long. `x` must be a
    * positive integer-domain column — the only inputs whose ln both
    * engines agree on after quantization.
    */
  private def qln(x: Column): Column =
    round(log(x.cast("double")) * 1e12d).cast("long")

  /** The hashed feature stream of one document set: unigram buckets
    * in [0, buckets); with `bigrams`, word-bigram buckets in
    * [buckets, 2·buckets) — the GPT-3-style filter hashes word
    * n-grams, not unigrams alone, and the disjoint offset keeps the
    * two families from colliding (doubled bucket space, same
    * md5-bucket idiom). Output: (`keyName`, b). Row-local explode —
    * feature strings never shuffle.
    */
  private def featureBuckets(df: DataFrame, key: Column, keyName: String,
                             textCol: String, buckets: Int,
                             bigrams: Boolean): DataFrame = {
    val uni = df
      .select(key.as(keyName), explode(tokens(col(textCol))).as("w"))
      .select(col(keyName), Sampling.hashBucket(col("w"), buckets).as("b"))
    if (!bigrams) uni
    else uni.unionByName(df
      .select(key.as(keyName), explode(graft.functions.WordNgrams
        .word_ngrams(col(textCol), 2)).as("w"))
      .select(col(keyName),
        (Sampling.hashBucket(col("w"), buckets) + buckets).as("b")))
  }

  /** Train: per-bucket class counts over the hashed feature stream of
    * the labeled set. `labelCol` is boolean (true = positive /
    * curated / high-quality); `bigrams` adds the word-bigram bucket
    * family ([[featureBuckets]]). Output: (b, c_pos, c_neg) — at most
    * `buckets` (2·`buckets` with bigrams) rows, the broadcastable
    * model relation. One explode + one buckets-keyed groupBy (partial
    * counts before the exchange); token strings never shuffle, only
    * (bucket, partial counts).
    */
  /** ONE-PASS hashed feature stream (r18): (keys…, b) from a single
    * projection — with `bigrams`, the unigram and bigram bucket
    * arrays concatenate row-locally and explode ONCE, where
    * [[featureBuckets]]'s union shape scanned and tokenized the text
    * twice. Bucket values are identical (same md5 idiom, same
    * disjoint offset); only row order differs, and every consumer
    * aggregates.
    */
  private def featureStreamKeyed(df: DataFrame, keys: Seq[Column],
                                 textCol: String, buckets: Int,
                                 bigrams: Boolean): DataFrame = {
    val uniB = transform(tokens(col(textCol)),
      w => Sampling.hashBucket(w, buckets))
    val allB =
      if (!bigrams) uniB
      else concat(uniB,
        transform(graft.functions.WordNgrams.word_ngrams(col(textCol), 2),
          w => Sampling.hashBucket(w, buckets) + buckets))
    // Par.widen (r18): the md5-per-token pass must not serialize on a
    // single-file scan.
    Par.widen(df, col("doc_id")).select(keys :+ explode(allB).as("b"): _*)
  }

  /** Train + score in ONE feature pass (r18): the model's per-bucket
    * class counts and the corpus scoring sums read the SAME hashed
    * feature stream — `labeled` IS the corpus with its label column,
    * so [[nbTrain]] + [[nbScore]] tokenized and md5-hashed every
    * token twice for one number. The stream pins per invocation
    * (skinny (doc_id, label, bucket) rows); model and term sums are
    * aggregations of the pinned relation. Output ≡
    * `nbScore(labeled, nbTrain(labeled, …), labeled, …)` row for row
    * (oracle hash re-proved on every consumer query).
    */
  def nbScoreSelfTrained(labeled: DataFrame, buckets: Int = 512,
                         textCol: String = "text",
                         labelCol: String = "label",
                         bigrams: Boolean = false): DataFrame = {
    val feats = featureStreamKeyed(labeled,
        Seq(col("doc_id"), col(labelCol).as("__y")), textCol, buckets,
        bigrams)
      .localCheckpoint()
    val model = feats.groupBy(col("b"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("c_neg"))
    val b = if (bigrams) 2L * buckets else buckets.toLong
    val totals = model.agg(
      sum(col("c_pos")).as("__tp"), sum(col("c_neg")).as("__tn"))
    val priors = labeled.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("__nn"))
    val termSums = feats
      .join(broadcast(model), Seq("b"), "left")
      .select(col("doc_id"),
        (qln(coalesce(col("c_pos"), lit(0L)) + 1L) -
          qln(coalesce(col("c_neg"), lit(0L)) + 1L)).as("wq"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wq")).as("__sw"))
    labeled.select(col("doc_id"), col("lang"))
      .join(termSums, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        (coalesce(col("__sw"), lit(0L))
          - coalesce(col("n_toks"), lit(0L))
            * (qln(col("__tp") + b) - qln(col("__tn") + b))
          + qln(col("__np")) - qln(col("__nn"))).as("__sq"))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        (col("__sq").cast("double") / 1e12d).as("score"),
        (col("__sq") > 0L).as("pred_hq"))
      .orderBy(col("doc_id"))
  }

  def nbTrain(labeled: DataFrame, buckets: Int = 512,
              textCol: String = "text",
              labelCol: String = "label",
              bigrams: Boolean = false): DataFrame =
    featureBuckets(labeled, col(labelCol), "__y", textCol, buckets, bigrams)
      .groupBy(col("b"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("c_neg"))

  /** Score every doc by the NB log-odds of the positive class under
    * the trained `model` (a [[nbTrain]] relation), with add-1
    * smoothing:
    *
    *   score = Σ_tokens [Qln(c_pos(b)+1) − Qln(c_neg(b)+1)]
    *         − n_toks·[Qln(totPos+B) − Qln(totNeg+B)]
    *         + Qln(nPosDocs) − Qln(nNegDocs)
    *
    * all in quantized-long space, ÷1e12 to double once at the end.
    * Unseen buckets contribute Qln(1)−Qln(1) = 0 through the left
    * join's coalesce. `priors` is the labeled set itself (doc-level
    * class counts); totals derive from the model — both 1-row
    * relations riding in as broadcast crosses.
    *
    * Scale shape: corpus explodes row-locally, joins the BROADCAST
    * model on bucket, and partially aggregates (doc_id, Σwq) before
    * the one doc-keyed exchange. Docs with zero tokens score the
    * prior alone (left join back onto the corpus).
    */
  def nbScore(docs: DataFrame, model: DataFrame, labeled: DataFrame,
              buckets: Int = 512, textCol: String = "text",
              labelCol: String = "label",
              bigrams: Boolean = false): DataFrame = {
    // add-1 smoothing runs over the FEATURE SPACE size — doubled when
    // the bigram bucket family is on
    val b = if (bigrams) 2L * buckets else buckets.toLong
    val totals = model.agg(
      sum(col("c_pos")).as("__tp"), sum(col("c_neg")).as("__tn"))
    val priors = labeled.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("__nn"))
    val termSums = featureBuckets(docs, col("doc_id"), "doc_id",
        textCol, buckets, bigrams)
      .join(broadcast(model), Seq("b"), "left")
      .select(col("doc_id"),
        (qln(coalesce(col("c_pos"), lit(0L)) + 1L) -
          qln(coalesce(col("c_neg"), lit(0L)) + 1L)).as("wq"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wq")).as("__sw"))
    docs.select(col("doc_id"), col("lang"))
      .join(termSums, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        (coalesce(col("__sw"), lit(0L))
          - coalesce(col("n_toks"), lit(0L))
            * (qln(col("__tp") + b) - qln(col("__tn") + b))
          + qln(col("__np")) - qln(col("__nn"))).as("__sq"))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        (col("__sq").cast("double") / 1e12d).as("score"),
        (col("__sq") > 0L).as("pred_hq"))
      .orderBy(col("doc_id"))
  }

  /** Exact tie-corrected ROC-AUC of a scored+labeled relation — the
    * Mann-Whitney U statistic, the threshold-free answer to "is the
    * cheap quality model actually ranking curated above crawled?".
    * A classifier gate ships behind this number; accuracy at one
    * threshold hides a miscalibrated ranker.
    *
    * Exactness: AUC = (2·Σ_g p_g·negBelow_g + Σ_g p_g·n_g) / (2·P·N)
    * over per-DISTINCT-SCORE groups g — the numerator counts
    * (pos, neg) pairs ranked correctly twice plus ties once, all in
    * integer space (DECIMAL(38,0) accumulation so 2·P·N past 2^63
    * can't wrap), with ONE double division at the end. No sampling,
    * no trapezoid approximation.
    *
    * Scale shape: the corpus reduces to one row per DISTINCT score
    * before any ordering; the strictly-below negative count uses the
    * same two-level prefix sum as [[Packing.packBinsCounted]] (range
    * repartition → local cumsum + partition offsets), so no global
    * single-partition window ever sees a data-sized relation.
    */
  def rocAuc(scored: DataFrame, labelCol: String = "label",
             scoreCol: String = "score", partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p"),
        sum(when(!col(labelCol), 1L).otherwise(0L)).as("n"))
    // localCheckpoint (r17): `parts` feeds both the per-partition
    // offset aggregate and the ranked join below; unsealed, the entire
    // upstream scoring chain (tokenize + feature-bucket + model join)
    // re-ran per reference — nb_auc's plan scanned documents 8×. The
    // relation is distinct-score-sized, tiny at any corpus scale.
    val parts = g.repartitionByRange(partitions, col("s"))
      .sortWithinPartitions(col("s"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // Level 1: one row per partition — the only global window input.
    val offsets = parts.groupBy(col("__pid"))
      .agg(sum(col("n")).as("__pt"))
      .withColumn("__off",
        coalesce(sum(col("__pt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pt")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts.join(broadcast(offsets), "__pid")
      .select(col("p"), col("n"),
        (col("__off") + coalesce(sum(col("n")).over(wLocal), lit(0L))).as("nb"))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        // Widen BEFORE the multiply: p·nb·2 in LongType wraps silently
        // (ANSI off) when one distinct score concentrates mass at
        // 100 TB scale; decimal(38,0) operands keep every per-group
        // term exact, not just the accumulation.
        sum(col("p").cast("decimal(38,0)") * col("nb") * 2L +
          col("p").cast("decimal(38,0)") * col("n")).as("__u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("__u2").cast("double") /
            (lit(2.0d) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"))
  }

  /** Reliability table over unit-width score bins (clamped to
    * [−16, 16] so pathological outliers can't mint unbounded group
    * keys): per bin, doc count, positive count, the observed positive
    * rate, and the bin's actual score extremes. The calibration
    * companion to [[rocAuc]] — AUC says the RANKING works; this says
    * whether the SCORE VALUES mean anything (a monotone pos_rate
    * column is what a thresholded production gate assumes).
    *
    * Scale shape: one groupBy on a clamped integer key — ≤ 33 groups
    * regardless of corpus size; min/max are order-independent so the
    * doubles are deterministic (no float SUM ever crosses a shuffle).
    */
  def calibrationBins(scored: DataFrame, labelCol: String = "label",
                      scoreCol: String = "score"): DataFrame =
    scored.groupBy(
        greatest(lit(-16L), least(lit(16L),
          floor(col(scoreCol)).cast("long"))).as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        min(col(scoreCol)).as("min_score"),
        max(col(scoreCol)).as("max_score"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs").cast("double")).as("pos_rate"),
        col("min_score"), col("max_score"))
      .orderBy(col("bin"))
}

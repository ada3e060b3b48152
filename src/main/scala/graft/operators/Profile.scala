package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for data-quality monitoring: per column the row
  * count, null count, distinct count, and min/max — the health check a
  * pipeline runs on every ingest batch before anything trains on it.
  *
  * Two variants with the same output shape:
  *  - [[profileExact]]: exact distincts via `count(DISTINCT c)`. With
  *    k profiled columns Catalyst plans one Expand (k× row
  *    amplification before partial aggregation) — fine for dimension
  *    tables and ingest batches, and it is the DuckDB-mirrorable
  *    oracle twin.
  *  - [[profileApprox]]: HLL sketches (`approx_count_distinct`), one
  *    flat pass, NO Expand — the 100 TB fact-table path; everything
  *    except n_distinct is still exact.
  *
  * min/max surface as strings so one relation profiles heterogeneous
  * columns; keep float columns out of oracle-pinned profiles (engine
  * float→string formatting differs).
  */
object Profile {

  private def shape(df: DataFrame, cols: Seq[String],
                    distinct: String => org.apache.spark.sql.Column,
                    splitDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    val one =
      if (splitDistinct) {
        // r17 (exact profile): EXACT multi-distinct plans via Expand
        // (one input replica per distinct column), and a string
        // min/max riding in the SAME Aggregate forces the whole
        // expanded stream through sort-based aggregation (var-length
        // buffer → SortAggregate over cols+1 × n rows). Split: the
        // distinct counts keep the Expand but aggregate with a
        // fixed-size count buffer (hash, no sort); count/min/max run
        // as one global partial agg with NO Expand; a 1-row broadcast
        // cross reassembles. 1.93 s → see OPTIMIZATION_r17.md.
        val distincts = cols.map(c => distinct(c).as(s"__nd_$c"))
        val stats = cols.flatMap(c => Seq(
          count(col(c)).as(s"__cnt_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))) :+
          count(lit(1)).as("__n")
        df.agg(distincts.head, distincts.tail: _*)
          .crossJoin(broadcast(df.agg(stats.head, stats.tail: _*)))
      } else {
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"__cnt_$c"),
          distinct(c).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))) :+
          count(lit(1)).as("__n")
        df.agg(aggs.head, aggs.tail: _*)
      }
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }

  def profileExact(df: DataFrame, cols: Seq[String]): DataFrame =
    shape(df, cols, c => countDistinct(col(c)), splitDistinct = true)

  /** Per-(label, dimension) mean of an embedding column — the feature
    * drift monitor a training pipeline runs per source/label shard.
    *
    * Cross-engine float discipline: each component is quantized to an
    * exact integer (round(x·1e7) — float→double is exact, both
    * engines round half-away-from-zero) and summed in the INTEGER
    * domain, so the group sum is order-independent and hash-exact;
    * the mean is a single double division at the end. Summing the raw
    * floats/doubles instead would make the result depend on shuffle
    * arrival order.
    *
    * Scale shape: posexplode is row-local; the shuffle carries one
    * partial (label, dim) pair per map partition after partial
    * aggregation — G·D rows per partition, independent of corpus
    * size; output is G·D rows.
    */
  def embeddingGroupStats(emb: DataFrame, quantScale: Double = 1e7): DataFrame =
    emb.filter(col("embedding").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * lit(quantScale)).cast("long").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("q")).as("sum_q"))
      .select(col("label"), col("dim"), col("n_vectors"), col("sum_q"),
        (col("sum_q").cast("double") /
          (col("n_vectors").cast("double") * lit(quantScale))).as("mean_val"))
      .orderBy(col("label"), col("dim"))

  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    shape(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Attach operational counters to a plan via `observe`: row count,
    * null count of a guarded column, and an exact decimal sum —
    * collected DURING the action by accumulator, so the audit costs
    * ZERO extra passes (contrast a separate `.count()`/agg, which
    * rescans the input; at 100 TB the difference is the whole job).
    * Read the metrics from the returned observation after an action
    * ran: `Profile.observed(df, "stage") → (df2, obs)`;
    * `obs.get("n_rows")`.
    */
  /** Embedding covariance diagnostics — the anisotropy report
    * (Ethayarajh 2019: contextual embeddings concentrate in a narrow
    * cone; a dominant diagonal + large off-diagonal mass means cosine
    * similarities are inflated and whitening is warranted). Emits the
    * upper-triangle population covariance per (dim_a ≤ dim_b) over
    * 1e3-quantized components: all moment sums are exact DECIMAL
    * integers (the label_centroid_sim discipline), and the quantum is
    * chosen so the n·Σab − Σa·Σb numerator stays under 2^53 — the
    * int→double cast is then EXACT on every engine (at 1e7 the
    * ~1e20 numerator's cast rounded differently between BigDecimal
    * and HUGEINT paths, a measured 1-ulp drift), and the two-division
    * chain is bit-identical to the oracle's HUGEINT mirror at any
    * partitioning. The statistic is the quantized-domain covariance —
    * exactly defined, with ≤5e-4 component quantization error.
    *
    * Scale shape (r17): zero pre-aggregation shuffles — each vector
    * quantizes row-locally to a dim-ordered (dim, q) array and emits
    * its dim(dim+1)/2 upper-triangle cells inside whole-stage codegen
    * (two nested generates, no vec_id self-join: the old shape
    * shuffled the n·dim component relation twice and sort-merged it
    * into the same n·dim² rows). Partial aggregation shrinks the cell
    * stream to dim² rows per task before the only exchange.
    */
  /** (dim_a ≤ dim_b, n, num_q): the exact integer covariance
    * numerator n·Σab − Σa·Σb per cell — shared by the per-cell
    * report and the anisotropy summary. num_q < 2^53 by the quantum
    * contract, so every downstream cast is exact.
    */
  private def covMoments(emb: DataFrame, quant: Double): DataFrame =
    covMomentsFromArrays(
      emb.filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          transform(col("embedding"), (v, i) =>
            struct(i.cast("int").as("dim"),
              round(v.cast("double") * quant).cast("long").as("q")))
            .as("dq"))
        // the corpus arrives as few large files, so without this the
        // whole dim² cell expansion + aggregation runs on the scan's
        // task count (ONE at bench scale) — spread the skinny arrays
        // first; the expansion below is the expensive part (§2.5).
        .repartition(emb.sparkSession.sparkContext.defaultParallelism))

  /** Upper-triangle cell stream from per-vector dim-ordered (dim, q)
    * arrays: each vector emits (dim_a ≤ dim_b, qa, qb) via two nested
    * row-local generates inside whole-stage codegen — no join, no
    * pre-aggregation exchange. `sa_q` (Σq of dim_a) rides along:
    * sub-2^53 by the same quantum contract, it is the centering term
    * the whitening transform needs.
    */
  private def covMomentsFromArrays(vecs: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    vecs
      // Two generates over the SAME array + an index filter: inside
      // whole-stage codegen this is a nested loop emitting primitive
      // cells straight into the partial aggregate — no array copies
      // (an explode(slice(…)) variant allocates a suffix copy per
      // (vector, dim_a): measured 0.91 s vs 0.76 s for this shape).
      .select(posexplode(col("dq")).as(Seq("__ia", "__a")), col("dq"))
      .select(col("__ia"), col("__a"),
        posexplode(col("dq")).as(Seq("__ib", "__b")))
      // dq is dim-ordered, so __ib ≥ __ia ⇔ dim_b ≥ dim_a — exactly
      // the triangle the old join+filter produced.
      .filter(col("__ib") >= col("__ia"))
      .select(col("__a.dim").as("dim_a"), col("__b.dim").as("dim_b"),
        col("__a.q").as("qa"), col("__b.q").as("qb"))
      .groupBy(col("dim_a"), col("dim_b"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("qa") * col("qb"))).as("__sab"),
        sum(dec(col("qa"))).as("__sa"),
        sum(dec(col("qb"))).as("__sb"))
      .select(col("dim_a"), col("dim_b"), col("n"), (
        // Loud guard on the quantum contract: the DECIMAL→LONG cast
        // below is only exact (and only engine-identical) while
        // |n·Σab − Σa·Σb| < 2^53. Nothing upstream enforces that — a
        // larger corpus or a larger quant would otherwise wrap/null
        // silently under the non-ANSI cast (num ~ n²·quant²·|v|², so
        // at quant=1e3, |v|≤1 the contract holds to n ≈ 9e4 vectors;
        // re-derive the quantum before profiling a bigger corpus).
        {
          val num = dec(col("n")) * col("__sab") - col("__sa") * col("__sb")
          when(abs(num) < lit(9007199254740992L).cast(DecimalType38),
            num.cast("long"))
            .otherwise(raise_error(concat(
              lit("covMoments: numerator exceeds 2^53 at cell ("),
              col("dim_a").cast("string"), lit(","),
              col("dim_b").cast("string"),
              lit(") - shrink the quantum (see quantum contract)"))))
        }).as("num_q"),
        col("__sa").cast("long").as("sa_q"))
  }

  private val DecimalType38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** [[covMoments]] staged per (session, key, corpus fingerprint,
    * quant) — the dim²-sized moment relation is one corpus pass
    * shared by the per-cell report and the anisotropy summary.
    */
  def covMomentsStaged(emb: DataFrame, key: String,
                       quant: Double = 1e3): DataFrame =
    Stage.relation(s"covmom|$key|$quant", Seq(emb))(covMoments(emb, quant))

  def embeddingCovariance(emb: DataFrame, quant: Double = 1e3,
                          stageKey: Option[String] = None): DataFrame =
    momentsOf(emb, quant, stageKey)
      .select(col("dim_a"), col("dim_b"), col("n"),
        (col("num_q").cast("double") /
          (col("n") * col("n")).cast("double") / (quant * quant)).as("cov"))
      .orderBy(col("dim_a"), col("dim_b"))

  private def momentsOf(emb: DataFrame, quant: Double,
                        stageKey: Option[String]): DataFrame =
    stageKey match {
      case Some(k) => covMomentsStaged(emb, k, quant)
      case None => covMoments(emb, quant)
    }

  /** One-row anisotropy summary over the same exact numerators: the
    * diagonal mass (trace), the off-diagonal absolute mass, the worst
    * off-diagonal cell, and their ratio — the "how much whitening
    * would change things" top line. All three masses are INTEGER sums
    * of sub-2^53 cell numerators (int64→f64 conversion is
    * correctly-rounded hardware on both engines, so even the >2^53
    * totals cast identically); the ratio is one double division.
    */
  def embeddingAnisotropy(emb: DataFrame, quant: Double = 1e3,
                          stageKey: Option[String] = None): DataFrame =
    momentsOf(emb, quant, stageKey)
      .agg(count(when(col("dim_a") === col("dim_b"), lit(1))).as("n_dims"),
        sum(when(col("dim_a") === col("dim_b"), col("num_q"))
          .otherwise(lit(0L))).as("trace_q"),
        sum(when(col("dim_a") =!= col("dim_b"), abs(col("num_q")))
          .otherwise(lit(0L))).as("offdiag_abs_q"),
        max(when(col("dim_a") =!= col("dim_b"), abs(col("num_q")))
          .otherwise(lit(0L))).as("max_offdiag_abs_q"))
      .select(col("n_dims"), col("trace_q"), col("offdiag_abs_q"),
        col("max_offdiag_abs_q"),
        when(col("trace_q") > 0,
          col("offdiag_abs_q").cast("double") / col("trace_q").cast("double"))
          .otherwise(lit(0.0)).as("anisotropy_ratio"))

  /** APPLY the whitening the anisotropy rows diagnose (diagonal /
    * per-dimension standardization — the cheap, always-stable member
    * of the whitening family; full ZCA needs the eigenbasis and is
    * the documented next step): per component,
    *
    *   w = (x − μ_d) / σ_d = (n·q − Σq_d) / √num_q(d,d)
    *
    * — the quantum CANCELS, so the transform runs entirely on the
    * exact integer moments ([[covMoments]]' diagonal cells): one
    * integer numerator, one IEEE sqrt, one IEEE division, one
    * round-to-`outQuant` — every step correctly-rounded hardware on
    * both engines, no tolerance anywhere. Output (vec_id, dim, w_q)
    * BIGINT. A zero-variance dimension whitens to 0 by convention.
    *
    * Scale shape: the dim-sized diagonal relation broadcasts; the
    * corpus pays one row-local explode + hash-probe — embeddings
    * never shuffle.
    */
  def embeddingWhiten(emb: DataFrame, quant: Double = 1e3,
                      outQuant: Double = 1e3,
                      stageKey: Option[String] = None): DataFrame = {
    // The component-shaped output keeps the broadcast hash join on
    // dim: it is whole-stage-codegen'd end to end, unlike the
    // array-transform twin below (ArrayTransform is interpreted —
    // measured 1.32 s vs 0.65 s for this row at sf0.1, r17).
    val diag = momentsOf(emb, quant, stageKey)
      .filter(col("dim_a") === col("dim_b"))
      .select(col("dim_a").as("dim"), col("n"), col("num_q"), col("sa_q"))
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        round(col("v").cast("double") * quant).cast("long").as("q"))
      .join(broadcast(diag), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("num_q") > 0,
          round((col("n") * col("q") - col("sa_q")).cast("double") /
            sqrt(col("num_q").cast("double")) * outQuant).cast("long"))
          .otherwise(lit(0L)).as("w_q"))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** (vec_id, __wq array<long>): the whitened integers computed
    * entirely row-locally (r17) — the dim-sized diagonal relation
    * folds to ONE dim-ordered array row, rides in on a broadcast
    * cross, and the transform indexes it per element. Feeds
    * [[embeddingWhitenCheck]]'s after-side moment pass in array form
    * directly: no component explode, no join probe per component, no
    * regroup shuffle (the transform itself runs interpreted, but the
    * check's bottleneck is the dim² moment pass, where array input
    * wins — 3.66 s → 1.04 s measured). Same w_q expression per
    * element as [[embeddingWhiten]], so values are bit-identical.
    */
  private def whitenedArrays(emb: DataFrame, quant: Double,
                             outQuant: Double,
                             stageKey: Option[String]): DataFrame = {
    val diagArr = momentsOf(emb, quant, stageKey)
      .filter(col("dim_a") === col("dim_b"))
      .agg(array_sort(collect_list(struct(col("dim_a").as("dim"),
        col("n").as("n"), col("num_q").as("num_q"), col("sa_q").as("sa_q"))))
        .as("__dg"))
    emb.filter(col("embedding").isNotNull)
      .crossJoin(broadcast(diagArr))
      .select(col("vec_id"),
        transform(col("embedding"), (v, i) => {
          val e = element_at(col("__dg"), i + 1)
          val q = round(v.cast("double") * quant).cast("long")
          when(e.getField("num_q") > 0,
            round((e.getField("n") * q - e.getField("sa_q")).cast("double") /
              sqrt(e.getField("num_q").cast("double")) * outQuant)
              .cast("long"))
            .otherwise(lit(0L))
        }).as("__wq"))
  }

  /** The effect pin: anisotropy ratio BEFORE (raw components) vs
    * AFTER ([[embeddingWhiten]]'s integers fed straight back through
    * the same exact moment pass) — diagonal standardization must
    * strictly shrink off-diagonal mass relative to trace on any
    * corpus whose per-dim variances differ (it equalizes the trace
    * contributions; correlations it leaves for ZCA). One row,
    * integer masses, two double ratios.
    */
  def embeddingWhitenCheck(emb: DataFrame, quant: Double = 1e3,
                           outQuant: Double = 1e3,
                           stageKey: Option[String] = None): DataFrame = {
    def ratio(m: DataFrame) = m
      .agg(count(when(col("dim_a") === col("dim_b"), lit(1))).as("n_dims"),
        sum(when(col("dim_a") === col("dim_b"), col("num_q"))
          .otherwise(lit(0L))).as("trace_q"),
        sum(when(col("dim_a") =!= col("dim_b"), abs(col("num_q")))
          .otherwise(lit(0L))).as("offdiag_abs_q"))
      .select(col("n_dims"),
        when(col("trace_q") > 0,
          col("offdiag_abs_q").cast("double") / col("trace_q").cast("double"))
          .otherwise(lit(0.0)).as("ratio"))
    val before = ratio(momentsOf(emb, quant, stageKey))
      .withColumnRenamed("ratio", "ratio_raw")
    // Whitened integers stay in ARRAY form straight into the moment
    // pass (r17): no component explode, no broadcast-join probe per
    // component, no regroup shuffle — the whitened side costs one
    // row-local transform + the triangle expansion.
    val whitened = whitenedArrays(emb, quant, outQuant, stageKey)
      .select(col("vec_id"),
        transform(col("__wq"), (w, i) =>
          struct(i.cast("int").as("dim"), w.as("q"))).as("dq"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val after = ratio(covMomentsFromArrays(whitened))
      .select(col("ratio").as("ratio_whitened"))
    before.crossJoin(after)
      .select(col("n_dims"), col("ratio_raw"), col("ratio_whitened"),
        (col("ratio_whitened") < col("ratio_raw")).as("whitening_helps"))
  }

  /** Population-stability-index drift monitor between two corpus
    * snapshots — the gate a refresh pipeline runs before swapping in a
    * new crawl (PSI > 0.2 is the conventional "distribution moved,
    * investigate" line). Per bucket of `bucket` (a categorical or
    * pre-bucketed expression): Laplace-smoothed shares q (before) and
    * p (after) over the union bucket set, term = (p−q)·ln(p/q), and
    * the total PSI = Σ term.
    *
    * Cross-engine exactness: shares are single IEEE divisions of exact
    * integer counts; ln goes through the round(ln·1e12) quantization
    * discipline; each term quantizes to a 1e15-scaled long so the
    * TOTAL is an integer sum — order-free, no float accumulation
    * anywhere. `term_q` is emitted raw (BIGINT) and psi as one final
    * division.
    *
    * Scale shape: two partial-agg'd bucket counts, a bucket-keyed full
    * join (bucket-sized), a 1-row totals aggregate riding back as a
    * broadcast cross, and one window over the bucket-sized relation —
    * the corpus is scanned once per snapshot and never shuffled.
    */
  def driftPsi(before: DataFrame, after: DataFrame,
               bucket: org.apache.spark.sql.Column): DataFrame = {
    val b = before.select(bucket.cast("string").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_before"))
    val a = after.select(bucket.cast("string").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_after"))
    val j = b.join(a, Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
    val tot = j.agg(sum(col("n_before")).as("__tb"),
      sum(col("n_after")).as("__ta"), count(lit(1)).as("__k"))
    val q = (col("n_before") + 1).cast("double") /
      (col("__tb") + col("__k")).cast("double")
    val p = (col("n_after") + 1).cast("double") /
      (col("__ta") + col("__k")).cast("double")
    val lnq = round(log(p / q) * 1e12).cast("long")
    val termQ = round((p - q) * (lnq.cast("double") / 1e12) * 1e15).cast("long")
    // unpartitioned window over the BUCKET-sized relation only (tiny
    // by construction — same pattern as daily_growth's 30-row window)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    j.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_before"), col("n_after"),
        q.as("q"), p.as("p"), termQ.as("term_q"))
      .withColumn("psi", sum(col("term_q")).over(w).cast("double") / 1e15)
      .orderBy(col("bucket"))
  }

  def observed(df: DataFrame, name: String, guardCol: String,
               sumCol: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val out = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(guardCol).isNull, 1L).otherwise(0L)).as("n_null_guard"),
      sum(col(sumCol).cast(org.apache.spark.sql.types.DecimalType(12, 2)))
        .cast(org.apache.spark.sql.types.DecimalType(28, 2))
        .cast("double").as("sum_value"))
    (out, obs)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation / join / window analytics. The reference itself has no
  * SQL aggregations (SURVEY §2.5 — Postgres supplied them on demand);
  * these are the engine-side analytics a consumer of the same data
  * runs, expressed as declarative plans so Catalyst gives partial
  * (map-side) aggregation, pushed filters, and AQE-planned joins.
  *
  * Determinism convention for the DuckDB oracle: monetary/float sums
  * are computed in exact DECIMAL and only cast to DOUBLE at the end,
  * so Spark's and DuckDB's different summation orders cannot diverge
  * in the last ulp. Averages are `CAST(decimal_sum AS DOUBLE) / count`
  * on both sides for the same reason.
  */
object Analytics {

  /** Exact-decimal views of a double column (money / quantity).
    * Widths are deliberately small (12,2 / 6,4) so that chained
    * products never exceed precision 38 — Spark and DuckDB apply
    * *different* scale-truncation rules on decimal overflow, which
    * would re-introduce the float divergence this scheme exists to
    * kill.
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(6, 4))
  /** `1 ± x` with a narrow integer-literal decimal — a plain `lit(1)`
    * promotes to DECIMAL(10,0) and the chained products in sum_charge
    * then exceed precision 38, forcing lossy scale truncation.
    */
  private val one = lit(1).cast(DecimalType(2, 0))
  private def oneMinus(c: Column): Column = one - c
  private def onePlus(c: Column): Column  = one + c
  /** Order-independent exact sum surfaced as double. The sum is first
    * rounded to scale 2: a high-scale decimal (product terms reach
    * scale 10) has an unscaled value beyond 2^53, where DuckDB's
    * int128/10^s double conversion double-rounds while the JVM's
    * BigDecimal.doubleValue rounds once — a 1-ulp oracle mismatch. At
    * scale 2 the unscaled value fits a double exactly and both engines
    * produce the identical correctly-rounded result.
    */
  private def dsum(c: Column): Column =
    sum(c).cast(DecimalType(28, 2)).cast("double")

  /** TPC-H Q1-shaped pricing summary over lineitem: one pass, grouped
    * partial aggregation; the ship-date filter pushes to the scan.
    */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame = {
    val ep   = dec2(col("l_extendedprice"))
    val disc = dec4(col("l_discount"))
    val tax  = dec4(col("l_tax"))
    lineitem
      .filter(col("l_shipdate") <= to_timestamp_ntz(lit(shipBefore)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(dec2(col("l_quantity"))).as("sum_qty"),
        dsum(ep).as("sum_base_price"),
        dsum(ep * oneMinus(disc)).as("sum_disc_price"),
        dsum(ep * oneMinus(disc) * onePlus(tax)).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(ep).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec4(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-shaped top revenue orders: filtered dim broadcast into
    * orders⋈lineitem, grouped revenue, top-N. Both date filters push
    * down; the final top-10 is a `TakeOrderedAndProject`, not a global
    * sort.
    */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String, cutoff: String, n: Int): DataFrame = {
    val cut = to_timestamp_ntz(lit(cutoff))
    val c = customer.filter(col("c_mktsegment") === segment)
    val o = orders.filter(col("o_orderdate") < cut)
    val l = lineitem.filter(col("l_shipdate") > cut)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum(dec2(col("l_extendedprice")) * oneMinus(dec4(col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(n)
  }

  /** TPC-H Q14-shaped promo revenue share: the part dimension
    * broadcasts into the filtered lineitem scan; both revenue sums run
    * exact-decimal and the percentage is one double division — the
    * conditional-aggregation-over-a-join shape.
    */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        from: String, until: String): DataFrame = {
    val rev = dec2(col("l_extendedprice")) * oneMinus(dec4(col("l_discount")))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp_ntz(lit(from)) &&
        col("l_shipdate") < to_timestamp_ntz(lit(until)))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(rev).as("total_revenue"),
        dsum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast(DecimalType(2, 0)))).as("promo_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        when(col("total_revenue") > 0,
          lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .otherwise(lit(0.0)).as("promo_pct"))
  }

  /** Hourly event rollup (time-bucketed aggregation over the fact
    * stream — the batch shape of a streaming windowed agg).
    */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n"),
        dsum(dec2(col("value"))).as("sum_value"))
      .orderBy(col("hour"))

  /** Hopping (sliding) window rollup — the batch shape of a streaming
    * `window(ts, dur, slide)` aggregation: every event lands in
    * `dur/slide` overlapping windows (4 for 1h/15m). Spark plans the
    * fan-out as a row-local Expand feeding a partial-aggregated hash
    * aggregate, so the shuffle carries one row per (window, partition),
    * not `dur/slide`× the event count — the same plan shape a 100 TB
    * hourly/15-min SLA dashboard needs. Window starts are epoch-aligned
    * (identical in Spark and the oracle's floor-arithmetic mirror).
    */
  def hoppingCounts(events: DataFrame, windowDur: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur, slide).as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(dec2(col("value"))).as("sum_value"))
      .select(col("w.start").as("window_start"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"))

  /** Tie-aware top-k cut over a sketch's over-fetched output. The
    * sketch's choice among items TIED at the fetch boundary is
    * arbitrary, so the deterministic (count desc, key) re-rank is only
    * trustworthy when the k-th count strictly exceeds the boundary
    * count (no excluded item could displace the top k). Inspecting
    * that takes one bounded driver action over the ≤`fetch`-row sketch
    * output — not a corpus collect — and when the boundary IS
    * ambiguous we fall back to the exact GROUP BY instead of betting
    * on `fetch` out-running every possible tie.
    *
    * EAGERNESS: that probe runs while the query DataFrame is being
    * CONSTRUCTED — building [[heavyHitters]] triggers a Spark job even
    * if the result is never consumed, a deliberate break from the
    * queries map's usual laziness. Fine for Verify/Bench (which time
    * construction + execution together); callers that need a lazy
    * plan should use the exact path directly.
    */
  private def certainTopK(sketchTopK: DataFrame, k: Int, fetch: Int)
                         (exact: => DataFrame): DataFrame = {
    val fetched = sketchTopK.collect() // ordered (count desc, key), ≤ fetch rows
    val certain = fetched.length < fetch ||  // sketch returned everything
      (fetched.length >= k && fetched(k - 1).getLong(1) > fetched.last.getLong(1))
    if (certain) {
      import scala.jdk.CollectionConverters._
      sketchTopK.sparkSession.createDataFrame(
        fetched.take(k).toSeq.asJava, sketchTopK.schema)
    } else exact
  }

  private def exactTopK(events: DataFrame, keyCol: String, k: Int): DataFrame =
    events.groupBy(col(keyCol)).agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col(keyCol))
      .limit(k)

  /** Heavy hitters via the ApproxTopK frequent-items sketch (Spark
    * 4.1 built-in, datasketches-backed): one pass, bounded state,
    * mergeable. While the tracked-item capacity exceeds the true
    * distinct count the counts are EXACT (the fixture's 1.5k users
    * vs 10k capacity — so the oracle can hash-match); past capacity it
    * degrades to approximate gracefully, which is the 100 TB contract.
    * The sketch's own top-k boundary order is not deterministic under
    * ties, so we over-fetch, re-rank deterministically by (count desc,
    * key) outside the sketch, and cut to k through [[certainTopK]] —
    * which detects a tie reaching the fetch boundary and falls back to
    * the exact path rather than silently diverging.
    */
  def heavyHitters(events: DataFrame, keyCol: String, k: Int = 10,
                   fetch: Int = 50, capacity: Int = 10000): DataFrame =
    certainTopK(
      events
        .select(expr(s"approx_top_k($keyCol, $fetch, $capacity)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as(keyCol), col("e.count").as("n_events"))
        .orderBy(col("n_events").desc, col(keyCol)),
      k, fetch)(exactTopK(events, keyCol, k))

  /** The merge path of the same sketch — per-day partial sketches
    * combined into one estimate, the pre-aggregate-then-merge shape a
    * 100 TB rollup needs (no second scan of the corpus when a new day
    * arrives; union the day's sketch instead).
    */
  def heavyHittersMergeable(events: DataFrame, keyCol: String, k: Int = 10,
                            fetch: Int = 50, capacity: Int = 10000): DataFrame =
    certainTopK(
      events
        .groupBy(to_date(col("ts")).as("day"))
        .agg(expr(s"approx_top_k_accumulate($keyCol, $capacity)").as("sk"))
        .agg(expr(s"approx_top_k_estimate(approx_top_k_combine(sk, $capacity), $fetch)")
          .as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as(keyCol), col("e.count").as("n_events"))
        .orderBy(col("n_events").desc, col(keyCol)),
      k, fetch)(exactTopK(events, keyCol, k))

  /** Mergeable quantiles — the merge path of quantile sketching the
    * way [[heavyHittersMergeable]] is for frequent items: per-day
    * datasketches KLL sketches of `value` combined per type with
    * `kll_merge_agg_double` (a new day unions ONE bounded-size
    * sketch; the corpus never rescans — `approx_percentile`'s GK
    * sketch has no SQL-level merge of stored partials, so it cannot
    * roll forward). Output carries the EXACT interpolated
    * percentiles (oracle-checked values) plus in-row pins that each
    * merged-sketch estimate's exact rank sits within `tol` of its
    * target — the rank-space bound is what KLL promises (k=200 ⇒
    * ~1.65% normalized rank error; measured ≤0.5% on all SFs).
    */
  def quantilesMergeable(events: DataFrame, k: Int = 200,
                         tol: Double = 0.05): DataFrame = {
    // DISCRETE exact percentiles (smallest value with cume_dist ≥ p —
    // Spark's percentile_disc and DuckDB's quantile_disc share the
    // rule, probed on boundary cases): the result is an actual data
    // element, so it is bit-exact cross-engine. Continuous percentile
    // interpolates (1−g)·lo + g·hi in doubles, whose last ulp diverges
    // between engines — the r9 robustness sweep caught exactly that at
    // a synthetic 2× re-scale (p90 112.04 vs 112.04000000000002).
    val exact = events.groupBy(col("event_type")).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50_exact"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90_exact"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99_exact"))
    val est = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr(s"kll_sketch_agg_double(value, $k)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr(s"kll_merge_agg_double(sk, $k)").as("msk"))
      .select(col("event_type"),
        expr("kll_sketch_get_quantile_double(msk, 0.5D)").as("__e50"),
        expr("kll_sketch_get_quantile_double(msk, 0.9D)").as("__e90"),
        expr("kll_sketch_get_quantile_double(msk, 0.99D)").as("__e99"))
    val ranks = events.join(broadcast(est), "event_type")
      .groupBy(col("event_type"))
      .agg(
        (sum(when(col("value") <= col("__e50"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("__r50"),
        (sum(when(col("value") <= col("__e90"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("__r90"),
        (sum(when(col("value") <= col("__e99"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("__r99"))
    exact.join(ranks, "event_type")
      .select(col("event_type"),
        col("p50_exact"), col("p90_exact"), col("p99_exact"),
        (abs(col("__r50") - 0.5d) <= tol).as("p50_rank_ok"),
        (abs(col("__r90") - 0.9d) <= tol).as("p90_rank_ok"),
        (abs(col("__r99") - 0.99d) <= tol).as("p99_rank_ok"))
      .orderBy(col("event_type"))
  }

  /** Per-type breakdown with exact-decimal average. */
  def eventTypeBreakdown(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(dec2(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
      .orderBy(col("event_type"))

  /** Grouped correlation / covariance / regression slope from
    * EXACT decimal moment sums — the engine-independent formulation.
    * Spark's native `corr`/`covar_samp` stream Welford-style updates
    * whose float accumulation order differs from DuckDB's, so the
    * last ulp diverges; here the five moment sums (Σx Σy Σxy Σx² Σy²)
    * are exact decimals rounded to scale 2 (unscaled values stay
    * under 2^53 — the dsum contract), and the textbook two-pass
    * formulas run in double arithmetic in the SAME operation order on
    * both engines. One partial-aggregated pass; ANSI-guarded against
    * zero variance.
    */
  def corrByGroup(df: DataFrame, groupCol: String,
                  xCol: String, yCol: String): DataFrame = {
    val (x, y) = (dec2(col(xCol)), dec2(col(yCol)))
    val agged = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("__n"),
      dsum(x).as("__sx"), dsum(y).as("__sy"),
      dsum(x * y).as("__sxy"), dsum(x * x).as("__sxx"),
      dsum(y * y).as("__syy"))
    val covN   = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val varXN  = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val varYN  = col("__n") * col("__syy") - col("__sy") * col("__sy")
    agged.select(col(groupCol), col("__n").cast("long").as("n"),
        when(col("__n") > 1, covN / (col("__n") * (col("__n") - 1)))
          .otherwise(lit(0.0)).as("covar_samp"),
        when(varXN > 0 && varYN > 0, covN / (sqrt(varXN) * sqrt(varYN)))
          .otherwise(lit(0.0)).as("corr"),
        when(varXN > 0, covN / varXN).otherwise(lit(0.0)).as("slope"))
      .orderBy(col(groupCol))
  }

  /** Per-group z-score anomaly counts: rows whose value sits more than
    * `zMax` sample standard deviations from the group mean. The
    * mean/std derive from the same exact decimal moment sums as
    * [[corrByGroup]] (native stddev's streaming accumulation is
    * engine-dependent), so the flag thresholds — and therefore the
    * counts — are bit-identical on any engine and partitioning. The
    * group-stats relation is tiny and broadcasts back onto the fact
    * scan for the flagging pass.
    */
  def anomalyCounts(events: DataFrame, groupCol: String, valueCol: String,
                    zMax: Double = 3.0): DataFrame = {
    val v = dec2(col(valueCol))
    val stats = events.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("__n"),
      dsum(v).as("__sx"), dsum(v * v).as("__sxx"))
    val varN = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val enriched = stats.select(col(groupCol), col("__n"),
      (col("__sx") / col("__n")).as("__mean"),
      when(col("__n") > 1 && varN > 0,
        sqrt(varN / (col("__n") * (col("__n") - 1)))).otherwise(lit(0.0))
        .as("__std"))
    events.join(broadcast(enriched), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(col("__mean")).as("mean_value"),
        max(col("__std")).as("std_value"),
        sum(when(col("__std") > 0 &&
          abs(col(valueCol).cast("double") - col("__mean")) > lit(zMax) * col("__std"),
          1L).otherwise(0L)).as("n_anomalies"))
      .orderBy(col(groupCol))
  }

  /** Ordered funnel: how many users reach each stage IN ORDER —
    * stage n counts only if its earliest qualifying event is at or
    * after the user's stage n−1 time (a purchase before the signup
    * does not convert). Three conditional-min aggregations over the
    * fact table, each joined back on the (small) user relation — no
    * window over raw events, partial aggs throughout.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val perUser = stages.zipWithIndex.foldLeft(
      events.select(col("user_id")).distinct()) { case (acc, (stage, i)) =>
      val cond = if (i == 0) col("event_type") === stage
        else col("event_type") === stage && col("ts") >= col(s"__t${i - 1}")
      val agged = events.join(acc.select((col("user_id") +:
          (0 until i).map(j => col(s"__t$j"))): _*), "user_id")
        .groupBy(col("user_id"))
        .agg(min(when(cond, col("ts"))).as(s"__t$i"))
        .select(col("user_id"), col(s"__t$i"))
      acc.join(agged, Seq("user_id"), "left")
    }
    val counts = stages.indices.map(i =>
      sum(when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).as(s"n_${stages(i)}"))
    perUser.agg(counts.head, counts.tail: _*)
  }

  /** Recency-weighted engagement: value · 2^(−age_weeks) summed per
    * user — exponential time decay computed ENTIRELY in integers so it
    * is engine- and order-independent: cents = round(value·100),
    * halved once per elapsed week by integer division (2^k is exact in
    * double far past any real horizon, so the divisor round-trips the
    * cast), summed as BIGINT, surfaced as a double only at the end.
    * The naive `value * pow(0.5, age/7.0)` is unpinnable twice over:
    * libm pow differs in the last ulp across engines AND float
    * summation order differs across partitionings.
    */
  def recencyScores(events: DataFrame, asOf: String, k: Int = 20): DataFrame = {
    val asOfTs = to_timestamp_ntz(lit(asOf))
    val ageDays = floor((unix_micros(asOfTs.cast("timestamp")) -
      unix_micros(col("ts").cast("timestamp"))) / lit(86400000000L))
    val halvings = least(floor(ageDays / 7).cast("long"), lit(50L))
    val cents = round(col("value") * 100.0d).cast("long")
    // cents / 2^k is EXACT in double (an exponent shift — cents < 2^53,
    // 2^k exactly representable), so floor() is true integer halving
    // on both engines.
    events
      .filter(col("ts") <= asOfTs)
      .withColumn("__k", halvings)
      .withColumn("__term",
        floor(cents.cast("double") / pow(lit(2.0d), col("__k"))).cast("long"))
      .groupBy(col("user_id"))
      .agg(sum(col("__term")).as("__sc"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        (col("__sc").cast("double") / 100.0d).as("recency_score"))
      .orderBy(col("recency_score").desc, col("user_id"))
      .limit(k)
  }

  /** Top-N events per user by value: partitioned window, no global
    * sort; the row_number rank is dropped from the output (int-width
    * differences between engines) — ordering carries the semantics.
    */
  def topEventsPerUser(events: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
  }

  /** Per-user activity rollup joined to the user dimension (users ⟕
    * per-user aggregates). Aggregate first, then join — the join input
    * is one row per user, not one per event.
    */
  def userActivityRollup(customer: DataFrame, events: DataFrame): DataFrame = {
    val agg = events.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      dsum(dec2(col("value"))).as("total_value"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"))
    customer
      .join(agg, col("c_custkey") === col("user_id"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("total_value"), col("first_ts"), col("last_ts"))
      .orderBy(col("c_custkey"))
  }

  /** Running per-user total over event time (cumulative window). */
  def runningUserTotal(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        sum(dec2(col("value"))).over(w).cast("double").as("running_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Pivot: hourly × event-type count matrix. Explicit pivot values
    * keep the plan single-pass (no distinct-values pre-query) — at
    * scale, always pass the value list.
    */
  def hourlyTypePivot(events: DataFrame, types: Seq[String]): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("hour"))

  /** Per-user inter-event gap via lag — the sessionization primitive
    * in batch form. Exact integer microsecond arithmetic.
    */
  def eventGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("ts"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .select(col("event_id"), col("user_id"), col("ts"),
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("prev_ts").cast("timestamp"))).as("gap_us"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Event debouncing: keep only the FIRST event of each burst per
    * (user, event_type) — consecutive same-key events closer than
    * `gapMinutes` are duplicates of the gesture, not new signals (the
    * double-click / retry / webhook-redelivery cleanup step). One LAG
    * over one (user, type)-keyed window; the survivor test is exact
    * integer microsecond arithmetic, so the kept SET is
    * engine-reproducible. Note the semantics: the gap is measured to
    * the previous RAW event, not the previous survivor — a long burst
    * collapses to its head as long as no internal gap exceeds the
    * threshold (the standard debounce).
    */
  def debounce(events: DataFrame, gapMinutes: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val prevUs = lag(unix_micros(col("ts").cast("timestamp")), 1).over(w)
    events
      .withColumn("__gap",
        unix_micros(col("ts").cast("timestamp")) - prevUs)
      .filter(col("__gap").isNull || col("__gap") > gapMinutes * 60L * 1000000L)
      .drop("__gap")
      .orderBy(col("event_id"))
  }

  /** Batch sessionization — the static twin of
    * [[graft.streaming.Sessionize]]: events more than `gapMinutes`
    * apart start a new session; output is one row per session with
    * event count and duration. Two windows over ONE partitioning
    * (user_id) — the session-boundary flag and its running sum plan
    * into a single shuffle + sort — then a hash aggregate on
    * (user_id, session_seq). Exact integer microsecond arithmetic so
    * an oracle can reproduce it bit-for-bit.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = lit(gapMinutes.toLong * 60L * 1000000L)
    val prev = lag(unix_micros(col("ts").cast("timestamp")), 1).over(w)
    val isNew = when(
      prev.isNull ||
        unix_micros(col("ts").cast("timestamp")) - prev > gapUs, 1L).otherwise(0L)
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (unix_micros(max(col("ts")).cast("timestamp")) -
          unix_micros(min(col("ts")).cast("timestamp"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** rank / dense_rank of orders within each customer by price. */
  def orderRanks(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
  }

  /** Cohort retention: for every user, day 0 is their first active
    * date; n_active(k) counts (user, day) pairs at offset k. Two hash
    * aggregations and one broadcastable join on user_id — the classic
    * growth-analytics query, all-integer so the oracle compares
    * exactly.
    */
  def userRetention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val first = days.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    days.join(first, "user_id")
      .groupBy(datediff(col("d"), col("d0")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("day_offset"))
  }

  /** Per-user moving average over the last `frame` events (ROWS
    * frame): one window shuffle on user_id. The sum computes over
    * exact DECIMAL and the count is exact, so the only float step is
    * ONE IEEE double division — bit-identical in any engine,
    * independent of the frame's internal summation order (a windowed
    * double avg would drift, and a decimal avg rounds differently
    * across engines at the .005 boundary).
    */
  def movingAvg(events: DataFrame, frame: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(frame - 1), Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts"),
        (sum(dec2(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** TPC-H Q5 shape — the 6-table join chain (region → nation →
    * customer → orders → lineitem → supplier) with the local-supplier
    * constraint (s_nationkey = c_nationkey). Fully declarative:
    * Catalyst reorders the chain, the dimension sides broadcast, the
    * date filter pushes into the orders scan, and only the two
    * fact-sized relations meet in a shuffled join. Revenue is
    * DECIMAL-exact then rounded once (oracle parity, same discipline
    * as Q1).
    */
  def q5RegionVolume(region: DataFrame, nation: DataFrame,
                     customer: DataFrame, supplier: DataFrame,
                     orders: DataFrame, lineitem: DataFrame,
                     regionName: String = "ASIA"): DataFrame =
    region.filter(col("r_name") === regionName)
      .join(nation, col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01")),
        col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(dec2(col("l_extendedprice")) *
          (lit(1) - col("l_discount").cast(DecimalType(6, 4)))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** TIME-based trailing window (RANGE frame, not ROWS): the
    * 1-hour-lookback running aggregate a rate monitor computes. Spark
    * range frames need a numeric order key, so the frame orders on
    * epoch micros with a [-3600s, 0] offset — rows with equal ts are
    * peers on both engines (SQL RANGE semantics), so results don't
    * depend on tie order. Decimal-exact sum, one final double
    * division (oracle parity).
    */
  def movingAvgTime(events: DataFrame, windowSeconds: Long = 3600L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts").cast("timestamp")))
      .rangeBetween(-windowSeconds * 1000000L, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_window"),
        (sum(dec2(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg_1h"))
      .orderBy(col("event_id"))
  }

  /** Distribution window functions over orders within each status:
    * percent_rank / cume_dist / quartile bucket by price. One window
    * shuffle on the status key serves all three.
    */
  def orderPercentiles(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
  }

  /** CUBE over order status × priority (all grouping-set combos). */
  def cubeOrders(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(dec2(col("o_totalprice"))).as("total"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** Explicit GROUPING SETS (the Spark 4 `Dataset.groupingSets` API):
    * the per-dimension marginals plus the grand total WITHOUT the
    * cross-dimension cells a full cube pays for — at high-cardinality
    * dimensions the cube's cross products dominate its cost, so
    * hand-picked sets are the production shape. Same single-pass
    * Expand plan as cube/rollup, one row group per requested set.
    */
  def marginalsOrders(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(dec2(col("o_totalprice"))).as("total"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** JSON property normalization (ingest-side schema-on-read, the
    * `activityToMap` shape — reference `internal/strava/strava.go:86-100`):
    * parse the `props` JSON string with an explicit schema.
    */
  def normalizeProps(events: DataFrame): DataFrame =
    events
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .orderBy(col("event_id"))
}

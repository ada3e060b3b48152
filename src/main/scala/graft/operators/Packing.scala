package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Sequence packing for LLM training: assign every document a bin id
  * so that concatenating docs in key order fills ~`binTokens`-token
  * training sequences (contiguous packing — doc d goes to bin
  * `floor(prefix_tokens_before(d) / binTokens)`).
  *
  * Scale shape — the global prefix sum runs in TWO LEVELS so the
  * corpus never funnels through one partition:
  *   1. one range shuffle puts docs in key order
  *      (`repartitionByRange` + `sortWithinPartitions` — the same
  *      exchange any global ordering needs);
  *   2. per-partition token subtotals (one row per partition — tens of
  *      rows at any corpus size) get a cumulative offset via a window
  *      over that TINY relation, and broadcast-join back;
  *   3. each doc's prefix = its partition's offset + a window cumsum
  *      WITHIN its partition.
  * The only data-sized exchanges are the range shuffle and none after;
  * the driver never collects anything. A single global
  * `Window.orderBy` would compute the same numbers through one
  * partition — the formulation that dies first at 100 TB.
  */
object Packing {

  /** (doc_id ordered) → bin_id, n_tokens, prefix_tokens. Docs longer
    * than `binTokens` still get exactly one bin (the one their prefix
    * lands in) — splitting oversized docs is a tokenizer-side concern.
    */
  def packBins(docs: DataFrame, keyCol: String, binTokens: Long,
               partitions: Int = 32): DataFrame =
    packBinsCounted(
      docs.select(col(keyCol),
        size(tokens(col("text"))).cast("long").as("__nt")),
      keyCol, "__nt", binTokens, partitions)

  /** [[packBins]] over a PRE-COUNTED token column — the entry point
    * when the budget isn't whitespace words (BPE/subword counts, char
    * budgets, multimodal frame counts). Same two-level prefix sum,
    * same output schema (`n_tokens` = the supplied counts).
    */
  def packBinsCounted(rows: DataFrame, keyCol: String, tokensCol: String,
                      binTokens: Long, partitions: Int = 32): DataFrame = {
    val key = col(keyCol)
    val toked = rows
      .repartitionByRange(partitions, key)
      .sortWithinPartitions(key)
      .select(key, col(tokensCol).cast("long").as("n_tokens"),
        spark_partition_id().as("__pid"))

    // Level 1: per-partition subtotals — one row per partition, so the
    // single-partition window over them is bounded by cluster width,
    // not data size.
    val offsets = toked.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__ptotal"))
      .withColumn("__offset",
        coalesce(sum(col("__ptotal")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__ptotal")

    // Level 2: local cumsum + broadcast offset = exact global prefix.
    val wLocal = Window.partitionBy(col("__pid")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, -1)
    toked
      .join(broadcast(offsets), "__pid")
      .select(key, col("n_tokens"),
        (col("__offset") + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
          .as("prefix_tokens"))
      .withColumn("bin_id", floor(col("prefix_tokens") / binTokens))
  }

  /** Curriculum packing: the same contiguous two-level prefix sum as
    * [[packBinsCounted]], but in an EXPLICIT curriculum order
    * (`orderCols`, e.g. cleanest-first by LM log-perplexity) instead
    * of key order — `keyCol` identifies rows and breaks order ties.
    * The order columns must be deterministic values (ours are exact
    * by construction) or the packing wouldn't be reproducible.
    */
  def packBinsOrderedBy(rows: DataFrame, keyCol: String, tokensCol: String,
                        orderCols: Seq[String], binTokens: Long,
                        partitions: Int = 32): DataFrame = {
    val sortCols = (orderCols :+ keyCol).map(col)
    val toked = rows
      .repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .select(sortCols :+ col(tokensCol).cast("long").as("n_tokens")
        :+ spark_partition_id().as("__pid"): _*)
    val offsets = toked.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__ptotal"))
      .withColumn("__offset",
        coalesce(sum(col("__ptotal")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__ptotal")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    toked
      .join(broadcast(offsets), "__pid")
      .select(col(keyCol), col("n_tokens"),
        (col("__offset") + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
          .as("prefix_tokens"))
      .withColumn("bin_id", floor(col("prefix_tokens") / binTokens))
  }

  /** Group-scoped packing — the multilingual/sharded variant: every
    * group (language, source, …) packs its own bin sequence starting
    * at prefix 0, so shards stay group-pure (the layout a
    * per-language training mixture consumes). Same two-level prefix
    * sum as [[packBins]] with one twist: the range shuffle keys on
    * (group, key), so a group's rows are CONTIGUOUS across ordered
    * partitions and the level-1 offsets window partitions by group
    * over the same tiny (partition × groups-touching-it) relation —
    * still bounded by cluster width × group count, never data-sized.
    */
  def packBinsGrouped(docs: DataFrame, groupCol: String, keyCol: String,
                      binTokens: Long, partitions: Int = 32): DataFrame = {
    val grp = col(groupCol)
    val key = col(keyCol)
    val toked = docs
      .repartitionByRange(partitions, grp, key)
      .sortWithinPartitions(grp, key)
      .select(grp, key, size(tokens(col("text"))).cast("long").as("n_tokens"),
        spark_partition_id().as("__pid"))

    val offsets = toked.groupBy(col("__pid"), grp)
      .agg(sum(col("n_tokens")).as("__ptotal"))
      .withColumn("__offset",
        coalesce(sum(col("__ptotal")).over(
          Window.partitionBy(grp).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__ptotal")

    val wLocal = Window.partitionBy(col("__pid"), grp).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, -1)
    toked
      .join(broadcast(offsets), Seq("__pid", groupCol))
      .select(grp, key, col("n_tokens"),
        (col("__offset") + coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
          .as("prefix_tokens"))
      .withColumn("bin_id", floor(col("prefix_tokens") / binTokens))
  }

  /** Bin-level summary: docs per bin and filled tokens — the shape a
    * shard-writer consumes (`partitionBy(bin_id)` on write).
    */
  def binStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("bin_id"))

  // ---- no-split (padded) packing ---------------------------------------

  /** 0-based global rank under `sortCols` via the same two-level scheme
    * as [[packBinsCounted]]: one range shuffle, per-partition counts
    * (one row per partition) windowed for offsets, broadcast back, local
    * rank added. No data-sized single-partition window anywhere.
    */
  private def withGlobalRank(rows: DataFrame, partitions: Int,
                             sortCols: Column*): DataFrame = {
    val placed = rows
      .repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = placed.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pcnt"))
      .withColumn("__offset",
        coalesce(sum(col("__pcnt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pcnt")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    placed
      .join(broadcast(offsets), "__pid")
      .withColumn("__rank", col("__offset") + count(lit(1)).over(wLocal))
      .drop("__pid", "__offset")
  }

  /** Harmonic no-split packing (Lee & Lee 1985): each doc keeps its
    * whole token run in ONE bin (a padded training sequence), bins hold
    * docs of similar length. Bucket `k = max(1, floor(binTokens/len))`
    * is exactly how many docs of that length class fit a bin —
    * `len ∈ (C/(k+1), C/k]` implies k docs sum ≤ C — so within a bucket
    * the packing is just rank/k: embarrassingly parallel across buckets,
    * deterministic, and worst-case 1.691× optimal bins (the harmonic
    * bound). Docs longer than the budget get singleton bins (k clipped
    * to 1) — splitting is [[packBins]]' contiguous regime instead.
    *
    * Scale shape: bucket assignment is row-local arithmetic; the
    * per-bucket rank reuses the two-level prefix idiom with the level-1
    * relation bounded by partitions × distinct buckets (≤ partitions ×
    * binTokens rows — cluster-width-sized, never data-sized).
    *
    * Output: (key, n_tokens, bucket_k, bin_idx) — a bin is the pair
    * (bucket_k, bin_idx); global ids are a downstream dense-rank over
    * bins if a flat numbering is ever needed.
    */
  def packHarmonic(docs: DataFrame, keyCol: String, binTokens: Long,
                   partitions: Int = 32): DataFrame = {
    val key = col(keyCol)
    val bucketed = docs.select(key,
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket_k",
        greatest(lit(1L), floor(lit(binTokens) /
          greatest(col("n_tokens"), lit(1L))).cast("long")))
    val placed = bucketed
      .repartitionByRange(partitions, col("bucket_k"), key)
      .sortWithinPartitions(col("bucket_k"), key)
      .withColumn("__pid", spark_partition_id())
    // Level 1: (partition, bucket) counts — each partition touches a
    // contiguous bucket range, so this stays cluster-width-sized.
    val offsets = placed.groupBy(col("__pid"), col("bucket_k"))
      .agg(count(lit(1)).as("__pcnt"))
      .withColumn("__offset",
        coalesce(sum(col("__pcnt")).over(
          Window.partitionBy(col("bucket_k")).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pcnt")
    val wLocal = Window.partitionBy(col("__pid"), col("bucket_k")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, -1)
    placed
      .join(broadcast(offsets), Seq("__pid", "bucket_k"))
      .select(key, col("n_tokens"), col("bucket_k"),
        floor((col("__offset") + count(lit(1)).over(wLocal)) / col("bucket_k"))
          .as("bin_idx"))
  }

  /** Per-bin fill for [[packHarmonic]] output: padding is the unfilled
    * budget (0 for oversized singleton bins — truncation is a
    * tokenizer-side concern, as in [[packBins]]).
    */
  def harmonicStats(packed: DataFrame, binTokens: Long): DataFrame =
    packed.groupBy(col("bucket_k"), col("bin_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("fill_tokens"))
      .withColumn("padding",
        greatest(lit(0L), lit(binTokens) - col("fill_tokens")))
      .orderBy(col("bucket_k"), col("bin_idx"))

  /** Length-sorted batching: rank docs by (length desc, key), cut into
    * fixed `batchSize` batches, pad every sequence in a batch to the
    * batch max. Sorting first is THE padding minimizer for this layout
    * — similar lengths land in the same batch, so max−len ≈ 0. Returns
    * per-batch stats: (batch_id, n_docs, max_tokens, fill_tokens,
    * padding). Rank is the two-level scheme — no global window.
    */
  def sortedBatchStats(docs: DataFrame, keyCol: String, batchSize: Int,
                       partitions: Int = 32): DataFrame =
    batchStats(docs, keyCol, batchSize, partitions, sortByLength = true)

  /** Arrival-order (key-order) batching — the layout a pipeline gets by
    * NOT sorting; exists so the sorted variant's padding win is a
    * measured, oracle-checked number rather than a claim.
    */
  def arrivalBatchStats(docs: DataFrame, keyCol: String, batchSize: Int,
                        partitions: Int = 32): DataFrame =
    batchStats(docs, keyCol, batchSize, partitions, sortByLength = false)

  private def batchStats(docs: DataFrame, keyCol: String, batchSize: Int,
                         partitions: Int, sortByLength: Boolean): DataFrame = {
    val key = col(keyCol)
    val toked = docs.select(key,
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val sortCols =
      if (sortByLength) Seq(col("n_tokens").desc, key) else Seq(key)
    withGlobalRank(toked, partitions, sortCols: _*)
      .withColumn("batch_id", floor(col("__rank") / batchSize))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("fill_tokens"))
      .withColumn("padding",
        col("max_tokens") * col("n_docs") - col("fill_tokens"))
      .orderBy(col("batch_id"))
  }
}

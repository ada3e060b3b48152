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
}

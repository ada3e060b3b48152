package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Mergeable Bloom-filter membership sketch, wrapping Spark's own
  * runtime-filtering expressions ([[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]] — the machinery behind Spark's
  * injected runtime row-group filters) as first-class library
  * functions. Spark-first by construction: zero new sketch code, the
  * exact battle-tested kernel the engine already trusts for its own
  * join pruning.
  *
  * Why a Bloom at 100 TB: the broadcast-the-strings decontamination
  * path ([[graft.operators.TextAnalysis.contaminationScore]]) stops
  * working when the benchmark/blocklist gram set reaches ~10⁸ entries
  * (gigabytes of UTF-8). A Bloom at ~10 bits/item is two orders of
  * magnitude smaller, OR-mergeable across partitions (one partial
  * filter per partition, driver ORs fixed-size bit arrays — the same
  * no-rescan merge shape as the HLL/KLL/ApproxTopK sketch family),
  * and guarantees ZERO false negatives: the exact-verify join after
  * the prefilter only sees the tiny candidate slice, never the
  * corpus.
  *
  * Hashing contract: both sides hash through `xxhash64` of the key
  * column, so membership is over identical 64-bit keys on the build
  * and probe paths. The filter bytes are engine-internal (xxhash64 is
  * never oracle-checked — verify-skill discipline); correctness is
  * pinned through the no-false-negative property, which IS
  * cross-engine checkable.
  */
object BloomFunctions {

  /** Aggregate: one serialized Bloom filter (binary) over the
    * xxhash64 of `key`, sized for `expectedItems` at `numBits` bits.
    * Partial filters OR-merge — safe under any partitioning.
    */
  def bloom_agg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** The hashed probe key, safe to hand to `might_contain`'s codegen:
    * a FOLDABLE hash (literal key) would constant-fold to a long
    * literal that Spark's generated `(Long)<value>` cast mis-parses
    * under janino when negative — see [[CodegenMaterialized]]. Column
    * keys (every production path) pass through untouched. */
  private def probeHash(
      key: Column): org.apache.spark.sql.catalyst.expressions.Expression = {
    val h = ColumnBridge.expression(xxhash64(key))
    if (h.foldable) CodegenMaterialized(h) else h
  }

  /** Probe: might `key` be in `bloom`? False ⇒ definitely absent
    * (the load-bearing direction); true ⇒ present or false positive.
    * `bloom` must be foldable (a literal filter) — for a
    * filter-built-by-a-plan, use [[bloom_probe]], the scalar-subquery
    * form [[BloomFilterMightContain]] actually accepts.
    */
  def bloom_might_contain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), probeHash(key)))

  /** Probe against a filter built by a 1-row, 1-column aggregate plan
    * (`bloomDf` = `relation.agg(bloom_agg(...))`): the filter rides
    * in as a SCALAR SUBQUERY — the exact shape Spark's own
    * InjectRuntimeFilter emits, and the only non-literal bloom input
    * `might_contain` accepts. The subquery executes once and its
    * bytes broadcast to every probe task; the probing side never
    * shuffles.
    */
  def bloom_probe(bloomDf: org.apache.spark.sql.DataFrame, key: Column): Column = {
    val plan = bloomDf.queryExecution.analyzed
    require(plan.output.length == 1,
      s"bloom_probe expects a 1-column bloom aggregate, got ${plan.output.length}")
    ColumnBridge.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(plan),
      probeHash(key)))
  }
}

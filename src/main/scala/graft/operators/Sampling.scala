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

  /** Epoch-seeded deterministic shuffle order: sort by
    * md5(epoch ":" key). Each epoch is a different but fully
    * reproducible permutation — what multi-epoch training needs
    * (`rand()` orders differ per retry; this one is bit-stable and any
    * engine with md5 reproduces it). At scale the SORT is the product
    * (`repartitionByRange` on the shuffle key when writing epochs);
    * [[epochShuffleRank]] additionally materializes the position via a
    * single global window — pin/debug shape, not the 100 TB path.
    */
  def epochShuffleKey(key: Column, epoch: Int): Column =
    md5(concat(lit(s"$epoch:"), key.cast("string")))

  def epochShuffleRank(df: DataFrame, keyCol: String, epoch: Int): DataFrame = {
    val k = epochShuffleKey(col(keyCol), epoch)
    df.select(col(keyCol),
      row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(k, col(keyCol)))
        .cast("long").as("shuffle_rank"))
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
}

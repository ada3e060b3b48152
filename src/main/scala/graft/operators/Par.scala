package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-width guard for expensive row-local passes (r18, guide §2.5
  * "input skew" / §6): a single-file parquet scan plans ONE task, so
  * a tokenize/md5/bigram pass over it runs serially no matter how
  * many cores the cluster has — r17 hit this on the covariance
  * moments and the staged CSV; the honest per-rep bench (r18) exposed
  * it on every hashed-feature builder. [[widen]] repartitions to
  * cluster parallelism ONLY when the input plans narrower than that —
  * a real 100 TB corpus arrives already split and the repartition
  * no-ops; the explicit partition count keeps AQE from coalescing the
  * tiny local shuffle back to one partition. Deterministic hash key —
  * never round-robin — so retries reproduce the same placement
  * (SPARK-38388 discipline).
  */
object Par {

  def widen(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key)
    else df
  }
}

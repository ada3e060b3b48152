package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Persisted IVF vector index — build once, query many: the ANN
  * lifecycle a 100 TB embedding store actually runs (re-deriving
  * centroids + assignments per query would rescan the corpus).
  *
  * Layout: `dir/centroids` holds the nlist (centroid_id, centroid)
  * rows; `dir/cells` holds the assigned corpus PARTITIONED BY
  * centroid_id — so a probe of `nprobe` cells reads `nprobe/nlist`
  * of the data via partition pruning (the probe join keys on the
  * partition column; Spark's dynamic partition pruning turns the
  * tiny probe relation into a scan filter). Writing moves each
  * vector once; queries never touch unprobed cells.
  *
  * Appends from at-least-once sources (foreachBatch re-delivers a
  * micro-batch after a failure) land in PER-BATCH roots
  * (`dir/cells_batch_<id>`, same centroid_id partitioning) written
  * with OVERWRITE — a re-delivered batch rewrites its own root
  * instead of double-appending, so duplicated vec_ids can never
  * reach [[topK]]. Readers union the base root with every batch
  * root; each root keeps its own partition pruning.
  */
object VectorIndex {

  def write(corpus: DataFrame, dir: String, nlist: Int = 16,
            refine: Int = 0): Unit = {
    val centroids = Similarity.ivfCentroids(corpus, nlist, refine)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    Similarity.ivfAssign(corpus, centroids)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/cells")
  }

  /** Append a fresh batch WITHOUT rebuilding — the index-maintenance
    * path continuous embedding ingest runs: fresh vectors assign
    * row-locally against the PERSISTED centroids (one broadcast read;
    * the standing cells are never read, moved, or rewritten) and land
    * in their cell partitions. Centroids stay fixed by design — IVF
    * tolerates assignment drift until a scheduled rebuild, and
    * full-probe retrieval over the appended index still exactly equals
    * brute force over the union corpus (what `ann_index_append` pins),
    * because probing every cell reads every vector regardless of which
    * centroid it sits under.
    *
    * `batch`: identity of the delivery (a streaming batchId). When
    * set, the rows write to the batch's OWN root with overwrite — a
    * redelivered micro-batch (foreachBatch is at-least-once) replaces
    * its previous attempt instead of appending duplicates. When None
    * (a one-shot batch append from a driver program, not a retryable
    * sink), rows append into the base cells root directly.
    */
  def append(fresh: DataFrame, dir: String,
             batch: Option[String] = None): Unit = {
    val spark = fresh.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val assigned = Similarity.ivfAssign(fresh, centroids)
    batch match {
      case Some(b) =>
        assigned.write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/cells_batch_$b")
      case None =>
        assigned.write.mode("append").partitionBy("centroid_id")
          .parquet(s"$dir/cells")
    }
  }

  /** All cell roots of the index: the base build plus every per-batch
    * append root, unioned. Listing the index dir is a driver-side
    * metadata op (one per query plan, never per row); each root scans
    * with its own centroid_id partition pruning.
    */
  def cells(spark: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(dir)
    val batchRoots = Option(base.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("cells_batch_"))
      .map(_.getAbsolutePath).sorted
    batchRoots.foldLeft(spark.read.parquet(s"$dir/cells"))(
      (acc, p) => acc.unionByName(spark.read.parquet(p)))
  }

  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    Similarity.ivfProbe(centroids, cells(spark, dir), queries, k, nprobe)
  }
}

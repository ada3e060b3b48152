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
    * in their cell partitions via partition-wise append. Centroids stay
    * fixed by design — IVF tolerates assignment drift until a
    * scheduled rebuild, and full-probe retrieval over the appended
    * index still exactly equals brute force over the union corpus
    * (what `ann_index_append` pins), because probing every cell reads
    * every vector regardless of which centroid it sits under.
    */
  def append(fresh: DataFrame, dir: String): Unit = {
    val spark = fresh.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    Similarity.ivfAssign(fresh, centroids)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$dir/cells")
  }

  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val assigned = spark.read.parquet(s"$dir/cells")
    Similarity.ivfProbe(centroids, assigned, queries, k, nprobe)
  }
}

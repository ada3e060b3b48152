package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout management — the write-side concerns a 100 TB
  * corpus store lives or dies by: shard-structured training output and
  * small-file compaction. (Read-side layout lives in [[Partitioned]]
  * and [[Bucketing]].)
  */
object Layout {

  /** Write a packed corpus (see [[graft.operators.Packing]]) as
    * training shards: one directory per `bin_id`, files capped at
    * `maxRecordsPerFile` rows. `repartition(binCol)` co-locates each
    * bin's docs before the write, so a bin is one writer task's output
    * (no tiny per-task fragments), and the record cap bounds file size
    * without a second pass.
    */
  def writeShards(packed: DataFrame, outDir: String, binCol: String = "bin_id",
                  maxRecordsPerFile: Int = 10000): Unit =
    packed
      .repartition(col(binCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(binCol)
      .parquet(outDir)

  /** Compact a small-files parquet directory to ~`targetBytes` files:
    * size the partition count from the ACTUAL on-disk bytes (not a
    * guess), rewrite to a temp dir, swap. The swap is the same
    * write-tmp → delete → rename sequence the ingest store uses —
    * non-atomic on a plain filesystem, so run it from the single
    * maintenance job that owns the table (a table format makes it a
    * metadata commit).
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(dir)
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          buf += f
      }
      buf.toSeq
    }
    val before = dataFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(path, true)
    fs.rename(tmp, path)
    (before.size, dataFiles(path).size)
  }
}

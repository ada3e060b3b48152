package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Morton (z-order) key over two already-normalized cell ids in
    * [0, 2^bits). Pure bit arithmetic on attributes — codegen'd, no
    * UDF, no shuffle.
    */
  def zOrderKey(cellA: Column, cellB: Column, bits: Int = 8): Column =
    // interleave: bit i of a → bit 2i+1, bit i of b → bit 2i
    (0 until bits).map { i =>
      shiftleft(shiftright(cellA, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(cellB, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Z-order a table on two dimensions and write it so parquet
    * row-group/file min-max stats prune BOTH dimensions — the layout
    * trick behind Delta/Iceberg OPTIMIZE ZORDER, built from Spark
    * primitives.
    *
    * Dimensions are normalized by RANK, not by min-max: each dimension
    * maps to its cell among `cells` equi-MASS buckets (one
    * approx_percentile pass → a boundary array of `cells-1` values,
    * broadcast; the per-row cell is a bounded scan of that array).
    * Min-max interleaving looks simpler but degenerates on skew — a
    * right-skewed column crowds most rows into the lowest z-cells and
    * pruning on it collapses to the linear case (measured on the
    * events fixture: a bottom-decile value slice hit 12/16 min-max
    * z-files vs ~5/16 rank-normalized). Equi-mass cells are exactly the
    * sampled range boundaries Delta/Iceberg use for OPTIMIZE ZORDER.
    *
    * Write path: Morton key per row (row-local), `repartitionByRange`
    * on the key (one range shuffle — the same cost a linear sort-write
    * pays), `sortWithinPartitions` so stats tighten inside each file.
    * Linear layout sorts on ONE dimension and a predicate on the other
    * overlaps every file; the Morton curve keeps both dimensions
    * locally contiguous, so a box predicate touches O(perimeter) files
    * instead of all of them — at 100 TB the difference between
    * scanning a terabyte and scanning the lot (LayoutSpec measures the
    * file-overlap win on real data).
    */
  def writeZOrdered(df: DataFrame, outDir: String,
                    dimA: String, dimB: String, files: Int = 16,
                    cells: Int = 256): Unit = {
    val qs = (1 until cells).map(i => i.toDouble / cells)
    def boundaries(dim: String): Column =
      expr(s"approx_percentile($dim, array(${qs.mkString(",")}), 10000)")
    val bounds = df.agg(
      boundaries(dimA).cast("array<double>").as("__qa"),
      boundaries(dimB).cast("array<double>").as("__qb"))
    def cellOf(x: Column, bnds: Column): Column =
      size(filter(bnds, b => b <= x.cast("double"))).cast("long")
    val keyed = df.crossJoin(broadcast(bounds))
      .withColumn("__z", zOrderKey(
        cellOf(col(dimA), col("__qa")), cellOf(col(dimB), col("__qb")),
        bits = 32 - Integer.numberOfLeadingZeros(cells - 1)))
      .drop("__qa", "__qb")
    keyed
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

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

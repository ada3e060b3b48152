package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal copy-on-write versioned table — the MERGE write path the
  * production table formats (Delta Lake, Iceberg) implement, in pure
  * Spark + parquet + atomic manifest commits. The environment carries
  * no format jars, so the engine ships the MECHANISM those formats
  * share rather than a binding to one of them; `operators/Merge`
  * documents the logical MERGE INTO mapping, and this is its
  * format-backed physical twin (reference analog: the Postgres
  * upsert, `internal/db/activities.go:100-185`).
  *
  * Layout under `root/`:
  *   - `_manifests/v%05d.json` — one JSON line per snapshot: version,
  *     parent, and the entry list `(path, min_key, max_key, rows)`.
  *     An entry is a parquet DIRECTORY (one key-range bucket, written
  *     by a single partitioned job — file-in-manifest granularity,
  *     like a Delta AddFile / Iceberg data file).
  *   - `data/v<N>/__bucket=<b>/…parquet` — snapshot N's rewritten
  *     buckets. Untouched buckets are CARRIED by path reference into
  *     the child manifest — never read, moved, or rewritten. That is
  *     the whole copy-on-write bargain: commit cost ∝ touched data,
  *     not table size.
  *
  * MERGE (upsert) walks exactly the production shape:
  *   1. prune: join the (file-count-sized) manifest stats with the
  *      DISTINCT update keys — an entry is touched iff some update
  *      key lands in its [min_key, max_key]. Only entry ids are ever
  *      collected; untouched data is never scanned.
  *   2. rewrite: touched buckets anti-join away matched keys and
  *      rewrite under the new version; all update rows land in ONE
  *      new entry (matched replacements + inserts together — the
  *      "new file" of a Delta merge).
  *   3. commit: write the manifest to a temp name, then
  *      ATOMIC_MOVE-rename to `v%05d.json`. A crash before the
  *      rename leaves the parent snapshot intact and the orphan data
  *      dir unreferenced (vacuum fodder — exactly Delta's story); a
  *      concurrent committer loses the rename race and must retry on
  *      the new parent (optimistic concurrency).
  *
  * Readers resolve a version (default: latest) to its entry paths
  * and union-scan them; time travel is just reading an older
  * manifest. Every snapshot stays readable until vacuumed.
  *
  * Scale notes: create() is ONE partitioned write job (range buckets
  * via a key-derived column) plus one file-stats aggregate; merge()
  * reads only touched buckets; the manifest relation is file-count-
  * sized and broadcasts. At 100 TB the bucket count grows with the
  * table (the `buckets` argument is per-create, as `maxPartitionBytes`
  * sizing would be) — pruning cost stays ∝ manifest size, never data.
  */
object CowTable {

  case class Entry(path: String, minKey: Long, maxKey: Long, rows: Long)
  case class Manifest(version: Int, parent: Int, entries: Seq[Entry])

  private val manifestSchema = StructType(Seq(
    StructField("version", IntegerType),
    StructField("parent", IntegerType),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("path", StringType),
      StructField("min_key", LongType),
      StructField("max_key", LongType),
      StructField("rows", LongType)))))))

  private def manifestDir(root: String) = s"$root/_manifests"
  private def manifestPath(root: String, v: Int) =
    f"${manifestDir(root)}/v$v%05d.json"

  /** Latest committed version, 0 if none. */
  def currentVersion(root: String): Int = {
    val d = new java.io.File(manifestDir(root))
    Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName).collect {
        case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toInt
      }.maxOption.getOrElse(0)
  }

  def readManifest(spark: SparkSession, root: String, version: Int): Manifest = {
    val row = spark.read.schema(manifestSchema)
      .json(manifestPath(root, version)).head()
    Manifest(row.getInt(0), row.getInt(1),
      row.getSeq[org.apache.spark.sql.Row](2).map(e =>
        Entry(e.getString(0), e.getLong(1), e.getLong(2), e.getLong(3))))
  }

  /** Atomic commit: temp write + ATOMIC_MOVE rename. Fails (and
    * leaves the data dirs orphaned-but-harmless) if `version` was
    * committed concurrently. */
  private def commit(root: String, m: Manifest): Unit = {
    val dir = java.nio.file.Paths.get(manifestDir(root))
    java.nio.file.Files.createDirectories(dir)
    val body = {
      val es = m.entries.map(e =>
        s"""{"path":"${e.path}","min_key":${e.minKey},""" +
          s""""max_key":${e.maxKey},"rows":${e.rows}}""").mkString(",")
      s"""{"version":${m.version},"parent":${m.parent},"entries":[$es]}"""
    }
    val tmp = dir.resolve(s".tmp_v${m.version}_${System.nanoTime()}")
    java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
    try
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(manifestPath(root, m.version)),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"concurrent commit of version ${m.version}", e)
    }
  }

  /** Write the buckets of `df` under `data/v<version>` in ONE
    * partitioned job and return their manifest entries (per-bucket
    * key stats from one aggregate over the written data). */
  private def writeBuckets(df: DataFrame, root: String, version: Int,
                           keyCol: String, bucketOf: org.apache.spark.sql.Column,
                           tag: String = ""): Seq[Entry] = {
    val spark = df.sparkSession
    val dir = s"$root/data/v$version$tag"
    df.withColumn("__bucket", bucketOf)
      .write.mode("errorifexists").partitionBy("__bucket").parquet(dir)
    spark.read.parquet(dir)
      .groupBy(col("__bucket"))
      .agg(min(col(keyCol)).as("mn"), max(col(keyCol)).as("mx"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => Entry(s"$dir/__bucket=${r.get(0)}", r.getLong(1),
        r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_.path)
  }

  /** Create version 1: `buckets` key-range buckets of width
    * ceil((max_key+1)/buckets) — deterministic from the data, so an
    * oracle (and a rewrite job) can recompute every bucket boundary. */
  def create(df: DataFrame, root: String, keyCol: String,
             buckets: Int = 8): Manifest = {
    require(currentVersion(root) == 0, s"table at $root already exists")
    val maxKey = df.agg(max(col(keyCol))).head().getLong(0)
    val width = math.max(1L, (maxKey + buckets) / buckets) // ceil((max+1)/buckets)
    val entries = writeBuckets(df, root, 1, keyCol,
      least(floor(col(keyCol) / width), lit(buckets - 1L)))
    val m = Manifest(1, 0, entries)
    commit(root, m)
    m
  }

  /** Read a snapshot (default: latest) as one union scan of its
    * entries. */
  def read(spark: SparkSession, root: String,
           version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(root))
    val m = readManifest(spark, root, v)
    spark.read.parquet(m.entries.map(_.path): _*)
      .drop("__bucket")
  }

  /** Manifest-stat pruned read (zone-map data skipping): only entries
    * whose [min_key, max_key] intersects [lo, hi] are opened, and the
    * key predicate is pushed into the scan for row-group pruning
    * inside the survivors. Returns (result, entriesScanned,
    * entriesSkipped) — the skip count is the whole point: at 100 TB a
    * key-range query touches O(range/width) files, never the table.
    */
  def readWhere(spark: SparkSession, root: String, keyCol: String,
                lo: Long, hi: Long,
                version: Option[Int] = None): (DataFrame, Int, Int) = {
    val v = version.getOrElse(currentVersion(root))
    val m = readManifest(spark, root, v)
    val (hit, skip) = m.entries.partition(e => e.maxKey >= lo && e.minKey <= hi)
    val df =
      if (hit.isEmpty)
        read(spark, root, Some(v)).filter(lit(false))
      else
        spark.read.parquet(hit.map(_.path): _*).drop("__bucket")
          .filter(col(keyCol).between(lo, hi))
    (df, hit.length, skip.length)
  }

  /** Version history from manifests alone — no data is scanned; row
    * counts come from the per-entry stats the writes recorded. Reading
    * it back equal to the data is itself a stats-integrity check. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    (1 to currentVersion(root)).map { v =>
      val m = readManifest(spark, root, v)
      (v.toLong, m.parent.toLong, m.entries.length.toLong,
        m.entries.map(_.rows).sum)
    }.toDF("version", "parent", "n_entries", "n_rows")
  }

  /** Compaction (the production OPTIMIZE): entries smaller than
    * `targetRows` rewrite together into ceil(sum/targetRows) range
    * buckets; entries already at target size CARRY by path. Content
    * is identical before and after — only the file layout changes —
    * so every reader (including time travel to the pre-compaction
    * version) is unaffected. Commit cost ∝ small-file data, never
    * table size. No-op (no commit) when fewer than two entries
    * qualify. Returns (manifest, entriesCompacted, entriesCarried).
    */
  def compact(spark: SparkSession, root: String, keyCol: String,
              targetRows: Long): (Manifest, Int, Int) = {
    val parent = currentVersion(root)
    val m = readManifest(spark, root, parent)
    val (small, carried) = m.entries.partition(_.rows < targetRows)
    if (small.length < 2) return (m, 0, m.entries.length)
    val v = parent + 1
    val src = spark.read.parquet(small.map(_.path): _*).drop("__bucket")
    val nb = math.max(1L, (small.map(_.rows).sum + targetRows - 1) / targetRows).toInt
    val mx = small.map(_.maxKey).max
    val width = math.max(1L, (mx + nb) / nb)
    val entries = writeBuckets(src, root, v, keyCol,
      least(floor(col(keyCol) / width), lit(nb - 1L)), tag = "c")
    val nm = Manifest(v, parent, carried ++ entries)
    commit(root, nm)
    (nm, small.length, carried.length)
  }

  /** Pruned CDC between two snapshots (the table-format change feed):
    * entries present in BOTH manifests by path hold identical bytes
    * and cancel — only path-differing entries are read, so feed cost
    * ∝ churn between the versions, never table size. The differing
    * sides full-outer join on the key; rows equal on every column
    * (rewrite-without-change survivors of a touched bucket) drop out.
    * Output: key, op ∈ {insert, update, delete}, then old_/new_
    * prefixed data columns (null on the absent side). Returns
    * (feed, entriesRead, entriesCancelled). */
  def changefeed(spark: SparkSession, root: String, keyCol: String,
                 fromVersion: Int, toVersion: Int): (DataFrame, Int, Int) = {
    val mo = readManifest(spark, root, fromVersion)
    val mn = readManifest(spark, root, toVersion)
    val oldPaths = mo.entries.map(_.path).toSet
    val newPaths = mn.entries.map(_.path).toSet
    val onlyOld = mo.entries.filterNot(e => newPaths(e.path))
    val onlyNew = mn.entries.filterNot(e => oldPaths(e.path))
    val cancelled = (mo.entries.length - onlyOld.length) +
      (mn.entries.length - onlyNew.length)
    def scan(es: Seq[Entry]): DataFrame =
      if (es.nonEmpty) spark.read.parquet(es.map(_.path): _*).drop("__bucket")
      else read(spark, root, Some(toVersion)).filter(lit(false))
    val dataCols = scan(mn.entries.take(1)).columns.filter(_ != keyCol).toSeq
    def packed(es: Seq[Entry]): DataFrame =
      scan(es).select(col(keyCol),
        struct(dataCols.map(col): _*).as("__v"))
    val j = packed(onlyOld).withColumnRenamed("__v", "__old")
      .join(packed(onlyNew).withColumnRenamed("__v", "__new"),
        Seq(keyCol), "full_outer")
      .filter(!(col("__old") <=> col("__new")))
    val out = j.select(
      col(keyCol) +:
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .otherwise(lit("update")).as("op") +:
        dataCols.flatMap(c => Seq(
          col(s"__old.$c").as(s"old_$c"),
          col(s"__new.$c").as(s"new_$c"))): _*)
    (out, onlyOld.length + onlyNew.length, cancelled)
  }

  /** Vacuum: drop manifests older than the last `retainVersions`
    * snapshots, then delete every data bucket directory no retained
    * manifest references. Listing here is local-FS (the sandbox has
    * no object store); at 100 TB the listing is a distributed job but
    * the referenced-set is still only manifest-count-sized. Returns
    * (bucketDirsDeleted, manifestsDeleted). */
  def vacuum(spark: SparkSession, root: String,
             retainVersions: Int): (Int, Int) = {
    val cur = currentVersion(root)
    val keepFrom = math.max(1, cur - retainVersions + 1)
    val referenced = (keepFrom to cur)
      .flatMap(v => readManifest(spark, root, v).entries.map(_.path))
      .toSet
    val dataRoot = new java.io.File(s"$root/data")
    def rmTree(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rmTree)); p.delete(): Unit
    }
    val versionDirs = Option(dataRoot.listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty).filter(_.isDirectory)
    var dirsDeleted = 0
    versionDirs.foreach { vd =>
      Option(vd.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("__bucket="))
        .foreach { b =>
          if (!referenced(b.getPath)) { rmTree(b); dirsDeleted += 1 }
        }
      if (Option(vd.listFiles()).forall(_.isEmpty)) rmTree(vd)
    }
    var manifestsDeleted = 0
    (1 until keepFrom).foreach { v =>
      if (java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(manifestPath(root, v)))) manifestsDeleted += 1
    }
    (dirsDeleted, manifestsDeleted)
  }

  /** MERGE (upsert): rows of `updates` replace same-key rows and
    * insert otherwise. Returns (new manifest, #entries rewritten,
    * #entries carried). Only buckets whose [min,max] key range
    * contains an update key are read or rewritten. */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
            keyCol: String): (Manifest, Int, Int) = {
    val parent = currentVersion(root)
    val m = readManifest(spark, root, parent)
    val v = parent + 1
    val stats = spark.createDataFrame(m.entries.zipWithIndex.map {
      case (e, i) => (i, e.minKey, e.maxKey)
    }).toDF("__eid", "__mn", "__mx")
    val keys = updates.select(col(keyCol).as("__k")).distinct()
    // prune: file-count-sized stats × distinct update keys — the only
    // rows collected are touched ENTRY IDS
    val touched = broadcast(stats)
      .join(keys, col("__k").between(col("__mn"), col("__mx")), "left_semi")
      .select(col("__eid")).collect().map(_.getInt(0)).toSet
    val (hit, carried) = m.entries.zipWithIndex.partition {
      case (_, i) => touched(i)
    }
    // survivors of touched buckets (matched keys anti-joined away)
    // plus every update row, rebucketed under the new version. Bucket
    // ranges are re-derived per rewrite — stats in the manifest stay
    // the source of truth, not the bucket function.
    val rewriteSrc = {
      val old =
        if (hit.isEmpty) None
        else Some(spark.read.parquet(hit.map(_._1.path): _*).drop("__bucket")
          .join(updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti"))
      old.map(_.unionByName(updates)).getOrElse(updates)
    }
    val nb = math.max(1, hit.length)
    // an EMPTY update batch (an at-least-once source can deliver one)
    // commits a carried-only snapshot — same version arithmetic, no
    // data write, and the empty-relation parquet write/readback that
    // would otherwise throw never happens
    val newEntries = rewriteSrc.agg(max(col(keyCol))).head() match {
      case r if r.isNullAt(0) => Seq.empty[Entry]
      case r =>
        val width = math.max(1L, (r.getLong(0) + nb) / nb)
        writeBuckets(rewriteSrc, root, v, keyCol,
          least(floor(col(keyCol) / width), lit(nb - 1L)))
    }
    val nm = Manifest(v, parent, carried.map(_._1) ++ newEntries)
    commit(root, nm)
    (nm, hit.length, carried.length)
  }

  /** DELETE by key set: touched buckets rewrite without the matched
    * rows; untouched buckets carry. Same pruning as [[merge]]. */
  def delete(spark: SparkSession, root: String, keys: DataFrame,
             keyCol: String): (Manifest, Int, Int) = {
    val parent = currentVersion(root)
    val m = readManifest(spark, root, parent)
    val v = parent + 1
    val stats = spark.createDataFrame(m.entries.zipWithIndex.map {
      case (e, i) => (i, e.minKey, e.maxKey)
    }).toDF("__eid", "__mn", "__mx")
    val ks = keys.select(col(keyCol).as("__k")).distinct()
    val touched = broadcast(stats)
      .join(ks, col("__k").between(col("__mn"), col("__mx")), "left_semi")
      .select(col("__eid")).collect().map(_.getInt(0)).toSet
    val (hit, carried) = m.entries.zipWithIndex.partition {
      case (_, i) => touched(i)
    }
    val newEntries =
      if (hit.isEmpty) Seq.empty
      else {
        val survivors = spark.read.parquet(hit.map(_._1.path): _*)
          .drop("__bucket")
          .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        val nb = hit.length
        val mx = survivors.agg(max(col(keyCol))).head() match {
          case r if r.isNullAt(0) => -1L // every survivor deleted
          case r => r.getLong(0)
        }
        if (mx < 0) Seq.empty
        else {
          val width = math.max(1L, (mx + nb) / nb)
          writeBuckets(survivors, root, v, keyCol,
            least(floor(col(keyCol) / width), lit(nb - 1L)), tag = "d")
        }
      }
    val nm = Manifest(v, parent, carried.map(_._1) ++ newEntries)
    commit(root, nm)
    (nm, hit.length, carried.length)
  }
}

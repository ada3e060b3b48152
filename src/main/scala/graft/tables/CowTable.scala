package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  *   - `_manifests/v%05d.json` — one JSON doc per snapshot: version,
  *     parent, key type, the snapshot's SCHEMA (DDL), the per-stream
  *     transaction watermarks, and the entry list
  *     `(path, min_key, max_key, rows)`. An entry is a parquet
  *     DIRECTORY (one key-range bucket, written by a single
  *     partitioned job — file-in-manifest granularity, like a Delta
  *     AddFile / Iceberg data file).
  *   - `data/v<N>-<uniq>/__bucket=<b>/…parquet` — snapshot N's
  *     rewritten buckets (the uniq suffix keeps racing attempts from
  *     colliding on a directory). Untouched buckets are CARRIED by
  *     path reference into the child manifest — never read, moved, or
  *     rewritten. That is the whole copy-on-write bargain: commit
  *     cost ∝ touched data, not table size.
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
  *   3. commit: write the manifest to a temp name, then publish it
  *      with `link(2)` (`Files.createLink`), which atomically FAILS
  *      if the target exists — rename(2) would silently replace a
  *      concurrent winner's manifest, so ATOMIC_MOVE alone cannot
  *      detect the race. A crash before the link leaves the parent
  *      snapshot intact and the orphan data dir unreferenced (vacuum
  *      fodder — exactly Delta's story); a LOSING committer throws
  *      [[ConcurrentCommitException]] and [[merge]]/[[delete]] rebase
  *      onto the new parent and retry (bounded attempts) — the
  *      optimistic-concurrency loop Delta/Iceberg writers share.
  *
  * Exactly-once streaming: a merge may carry a `txn = (app, batch)`
  * tag. Each manifest records the highest committed batch per app
  * (carried forward from its parent), so a REDELIVERED micro-batch
  * (foreachBatch is at-least-once) no-ops instead of committing a
  * duplicate version — Delta's `txn` action, verbatim.
  *
  * Keys are BIGINT or STRING. Bigint tables bucket by contiguous key
  * range (width derived from the batch max — range reads prune
  * surgically); string tables bucket by hash range (xxhash64 mod n) —
  * per-bucket lexicographic min/max stats still bound every bucket,
  * so stat pruning stays CORRECT, just coarser (hash buckets span the
  * key space — the trade every format makes for non-numeric keys).
  *
  * Schema evolution: a merge whose update batch carries NEW columns
  * widens the table schema (old rows null-fill — parquet's
  * missing-column read semantics); common columns must keep their
  * type. Every manifest stores ITS OWN schema DDL, so time travel
  * reads each snapshot under the schema it was committed with, and an
  * all-rows-deleted snapshot (zero entries) still reads back as an
  * empty DataFrame with the right schema.
  *
  * Readers resolve a version (default: latest) to its entry paths
  * and union-scan them under the manifest schema; time travel is just
  * reading an older manifest. Every snapshot stays readable until
  * vacuumed. Manifests parse driver-side (json4s — file-count-sized
  * metadata never deserves a Spark job).
  *
  * Scale notes: create() is ONE partitioned write job (range buckets
  * via a key-derived column) plus one file-stats aggregate; merge()
  * reads only touched buckets; the manifest relation is file-count-
  * sized and broadcasts. At 100 TB the bucket count grows with the
  * table (the `buckets` argument is per-create, as `maxPartitionBytes`
  * sizing would be) — pruning cost stays ∝ manifest size, never data.
  */
object CowTable {

  /** Another writer committed this version first; [[merge]]/[[delete]]
    * catch it and rebase onto the new parent (bounded retries). */
  final class ConcurrentCommitException(val version: Int)
    extends RuntimeException(s"concurrent commit of version $version")

  /** min/max key stats are stored as strings in the manifest; the
    * typed accessors parse per the manifest's key type. `dv` is the
    * entry's DELETION-VECTOR sidecar (a parquet dir of deleted keys —
    * merge-on-read, see [[deleteMor]]), null when none; `dvRows` its
    * exact deleted-key count, so `liveRows` stays manifest-derivable. */
  case class Entry(path: String, minKey: String, maxKey: String, rows: Long,
                   dv: String = null, dvRows: Long = 0L,
                   colStats: Map[String, (Double, Double)] = Map.empty,
                   bloom: String = null) {
    def minKeyLong: Long = minKey.toLong
    def maxKeyLong: Long = maxKey.toLong
    def liveRows: Long = rows - dvRows
  }

  case class Manifest(version: Int, parent: Int, keyType: String,
                      keyCol: String, schemaDdl: String,
                      txns: Map[String, Long], entries: Seq[Entry],
                      statsCols: Seq[String] = Seq.empty,
                      committedAt: Long = 0L,
                      bloomKeys: Boolean = false) {
    def schema: StructType = StructType.fromDDL(schemaDdl)
  }

  private def manifestDir(root: String) = s"$root/_manifests"
  private def manifestPath(root: String, v: Int) =
    f"${manifestDir(root)}/v$v%05d.json"

  /** Committed versions still on disk, ascending (vacuum removes old
    * manifests, so the range need not start at 1). */
  def versions(root: String): Seq[Int] = {
    val d = new java.io.File(manifestDir(root))
    Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName).collect {
        case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toInt
      }.sorted
  }

  /** Latest committed version, 0 if none. */
  def currentVersion(root: String): Int =
    versions(root).lastOption.getOrElse(0)

  def readManifest(spark: SparkSession, root: String, version: Int): Manifest = {
    val body = new String(Files.readAllBytes(
      Paths.get(manifestPath(root, version))), "UTF-8")
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(body)
    Manifest(
      (j \ "version").extract[Int],
      (j \ "parent").extract[Int],
      (j \ "key_type").extract[String],
      (j \ "key_col").extract[String],
      (j \ "schema").extract[String],
      (j \ "txns") match {
        case JArray(xs) => xs.map(t =>
          ((t \ "app").extract[String], (t \ "batch").extract[Long])).toMap
        case _ => Map.empty[String, Long]
      },
      (j \ "entries") match {
        case JArray(es) => es.map(e => Entry(
          (e \ "path").extract[String],
          (e \ "min_key").extract[String],
          (e \ "max_key").extract[String],
          (e \ "rows").extract[Long],
          (e \ "dv") match {
            case JString(p) => p
            case _ => null
          },
          (e \ "dv_rows") match {
            case JInt(n) => n.toLong
            case JLong(n) => n
            case _ => 0L
          },
          (e \ "col_stats") match {
            case JArray(cs) => cs.map(c => (
              (c \ "col").extract[String],
              ((c \ "min").extract[Double], (c \ "max").extract[Double]))).toMap
            case _ => Map.empty[String, (Double, Double)]
          },
          (e \ "bloom") match {
            case JString(p) => p
            case _ => null
          }))
        case _ => Seq.empty[Entry]
      },
      (j \ "stats_cols") match {
        case JArray(cs) => cs.map(_.extract[String])
        case _ => Seq.empty[String]
      },
      (j \ "committed_at") match {
        case JInt(t) => t.toLong
        case JLong(t) => t
        case _ => 0L
      },
      (j \ "bloom_keys") match {
        case JBool(b) => b
        case _ => false
      })
  }

  private def jstr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def manifestJson(m: Manifest): String = {
    val es = m.entries.map { e =>
      val dv = if (e.dv == null) ""
        else s""","dv":${jstr(e.dv)},"dv_rows":${e.dvRows}"""
      val cs = if (e.colStats.isEmpty) ""
        else ""","col_stats":[""" + e.colStats.toSeq.sortBy(_._1).map {
          case (c, (mn, mx)) => s"""{"col":${jstr(c)},"min":$mn,"max":$mx}"""
        }.mkString(",") + "]"
      val bl = if (e.bloom == null) "" else s""","bloom":${jstr(e.bloom)}"""
      s"""{"path":${jstr(e.path)},"min_key":${jstr(e.minKey)},""" +
        s""""max_key":${jstr(e.maxKey)},"rows":${e.rows}$dv$cs$bl}"""
    }.mkString(",")
    val ts = m.txns.toSeq.sortBy(_._1).map { case (a, b) =>
      s"""{"app":${jstr(a)},"batch":$b}"""
    }.mkString(",")
    val sc = m.statsCols.map(jstr).mkString(",")
    s"""{"version":${m.version},"parent":${m.parent},""" +
      s""""key_type":${jstr(m.keyType)},"key_col":${jstr(m.keyCol)},""" +
      s""""schema":${jstr(m.schemaDdl)},"stats_cols":[$sc],""" +
      s""""committed_at":${m.committedAt},"bloom_keys":${m.bloomKeys},""" +
      s""""txns":[$ts],"entries":[$es]}"""
  }

  /** Test seam: runs after a writer computed its new snapshot but
    * before it commits — lets a spec deterministically interleave a
    * competing commit (the OCC race is otherwise timing-dependent). */
  private[graft] var beforeCommitHook: () => Unit = () => ()

  /** Atomic commit: temp write + `link(2)` publish. `createLink`
    * atomically fails with FileAlreadyExistsException when the target
    * exists (unlike rename(2), which silently REPLACES — the reason
    * ATOMIC_MOVE cannot detect this race) → the loser throws
    * [[ConcurrentCommitException]] and leaves its data dirs
    * orphaned-but-harmless (vacuum removes them). On filesystems
    * without hard links, an exclusive create claims the version and
    * an atomic move then publishes the bytes. */
  private[graft] def commit(root: String, m: Manifest): Unit = {
    val dir = Paths.get(manifestDir(root))
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp_v${m.version}_${System.nanoTime()}")
    // commit wall-clock stamped at publish time (timestamp travel)
    val stamped = m.copy(committedAt = System.currentTimeMillis())
    Files.write(tmp, manifestJson(stamped).getBytes("UTF-8"))
    val target = Paths.get(manifestPath(root, m.version))
    try {
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException =>
          Files.createFile(target) // atomic claim; throws if committed
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(m.version)
    } finally {
      Files.deleteIfExists(tmp): Unit
    }
  }

  private def keyTypeOf(df: DataFrame, keyCol: String): String =
    df.schema(keyCol).dataType match {
      case LongType => "bigint"
      case StringType => "string"
      case t => throw new IllegalArgumentException(
        s"CowTable keys must be BIGINT or STRING, got $t for $keyCol")
    }

  private def sparkKeyType(keyType: String): DataType =
    if (keyType == "bigint") LongType else StringType

  /** Bucket assignment for a batch about to be written: bigint keys
    * take contiguous ranges (width from the batch max — range pruning
    * stays surgical); string keys take hash ranges (stats still bound
    * each bucket lexicographically, so pruning stays correct).
    * `maxKey` is by-name: only bigint layouts evaluate it. */
  private def bucketExpr(keyCol: String, keyType: String, nb: Int,
                         maxKey: => Long): Column =
    if (keyType == "bigint") {
      val width = math.max(1L, (maxKey + nb) / nb) // ceil((max+1)/nb)
      least(floor(col(keyCol) / width), lit(nb - 1L))
    } else pmod(xxhash64(col(keyCol)), lit(nb.toLong))

  /** Write the buckets of `df` under a version-unique data dir in ONE
    * partitioned job and return their manifest entries (per-bucket
    * key stats from one aggregate over the written data). The uniq
    * suffix keeps concurrent attempts at the same version from
    * colliding; a losing attempt's dir is unreferenced → vacuumable. */
  private def writeBuckets(df: DataFrame, root: String, version: Int,
                           keyCol: String, bucketOf: Column,
                           statsCols: Seq[String] = Seq.empty,
                           bloomKeys: Boolean = false): Seq[Entry] = {
    val spark = df.sparkSession
    val uniq = java.util.UUID.randomUUID().toString.take(8)
    val dir = s"$root/data/v$version-$uniq"
    df.withColumn("__bucket", bucketOf)
      .write.mode("errorifexists").partitionBy("__bucket").parquet(dir)
    // one aggregate recovers the key stats AND the per-column zone
    // maps (numeric min/max as double — exact under 2^53, ample for
    // pruning bounds) AND, when the table opted in, a per-bucket
    // Bloom filter over the keys (Spark's own sketch — the sidecar a
    // POINT lookup prunes hash-bucketed string tables with, where
    // lexicographic ranges span the whole key space). Scale note: the
    // sidecar bytes (4 KB/bucket) ride this stats collect, so the
    // driver transfer is bounded by THIS WRITE's bucket count — fine
    // for merges (touched buckets) and bounded creates; a 100 TB
    // initial load would stage blooms through a distributed write
    // (foreachPartition to the store) instead of the collect.
    val extra = statsCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val bloomAgg =
      if (bloomKeys) Seq(graft.functions.BloomFunctions
        .bloom_agg(col(keyCol), 4096L, 1L << 15).as("__bloom"))
      else Seq.empty
    val aggs = Seq(max(col(keyCol)).as("mx"), count(lit(1)).as("n")) ++
      extra ++ bloomAgg
    val bloomDir = s"$root/bloom/v$version-$uniq"
    if (bloomKeys) Files.createDirectories(Paths.get(bloomDir)): Unit
    spark.read.parquet(dir)
      .groupBy(col("__bucket"))
      .agg(min(col(keyCol)).as("mn"), aggs: _*)
      .collect()
      .map { r =>
        val cs = statsCols.zipWithIndex.flatMap { case (c, i) =>
          val mnI = 4 + 2 * i
          if (r.isNullAt(mnI) || r.isNullAt(mnI + 1)) None
          else Some(c -> ((r.getDouble(mnI), r.getDouble(mnI + 1))))
        }.toMap
        val bloomPath =
          if (!bloomKeys) null
          else {
            val bytes = r.getAs[Array[Byte]](4 + 2 * statsCols.length)
            val p = s"$bloomDir/b${r.get(0)}.bloom"
            Files.write(Paths.get(p), bytes)
            p
          }
        Entry(s"$dir/__bucket=${r.get(0)}", r.get(1).toString,
          r.get(2).toString, r.getLong(3), colStats = cs, bloom = bloomPath)
      }
      .toSeq.sortBy(_.path)
  }

  /** Deserialized Bloom sidecars, cached per path (sidecars are
    * immutable once written). */
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.util.sketch.BloomFilter]()

  private def loadBloom(path: String): org.apache.spark.util.sketch.BloomFilter =
    bloomCache.computeIfAbsent(path, p =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(Files.readAllBytes(Paths.get(p)))))

  /** Union-scan entries under an explicit schema: carried old-schema
    * files null-fill evolved columns (parquet missing-column reads);
    * ZERO entries read as an empty frame with the right schema (an
    * all-rows-deleted snapshot stays readable). PHYSICAL rows — does
    * not apply deletion vectors; [[readEntriesLive]] does. */
  private def scanEntries(spark: SparkSession, schema: StructType,
                          es: Seq[Entry]): DataFrame =
    if (es.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else
      spark.read.schema(schema).parquet(es.map(_.path): _*).drop("__bucket")

  /** Union-scan of deletion-vector sidecars: one column, the key. */
  private def scanDvs(spark: SparkSession, m: Manifest,
                      dvPaths: Seq[String]): DataFrame =
    spark.read
      .schema(StructType(Seq(StructField(m.keyCol, sparkKeyType(m.keyType)))))
      .parquet(dvPaths: _*)
      .select(col(m.keyCol))

  /** LIVE rows of the given entries: physical scan minus the entries'
    * deletion vectors. One union scan + ONE global anti-join — a
    * per-entry DV only ever lists keys physically present in THAT
    * entry, and the table holds each key in exactly one entry (upsert
    * semantics), so the global anti-join equals the per-entry one. */
  private def readEntriesLive(spark: SparkSession, m: Manifest,
                              es: Seq[Entry]): DataFrame =
    readEntriesLiveAs(spark, m, es, m.schema)

  private def readEntriesLiveAs(spark: SparkSession, m: Manifest,
                                es: Seq[Entry],
                                schema: StructType): DataFrame = {
    val base = scanEntries(spark, schema, es)
    val dvs = es.filter(_.dv != null).map(_.dv)
    if (dvs.isEmpty) base
    else base.join(scanDvs(spark, m, dvs), Seq(m.keyCol), "left_anti")
  }

  /** Null-fill + reorder `df` to `schema` (common columns must already
    * match types — [[evolveSchema]] enforces that). */
  private def conform(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(schema.fields.toSeq.map(f =>
      if (present(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)): _*)
  }

  /** Table schema ∪ update columns (appended in update order). Common
    * columns must keep their exact type — silent upcasts would change
    * what time travel reads back. */
  private def evolveSchema(table: StructType, upd: StructType): StructType = {
    val tableNames = table.fieldNames.toSet
    upd.fields.filter(f => tableNames(f.name)).foreach { f =>
      val t = table(f.name).dataType
      require(t == f.dataType,
        s"merge type conflict on ${f.name}: table $t vs update ${f.dataType}")
    }
    StructType(table.fields ++ upd.fields.filterNot(f => tableNames(f.name)))
  }

  /** Entry ids whose [min,max] key range contains some update key —
    * the prune join: file-count-sized broadcast stats × distinct
    * keys; only entry IDS are ever collected. */
  private def touchedEntries(spark: SparkSession, m: Manifest,
                             keys: DataFrame, keyCol: String): Set[Int] = {
    if (m.entries.isEmpty) return Set.empty
    val kt = sparkKeyType(m.keyType)
    val statsSchema = StructType(Seq(StructField("__eid", IntegerType),
      StructField("__mn", kt), StructField("__mx", kt)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    m.entries.zipWithIndex.foreach { case (e, i) =>
      val (mn, mx): (Any, Any) =
        if (m.keyType == "bigint") (e.minKeyLong, e.maxKeyLong)
        else (e.minKey, e.maxKey)
      rows.add(Row(i, mn, mx))
    }
    val stats = spark.createDataFrame(rows, statsSchema)
    broadcast(stats)
      .join(keys.select(col(keyCol).as("__k")).distinct(),
        col("__k").between(col("__mn"), col("__mx")), "left_semi")
      .select(col("__eid")).collect().map(_.getInt(0)).toSet
  }

  /** Create version 1. Bigint keys: `buckets` contiguous ranges of
    * width ceil((max_key+1)/buckets) — deterministic from the data,
    * so an oracle (and a rewrite job) can recompute every bucket
    * boundary. String keys: `buckets` hash ranges. */
  def create(df: DataFrame, root: String, keyCol: String,
             buckets: Int = 8,
             statsCols: Seq[String] = Seq.empty,
             bloomKeys: Boolean = false): Manifest = {
    require(currentVersion(root) == 0, s"table at $root already exists")
    val kt = keyTypeOf(df, keyCol)
    val entries = writeBuckets(df, root, 1, keyCol,
      bucketExpr(keyCol, kt, buckets,
        df.agg(max(col(keyCol))).head().getLong(0)), statsCols, bloomKeys)
    val m = Manifest(1, 0, kt, keyCol, df.schema.toDDL, Map.empty, entries,
      statsCols, bloomKeys = bloomKeys)
    commit(root, m)
    m
  }

  /** Read a snapshot (default: latest) as one union scan of its
    * entries under the schema that snapshot committed with, minus the
    * snapshot's deletion vectors (merge-on-read). */
  def read(spark: SparkSession, root: String,
           version: Option[Int] = None): DataFrame = {
    val m = readManifest(spark, root, version.getOrElse(currentVersion(root)))
    readEntriesLive(spark, m, m.entries)
  }

  /** TIMESTAMP AS OF: the snapshot whose commit wall-clock is the
    * latest ≤ `timestampMs` among retained manifests (ties broken by
    * version — commits are totally ordered, timestamps need not be).
    * Throws when the timestamp precedes every retained commit. */
  def versionAsOf(spark: SparkSession, root: String,
                  timestampMs: Long): Int = {
    val eligible = versions(root)
      .filter(v => readManifest(spark, root, v).committedAt <= timestampMs)
    require(eligible.nonEmpty,
      s"no snapshot committed at or before $timestampMs")
    eligible.max
  }

  /** Read the snapshot current at `timestampMs` (timestamp travel). */
  def readAsOf(spark: SparkSession, root: String,
               timestampMs: Long): DataFrame =
    read(spark, root, Some(versionAsOf(spark, root, timestampMs)))

  /** Manifest-stat pruned read (zone-map data skipping): only entries
    * whose [min_key, max_key] intersects [lo, hi] are opened, and the
    * key predicate is pushed into the scan for row-group pruning
    * inside the survivors. Returns (result, entriesScanned,
    * entriesSkipped) — the skip count is the whole point: at 100 TB a
    * key-range query touches O(range/width) files, never the table.
    * Bigint keys only (hash-bucketed string tables prune through the
    * same stats inside [[merge]]/[[delete]]). */
  def readWhere(spark: SparkSession, root: String, keyCol: String,
                lo: Long, hi: Long,
                version: Option[Int] = None): (DataFrame, Int, Int) = {
    val v = version.getOrElse(currentVersion(root))
    val m = readManifest(spark, root, v)
    require(m.keyType == "bigint", "readWhere requires a BIGINT key")
    val (hit, skip) = m.entries.partition(e =>
      e.maxKeyLong >= lo && e.minKeyLong <= hi)
    val df = readEntriesLive(spark, m, hit)
      .filter(col(keyCol).between(lo, hi))
    (df, hit.length, skip.length)
  }

  /** Version history from manifests alone — no data is scanned; row
    * counts come from the per-entry stats the writes recorded, and
    * only manifests still on disk list (vacuum truncates the range).
    * Reading it back equal to the data is itself a stats-integrity
    * check. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(root).map { v =>
      val m = readManifest(spark, root, v)
      (v.toLong, m.parent.toLong, m.entries.length.toLong,
        m.entries.map(_.liveRows).sum)
    }.toDF("version", "parent", "n_entries", "n_rows")
  }

  private def withRetry[T](maxAttempts: Int)(body: => T): T = {
    var attempt = 0
    var last: ConcurrentCommitException = null
    while (attempt < maxAttempts) {
      attempt += 1
      try return body
      catch { case e: ConcurrentCommitException => last = e }
    }
    throw last
  }

  /** MERGE (upsert): rows of `updates` replace same-key rows and
    * insert otherwise. Returns (new manifest, #entries rewritten,
    * #entries carried). Only buckets whose [min,max] key range
    * contains an update key are read or rewritten.
    *
    * `txn = (app, batch)`: exactly-once tag — a batch at or below the
    * app's committed watermark no-ops (returns the CURRENT manifest
    * with 0/0 counts) instead of committing a duplicate version.
    * Batch ids must be monotone per app (structured streaming's
    * foreachBatch contract).
    *
    * A commit conflict (another writer won the version) rebases onto
    * the new parent and retries, up to `maxAttempts` — losing
    * attempts' data dirs are unreferenced and vacuumable. */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
            keyCol: String, txn: Option[(String, Long)] = None,
            maxAttempts: Int = 5): (Manifest, Int, Int) =
    withRetry(maxAttempts) { mergeOnce(spark, root, updates, keyCol, txn) }

  private def mergeOnce(spark: SparkSession, root: String,
                        updates: DataFrame, keyCol: String,
                        txn: Option[(String, Long)]): (Manifest, Int, Int) = {
    val parent = currentVersion(root)
    val m = readManifest(spark, root, parent)
    val replayed = txn.exists { case (app, batch) =>
      m.txns.get(app).exists(_ >= batch)
    }
    if (replayed) return (m, 0, 0)
    val v = parent + 1
    val evolved = evolveSchema(m.schema, updates.schema)
    val touched = touchedEntries(spark, m, updates.select(col(keyCol)), keyCol)
    val (hit, carried) = m.entries.zipWithIndex.partition {
      case (_, i) => touched(i)
    }
    // LIVE survivors of touched buckets (deletion vectors applied,
    // then matched keys anti-joined away) plus every update row,
    // conformed to the evolved schema and rebucketed under the new
    // version — a rewrite MATERIALIZES its buckets' deletion vectors,
    // so rewritten entries carry none. Bucket ranges are re-derived
    // per rewrite — stats in the manifest stay the source of truth,
    // not the bucket function.
    val rewriteSrc = {
      val upd = conform(updates, evolved)
      if (hit.isEmpty) upd
      else conform(
        readEntriesLiveAs(spark, m, hit.map(_._1), evolved)
          .join(updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti"),
        evolved).unionByName(upd)
    }
    val nb = math.max(1, hit.length)
    // an EMPTY update batch (an at-least-once source can deliver one)
    // commits a carried-only snapshot — same version arithmetic, no
    // data write, and the empty-relation parquet write/readback that
    // would otherwise throw never happens
    val mxRow = rewriteSrc.agg(max(col(keyCol))).head()
    val newEntries =
      if (mxRow.isNullAt(0)) Seq.empty[Entry]
      else writeBuckets(rewriteSrc, root, v, keyCol,
        bucketExpr(keyCol, m.keyType, nb,
          if (m.keyType == "bigint") mxRow.getLong(0) else 0L),
        m.statsCols, m.bloomKeys)
    val newTxns = txn.map { case (a, b) => m.txns + (a -> b) }.getOrElse(m.txns)
    val nm = Manifest(v, parent, m.keyType, m.keyCol, evolved.toDDL, newTxns,
      carried.map(_._1) ++ newEntries, m.statsCols, bloomKeys = m.bloomKeys)
    beforeCommitHook()
    commit(root, nm)
    (nm, hit.length, carried.length)
  }

  /** DELETE by key set: touched buckets rewrite without the matched
    * rows; untouched buckets carry. Same pruning and OCC retry as
    * [[merge]]. */
  def delete(spark: SparkSession, root: String, keys: DataFrame,
             keyCol: String, maxAttempts: Int = 5): (Manifest, Int, Int) =
    withRetry(maxAttempts) { deleteOnce(spark, root, keys, keyCol) }

  private def deleteOnce(spark: SparkSession, root: String, keys: DataFrame,
                         keyCol: String): (Manifest, Int, Int) = {
    val parent = currentVersion(root)
    val m = readManifest(spark, root, parent)
    val v = parent + 1
    val touched = touchedEntries(spark, m, keys.select(col(keyCol)), keyCol)
    val (hit, carried) = m.entries.zipWithIndex.partition {
      case (_, i) => touched(i)
    }
    val newEntries =
      if (hit.isEmpty) Seq.empty
      else {
        // live survivors: the rewrite materializes the touched
        // buckets' deletion vectors along the way
        val survivors = readEntriesLive(spark, m, hit.map(_._1))
          .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        // every survivor deleted → zero new entries; the snapshot may
        // legitimately end up with NO entries at all (schema in the
        // manifest keeps it readable)
        val mxRow = survivors.agg(max(col(keyCol))).head()
        if (mxRow.isNullAt(0)) Seq.empty
        else writeBuckets(survivors, root, v, keyCol,
          bucketExpr(keyCol, m.keyType, hit.length,
            if (m.keyType == "bigint") mxRow.getLong(0) else 0L),
          m.statsCols, m.bloomKeys)
      }
    val nm = Manifest(v, parent, m.keyType, m.keyCol, m.schemaDdl, m.txns,
      carried.map(_._1) ++ newEntries, m.statsCols, bloomKeys = m.bloomKeys)
    beforeCommitHook()
    commit(root, nm)
    (nm, hit.length, carried.length)
  }

  /** MERGE-ON-READ DELETE (deletion vectors — the Delta DV / Iceberg
    * v2 delete-file mechanism): instead of rewriting every touched
    * bucket, write a per-entry SIDECAR of deleted keys and leave the
    * data files untouched. Delete cost ∝ matched keys plus ONE
    * read-only pruned scan — ZERO rewrite — which is the difference
    * between "delete 100 rows" costing 100 rows and costing the 100 GB
    * of buckets they live in. Readers anti-join the snapshot's
    * sidecars ([[readEntriesLive]]); [[merge]]/[[delete]]/[[compact]]
    * MATERIALIZE the vectors of any bucket they rewrite, so vectors
    * never outlive their entry.
    *
    * Mechanism per touched entry (range-pruned, like [[merge]]):
    * new vector = (physical keys ∩ delete keys) ∪ old vector,
    * DISTINCT — re-deleting an already-deleted key is absorbed, keys
    * absent from the table contribute nothing, and `dvRows` stays the
    * exact per-entry deleted count, so `history()`'s
    * Σ(rows − dvRows) remains manifest-derivable truth. Attribution
    * of a key to its entry rides `input_file_name()` (each entry is
    * one bucket directory); all touched entries' vectors write in ONE
    * partitioned job. An entry whose vector grows to cover every
    * physical row drops out of the manifest entirely (its data dir
    * and sidecar become vacuum fodder).
    *
    * Returns (manifest, #entries whose vector changed, #entries
    * carried untouched). Same OCC retry as [[merge]]. */
  def deleteMor(spark: SparkSession, root: String, keys: DataFrame,
                keyCol: String,
                maxAttempts: Int = 5): (Manifest, Int, Int) =
    withRetry(maxAttempts) { deleteMorOnce(spark, root, keys, keyCol) }

  private def deleteMorOnce(spark: SparkSession, root: String,
                            keys: DataFrame,
                            keyCol: String): (Manifest, Int, Int) = {
    val parent = currentVersion(root)
    val m = readManifest(spark, root, parent)
    require(keyCol == m.keyCol, s"table is keyed by ${m.keyCol}, not $keyCol")
    val v = parent + 1
    val touched = touchedEntries(spark, m, keys.select(col(keyCol)), keyCol)
    val (hit, carried) = m.entries.zipWithIndex.partition {
      case (_, i) => touched(i)
    }
    if (hit.isEmpty) {
      val nm = Manifest(v, parent, m.keyType, m.keyCol, m.schemaDdl, m.txns,
        m.entries, m.statsCols, bloomKeys = m.bloomKeys)
      beforeCommitHook()
      commit(root, nm)
      return (nm, 0, carried.length)
    }
    // one PHYSICAL scan of the touched buckets, each row attributed to
    // its entry via the bucket directory it was read from
    val dirToEid = hit.map { case (e, _) => e.path }.zipWithIndex
    val eidOf = spark.createDataFrame(
      java.util.Arrays.asList(dirToEid.map { case (p, i) => Row(p, i) }: _*),
      StructType(Seq(StructField("__dir", StringType),
        StructField("__eid", IntegerType))))
    val tagged = scanEntries(spark, m.schema, hit.map(_._1))
      .select(col(keyCol),
        regexp_replace(regexp_replace(input_file_name(), "^file:(//)?", ""),
          "/[^/]+$", "").as("__dir"))
      .join(broadcast(eidOf), Seq("__dir"))
    val matched = tagged
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .select(col(keyCol), col("__eid"))
    // new vector per entry = matched ∪ old vector, DISTINCT (absorbs
    // re-deletes); old vectors re-read with their entry id attached
    val oldDvs = hit.zipWithIndex.collect {
      case ((e, _), i) if e.dv != null => (e.dv, i)
    }
    val withOld =
      if (oldDvs.isEmpty) matched
      else matched.unionByName(oldDvs.map { case (p, i) =>
        scanDvs(spark, m, Seq(p)).select(col(keyCol), lit(i).as("__eid"))
      }.reduce(_.unionByName(_)))
    val combined = withOld.distinct()
    val dvDir = s"$root/dv/v$v-${java.util.UUID.randomUUID().toString.take(8)}"
    combined.write.mode("errorifexists").partitionBy("__eid").parquet(dvDir)
    // read back with an explicit schema: a no-keys-matched write
    // leaves an empty dir, which schema inference would refuse
    val dvSchema = StructType(Seq(
      StructField(m.keyCol, sparkKeyType(m.keyType)),
      StructField("__eid", IntegerType)))
    val counts = spark.read.schema(dvSchema).parquet(dvDir)
      .groupBy(col("__eid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val updatedHit = hit.zipWithIndex.flatMap { case ((e, _), i) =>
      counts.get(i) match {
        case None => Some(e) // range-touched but no key matched: as-was
        case Some(n) if n == e.dvRows =>
          Some(e) // re-deletes only: identical vector, keep the old sidecar
        case Some(n) if n >= e.rows => None // fully deleted: drop entry
        case Some(n) => Some(e.copy(dv = s"$dvDir/__eid=$i", dvRows = n))
      }
    }
    val changed = hit.zipWithIndex.count { case ((e, _), i) =>
      counts.get(i).exists(_ != e.dvRows)
    }
    val nm = Manifest(v, parent, m.keyType, m.keyCol, m.schemaDdl, m.txns,
      carried.map(_._1) ++ updatedHit, m.statsCols, bloomKeys = m.bloomKeys)
    beforeCommitHook()
    commit(root, nm)
    (nm, changed, carried.length)
  }

  /** Compaction (the production OPTIMIZE): entries smaller than
    * `targetRows` rewrite together into ceil(sum/targetRows) range
    * buckets; entries already at target size CARRY by path. Content
    * is identical before and after — only the file layout changes —
    * so every reader (including time travel to the pre-compaction
    * version) is unaffected. Commit cost ∝ small-file data, never
    * table size. No-op (no commit) when fewer than two entries
    * qualify. Returns (manifest, entriesCompacted, entriesCarried).
    * A commit conflict rebases and retries like [[merge]] (layout
    * work is idempotent — recompacting the new parent is correct). */
  def compact(spark: SparkSession, root: String, keyCol: String,
              targetRows: Long, maxAttempts: Int = 5): (Manifest, Int, Int) =
    withRetry(maxAttempts) {
      val parent = currentVersion(root)
      val m = readManifest(spark, root, parent)
      val (small, carried) = m.entries.partition(_.liveRows < targetRows)
      if (small.length < 2) (m, 0, m.entries.length)
      else {
        val v = parent + 1
        // compaction MATERIALIZES the rewritten entries' deletion
        // vectors (the production OPTIMIZE / purge behavior)
        val src = readEntriesLive(spark, m, small)
        val nb = math.max(1L,
          (small.map(_.liveRows).sum + targetRows - 1) / targetRows).toInt
        val entries = writeBuckets(src, root, v, keyCol,
          bucketExpr(keyCol, m.keyType, nb,
            if (m.keyType == "bigint") small.map(_.maxKeyLong).max else 0L),
          m.statsCols, m.bloomKeys)
        val nm = Manifest(v, parent, m.keyType, m.keyCol, m.schemaDdl, m.txns,
          carried ++ entries, m.statsCols, bloomKeys = m.bloomKeys)
        beforeCommitHook()
        commit(root, nm)
        (nm, small.length, carried.length)
      }
    }

  /** POINT lookup with Bloom-sidecar pruning: range stats prune
    * first, then each surviving entry's key Bloom filter (loaded
    * driver-side, KBs each, cached) rejects buckets that definitely
    * lack the key. This is what makes point reads on HASH-bucketed
    * STRING tables cheap: every hash bucket's lexicographic [min,max]
    * spans essentially the whole key space, so range pruning alone
    * scans all n buckets — the Bloom pass cuts that to ~1 (false
    * positives scan harmlessly; false negatives cannot happen).
    * Entries without sidecars scan conservatively; deletion vectors
    * apply. The probe hashes exactly like the build side
    * (xxhash64, evaluated as a foldable expression — no job).
    * Returns (rows, entriesScanned, entriesSkipped). */
  def lookupKey(spark: SparkSession, root: String, key: Any,
                version: Option[Int] = None): (DataFrame, Int, Int) = {
    val v = version.getOrElse(currentVersion(root))
    val m = readManifest(spark, root, v)
    val inRange = m.entries.partition { e =>
      if (m.keyType == "bigint") {
        val k = key.asInstanceOf[Number].longValue()
        k >= e.minKeyLong && k <= e.maxKeyLong
      } else {
        val k = org.apache.spark.unsafe.types.UTF8String
          .fromString(key.toString)
        // compare in the same UTF8-binary order the stats aggregate used
        k.compareTo(org.apache.spark.unsafe.types.UTF8String
          .fromString(e.minKey)) >= 0 &&
          k.compareTo(org.apache.spark.unsafe.types.UTF8String
            .fromString(e.maxKey)) <= 0
      }
    }
    // hash exactly like the build side (bloom_agg over xxhash64(key)),
    // evaluated driver-side on a literal — no job
    val keyLit =
      if (m.keyType == "bigint")
        org.apache.spark.sql.catalyst.expressions.Literal(
          key.asInstanceOf[Number].longValue())
      else
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(key.toString, StringType)
    val hash = new org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(keyLit)).eval(null).asInstanceOf[Long]
    val (hit, bloomSkipped) = inRange._1.partition { e =>
      e.bloom == null || loadBloom(e.bloom).mightContainLong(hash)
    }
    val df = readEntriesLive(spark, m, hit)
      .filter(col(m.keyCol) === lit(key))
    (df, hit.length, inRange._2.length + bloomSkipped.length)
  }

  /** Zone-map pruned read on ANY stats column (data skipping beyond
    * the key): entries whose recorded [min, max] for `column` misses
    * [lo, hi] never open; the predicate then pushes into the
    * surviving scans and deletion vectors apply. Entries with no
    * recorded stats for the column scan conservatively. The payoff
    * scales with how well the layout CLUSTERS the column — after
    * [[compactZOrder]] on it, a selective range touches O(selectivity)
    * buckets; under key-range layout a non-key column's per-bucket
    * range typically spans everything and nothing skips. */
  def readWhereNum(spark: SparkSession, root: String, column: String,
                   lo: Double, hi: Double,
                   version: Option[Int] = None): (DataFrame, Int, Int) = {
    val v = version.getOrElse(currentVersion(root))
    val m = readManifest(spark, root, v)
    val (hit, skip) = m.entries.partition { e =>
      e.colStats.get(column) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    val df = readEntriesLive(spark, m, hit)
      .filter(col(column).between(lit(lo), lit(hi)))
    (df, hit.length, skip.length)
  }

  /** Conjunctive multi-column zone-map pruning — the read shape
    * Z-ordering exists for: an entry survives only if EVERY range
    * intersects its recorded [min, max] for that column, so pruning
    * power multiplies across dimensions (a 1/k-selective range on
    * each of two z columns skips ~1−1/k² of the buckets, where any
    * single-column sort could only deliver one dimension). Columns
    * without recorded stats scan conservatively; all predicates push
    * into the surviving scans; deletion vectors apply. */
  def readWhereNums(spark: SparkSession, root: String,
                    ranges: Map[String, (Double, Double)],
                    version: Option[Int] = None): (DataFrame, Int, Int) = {
    require(ranges.nonEmpty)
    val v = version.getOrElse(currentVersion(root))
    val m = readManifest(spark, root, v)
    val (hit, skip) = m.entries.partition { e =>
      ranges.forall { case (c, (lo, hi)) =>
        e.colStats.get(c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }
    val df = ranges.foldLeft(readEntriesLive(spark, m, hit)) {
      case (d, (c, (lo, hi))) => d.filter(col(c).between(lit(lo), lit(hi)))
    }
    (df, hit.length, skip.length)
  }

  /** Z-ORDER compaction (the production OPTIMIZE ZORDER BY): rewrite
    * every live row, clustering by the bit-interleaved quantile ranks
    * of `zCols` ([[Zorder]]), into ~`targetBuckets` buckets. Content
    * is identical — only layout changes — but the per-entry zone maps
    * tighten on EVERY z column at once, so [[readWhereNum]] on any of
    * them prunes. `zCols` join the manifest's stats columns. The
    * trade: key stats WIDEN (the z layout scatters the key), so
    * subsequent merges prune less surgically until the next
    * key-ordered [[compact]] — exactly the production trade-off.
    * Deletion vectors materialize like any rewrite. Two passes over
    * the live data (one approxQuantile, one write). Returns
    * (manifest, entriesRewritten). */
  def compactZOrder(spark: SparkSession, root: String,
                    zCols: Seq[String], targetBuckets: Int,
                    maxAttempts: Int = 5): (Manifest, Int) =
    withRetry(maxAttempts) {
      require(zCols.nonEmpty)
      val parent = currentVersion(root)
      val m = readManifest(spark, root, parent)
      if (m.entries.isEmpty) (m, 0)
      else {
        val v = parent + 1
        val src = readEntriesLive(spark, m, m.entries)
        val statsCols = (m.statsCols ++ zCols).distinct
        val bitsPerCol = math.max(1,
          math.ceil(math.log(math.max(2, targetBuckets).toDouble) /
            math.log(2.0) / zCols.length).toInt)
        val nLevels = 1 << bitsPerCol
        val cuts = Zorder.boundaries(src, zCols, nLevels)
        val z = Zorder.zValue(zCols.map(col), cuts, bitsPerCol)
        val entries = writeBuckets(src, root, v, m.keyCol, z, statsCols,
          m.bloomKeys)
        val nm = Manifest(v, parent, m.keyType, m.keyCol, m.schemaDdl,
          m.txns, entries, statsCols, bloomKeys = m.bloomKeys)
        beforeCommitHook()
        commit(root, nm)
        (nm, m.entries.length)
      }
    }

  /** Pruned CDC between two snapshots (the table-format change feed):
    * entries present in BOTH manifests by path hold identical bytes
    * and cancel — only path-differing entries are read, so feed cost
    * ∝ churn between the versions, never table size. The differing
    * sides full-outer join on the key; rows equal on every column
    * (rewrite-without-change survivors of a touched bucket) drop out.
    * Both sides scan under the NEWER schema (old rows null-fill
    * evolved columns — matching what a reader of each version joined
    * on the evolved schema would see). Output: key, op ∈ {insert,
    * update, delete}, then old_/new_ prefixed data columns (null on
    * the absent side). Returns (feed, entriesRead, entriesCancelled). */
  def changefeed(spark: SparkSession, root: String, keyCol: String,
                 fromVersion: Int, toVersion: Int): (DataFrame, Int, Int) = {
    val mo = readManifest(spark, root, fromVersion)
    val mn = readManifest(spark, root, toVersion)
    // entry identity = (path, dv): a bucket whose deletion vector
    // changed holds different LIVE rows behind the same data path, so
    // it must diff, while a bucket carried with its dv intact cancels
    def ident(e: Entry) = (e.path, Option(e.dv))
    val oldIds = mo.entries.map(ident).toSet
    val newIds = mn.entries.map(ident).toSet
    val onlyOld = mo.entries.filterNot(e => newIds(ident(e)))
    val onlyNew = mn.entries.filterNot(e => oldIds(ident(e)))
    val cancelled = (mo.entries.length - onlyOld.length) +
      (mn.entries.length - onlyNew.length)
    val dataCols = mn.schema.fieldNames.filter(_ != keyCol).toSeq
    def packed(m: Manifest, es: Seq[Entry]): DataFrame =
      readEntriesLiveAs(spark, m, es, mn.schema).select(col(keyCol),
        struct(dataCols.map(col): _*).as("__v"))
    val j = packed(mo, onlyOld).withColumnRenamed("__v", "__old")
      .join(packed(mn, onlyNew).withColumnRenamed("__v", "__new"),
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

  /** Incremental change-data-feed reader — the CONSUMER side of the
    * CDC loop ([[changefeed]] is the per-step diff): one feed batch
    * per version step after `fromVersion`, each tagged with the
    * version that produced it. This is the shape a downstream
    * incremental job (index refresh, aggregate maintenance, replica
    * sync) consumes: cost ∝ churn per step (carried entries cancel
    * inside every step), never table size, and a layout-only step
    * (compaction, z-ordering) contributes ZERO rows. */
  def changesSince(spark: SparkSession, root: String, keyCol: String,
                   fromVersion: Int): DataFrame = {
    val vs = versions(root).filter(_ > fromVersion).sorted
    require(vs.nonEmpty, s"no versions after $fromVersion")
    vs.map { v =>
      val step =
        if (v == 1) {
          // the create itself: every row arrives as an insert
          val m = readManifest(spark, root, 1)
          val dataCols = m.schema.fieldNames.filter(_ != keyCol).toSeq
          readEntriesLive(spark, m, m.entries).select(
            col(keyCol) +: lit("insert").as("op") +:
              dataCols.flatMap(c => Seq(
                lit(null).cast(m.schema(c).dataType).as(s"old_$c"),
                col(c).as(s"new_$c"))): _*)
        } else changefeed(spark, root, keyCol, v - 1, v)._1
      step.withColumn("version", lit(v.toLong))
    }.reduce(_.unionByName(_))
  }

  /** Incremental VIEW MAINTENANCE over the change feed: a grouped
    * (count, sum) aggregate at the latest version computed as the
    * aggregate AT `fromVersion` plus the [[changesSince]] deltas —
    * never rescanning the table. Each feed row contributes +1/+new
    * under its new-side group and −1/−old under its old-side group
    * (inserts have no old side, deletes no new side, and an update
    * that MOVES a row between groups contributes to both), so the
    * maintained state equals the direct aggregate by construction.
    * Cost ∝ base-aggregate size + churn since `fromVersion` — the
    * materialized-view refresh pattern a 100 TB corpus-statistics
    * dashboard needs (re-aggregating the table per refresh is the
    * thing this exists to avoid). Groups whose count reaches zero
    * drop out, matching the direct aggregate. */
  def maintainedAgg(spark: SparkSession, root: String, keyCol: String,
                    groupCol: String, valCol: String,
                    fromVersion: Int): DataFrame = {
    val base = read(spark, root, Some(fromVersion))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__bc"), sum(col(valCol)).as("__bs"))
    val feed = changesSince(spark, root, keyCol, fromVersion)
    val plus = feed.filter(col("op") =!= "delete")
      .select(col(s"new_$groupCol").as(groupCol), lit(1L).as("__dc"),
        col(s"new_$valCol").as("__dv"))
    val minus = feed.filter(col("op") =!= "insert")
      .select(col(s"old_$groupCol").as(groupCol), lit(-1L).as("__dc"),
        (-col(s"old_$valCol")).as("__dv"))
    val delta = plus.unionByName(minus)
      .groupBy(col(groupCol))
      .agg(sum(col("__dc")).as("__dc"), sum(col("__dv")).as("__dv"))
    base.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("__bc"), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("__bs"), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as(s"sum_$valCol"))
      .filter(col("n_rows") > 0L)
  }

  // ---------------------------------------------------------------
  // Branches: write-audit-publish (WAP)
  //
  // A branch is a full table rooted at `$root/_branches/<name>` whose
  // version-1 manifest is a copy of a main snapshot — entries are
  // immutable files, so branching is O(manifest) metadata, never a
  // data copy. Every existing op (merge/delete/compact/read/…) works
  // on the branch root unchanged; branch writes land under the
  // BRANCH's data tree, so main never sees them until publish. The
  // WAP flow: createBranch → write → audit (any reads/gates over
  // read(branchRoot)) → publishBranch (fast-forward main) or
  // dropBranch (abandon — branch-local files die with the branch).
  // ---------------------------------------------------------------

  /** Publish found main advanced past the branch's base snapshot —
    * a fast-forward would silently drop main's newer commits. */
  final class BranchDivergedException(msg: String)
    extends RuntimeException(msg)

  def branchRoot(root: String, name: String): String =
    s"$root/_branches/$name"

  private def branchMetaPath(root: String, name: String) =
    Paths.get(s"${branchRoot(root, name)}/_branch.json")

  /** Fork `name` off main at `fromVersion` (default: current head).
    * Returns the base version the branch froze. */
  def createBranch(spark: SparkSession, root: String, name: String,
                   fromVersion: Option[Int] = None): Int = {
    require(name.nonEmpty && !name.contains("/"), s"bad branch name: $name")
    // a ready-marked .rebase_<name> temp is the branch's completed
    // next state whose swap crashed — finish it FIRST, so create
    // fails with "already exists" instead of minting a new branch a
    // later recovery would silently clobber
    completeCrashedRebase(root, name)
    val base = fromVersion.getOrElse(currentVersion(root))
    val m = readManifest(spark, root, base)
    val br = branchRoot(root, name)
    require(versions(br).isEmpty, s"branch $name already exists")
    Files.createDirectories(Paths.get(br))
    Files.write(branchMetaPath(root, name),
      s"""{"name": ${jstr(name)}, "base_version": $base}""".getBytes("UTF-8"))
    commit(br, m.copy(version = 1, parent = 0))
    base
  }

  /** The main-table version the branch was forked from. */
  def branchBaseVersion(root: String, name: String): Int = {
    val body = new String(Files.readAllBytes(branchMetaPath(root, name)), "UTF-8")
    implicit val fmts: Formats = DefaultFormats
    (JsonMethods.parse(body) \ "base_version").extract[Int]
  }

  /** Every branch-shaped dir, INCLUDING dot-prefixed internal ones
    * (a `.rebase_<name>` mid-swap temp has manifests of its own) —
    * [[vacuum]]'s referenced set must span these too, or a vacuum
    * racing a rebase could strand the half-swapped branch. */
  private def allBranchDirs(root: String): Seq[String] =
    Option(new java.io.File(s"$root/_branches").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(d => d.isDirectory && versions(d.getPath).nonEmpty)
      .map(_.getName).sorted

  def listBranches(root: String): Seq[String] =
    allBranchDirs(root).filterNot(_.startsWith("."))

  /** The entries with branch-local paths rewritten to their main-tree
    * locations — pure path arithmetic, no filesystem effects. Version
    * dirs carry a fresh-UUID suffix, so names never collide under
    * main. */
  private def rehomedEntries(entries: Seq[Entry], br: String,
                             root: String): Seq[Entry] = {
    def patch(p: String): String =
      if (p == null) null
      else if (p.startsWith(s"$br/")) s"$root/${p.stripPrefix(s"$br/")}"
      else p
    entries.map(e => e.copy(path = patch(e.path), dv = patch(e.dv),
      bloom = patch(e.bloom)))
  }

  /** Move every still-branch-local version directory named by the
    * RE-HOMED `entries` under the main tree. The move list derives
    * from the TARGET paths (each `$root/sub/d` whose source
    * `$br/sub/d` still exists moves), NOT from the branch prefix —
    * this is what makes a crashed publish recoverable: after the
    * re-homed branch commit, a recovery re-run reads entries that are
    * already main-pathed, and a source-prefix filter would match
    * nothing and move nothing while the dirs still sit under the
    * branch (then committing main against absent paths). Each move is
    * a same-filesystem directory rename (atomic per dir);
    * already-moved dirs have no surviving source and skip. */
  private def moveRehomed(entries: Seq[Entry], br: String,
                          root: String): Unit = {
    def moveTree(sub: String, paths: Seq[String]): Unit = {
      val prefix = s"$root/$sub/"
      paths.filter(_.startsWith(prefix))
        .map(p => p.stripPrefix(prefix).takeWhile(_ != '/'))
        .distinct.foreach { d =>
          val from = Paths.get(s"$br/$sub/$d")
          val to = Paths.get(s"$root/$sub/$d")
          if (Files.exists(from) && !Files.exists(to)) {
            Files.createDirectories(to.getParent)
            Files.move(from, to): Unit
          }
        }
    }
    moveTree("data", entries.map(_.path))
    moveTree("dv", entries.collect { case e if e.dv != null => e.dv })
    moveTree("bloom", entries.collect { case e if e.bloom != null => e.bloom })
  }

  /** Complete a publish that crashed between its re-homed branch
    * commit and the file moves: if the branch head is already fully
    * main-pathed (the commit [[publishBranch]] makes BEFORE any move)
    * but some version dirs still sit under the branch tree, finish
    * the moves. Idempotent and cheap — a head with branch-local
    * entries (no publish in flight) short-circuits, and
    * [[moveRehomed]] skips dirs already at their target. Runs BEFORE
    * the divergence check, so the crashed state is repaired even when
    * main advanced in the meantime — the state in which both a
    * publish re-run (throws diverged before moving) and a rebase
    * (cannot read the broken head) would otherwise wedge forever. */
  private def completeCrashedPublish(spark: SparkSession, root: String,
                                     name: String): Unit = {
    val br = branchRoot(root, name)
    val head = readManifest(spark, br, currentVersion(br))
    if (rehomedEntries(head.entries, br, root) == head.entries)
      moveRehomed(head.entries, br, root)
  }

  /** Complete a rebase that crashed mid-swap: a `.rebase_<name>` dir
    * carrying the ready marker is a COMPLETE rebased branch whose
    * old→new swap never finished — drop whatever remains of the old
    * branch and move it into place. Without the marker the temp is a
    * partial build and the old branch is authoritative — sweep it,
    * UNLESS the temp is younger than [[rebaseTempFreshnessMs]]: a
    * young marker-less temp may be a LIVE rebase in another process
    * mid-build, and sweeping it would destroy the in-flight work
    * (the concurrent-entry-point race) — fail loudly instead.
    *
    * The swap itself is CLAIMED by atomically renaming the ready
    * marker ([[claimRebaseSwap]]) before any destructive step, so a
    * recovery racing the rebase's own swap (or a second recovery) can
    * never interleave rm(branch)/move(temp) with it — exactly one
    * claimant performs the swap; the loser observes the claim and
    * either waits ([[rebaseBranch]]) or leaves it alone (here, when
    * the claim is fresh) / re-claims and completes it (when the
    * claimant itself crashed: claim older than the freshness bound).
    *
    * CONTRACT: branch-mutating ops (rebase/publish/drop and branch
    * writes) are single-writer PER BRANCH; these guards exist to turn
    * violations and crash overlaps into detectable errors or safe
    * completions rather than silent branch loss. */
  private def completeCrashedRebase(root: String, name: String): Unit = {
    val br = branchRoot(root, name)
    val tmp = branchRoot(root, s".rebase_$name")
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    if (Files.exists(Paths.get(s"$tmp/$RebaseReadyMarker"))) {
      // complete a crashed ready rebase — but only as the CLAIMANT;
      // losing the claim means another actor is completing it now
      if (claimRebaseSwap(tmp)) performRebaseSwap(root, name)
    } else if (Files.exists(Paths.get(tmp))) {
      rebaseClaims(tmp) match {
        case claims if claims.nonEmpty =>
          // a swap was claimed: fresh claim = live claimant mid-swap
          // (leave it alone); stale claim = the claimant crashed
          // between claim and swap — re-claim (atomic rename, one
          // winner) and finish the swap it started
          if (newestMtime(tmp) < System.currentTimeMillis() -
              rebaseTempFreshnessMs &&
              claimRebaseClaim(tmp, claims.max)) {
            performRebaseSwap(root, name)
          }
        case _ if newestMtime(tmp) >=
            System.currentTimeMillis() - rebaseTempFreshnessMs =>
          throw new IllegalStateException(
            s"rebase of branch $name in flight or freshly crashed " +
              s"(temp $tmp younger than ${rebaseTempFreshnessMs}ms); " +
              "retry after the bound, or dropBranch to abandon it")
        case _ => rm(new java.io.File(tmp))
      }
    }
    Files.deleteIfExists(Paths.get(s"$br/$RebaseReadyMarker")): Unit
    rebaseClaims(br).foreach(c =>
      Files.deleteIfExists(Paths.get(s"$br/$c")): Unit)
  }

  private val RebaseReadyMarker = "_rebase_ready.json"
  private val RebaseClaimPrefix = "_rebase_claim_"

  /** Marker-less temp sweep freshness bound: a `.rebase_<name>` temp
    * whose newest file is younger than this may be a LIVE build —
    * recovery refuses to sweep it. Settable seam for crash tests. */
  private[graft] var rebaseTempFreshnessMs: Long = 10 * 60 * 1000L

  private def rebaseClaims(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith(RebaseClaimPrefix)).sorted

  private def newestMtime(dir: String): Long = {
    def walk(f: java.io.File): Long =
      (f.lastModified() +: Option(f.listFiles).toSeq.flatten.map(walk)).max
    val f = new java.io.File(dir)
    if (f.exists()) walk(f) else 0L
  }

  /** Atomically CLAIM the old→new swap by renaming the ready marker
    * to a uniquely-named claim file — rename is atomic, so exactly
    * one of {the rebase's own swap, a concurrent recovery} wins; the
    * loser sees NoSuchFile and backs off. */
  private def claimRebaseSwap(tmp: String): Boolean =
    try {
      Files.move(Paths.get(s"$tmp/$RebaseReadyMarker"),
        Paths.get(s"$tmp/$RebaseClaimPrefix${
          java.util.UUID.randomUUID().toString.take(8)}"),
        StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case _: java.nio.file.NoSuchFileException => false }

  /** Re-claim a STALE claim (its holder crashed between claim and
    * swap): rename claim→fresh-claim, atomic, one winner. */
  private def claimRebaseClaim(tmp: String, claim: String): Boolean =
    try {
      Files.move(Paths.get(s"$tmp/$claim"),
        Paths.get(s"$tmp/$RebaseClaimPrefix${
          java.util.UUID.randomUUID().toString.take(8)}"),
        StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case _: java.nio.file.NoSuchFileException => false }

  /** The guarded swap body — runs ONLY under a won claim: drop the
    * old branch tree, rename the temp into place, clear claim files
    * (they rode the rename into the branch). */
  private def performRebaseSwap(root: String, name: String): Unit = {
    val br = branchRoot(root, name)
    val tmp = branchRoot(root, s".rebase_$name")
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    if (Files.exists(Paths.get(br))) rm(new java.io.File(br))
    Files.move(Paths.get(tmp), Paths.get(br)): Unit
    rebaseClaims(br).foreach(c =>
      Files.deleteIfExists(Paths.get(s"$br/$c")): Unit)
  }

  /** Fast-forward main to the branch head (the "publish" of WAP).
    *
    * Contract: main's head must still be the branch's base snapshot —
    * anything else throws [[BranchDivergedException]] (a fast-forward
    * over later main commits would drop them; [[rebaseBranch]] replays
    * the branch's net changes onto the new head, and
    * [[publishBranchRebasing]] loops the two under OCC).
    *
    * Crash/vacuum safety — the ordering matters: the branch head is
    * re-committed against the RE-HOMED paths BEFORE any file moves.
    * From that commit on, the branch's manifest history references
    * every moved dir at both its old location (versions ≤ head) and
    * its new one (head+1), and [[vacuum]]'s referenced set spans the
    * branch's full history — so no instant exists where a moved dir is
    * referenced by no manifest (the previous move-first ordering had
    * exactly that window, in which a concurrent vacuum(root) could
    * delete the only copy). Each move is an atomic per-dir rename; a
    * crash mid-publish is recovered by RE-RUNNING publish (already-
    * moved dirs are skipped, the re-homed commit is idempotent), and
    * until the moves finish the branch stays fully readable at its
    * pre-publish version. Recovery runs BEFORE the divergence check
    * ([[completeCrashedPublish]]) — so even when main advanced while
    * the publish lay crashed, the re-run repairs the branch (then
    * throws diverged, and [[rebaseBranch]] can proceed) instead of
    * wedging on a head that references unmoved paths. Returns the new
    * main version. */
  def publishBranch(spark: SparkSession, root: String,
                    name: String): Int = {
    val br = branchRoot(root, name)
    completeCrashedRebase(root, name)
    completeCrashedPublish(spark, root, name)
    val base = branchBaseVersion(root, name)
    val cur = currentVersion(root)
    if (cur != base)
      throw new BranchDivergedException(
        s"main at v$cur but branch $name forked from v$base")
    val head = readManifest(spark, br, currentVersion(br))
    val rehomed = rehomedEntries(head.entries, br, root)
    if (rehomed != head.entries)
      commit(br, head.copy(version = head.version + 1,
        parent = head.version, entries = rehomed))
    moveRehomed(rehomed, br, root)
    try {
      commit(root, head.copy(version = base + 1, parent = base,
        entries = rehomed))
      base + 1
    } catch {
      case e: ConcurrentCommitException =>
        throw new BranchDivergedException(
          s"main advanced to v${e.version} during publish of $name")
    }
  }

  /** REBASE the branch onto main's current head: the branch's NET
    * row-level changes against its base snapshot (one [[changefeed]]
    * diff v1→head — carried entries cancel, so the delta is
    * churn-sized, never table-sized) replay onto a fresh fork of
    * main's head as one merge (upserts) + one delete. Overlapping
    * keys resolve branch-wins — standard rebase semantics; main
    * commits on keys the branch never touched are preserved because
    * the new fork starts from main's head.
    *
    * Crash safety — the rebased branch builds COMPLETELY under the
    * hidden temp name `.rebase_<name>` (delta staged, main's head
    * forked, delta replayed) while the old branch still exists, then
    * a ready marker lands and the old→new swap runs (drop old, one
    * atomic dir rename). A crash before the marker leaves the old
    * branch authoritative (the temp sweeps on the next attempt); a
    * crash after it is finished by [[completeCrashedRebase]], which
    * every publish/rebase entry point runs first — no state loses the
    * branch. The temp has manifests of its own, so vacuum's
    * referenced set spans it (via allBranchDirs) while
    * [[listBranches]] hides it. Returns the new base version. */
  def rebaseBranch(spark: SparkSession, root: String, name: String,
                   keyCol: String): Int = {
    completeCrashedRebase(root, name)
    completeCrashedPublish(spark, root, name)
    val br = branchRoot(root, name)
    val head = currentVersion(br)
    val newBase = currentVersion(root)
    val m = readManifest(spark, br, head)
    val dataCols = m.schema.fieldNames.filter(_ != keyCol).toSeq
    val (feed, _, _) = changefeed(spark, br, keyCol, 1, head)
    val tmpName = s".rebase_$name"
    val tmp = branchRoot(root, tmpName)
    // stage the churn-sized delta once (changefeed is lazy and reads
    // the full branch history; merge/delete below each act on it)
    feed.filter(col("op") =!= "delete")
      .select(col(keyCol) +: dataCols.map(c => col(s"new_$c").as(c)): _*)
      .write.parquet(s"$tmp/.delta/upserts")
    feed.filter(col("op") === "delete").select(col(keyCol))
      .write.parquet(s"$tmp/.delta/deletes")
    // build the rebased branch at the temp name while the old branch
    // still exists: fork main's head, replay the delta
    Files.write(branchMetaPath(root, tmpName),
      s"""{"name": ${jstr(name)}, "base_version": $newBase}"""
        .getBytes("UTF-8")): Unit
    commit(tmp, readManifest(spark, root, newBase)
      .copy(version = 1, parent = 0))
    val ups = spark.read.parquet(s"$tmp/.delta/upserts")
    if (!ups.isEmpty) merge(spark, tmp, ups, keyCol): Unit
    val dels = spark.read.parquet(s"$tmp/.delta/deletes")
    if (!dels.isEmpty) delete(spark, tmp, dels, keyCol): Unit
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    rm(new java.io.File(s"$tmp/.delta"))
    // re-home every temp manifest onto the branch's FINAL path before
    // the marker: the swap below is one directory rename, so data
    // dirs travel with it — entry paths must point at where they land
    // (a manifest still referencing the temp would break on the move)
    versions(tmp).foreach { v =>
      val mv = readManifest(spark, tmp, v)
      def rh(p: String): String =
        if (p == null) null
        else if (p.startsWith(s"$tmp/")) s"$br/${p.stripPrefix(s"$tmp/")}"
        else p
      val patched = mv.copy(entries = mv.entries.map(e =>
        e.copy(path = rh(e.path), dv = rh(e.dv), bloom = rh(e.bloom))))
      val target = Paths.get(manifestPath(tmp, v))
      val scratch = Paths.get(s"${manifestPath(tmp, v)}.rehome")
      Files.write(scratch, manifestJson(patched).getBytes("UTF-8"))
      Files.move(scratch, target,
        StandardCopyOption.REPLACE_EXISTING): Unit
    }
    // marker LAST: from here the temp is the branch's next state and
    // any crash in the swap below is completed, not rolled back
    Files.write(Paths.get(s"$tmp/$RebaseReadyMarker"),
      s"""{"branch": ${jstr(name)}}""".getBytes("UTF-8")): Unit
    rebaseSwapHook()
    // swap ONLY under a won claim (atomic marker rename) — a
    // concurrent recovery that saw the marker may be swapping right
    // now; without the claim this rm/move pair could interleave with
    // its rm/move and destroy the just-swapped-in branch (the
    // recovery swaps, our rm deletes the new branch, our move fails
    // with the temp gone). NOT dropBranch either — dropBranch also
    // sweeps the temp (abandoning a branch abandons its rebase),
    // which here would delete the tree we are about to move.
    if (claimRebaseSwap(tmp)) {
      performRebaseSwap(root, name)
    } else {
      // a recovery claimed the swap between marker and here: it is
      // performing the IDENTICAL swap — wait it out, then verify
      val deadline = System.currentTimeMillis() + 30000L
      while (Files.exists(Paths.get(tmp)) &&
             System.currentTimeMillis() < deadline) Thread.sleep(10)
      if (Files.exists(Paths.get(tmp)) || !Files.exists(Paths.get(br)))
        throw new IllegalStateException(
          s"rebase swap of $name claimed by another actor but not " +
            "completed within 30s")
    }
    newBase
  }

  /** Test seam: runs after the rebase ready marker lands, before the
    * old→new branch swap — lets a spec crash a rebase mid-swap. */
  private[graft] var rebaseSwapHook: () => Unit = () => ()

  /** Publish with rebase-retry under OCC: fast-forward if main never
    * moved; otherwise rebase onto the new head and try again — the
    * same contend-and-retry discipline as [[merge]]'s OCC loop, at
    * branch granularity. Returns the new main version. */
  def publishBranchRebasing(spark: SparkSession, root: String,
                            name: String, keyCol: String,
                            maxAttempts: Int = 5): Int = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return publishBranch(spark, root, name)
      catch {
        case e: BranchDivergedException =>
          if (attempt >= maxAttempts) throw e
          rebaseBranch(spark, root, name, keyCol): Unit
      }
    }
    -1 // unreachable
  }

  // ---------------------------------------------------------------
  // Shallow clones (Delta-style CLONE): an INDEPENDENT table whose v1
  // manifest copies a source snapshot — zero data copy; the clone's
  // own writes land under its root, the source never sees them, and
  // each evolves its own version line (unlike a branch, a clone is
  // never published back). The source records its clones in
  // `_clones.json` so vacuum() keeps files a live clone still
  // references; deleting the clone's directory detaches it (vacuum
  // skips missing roots).
  // ---------------------------------------------------------------

  private def clonesPath(root: String) = Paths.get(s"$root/_clones.json")

  /** Clone roots recorded against `root`, pruned to those still on
    * disk with at least one manifest. */
  def listClones(root: String): Seq[String] = {
    if (!Files.exists(clonesPath(root))) return Seq.empty
    val body = new String(Files.readAllBytes(clonesPath(root)), "UTF-8")
    implicit val fmts: Formats = DefaultFormats
    (JsonMethods.parse(body) \ "clones") match {
      case JArray(xs) =>
        xs.map(_.extract[String]).filter(r => versions(r).nonEmpty)
      case _ => Seq.empty
    }
  }

  /** Shallow-clone `srcRoot`'s snapshot (default: latest) into a new
    * independent table at `dstRoot`. O(manifest) metadata; returns the
    * clone's v1 manifest. */
  def cloneAt(spark: SparkSession, srcRoot: String, dstRoot: String,
              version: Option[Int] = None): Manifest = {
    require(versions(dstRoot).isEmpty, s"clone target $dstRoot not empty")
    val m = readManifest(spark, srcRoot,
      version.getOrElse(currentVersion(srcRoot)))
    Files.createDirectories(Paths.get(dstRoot))
    commit(dstRoot, m.copy(version = 1, parent = 0))
    val recorded = listClones(srcRoot) :+ dstRoot
    Files.write(clonesPath(srcRoot),
      s"""{"clones": [${recorded.distinct.map(jstr).mkString(", ")}]}"""
        .getBytes("UTF-8"))
    readManifest(spark, dstRoot, 1)
  }

  /** Delete the branch: its manifests and every still-branch-local
    * file — including any in-flight `.rebase_<name>` temp (abandoning
    * the branch abandons its rebase; a stale ready-marked temp left
    * behind would otherwise overwrite a future branch of the same
    * name via [[completeCrashedRebase]]). Published data was re-homed
    * under main and is unaffected; unpublished work dies here by
    * design (the "abandon" arm of WAP). */
  def dropBranch(root: String, name: String): Unit = {
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    rm(new java.io.File(branchRoot(root, name)))
    rm(new java.io.File(branchRoot(root, s".rebase_$name")))
  }

  /** Vacuum: drop manifests older than the last `retainVersions`
    * snapshots, then delete every data bucket directory no retained
    * manifest references — including orphan dirs from crashed or
    * OCC-losing write attempts. Listing here is local-FS (the sandbox
    * has no object store); at 100 TB the listing is a distributed job
    * but the referenced-set is still only manifest-count-sized.
    * BRANCH-AWARE: live branches' manifests extend the referenced set
    * (a branch carries pointers into main's data tree; a published
    * branch's re-homed files live there too), so vacuuming main never
    * strands a branch that is still within its own retention.
    *
    * IN-FLIGHT-WRITER SAFE (r16, the [[graft.tables.IndexCatalog.gc]]
    * barrier discipline transplanted): version dirs are named
    * `v<N>-<uniq>` for the TARGET version their writer will commit,
    * and the sweep only considers dirs with N ≤ the head version —
    * such a dir is either referenced (kept) or its writer provably
    * lost the v<N> CAS (v<N> is already committed) and the dir is a
    * dead orphan. A dir targeting N > head may be a LIVE writer
    * between its data write and its commit; sweeping it would let
    * that writer commit pointers at deleted dirs (the gc TOCTOU).
    * Such an orphan from a CRASHED writer is collected by any later
    * vacuum once the head passes N.
    * Returns (bucketDirsDeleted, manifestsDeleted). */
  def vacuum(spark: SparkSession, root: String,
             retainVersions: Int): (Int, Int) = {
    val vs = versions(root)
    val cur = vs.lastOption.getOrElse(0)
    val keepFrom = math.max(1, cur - retainVersions + 1)
    // the sweepable frontier: unparseable names stay (conservative)
    def targetOf(name: String): Int =
      if (name.startsWith("v"))
        name.drop(1).takeWhile(_.isDigit).toIntOption
          .getOrElse(Int.MaxValue)
      else Int.MaxValue
    def referencedBy(r: String, from: Int): Set[String] =
      versions(r).filter(_ >= from).flatMap { v =>
        val m = readManifest(spark, r, v)
        m.entries.map(_.path) ++
          m.entries.collect { case e if e.dv != null => e.dv } ++
          m.entries.collect { case e if e.bloom != null => e.bloom }
      }.toSet
    val referenced = referencedBy(root, keepFrom) ++
      allBranchDirs(root).flatMap(b =>
        referencedBy(branchRoot(root, b), 1)) ++
      // live shallow clones keep their referenced source files too
      listClones(root).flatMap(c => referencedBy(c, 1))
    def rmTree(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rmTree)); p.delete(): Unit
    }
    var dirsDeleted = 0
    // data buckets and deletion-vector sidecars share the sweep: any
    // per-entry leaf dir (…/__bucket=<b> or …/__eid=<i>) no retained
    // manifest references goes — including losing-OCC-attempt orphans
    Seq(s"$root/data", s"$root/dv").foreach { treeRoot =>
      val versionDirs = Option(new java.io.File(treeRoot).listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(d => d.isDirectory && targetOf(d.getName) <= cur)
      versionDirs.foreach { vd =>
        Option(vd.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .filter(d => d.isDirectory &&
            (d.getName.startsWith("__bucket=") ||
              d.getName.startsWith("__eid=")))
          .foreach { b =>
            if (!referenced(b.getPath)) { rmTree(b); dirsDeleted += 1 }
          }
        if (Option(vd.listFiles()).forall(_.isEmpty)) rmTree(vd)
      }
    }
    // bloom sidecars are FILES under bloom/v*-*/: same referenced-set
    // rule, same in-flight frontier
    Option(new java.io.File(s"$root/bloom").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(d => d.isDirectory && targetOf(d.getName) <= cur)
      .foreach { vd =>
        Option(vd.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .filter(f => f.isFile && f.getName.endsWith(".bloom"))
          .foreach { f =>
            if (!referenced(f.getPath)) { f.delete(); dirsDeleted += 1 }
          }
        if (Option(vd.listFiles()).forall(_.isEmpty)) rmTree(vd)
      }
    var manifestsDeleted = 0
    vs.filter(_ < keepFrom).foreach { v =>
      if (Files.deleteIfExists(Paths.get(manifestPath(root, v))))
        manifestsDeleted += 1
    }
    (dirsDeleted, manifestsDeleted)
  }
}

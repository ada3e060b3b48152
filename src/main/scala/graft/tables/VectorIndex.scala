package graft.tables

import java.nio.file.{Files, Paths}

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
            refine: Int = 0, carry: Seq[String] = Nil,
            ver: Long = 0L): Unit = {
    val centroids = Similarity.ivfCentroids(corpus, nlist, refine)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    // facet columns named in `carry` ride the cell rows (the
    // postingsStagedWith discipline), so a filtered probe prunes on
    // its own scan — see [[topKFiltered]]; `ver` stamps each row's
    // doc version for the versioned-identity kill rules
    // ([[supersede]]/[[applyChanges]] — a re-embedded vector appends
    // under a HIGHER version than the one it supersedes)
    Similarity.ivfAssignWith(corpus.withColumn("ver", lit(ver)),
        centroids, carry :+ "ver")
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
             batch: Option[String] = None, ver: Long = 0L): Unit =
    appendVersioned(fresh.withColumn("ver", lit(ver)), dir, batch)

  /** [[append]] for a batch whose rows carry their OWN `ver` column —
    * the change-feed shape ([[applyChanges]]): one batch can hold
    * several table versions' worth of churn, and a re-embedded vector
    * appends under a higher version than the one a matching
    * [[supersede]] kills. Extra columns beyond (vec_id, label,
    * embedding) — facets and `ver` — ride the cell rows. */
  def appendVersioned(fresh: DataFrame, dir: String,
                      batch: Option[String] = None): Unit = {
    val spark = fresh.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val carry = fresh.columns.toSeq
      .filterNot(Set("vec_id", "label", "embedding"))
    val assigned = Similarity.ivfAssignWith(fresh, centroids, carry)
    batch match {
      case Some(b) =>
        assigned.write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/cells_batch_$b")
      case None =>
        assigned.write.mode("append").partitionBy("centroid_id")
          .parquet(s"$dir/cells")
    }
  }

  /** TOMBSTONE-delete vectors from the index: one skinny vec_id
    * relation written (O(|ids|) — no cell partition read or
    * rewritten); [[cells]]/[[pqCodes]] anti-join the broadcast
    * tombstone set, so deleted vectors stop being retrievable
    * IMMEDIATELY on both the float and the compressed path. Unlike
    * the lexical index there is NOTHING to drift — IVF carries no
    * corpus statistics and the PQ codebooks are fixed by design — so
    * tombstoned retrieval is exact: full probe over the tombstoned
    * index ≡ brute force over the live corpus, same-oracle-shape as
    * the append rows. [[compactTo]] folds the tombstones into the
    * next generation. Batch-id'd deletes absorb at-least-once
    * redelivery like [[append]].
    */
  def delete(vecIds: DataFrame, dir: String,
             batch: Option[String] = None): Unit = {
    // an index must exist before it can tombstone (InvertedIndex
    // .delete's guard) — a mistyped dir must fail loudly, not record
    // tombstones nowhere
    require(Files.exists(Paths.get(s"$dir/centroids")),
      s"no vector index at $dir")
    val id = batch.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    vecIds.select(col("vec_id")).distinct()
      .write.mode("overwrite").parquet(s"$dir/deletes_batch_$id")
  }

  /** SUPERSEDE: kill every version of each vec_id BELOW its
    * `kill_below` — the versioned half of an UPDATE (the re-embedded
    * vector appends at `kill_below` via [[appendVersioned]], the old
    * version dies here; an id-level [[delete]] would kill the
    * re-append too). O(|ids|) like delete; same at-least-once batch
    * discipline. Mirrors [[InvertedIndex.supersede]]. */
  def supersede(vecVers: DataFrame, dir: String,
                batch: Option[String] = None): Unit = {
    require(Files.exists(Paths.get(s"$dir/centroids")),
      s"no vector index at $dir")
    // a compressed index's code rows carry no version to compare
    // against kill_below (they read as ver 0, so a supersede would
    // erase the vector from PQ retrieval entirely, including its
    // re-encoded update) — same float-path-only rule as applyChanges
    require(!Files.exists(Paths.get(s"$dir/codes")),
      "supersede is float-path only — rebuild/retrain the compressed " +
        "index via the catalog's compact instead")
    val id = batch.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    vecVers.select(col("vec_id"), col("kill_below").cast("long"))
      .groupBy(col("vec_id"))
      .agg(max(col("kill_below")).as("kill_below"))
      .write.mode("overwrite").parquet(s"$dir/supersedes_batch_$id")
  }

  /** Consume a CoW change feed over an embedding table
    * ([[CowTable.changesSince]] shape: op ∈ insert/update/delete,
    * vec_id, new_<col>s, version) — CDC maintains the VECTOR index
    * exactly as [[InvertedIndex.applyChanges]] maintains the lexical
    * one: inserts/updates assign + append their vectors under the
    * feed version, updates/deletes supersede every version below it.
    * Unlike the lexical side there is nothing to drift — IVF carries
    * no corpus statistics — so full-probe retrieval over the
    * maintained index is EXACT against the live table. Feed contract
    * as on the lexical side: `insert` means a NEW vec identity.
    * Float path only: a compressed (PQ) index re-encodes via a
    * catalog-governed rebuild — its residual codes carry no version
    * column to filter on. */
  def applyChanges(feed: DataFrame, dir: String,
                   batch: Option[String] = None): Unit = {
    require(!Files.exists(Paths.get(s"$dir/codes")),
      "versioned CDC updates are float-path only — rebuild/retrain " +
        "the compressed index via the catalog's compact instead")
    val staged = feed.persist()
    try {
      val dataCols = staged.columns.filter(_.startsWith("new_")).toSeq
      val ups = staged.filter(col("op") =!= "delete")
        .select(col("vec_id") +:
          col("version").cast("long").as("ver") +:
          dataCols.map(c => col(c).as(c.stripPrefix("new_"))): _*)
      val downs = staged.filter(col("op") =!= "insert")
        .select(col("vec_id"),
          col("version").cast("long").as("kill_below"))
      if (!ups.isEmpty)
        appendVersioned(ups, dir, batch.map(b => s"${b}u"))
      if (!downs.isEmpty) supersede(downs, dir, batch.map(b => s"${b}d"))
    } finally staged.unpersist(): Unit
  }

  /** Batch roots for `prefix`, sorted; with `only` set (the
    * [[IndexCatalog]] serving path) unregistered batch ids are
    * excluded — an in-flight or crashed-before-commit append is never
    * served and never folded. */
  private def batchRoots(dir: String, prefix: String,
                         only: Option[Set[String]] = None): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(s"${prefix}_batch_"))
      .filter(f => only.forall { ids =>
        val suffix = f.getName.substring(
          f.getName.indexOf("_batch_") + "_batch_".length)
        // a registered id X admits X itself AND the Xu/Xd roots
        // [[applyChanges]] derives from one batch id —
        // InvertedIndex.batchRoots' rule
        ids.contains(suffix) ||
          ((suffix.endsWith("u") || suffix.endsWith("d")) &&
            ids.contains(suffix.dropRight(1)))
      })
      .map(_.getAbsolutePath).sorted

  /** The unified kill rule — [[InvertedIndex]]'s discipline at vector
    * granularity: id-level [[delete]]s kill every version
    * (kill_below = Long.MaxValue), [[supersede]]s kill the versions
    * below theirs, overlaps compose by max; None when the index has
    * never seen a tombstone (untouched plans unchanged). */
  private def killRules(spark: SparkSession, dir: String,
                        only: Option[Set[String]] = None)
      : Option[DataFrame] = {
    val dels = batchRoots(dir, "deletes", only).map(p =>
      spark.read.parquet(p)
        .select(col("vec_id"), lit(Long.MaxValue).as("kill_below")))
    val sups = batchRoots(dir, "supersedes", only)
      .map(spark.read.parquet(_))
    (dels ++ sups) match {
      case Seq() => None
      case parts =>
        Some(parts.reduce(_.unionByName(_))
          .groupBy(col("vec_id"))
          .agg(max(col("kill_below")).as("kill_below")))
    }
  }

  private def filterDeleted(spark: SparkSession, dir: String,
                            rows: DataFrame,
                            only: Option[Set[String]] = None): DataFrame =
    killRules(spark, dir, only) match {
      case None => rows
      case Some(kr) =>
        // PQ code rows carry no ver column (the compressed path never
        // sees supersedes — applyChanges guards); treat them as ver 0
        // so an id-level delete (MaxValue) still kills them
        val hasVer = rows.columns.contains("ver")
        val r = if (hasVer) rows else rows.withColumn("ver", lit(0L))
        val f = r.join(broadcast(kr), Seq("vec_id"), "left")
          .filter(col("kill_below").isNull ||
            col("ver") >= col("kill_below"))
          .drop("kill_below")
        if (hasVer) f else f.drop("ver")
    }

  /** All cell roots of the index: the base build plus every per-batch
    * append root, unioned, minus tombstoned vectors. Listing the
    * index dir is a driver-side metadata op (one per query plan,
    * never per row); each root scans with its own centroid_id
    * partition pruning.
    */
  def cells(spark: SparkSession, dir: String,
            only: Option[Set[String]] = None): DataFrame =
    filterDeleted(spark, dir,
      batchRoots(dir, "cells", only)
        .foldLeft(spark.read.parquet(s"$dir/cells"))(
          (acc, p) => acc.unionByName(spark.read.parquet(p))), only)

  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           k: Int, nprobe: Int,
           only: Option[Set[String]] = None): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    Similarity.ivfProbe(centroids, cells(spark, dir, only), queries, k,
      nprobe)
  }

  /** FILTERED (faceted) retrieval — Elasticsearch's filter-context
    * semantics on the dense arm: `filter` restricts which vectors may
    * rank; surviving cosines are bit-identical to their unfiltered
    * values (cosine carries no corpus statistics, so there is nothing
    * to drift). The predicate evaluates on the CELL rows themselves
    * (facets ride them via `carry` at [[write]]), after partition
    * pruning selects the probed cells — only facet-eligible vectors
    * in probed cells score; nothing joins the corpus. With
    * nprobe = nlist this is EXACTLY brute force over the filtered
    * corpus. */
  def topKFiltered(spark: SparkSession, dir: String, queries: DataFrame,
                   k: Int, nprobe: Int,
                   filter: org.apache.spark.sql.Column,
                   only: Option[Set[String]] = None): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    Similarity.ivfProbe(centroids, cells(spark, dir, only).filter(filter),
      queries, k, nprobe)
  }

  /** Per-cell population audit — (centroid_id, n_vecs) over the live
    * index (tombstones excluded, batch roots included): the signal a
    * deployment watches for assignment skew after sustained appends,
    * and the gauge [[compactTo]]'s recluster option exists to reset.
    * nlist-sized output; one aggregate over cell metadata columns. */
  def cellDepths(spark: SparkSession, dir: String): DataFrame =
    cells(spark, dir).groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("centroid_id"))

  /** COMPACT the index: fold every `cells_batch_*` append root AND
    * every tombstone into a fresh single-generation index at `dstDir`
    * — centroids carried verbatim (assignments stay valid by
    * construction), the unioned live cells rewritten once partitioned
    * by centroid_id ([[cells]] already drops tombstoned vectors, and
    * the new root carries no delete sets). Bounds the read-side batch
    * listing and per-cell file counts that grow with continuous
    * ingest. Same object-store discipline as
    * [[graft.tables.InvertedIndex.compactTo]]: the source is never
    * touched; the deployment flips its pointer to the new root and
    * GCs the old — probe-over-compacted ≡ probe-over-(base+batches).
    */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                recluster: Int = 0,
                only: Option[Set[String]] = None): Unit = {
    require(!Files.exists(Paths.get(s"$dstDir/_vindex.json")),
      s"compaction target $dstDir already a completed index")
    def rmTree(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rmTree)); p.delete(): Unit
    }
    // sweep debris from a crashed earlier attempt (no marker ⇒ any
    // existing trees are partial output) — INCLUDING stray *_batch_*
    // roots, which a reused dstDir would otherwise silently merge
    // into (or delete from) the compacted generation — then build
    // under staging and rename into place with the marker LAST —
    // InvertedIndex.write's crash discipline
    Seq(".staging", "centroids", "cells", "codebooks", "codes", "params")
      .foreach(d => rmTree(new java.io.File(s"$dstDir/$d")))
    Option(new java.io.File(dstDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.contains("_batch_"))
      .foreach(rmTree)
    val staging = s"$dstDir/.staging"
    val hasPqSrc = Files.exists(Paths.get(s"$srcDir/codes"))
    if (recluster > 0) {
      // RECLUSTER-ON-COMPACT: after sustained appends the persisted
      // centroids go stale (fresh vectors assigned to the nearest OLD
      // centroid skew cell depths). Refresh with `recluster` exact
      // integer-domain Lloyd sweeps over the LIVE corpus
      // (refineCentroidsExact — deterministic and oracle-replayable),
      // then reassign; full-probe retrieval is invariant (every live
      // vector still scores, whatever cell it sits in), cell depths
      // rebalance. PQ codes encode residuals against the OLD coarse
      // centroids, so a compressed index must retrain, not recluster.
      require(!hasPqSrc,
        "recluster invalidates PQ residual codebooks — retrain instead")
      val live = cells(spark, srcDir, only)
      val carry = live.columns.toSeq
        .filterNot(Set("vec_id", "label", "embedding", "centroid_id"))
      val fresh = (1 to recluster).foldLeft(
          spark.read.parquet(s"$srcDir/centroids"))(
        (c, _) => Similarity.refineCentroidsExact(live, c))
      fresh.write.parquet(s"$staging/centroids")
      Similarity.ivfAssignWith(live.drop("centroid_id"),
          spark.read.parquet(s"$staging/centroids"), carry)
        .write.partitionBy("centroid_id").parquet(s"$staging/cells")
    } else {
      spark.read.parquet(s"$srcDir/centroids")
        .write.parquet(s"$staging/centroids")
      cells(spark, srcDir, only)
        .write.partitionBy("centroid_id").parquet(s"$staging/cells")
    }
    // the compressed side travels too: codebooks/params verbatim, the
    // unioned LIVE codes (tombstones folded) rewritten once
    val hasPq = hasPqSrc
    if (hasPq) {
      spark.read.parquet(s"$srcDir/codebooks")
        .write.parquet(s"$staging/codebooks")
      spark.read.parquet(s"$srcDir/params")
        .coalesce(1).write.parquet(s"$staging/params")
      pqCodes(spark, srcDir, only)
        .write.partitionBy("centroid_id").parquet(s"$staging/codes")
    }
    (Seq("centroids", "cells") ++
      (if (hasPq) Seq("codebooks", "params", "codes") else Nil))
      .foreach { d =>
        Files.move(Paths.get(s"$staging/$d"), Paths.get(s"$dstDir/$d")): Unit
      }
    rmTree(new java.io.File(staging))
    Files.write(Paths.get(s"$dstDir/_vindex.json"),
      s"""{"pq": $hasPq}""".getBytes("UTF-8")): Unit
  }

  // ---- compressed (IVF-PQ) index lifecycle --------------------------

  /** Persist the COMPRESSED index (FAISS `IVFx,PQy` shape): coarse
    * centroids, PQ codebooks trained on cell residuals, and the code
    * table PARTITIONED BY centroid_id — m bytes of codes per vector
    * instead of the float array, with the same nprobe/nlist partition
    * pruning as the float index. A 1-row `params` relation records
    * (nlist, m, ksub, dim) so append/query never guess shapes.
    */
  def writePq(corpus: DataFrame, dir: String, nlist: Int = 16,
              m: Int = 8, ksub: Int = 16, dim: Int = 64): Unit = {
    import corpus.sparkSession.implicits._
    val centroids = Similarity.ivfCentroids(corpus, nlist)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    val resid = Similarity.ivfpqResiduals(corpus, centroids)
    val codebooks = Similarity.pqCodebooks(resid, m, ksub, dim)
    codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    Similarity.pqEncode(resid, codebooks, m, dim, carry = Seq("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/codes")
    Seq((nlist, m, ksub, dim)).toDF("nlist", "m", "ksub", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
  }

  private def pqParams(spark: SparkSession,
                       dir: String): (Int, Int, Int, Int) = {
    val r = spark.read.parquet(s"$dir/params")
      .select("nlist", "m", "ksub", "dim").head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** Append a fresh batch into the COMPRESSED index without any
    * rebuild — the full encode path is maintenance-free given the
    * persisted artifacts: assign against the standing centroids
    * (broadcast, row-local argmin), subtract for residuals
    * (row-local), PQ-encode against the standing codebooks (broadcast
    * packed map, row-local argmins). The standing code table is never
    * read, moved, or rewritten; centroids AND codebooks stay fixed by
    * design (IVF-PQ tolerates drift until a scheduled retrain, and
    * because the encode path is deterministic given the artifacts,
    * append-then-read is BYTE-IDENTICAL to one-shot-encoding the
    * union corpus — what `ann_ivfpq_append_check` pins).
    *
    * Same at-least-once discipline as [[append]]: with a `batch` id
    * the codes land in `codes_batch_<id>` with overwrite, so a
    * redelivered micro-batch replaces its prior attempt.
    */
  def appendPq(fresh: DataFrame, dir: String,
               batch: Option[String] = None): Unit = {
    val spark = fresh.sparkSession
    val (_, m, _, dim) = pqParams(spark, dir)
    val centroids = spark.read.parquet(s"$dir/centroids")
    val codebooks = spark.read.parquet(s"$dir/codebooks")
    val enc = Similarity.pqEncode(
      Similarity.ivfpqResiduals(fresh, centroids), codebooks, m, dim,
      carry = Seq("centroid_id"))
    batch match {
      case Some(b) =>
        enc.write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/codes_batch_$b")
      case None =>
        enc.write.mode("append").partitionBy("centroid_id")
          .parquet(s"$dir/codes")
    }
  }

  /** All code roots of the compressed index (base build + per-batch
    * appends), unioned, minus tombstoned vectors — the [[cells]]
    * pattern for codes.
    */
  def pqCodes(spark: SparkSession, dir: String,
              only: Option[Set[String]] = None): DataFrame =
    filterDeleted(spark, dir,
      batchRoots(dir, "codes", only)
        .foldLeft(spark.read.parquet(s"$dir/codes"))(
          (acc, p) => acc.unionByName(spark.read.parquet(p))), only)

  /** ADC retrieval over the persisted compressed index — reloads the
    * artifacts and runs [[Similarity.ivfpqProbe]]; the float vectors
    * are never touched.
    */
  def pqTopK(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int, nprobe: Int): DataFrame = {
    val (_, m, _, dim) = pqParams(spark, dir)
    Similarity.ivfpqProbe(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebooks"),
      pqCodes(spark, dir), queries, k, nprobe, m, dim)
  }

  /** Two-stage retrieval over the persisted compressed index: ADC
    * nominates `candidates` per query from codes alone, then ONLY
    * those rows fetch their float vectors from `corpus` for the exact
    * re-rank — the production deployment shape (codes in the hot
    * tier, floats in cold storage touched candidates-at-a-time).
    */
  def pqTopKReranked(spark: SparkSession, dir: String, corpus: DataFrame,
                     queries: DataFrame, k: Int, candidates: Int,
                     nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = pqTopK(spark, dir, queries, candidates, nprobe)
      .select(col("query_id"), col("vec_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val rescored = corpus.join(broadcast(cand), "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"), col("label"),
        graft.functions.CosineSimilarity.cosine_similarity(
          col("embedding"), col("query_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }
}

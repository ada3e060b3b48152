package graft

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Each query is forced end-to-end through
  * the `noop` sink (full materialization of every column — `count()`
  * would let Catalyst prune the work under aggregates/projections).
  *
  * Each query runs SPARK_GRAFT_REPS times (default 3) and reports the
  * per-query MEDIAN over SUCCESSFUL reps only, plus min/max spread — a
  * single-run artifact is at the mercy of one GC pause or scheduler
  * hiccup, and a rep that throws early would otherwise feed its partial
  * elapsed time into the median and make a broken query look fast.
  * Queries whose max exceeds 2x their median get up to 4 extra reps and
  * a trimmed spread (one outlier dropped per side at >=5 reps). A
  * query with zero successful reps reports null. `failed` lists every
  * query with at least one failed rep; `failures` carries the per-query
  * failed-rep count, so "flaky on one rep" and "always broken" are
  * distinguishable from the artifact alone. A run with any failure
  * emits `"ok":false` and exits non-zero — it must never read as a
  * passing run.
  *
  * The JSON line is also written to BENCHOUT.json in the working
  * directory: the driver's stdout capture truncates long tails, and the
  * committed file keeps the full per-query medians+spread reproducible
  * without a rerun.
  *
  * Cross-query JVM settle barrier (r10): three consecutive rounds of
  * adjudication traced 5-7 rows/round of 3-7x median inflation to
  * asynchronous driver-side work from PRIOR queries (ContextCleaner
  * bursts unpersisting broadcast vars / shuffle state when their
  * references get collected) landing inside the NEXT query's timed
  * window. Between queries (never inside a rep window) the harness now
  * forces that cleanup to happen off the clock: one explicit GC pushes
  * the dead references into the cleaner's queue, and a short sleep
  * lets its daemon drain before the next timer starts. Cost is ~0.1-
  * 0.3 s per query of UNMEASURED wall (reported as `settle_wall`);
  * the committed medians stop lying. SPARK_GRAFT_SETTLE_MS=0 opts out.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    // Quiet-box isolation: SPARK_GRAFT_ONLY=a,b,c restricts the run to
    // the named queries under the IDENTICAL harness (noop sink, warm-up,
    // adaptive reps) — used to adjudicate flagged regressions without
    // the 200-query bench's JIT/GC pressure. Unset for the driver.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A typo'd name silently shrinking an adjudication run is a false
    // "restored" verdict — any unknown name (and an empty selection)
    // makes the whole run a FAILURE, not a warning.
    val unknownOnly: Set[String] = only
      .map(_.filterNot(SparkEntry.queries.contains)).getOrElse(Set.empty)
    if (unknownOnly.nonEmpty)
      System.err.println(
        s"[bench] ERROR: SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknownOnly.mkString(", ")}")
    val bench = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    if (bench.isEmpty) {
      println("""{"metric":"total","ok":false,"value":0,"unit":"sec","queries":{},"failed":[],"failures":{},"err":"SPARK_GRAFT_ONLY selected zero known queries"}""")
      sys.exit(1)
    }
    // Ambient-load bookkeeping: /proc/loadavg before and after, plus
    // per-query start offsets — r8's end-of-round artifact ran on a
    // box 2.4x slower than the same code an hour earlier, and without
    // load figures in the artifact that adjudication needed a manual
    // re-run. Null on non-Linux.
    def loadAvg(): String =
      try {
        val parts = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")
        s"[${parts(0)},${parts(1)},${parts(2)}]"
      } catch { case _: Throwable => "null" }
    val loadBefore = loadAvg()
    val wallStart = System.nanoTime()
    val spark = GraftSession.local(cpus)
    // One warm-up action so JVM/classloader/codegen startup isn't billed
    // to the first query.
    bench.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Streaming queries share a once-per-process staged replay dir
    // (graft.streaming.Replay); run each once unmeasured so the
    // staging write and state-store init land in warm-up, not in
    // whichever streaming query sorts first.
    bench.toSeq.filter(_._1.startsWith("streaming_"))
      .foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // SCHEDULING (r16): the eight streaming replays run FIRST (their
    // staged replay is already warmed above; r15 burned three
    // adjudication passes on 2-5x late-run inflation of exactly these
    // rows), the ~20 once-per-JVM lifecycle/index builders run LAST so
    // their build pressure lands after every ordinary row, everything
    // else alphabetical in between. r18: ann_ivfpq_append(_check)
    // probe a persisted PQ index dir (pqIndexAppendDir) — the same
    // build-once/query-many semantics as ann_index_* — so they join
    // the lifecycle group; in r17 their once-per-JVM dir build landed
    // in rep 1 of an alphabetical group-1 slot and flagged the row.
    val lifecycleRow = (n: String) =>
      n.startsWith("bm25_indexed") || n.startsWith("bm25_catalog") ||
        n.startsWith("cdc_") || n.startsWith("cow_") ||
        n.startsWith("ann_index") || n.startsWith("ann_catalog") ||
        n.startsWith("serving_e2e") || n.startsWith("ann_filtered") ||
        n.startsWith("ann_ivfpq_append") ||
        n.startsWith("hybrid_rrf_indexed") ||
        n.startsWith("hybrid_rrf_filtered") ||
        n.startsWith("hybrid_rrf_pruned") ||
        n == "snippets_catalog" || n == "mmr_rerank_indexed" ||
        n == "retrieval_eval_hybrid" || n == "retrieval_phrase_persisted" ||
        n == "retrieval_boolean_not_indexed" || n == "lm_model_persisted" ||
        n == "bpe_model_persisted" || n == "dedup_index_fixed_batch" ||
        n == "streaming_wap_publish" ||
        n == "streaming_wap_history" || n == "streaming_serving_e2e"
    val failCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // r18 (verdict item 1): the Stage.relation memo is an in-process
    // localCheckpoint keyed per (session, key, input plan) — correct
    // engine discipline ("compute once, every consumer reads the
    // artifact"), but ACROSS BENCH REPS it made the reps=3 median of
    // every Stage-backed row a checkpoint-read instead of the
    // computation (embedding_covariance: 0.76 s isolated vs 0.11 s
    // bench median in r17). Non-lifecycle rows now get the memo
    // CLEARED before every timed rep, so each rep recomputes its
    // staged relations from the parquet inputs. The declared
    // build-once/query-many lifecycle rows (*_persisted / *_indexed /
    // catalog / persisted-index maintenance) keep the memo — reading
    // the stored artifact IS their steady state. Measurement-contract
    // change, documented in OPTIMIZATION_r18.md with both numbers.
    val stageMemoRow = (n: String) =>
      n.contains("_persisted") || n.contains("_indexed") ||
        n.contains("catalog") || n.contains("_index")
    def timeOnce(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      if (!(stageMemoRow(name) || lifecycleRow(name)))
        graft.operators.Stage.clear(spark)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        failCounts.updateWith(name) {
          case None =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Some(1)
          case Some(n) => Some(n + 1)
        }
        None
      }
    }
    // Settle barrier between queries: force the ContextCleaner's
    // pending work (reference-queue driven — it only sees garbage an
    // actual GC collected) to run NOW, between timers, instead of
    // asynchronously inside the next query's measured window.
    val settleMs = sys.env.getOrElse("SPARK_GRAFT_SETTLE_MS", "150").toLong
    var settleWall = 0.0
    def settle(): Unit = if (settleMs > 0) {
      val t0 = System.nanoTime()
      // r18: TWO collections per barrier, same total sleep. The
      // ContextCleaner is weak-reference driven: the FIRST GC merely
      // enqueues the dead DataFrames' refs; the cleaner's async
      // unpersist of their checkpoint/broadcast blocks then frees
      // memory that only a SECOND collection reclaims. r17's in-run
      // rechecks proved one extra settle round is exactly what
      // separated chunk_pack_pipeline's polluted 4.3 s reps from its
      // honest 0.9 s (BENCH_r17 flagged: [4.31, 1.17, 0.89]).
      System.gc()
      Thread.sleep(settleMs / 2 + 1)
      System.gc()
      Thread.sleep(settleMs - settleMs / 2)
      settleWall += (System.nanoTime() - t0) / 1e9
    }
    val group = (n: String) =>
      if (lifecycleRow(n)) 2
      else if (n.startsWith("streaming_")) 0
      else 1
    // Trailing-round medians (the committed BENCHOUT.json, or
    // SPARK_GRAFT_BASELINE): any row landing >2x its prior median gets
    // an IN-RUN recheck — settle, two fresh reps — so the artifact
    // carries its own adjudication instead of needing a post-hoc
    // isolated rerun (what ate three rounds of r13-r15 analysis).
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BENCHOUT.json")
    val baseline: Map[String, Double] =
      try {
        val body = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(baselinePath)), "UTF-8")
        // a baseline from a DIFFERENT scale factor would flag noise
        val sameSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(body)
          .forall(_.group(1) == sfDir)
        if (!sameSf) Map.empty[String, Double]
        else """"queries":\{([^}]*)\}""".r.findFirstMatchIn(body)
          .map(_.group(1)).map { qs =>
            """"([A-Za-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(qs)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          }.getOrElse(Map.empty)
      } catch { case _: Throwable => Map.empty }
    val flagged = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Option[Double])]
    val startOffsets = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val ordered = bench.toSeq.sortBy { case (n, _) => (group(n), n) }
    // r18 (verdict items 4+6): unmeasured LIFECYCLE PRE-PASS — right
    // before the lifecycle group's timed reps start, run each of its
    // rows once off the clock (the streaming-staging warm-up contract,
    // extended). The once-per-JVM index/dir builds land here instead
    // of inside whichever row alphabetizes first (ann_ivfpq_append was
    // flagged 3.1 s vs 1.3 s steady in r17 purely for paying its dir
    // build in rep 1) and instead of pressuring serving_e2e_eval's
    // timed window (3.6-4.5 s in-run vs 2.4 s isolated in r17). Kept
    // HERE rather than at startup so build pressure still lands after
    // every ordinary row, as the r16 scheduling intended.
    var lifecycleWarmed = false
    val results = ordered.map { case (name, fn) =>
      if (!lifecycleWarmed && group(name) == 2) {
        ordered.foreach { case (n, f) =>
          if (group(n) == 2)
            try f(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case _: Throwable => () }
        }
        settle()
        lifecycleWarmed = true
      }
      settle()
      startOffsets(name) = (System.nanoTime() - wallStart) / 1e9
      var ok = (1 to reps).flatMap(_ => timeOnce(name, fn)).toVector
      // Adaptive stabilization: a max > 2x the median is ambient noise
      // (GC pause, scheduler hiccup), and with 3 reps one outlier
      // drags the round-over-round comparison. Buy up to 4 extra reps
      // for such queries; with >=5 successful reps the reported spread
      // is trimmed (one outlier dropped each side) — the median is
      // always over ALL successful reps.
      var extra = 0
      while (ok.nonEmpty && extra < 4 &&
          ok.max > 2 * ok.sorted.apply(ok.length / 2)) {
        ok ++= timeOnce(name, fn); extra += 1
      }
      val s = ok.sorted
      if (s.isEmpty) (name, None, None, None)
      else {
        val med = s(s.length / 2)
        // in-run adjudication: >2x the trailing round's median → one
        // settle + two fresh reps, recorded alongside (the recheck
        // median is the number an isolated rerun would have produced;
        // the row's reported median stays the honest full set)
        baseline.get(name).filter(b => med > 2 * b).foreach { b =>
          settle()
          val re = (1 to 2).flatMap(_ => timeOnce(name, fn)).sorted
          flagged(name) = (med, b,
            if (re.isEmpty) None else Some(re(re.length / 2)))
        }
        val trimmed = if (s.length >= 5) s.slice(1, s.length - 1) else s
        (name, Some(med), Some(trimmed.head), Some(trimmed.last))
      }
    }
    def f(d: Double): String = "%.4f".format(d)
    def fOpt(d: Option[Double]): String = d.map(f).getOrElse("null")
    val qs = results.map { case (k, m, _, _) => "\"" + k + "\":" + fOpt(m) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, lo, hi) =>
      "\"" + k + "\":[" + fOpt(lo) + "," + fOpt(hi) + "]" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val failedJson = failCounts.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failuresJson = failCounts
      .map { case (k, n) => "\"" + k + "\":" + n }.mkString("{", ",", "}")
    // "ok" leads the line so a broken run is unmistakable even in a
    // truncated stdout capture; a run with ANY failed query also exits
    // non-zero below — r7 had 79 queries fail-fast yet the artifact
    // read as "[success]", which cost a full round.
    val ok = failCounts.isEmpty && unknownOnly.isEmpty
    val wall = (System.nanoTime() - wallStart) / 1e9
    val startedJson = startOffsets
      .map { case (k, t) => "\"" + k + "\":" + f(t) }.mkString("{", ",", "}")
    val flaggedJson = flagged
      .map { case (k, (m, b, re)) =>
        "\"" + k + "\":[" + f(m) + "," + f(b) + "," + fOpt(re) + "]" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","ok":$ok,"value":${f(total)},"unit":"sec","reps":$reps,"wall":${f(wall)},"settle_wall":${f(settleWall)},"settle_ms":$settleMs,"load_before":$loadBefore,"load_after":${loadAvg()},"queries":$qs,"spread":$spread,"started":$startedJson,"flagged":$flaggedJson,"failed":$failedJson,"failures":$failuresJson,"sf":"$sfDir"}"""
    println(line)
    // An isolated SPARK_GRAFT_ONLY run must not clobber the committed
    // full-bench artifact.
    if (only.isEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCHOUT.json"), line + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] BENCHOUT.json write failed: ${e.getMessage}") }
    spark.stop()
    if (!ok) {
      if (failCounts.nonEmpty)
        System.err.println(s"[bench] ${failCounts.size} queries FAILED: ${failCounts.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also emits an ENGINE-SIDE per-query summary (`VERIFY_SUMMARY.json`
  * in the working directory, committed each round): per query — row count, schema DDL, an
  * order-independent result fingerprint, and elapsed seconds. The
  * driver's CORRECTNESS artifact has come back empty before
  * (r16: `{}`); this file is the durable round-over-round correctness
  * history that survives a driver-side recording gap. The fingerprint
  * is `sum(xxhash64(to_json(struct(columns sorted by name))))` in
  * decimal(38,0) — column order normalized the way the driver's
  * compare normalizes, row order irrelevant, every type (arrays,
  * maps, binary, timestamps) serialized by to_json. It is a
  * JVM-side drift detector, not a cross-engine hash: two rounds that
  * produce the same rows produce the same fingerprint.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional extra args: restrict to the named queries (local
    // iteration only — the driver always passes exactly two args).
    val only = args.drop(2).toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    // name -> (rows, schema_ddl, fingerprint, elapsed_sec) or error.
    val summary = scala.collection.mutable.LinkedHashMap
      .empty[String, Either[String, (Long, String, String, Double)]]
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Fingerprint the WRITTEN parquet (what DuckDB will read),
        // not the in-flight plan — a lossy write would slip past an
        // in-flight hash.
        val back = spark.read.parquet(s"$outDir/$name")
        val sorted = back.columns.sorted.map(c => col(c).as(c))
        val agg = back
          .select(xxhash64(to_json(struct(sorted: _*))).as("h"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("h").cast("decimal(38,0)")),
              lit(0).cast("decimal(38,0)")).as("fp"))
          .collect().head
        val elapsed = (System.nanoTime() - t0) / 1e9
        summary(name) = Right((agg.getLong(0), back.schema.toDDL,
          agg.getDecimal(1).toBigInteger.toString, elapsed))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        summary(name) = Left(Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val sumJson = summary.map {
      case (k, Right((n, ddl, fp, el))) =>
        s"${q(k)}: {${q("rows")}: $n, ${q("fingerprint")}: ${q(fp)}, " +
          s"${q("elapsed_sec")}: ${f"$el%.3f"}, ${q("schema")}: ${q(ddl)}}"
      case (k, Left(err)) =>
        s"${q(k)}: {${q("error")}: ${q(err)}}"
    }.mkString("{\n", ",\n", "\n}")
    val nOk = summary.values.count(_.isRight)
    val nErr = summary.size - nOk
    val wrapped = s"""{"sf_dir": ${q(sfDir)}, "n_queries": ${summary.size}, """ +
      s""""n_ok": $nOk, "n_error": $nErr, "queries": $sumJson}"""
    // cwd ONLY, never outDir: the driver's compare lists outDir entries
    // as query dirs, and a stray json file there could crash the very
    // artifact this summary armors.
    try Files.writeString(Paths.get("VERIFY_SUMMARY.json"), wrapped)
    catch { case e: Throwable =>
      System.err.println(s"[verify] summary write failed: ${e.getMessage}")
    }
    System.err.println(s"[verify] summary: $nOk ok, $nErr error")
    spark.stop()
  }
}

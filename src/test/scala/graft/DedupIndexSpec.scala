package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.tables.DedupIndex

/** The persisted exact-dedup standing store: batch-over-batch
  * roll-forward must be equivalent to the all-in-one prefix join,
  * append-only on standing roots, redelivery-safe, and structurally
  * incapable of a standing-TEXT rescan (no text column in any
  * artifact; every file scan in a batch plan reads the store).
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
  private val other = "completely different words about spark catalyst plans and shuffles " * 4
  private val third = "yet another unrelated passage describing parquet row groups and stats " * 4
  private val fourth = "a fourth theme entirely about broadcast joins and skew salting tricks " * 4

  // corpus 0-2; batch0 10-12; batch1 20-23. Plants:
  //   10 = copy of 0 (dropped by corpus)
  //   20 = copy of 10 (dropped: DROPPED docs still veto)
  //   21 = copy of 11 (dropped by earlier BATCH survivor)
  //   23 = copy of 22 (dropped by same-batch lower id)
  private def doc(id: Long, t: String) = (id, t, "en", t.length.toLong)
  private def df(rows: (Long, String, String, Long)*): DataFrame =
    rows.toDF("doc_id", "text", "lang", "n_chars")

  private val corpus = df(doc(0L, base), doc(1L, other), doc(2L, third))
  private val batch0 = df(doc(10L, base), doc(11L, fourth),
    doc(12L, base.replaceAll("quick|lazy|far", "qq")))
  private val batch1 = df(doc(20L, base), doc(21L, fourth),
    doc(22L, other.replace("catalyst", "tungsten").replace("shuffles", "scans")),
    doc(23L, other.replace("catalyst", "tungsten").replace("shuffles", "scans")))

  private def files(dir: Path): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala.filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.size(p)).toMap
  }

  private def freshStore(): String = {
    val dir = Files.createTempDirectory("graft_dedupindex_spec_")
    dir.toFile.deleteOnExit()
    DedupIndex.create(spark, corpus, dir.toString)
    dir.toString
  }

  test("roll-forward replay matches the all-in-one prefix join and the veto rules") {
    val dir = freshStore()
    val s0 = DedupIndex.dedupBatch(spark, dir, batch0, 0L)
      .select($"doc_id").as[Long].collect().toSet
    DedupIndex.append(spark, dir, batch0, 0L)
    val s1 = DedupIndex.dedupBatch(spark, dir, batch1, 1L)
      .select($"doc_id").as[Long].collect().toSet
    assert(s0 === Set(11L, 12L), s"batch0 survivors: $s0")
    assert(s1 === Set(22L), s"batch1 survivors: $s1")
    // Equivalence with the in-flight (non-persisted) operator at the
    // same standing view: corpus ∪ batch0 vs batch1.
    val inFlight = Dedup.dedupIncrementalExact(
        corpus.unionByName(batch0), batch1, standingVetoes = true)
      .select($"doc_id").as[Long].collect().toSet
    assert(inFlight === s1)
  }

  test("appends are new roots only: standing files never rewritten") {
    val dir = freshStore()
    DedupIndex.append(spark, dir, batch0, 0L)
    val before = files(java.nio.file.Paths.get(dir))
    DedupIndex.dedupBatch(spark, dir, batch1, 1L).count()
    DedupIndex.append(spark, dir, batch1, 1L)
    val after = files(java.nio.file.Paths.get(dir))
    val touched = before.filter { case (p, sz) => after.get(p) != Some(sz) }
    assert(touched.isEmpty, s"standing files rewritten: ${touched.keys}")
  }

  test("redelivery: a batch never vetoes itself and re-append replaces, not accretes") {
    val dir = freshStore()
    DedupIndex.append(spark, dir, batch0, 0L)
    val first = DedupIndex.dedupBatch(spark, dir, batch1, 1L)
      .select($"doc_id").as[Long].collect().toSet
    // crash-after-append: the batch's own root exists when it re-runs
    DedupIndex.append(spark, dir, batch1, 1L)
    val redelivered = DedupIndex.dedupBatch(spark, dir, batch1, 1L)
      .select($"doc_id").as[Long].collect().toSet
    assert(redelivered === first,
      "a redelivered batch must not see its own prior append")
    val rows = spark.read.parquet(s"$dir/toks_batch_1").count()
    DedupIndex.append(spark, dir, batch1, 1L)
    assert(spark.read.parquet(s"$dir/toks_batch_1").count() === rows,
      "re-append must overwrite its root, not double it")
  }

  test("no standing-text rescan is representable: artifacts hold no text; batch plans scan only the store") {
    val dir = freshStore()
    DedupIndex.append(spark, dir, batch0, 0L)
    // (a) construction: no artifact carries a string payload column.
    for (root <- Seq("toks_seed", "toks_batch_0", "pref_seed",
        "pref_batch_0", "df")) {
      val fields = spark.read.parquet(s"$dir/$root").schema.fieldNames.toSet
      assert(fields.subsetOf(Set("doc_id", "sh", "n", "i", "h", "df")),
        s"$root carries unexpected columns: $fields")
    }
    // (b) plan: every file scan in a batch-dedup plan reads the store
    // (the batch itself arrives in memory, as from a stream source).
    val out = DedupIndex.dedupBatch(spark, dir, batch1.localCheckpoint(true), 1L)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    val scanned = """file:[^\s\],)]*""".r.findAllIn(plan).toSet
      .filterNot(_.contains(dir))
    assert(scanned.isEmpty, s"batch plan scans files outside the store: $scanned")
  }
}

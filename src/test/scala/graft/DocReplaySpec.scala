package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.streaming.DocReplay

class DocReplaySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = tables.Tables.documents(spark, sf)

  test("staging splits the corpus into two ordered micro-batch files") {
    val base = DocReplay.stagedDocs(spark, docs, sf)
    val parts = Files.list(base.resolve("stage")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(parts.size === 2)
    // strictly ordered mtimes — the property maxFilesPerTrigger relies on
    val times = parts.map(p => Files.getLastModifiedTime(p).toMillis).sorted
    assert(times(0) < times(1))
  }

  test("identity replay reproduces the corpus exactly; batches are real") {
    val out = DocReplay.run(spark, docs, sf)(identity)
    val got = out.select("doc_id").as[Long].collect().sorted
    val want = docs.select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
    // one whole-batch aggregate row per emission: exactly two rows
    // proves two micro-batches genuinely ran, and each batch is
    // parity-pure (a merged single batch would emit one row with 2)
    val stamped = DocReplay.run(spark, docs, sf)(
      b => b.agg(count(lit(1)).as("n"),
        count_distinct(col("doc_id") % 2).as("np")))
    val rows = stamped.as[(Long, Long)].collect()
    assert(rows.length === 2)
    assert(rows.forall(_._2 === 1L))
    assert(rows.map(_._1).sum === docs.count())
  }

  test("streaming exact dedup: arrival order vetoes, not id order") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq((0L, "totally unique corpus words here nothing shared", "en", 47L))
      .toDF("doc_id", "text", "lang", "n_chars")
    // 251 (odd -> batch 1) and 252 (even -> batch 0) are twins: the
    // id rule would keep 251; ARRIVAL order keeps 252 (batch 0 seen
    // first). 254 duplicates the corpus and must drop in batch 0.
    val twin = "the same exact duplicated sentence repeated for the test " * 3
    val fresh = Seq(
      (251L, twin, "en", twin.length.toLong),
      (252L, twin, "en", twin.length.toLong),
      (254L, "totally unique corpus words here nothing shared", "en", 47L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = graft.streaming.DedupStream
      .run(spark, corpus, fresh, key = s"dedupstream-test-${System.nanoTime}")
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(252L))
    // the batch (id-rule) sibling keeps 251 instead — the two rules
    // genuinely differ and each matches its own oracle
    val batch = graft.operators.Dedup.dedupIncrementalExact(corpus, fresh)
      .select("doc_id").as[Long].collect().toSet
    assert(batch === Set(251L))
  }
}

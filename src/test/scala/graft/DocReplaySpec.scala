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
}

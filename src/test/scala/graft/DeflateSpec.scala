package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.DeflateSize
import graft.operators.TextAnalysis

/** DEFLATE compression-ratio signal: determinism, ordering contracts
  * (repetitive ≪ prose ≲ noise), null/empty edges, codegen parity,
  * and the planted-band classification the driver check relies on.
  */
class DeflateSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("compressedSize: deterministic, zero on empty, repetitive ≪ noise") {
    val rep = ("ab" * 128).getBytes("UTF-8")
    val r1 = DeflateSize.compressedSize(rep)
    r1 shouldBe DeflateSize.compressedSize(rep) // deterministic
    r1.toDouble / rep.length should be < 0.1
    DeflateSize.compressedSize(Array.empty[Byte]) shouldBe 0L
    val noise = (1 to 8).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"7#$i".getBytes).map("%02x".format(_)).mkString).mkString
    val rn = DeflateSize.compressedSize(noise.getBytes("UTF-8"))
    rn.toDouble / noise.length should be > 0.45
    rn.toDouble / noise.length should be < 0.75
  }

  test("expression: interpreted eval ≡ codegen path, null-safe") {
    val df = Seq(
      (0L, "ab" * 128),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      DeflateSize.deflate_size(col("text")).as("dz"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    got(0L) shouldBe DeflateSize.compressedSize(("ab" * 128).getBytes("UTF-8"))
    got(1L) shouldBe DeflateSize.compressedSize(
      "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
    got(2L) shouldBe 0L
    got(3L) shouldBe -1L // null in, null out
  }

  test("compressionSignals: quantized ratio, text dropped, null-safe") {
    val df = Seq((0L, "ab" * 128, "s"), (1L, null.asInstanceOf[String], "s"))
      .toDF("doc_id", "text", "source")
    val sig = TextAnalysis.compressionSignals(df)
    sig.columns should not contain "text"
    val rows = sig.orderBy("doc_id")
      .select("doc_id", "n_bytes", "deflate_bytes", "ratio_q")
      .as[(Long, Long, Long, Long)].collect()
    val expected = DeflateSize.compressedSize(("ab" * 128).getBytes("UTF-8"))
    rows(0) shouldBe ((0L, 256L, expected, expected * 1000000L / 256L))
    rows(1) shouldBe ((1L, 0L, 0L, 0L))
  }

  test("compressionBand separates the planted classes at (25%, 45%)") {
    val fix = Seq(
      (0L, "repetitive", "ab" * 128),
      (1L, "noise", (1 to 8).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"1#$i".getBytes).map("%02x".format(_)).mkString).mkString))
      .toDF("doc_id", "class", "text")
    val bands = TextAnalysis.compressionBand(fix, loQ = 250000L, hiQ = 450000L)
      .select("class", "band").as[(String, String)].collect().toMap
    bands("repetitive") shouldBe "repetitive"
    bands("noise") shouldBe "noise"
  }

  test("signal rides whole-stage codegen on the scan — no UDF break") {
    // parquet-backed input: a literal local relation constant-folds
    // into a LocalTableScan and proves nothing about codegen
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exec = TextAnalysis.compressionSignals(docs)
      .queryExecution.executedPlan
    // the deflate projection sits INSIDE a WholeStageCodegen subtree
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.exists(p => p.toString.contains("deflate_size")))
    inCodegen shouldBe true
    exec.toString should not include "BatchEvalPython"
    // values flow through the generated path identically to eval
    val row = TextAnalysis.compressionSignals(docs)
      .filter(col("doc_id") === 0L)
      .select("n_bytes", "deflate_bytes").as[(Long, Long)].head()
    val raw = docs.filter(col("doc_id") === 0L)
      .select("text").as[String].head()
    row shouldBe ((raw.getBytes("UTF-8").length.toLong,
      DeflateSize.compressedSize(raw.getBytes("UTF-8"))))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Packing
import graft.tables.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeShards: one dir per bin, files capped, content round-trips") {
    val out = Files.createTempDirectory("graft_shards_").toString
    val packed = Packing.packBins(
      tables.Tables.documents(spark, sf), "doc_id", 500L)
    Layout.writeShards(packed, out, maxRecordsPerFile = 3)
    val back = spark.read.parquet(out)
    assert(back.count() === packed.count())
    // partition dirs exist per bin
    val bins = packed.select("bin_id").distinct().as[Long].collect().toSet
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("bin_id=")).map(_.getName).toSet
    assert(dirs === bins.map(b => s"bin_id=$b"))
    // record cap respected: no file holds more than 3 rows
    val perFile = back.groupBy(input_file_name()).count()
      .agg(max("count")).as[Long].head()
    assert(perFile <= 3L)
    // round-trip: same (doc_id, bin_id) assignment
    val a = packed.select("doc_id", "bin_id").as[(Long, Long)].collect().toSet
    val b = back.select("doc_id", "bin_id").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("compact: shrinks a small-files table without changing its rows") {
    val dir = Files.createTempDirectory("graft_compact_").toString
    val docs = tables.Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    docs.repartition(40).write.mode("overwrite").parquet(dir)
    val beforeRows = spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().toSet
    val (nBefore, nAfter) = Layout.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(nBefore === 40)
    assert(nAfter < nBefore)
    val afterRows = spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().toSet
    assert(afterRows === beforeRows)
  }
}

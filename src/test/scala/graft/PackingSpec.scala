package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = tables.Tables.documents(spark, sf)

  test("two-level prefix sum equals the single global window cumsum") {
    val packed = Packing.packBins(docs, "doc_id", 500L)
      .select("doc_id", "prefix_tokens", "bin_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val wAll = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val oracle = docs
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .select(col("doc_id"),
        coalesce(sum(col("n")).over(wAll), lit(0L)).as("prefix_tokens"))
      .withColumn("bin_id", floor(col("prefix_tokens") / 500L))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(packed === oracle)
  }

  test("packing is independent of source partitioning and partition count") {
    val a = Packing.packBins(docs.repartition(3), "doc_id", 500L, partitions = 4)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    val b = Packing.packBins(docs.repartition(17), "doc_id", 500L, partitions = 9)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("grouped packing ≡ per-group global cumsum, independent of partitioning") {
    import graft.functions.TextFunctions.tokens
    val expected = docs
      .select(col("lang"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("prefix_tokens",
        coalesce(sum(col("n_tokens")).over(
          Window.partitionBy(col("lang")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("doc_id"), col("prefix_tokens"))
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    for (parts <- Seq(4, 9)) {
      val got = Packing
        .packBinsGrouped(docs.repartition(7), "lang", "doc_id", 500L, parts)
        .select(col("lang"), col("doc_id"), col("prefix_tokens"))
        .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(got === expected, s"partitions=$parts")
    }
    // each group restarts at 0: the min prefix per lang is 0
    val firstPerLang = expected.groupBy(_._1._1).map { case (l, m) => l -> m.values.min }
    assert(firstPerLang.values.forall(_ === 0L))
  }

  test("bins are contiguous in key order and fill to the budget") {
    val packed = Packing.packBins(docs, "doc_id", 500L)
      .select("doc_id", "n_tokens", "bin_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // bin ids are non-decreasing in doc order
    assert(packed.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // every bin except the last crosses its budget boundary once its
    // docs are concatenated (contiguous packing invariant)
    val byBin = packed.groupBy(_._3).toSeq.sortBy(_._1)
    byBin.dropRight(1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sum >= 1L) // non-empty
    }
    val stats = Packing.binStats(Packing.packBins(docs, "doc_id", 500L))
      .as[(Long, Long, Long)].collect()
    assert(stats.map(_._2).sum === packed.length.toLong)
  }

  test("harmonic packing: capacity holds, buckets are right, totality") {
    val budget = 500L
    val packed = Packing.packHarmonic(docs, "doc_id", budget)
      .select("doc_id", "n_tokens", "bucket_k", "bin_idx")
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.length.toLong === docs.count()) // every doc placed once
    // bucket_k is exactly how many docs of that length fit the budget
    packed.foreach { case (_, n, k, _) =>
      assert(k === math.max(1L, budget / math.max(n, 1L)))
    }
    // no bin of docs that individually fit the budget exceeds it
    packed.filter(_._2 <= budget).groupBy(r => (r._3, r._4)).foreach {
      case ((k, _), rows) =>
        assert(rows.map(_._2).sum <= budget)
        assert(rows.length <= k)
    }
    // stable under input partitioning / partition-count changes
    val a = Packing.packHarmonic(docs.repartition(3), "doc_id", budget, 4)
      .select("doc_id", "bucket_k", "bin_idx")
      .as[(Long, Long, Long)].collect().toSet
    val b = Packing.packHarmonic(docs.repartition(17), "doc_id", budget, 9)
      .select("doc_id", "bucket_k", "bin_idx")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("harmonic packing: oversized docs take singleton bins") {
    val d = Seq(
      (0L, Seq.fill(120)("w").mkString(" ")), // len 120 > budget 100 → k=1
      (1L, Seq.fill(150)("w").mkString(" ")), // len 150 > budget → k=1
      (2L, Seq.fill(60)("w").mkString(" ")),  // k=1 (100/60=1), fits
      (3L, Seq.fill(40)("w").mkString(" ")),  // k=2
      (4L, Seq.fill(35)("w").mkString(" "))   // k=2
    ).toDF("doc_id", "text")
    val packed = Packing.packHarmonic(d, "doc_id", 100L)
      .select("doc_id", "n_tokens", "bucket_k", "bin_idx")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // oversized → k clips to 1, each alone in its bin
    assert(packed(0)._3 === 1L && packed(1)._3 === 1L)
    assert(packed.filter(_._3 === 1L).groupBy(r => r._4).forall(_._2.length === 1))
    // the two k=2 docs share one bin and fit the budget
    val k2 = packed.filter(_._3 === 2L)
    assert(k2.map(_._4).distinct.length === 1)
    assert(k2.map(_._2).sum <= 100L)
  }

  test("curriculum packing ≡ global cumsum in curriculum order") {
    import graft.functions.TextFunctions.tokens
    val rows = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("nt"),
        (col("n_chars") % 7).as("grade")) // a deterministic "quality"
    val expected = rows
      .withColumn("prefix_tokens",
        coalesce(sum(col("nt")).over(
          Window.orderBy(col("grade"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("prefix_tokens"))
      .as[(Long, Long)].collect().toMap
    for (parts <- Seq(4, 9)) {
      val got = Packing
        .packBinsOrderedBy(rows.repartition(7), "doc_id", "nt",
          Seq("grade"), 500L, parts)
        .select(col("doc_id"), col("prefix_tokens"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"partitions=$parts")
    }
  }

  test("length-sorted batching pads no more than arrival order") {
    val sorted = Packing.sortedBatchStats(docs, "doc_id", 16)
      .agg(sum(col("padding"))).as[Long].head()
    val arrival = Packing.arrivalBatchStats(docs, "doc_id", 16)
      .agg(sum(col("padding"))).as[Long].head()
    assert(sorted <= arrival, s"sorted=$sorted arrival=$arrival")
    // padding is non-negative and each batch's max bounds its members
    val stats = Packing.sortedBatchStats(docs, "doc_id", 16)
      .select("n_docs", "max_tokens", "fill_tokens", "padding")
      .as[(Long, Long, Long, Long)].collect()
    stats.foreach { case (n, mx, fill, pad) =>
      assert(pad >= 0L && fill <= mx * n && pad === mx * n - fill)
    }
  }
}

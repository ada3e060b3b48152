package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = tables.Tables.documents(spark, sf)

  test("splitColumn is a total partition, stable under repartitioning") {
    val labeled = docs.withColumn("split", Sampling.splitColumn(col("doc_id")))
    val n = docs.count()
    val byLabel = labeled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel.values.sum === n)              // every row exactly one label
    assert(byLabel("train") > byLabel("val"))     // 80/10/10 shape
    val reparted = docs.repartition(13)
      .withColumn("split", Sampling.splitColumn(col("doc_id")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val base = labeled.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(reparted === base)                     // partitioning-independent
  }

  test("stratifiedSample keeps exactly the rows under each stratum threshold") {
    val fr = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2, "es" -> 0.4, "zh" -> 0.1)
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id", fr)
      .select("doc_id").as[Long].collect().toSet
    val expected = docs
      .select(col("doc_id"), col("lang"),
        Sampling.hashBucket(col("doc_id")).as("b"))
      .as[(Long, String, Long)].collect()
      .filter { case (_, lang, b) => b < fr(lang) * 100 }
      .map(_._1).toSet
    assert(sampled === expected)
    // unknown strata are dropped
    val dropped = Sampling.stratifiedSample(
      docs.withColumn("lang", lit("xx")), "lang", "doc_id", fr)
    assert(dropped.count() === 0L)
  }

  test("epoch shuffle: reproducible per epoch, different across epochs") {
    val e1a = Sampling.epochShuffleRank(docs, "doc_id", 1)
      .as[(Long, Long)].collect().toMap
    val e1b = Sampling.epochShuffleRank(docs.repartition(7), "doc_id", 1)
      .as[(Long, Long)].collect().toMap
    val e2 = Sampling.epochShuffleRank(docs, "doc_id", 2)
      .as[(Long, Long)].collect().toMap
    assert(e1a === e1b)                       // stable under partitioning
    assert(e1a !== e2)                        // epochs permute differently
    assert(e1a.values.toSeq.sorted === (1L to e1a.size.toLong)) // a permutation
  }

  test("sampling ops are row-local: no Exchange in the plan") {
    val plan = Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}

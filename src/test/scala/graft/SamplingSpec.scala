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

  test("splitByComponent: total, component-consistent, zero straddling pairs") {
    val labels = graft.operators.Components.nearDupClusters(docs, sketch = true)
    val split = Sampling.splitByComponent(docs, labels)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(split.length.toLong === docs.count())  // inner join is total
    // every member of a cluster shares its cluster's split
    split.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.map(_._3).toSet.size === 1, s"cluster $cid split mixed")
    }
    // therefore no near-dup pair straddles the boundary
    val bySplit = split.map(r => r._1 -> r._3).toMap
    val pairs = graft.operators.Dedup.minhashPairs(docs)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty) // fixture must actually exercise the property
    pairs.foreach { case (a, b) =>
      assert(bySplit(a) === bySplit(b), s"pair ($a,$b) straddles the split")
    }
    // and the assignment is the component-hash split, not the doc hash
    val expected = labels.select(col("doc_id"),
        Sampling.splitColumn(col("cluster_id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(split.map(r => r._1 -> r._3).toMap === expected)
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

  test("uniformSampleNPerGroup: exact n per group, smallest-hash membership, pruned plan") {
    val n = 7
    val out = Sampling.uniformSampleNPerGroup(docs, "lang", "doc_id", n)
      .select("lang", "doc_id").as[(String, Long)].collect()
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length.toLong === math.min(n.toLong, sizes(lang)))
    }
    // membership = the n smallest md5(doc_id) within each group
    val expected = docs.select($"lang", $"doc_id",
        org.apache.spark.sql.functions.md5($"doc_id".cast("string")).as("h"))
      .as[(String, Long, String)].collect()
      .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(n).map(r => (lang, r._2)).toSeq
      }.toSet
    assert(out.toSet === expected)
    val reparted = Sampling.uniformSampleNPerGroup(
        docs.repartition(13), "lang", "doc_id", n)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(reparted === out.toSet)
    // the rank limit prunes below the shuffle
    val plan = Sampling.uniformSampleNPerGroup(docs, "lang", "doc_id", n)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
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

  test("uniformSampleN: exact N, hash-prefix membership, partitioning-independent") {
    val n = 37
    val got = Sampling.uniformSampleN(docs, "doc_id", n)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size === n)
    // membership = the first N doc_ids in md5 order, brute-forced
    val expected = docs.select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .as[(Long, String)].collect().sortBy(_._2).take(n).map(_._1).toSet
    assert(got === expected)
    val reparted = Sampling.uniformSampleN(docs.repartition(13), "doc_id", n)
      .select("doc_id").as[Long].collect().toSet
    assert(reparted === got)
  }

  test("negativeSamples: k per anchor, excluded pairs never drawn, deterministic") {
    val corpus = (0L to 9L).toDF("vec_id")
    val anchors = corpus.filter(col("vec_id") < 2)
    val exclude = Seq((0L, 3L), (7L, 1L)).toDF("id_a", "id_b")
    val out = Sampling.negativeSamples(corpus, anchors, 3, exclude = exclude)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.count(_._1 == 0L) === 3)
    assert(out.count(_._1 == 1L) === 3)
    assert(out.forall { case (a, c, _) => a != c })       // never self
    val drawn = out.map(r => (r._1, r._2)).toSet
    assert(!drawn.contains((0L, 3L)) && !drawn.contains((1L, 7L)),
      "excluded (near-dup) pairs must never be drawn in either orientation")
    // the draw is a pure hash function: stable under repartitioning
    val again = Sampling.negativeSamples(corpus.repartition(7), anchors, 3,
        exclude = exclude)
      .as[(Long, Long, Long)].collect().toSeq
    assert(again === out)
    // brute recompute of anchor 0's draw
    val expect0 = (1L to 9L).filter(_ != 3L)
      .sortBy(c => java.security.MessageDigest.getInstance("MD5")
        .digest(s"0:$c".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .take(3)
    assert(out.filter(_._1 == 0L).map(_._2) === expect0)
  }

  test("mixtureByBudget: membership matches the brute bucket cumsum; budget bound holds") {
    val fr = Map("en" -> 0.3, "de" -> 0.8, "fr" -> 0.6, "es" -> 0.5, "zh" -> 0.9)
    val kept = Sampling.mixtureByBudget(docs, "lang", "doc_id", "n_chars", fr)
      .select("doc_id").as[Long].collect().toSet

    // brute recompute: per (lang, bucket) cost, exclusive cumsum < frac·total
    val rows = docs.select(col("doc_id"), col("lang"), col("n_chars"),
        Sampling.hashBucket(col("doc_id")).as("b"))
      .as[(Long, String, Long, Long)].collect()
    val expected = rows.groupBy(_._2).flatMap { case (lang, rs) =>
      val perBucket = rs.groupBy(_._4).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val total = perBucket.map(_._2).sum
      val keptBuckets = perBucket.scanLeft((0L, 0L)) {
        case ((_, cum), (b, c)) => (b, cum + c)
      }.tail.zip(perBucket).collect {
        case ((b, cumAfter), (_, c))
          if (cumAfter - c).toDouble < fr(lang) * total.toDouble => b
      }.toSet
      rs.filter(r => keptBuckets(r._4)).map(_._1).toSeq
    }.toSet
    assert(kept === expected)

    // budget adherence at bucket granularity: kept cost stays under
    // frac·total + the largest single bucket of that domain
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val total = rs.map(_._3).sum.toDouble
      val keptCost = rs.filter(r => kept(r._1)).map(_._3).sum.toDouble
      val maxBucket = rs.groupBy(_._4).values.map(_.map(_._3).sum).max.toDouble
      assert(keptCost > 0.0, s"$lang kept nothing")
      assert(keptCost < fr(lang) * total + maxBucket,
        s"$lang overshot: kept=$keptCost budget=${fr(lang) * total}")
    }

    // stable under repartitioning; unknown domains are dropped
    val reparted = Sampling.mixtureByBudget(
        docs.repartition(13), "lang", "doc_id", "n_chars", fr)
      .select("doc_id").as[Long].collect().toSet
    assert(reparted === kept)
    val dropped = Sampling.mixtureByBudget(
      docs.withColumn("lang", lit("xx")), "lang", "doc_id", "n_chars", fr)
    assert(dropped.count() === 0L)
  }

  test("mixturePlan: targets honor fractions, epochs cover the repeat factor") {
    val docs = tables.Tables.documents(spark, sf)
    val fr = Map("en" -> 0.3, "de" -> 0.8, "fr" -> 0.6, "es" -> 0.5, "zh" -> 0.9)
    val plan = Sampling.mixturePlan(docs, "lang", fr, 100000L)
      .as[(String, Long, Long, Double, Long)].collect()
    assert(plan.map(_._1).sorted === fr.keys.toSeq.sorted)
    plan.foreach { case (dom, avail, target, repeat, epochs) =>
      assert(target === math.round(fr(dom) * 100000L))
      assert(math.abs(repeat - target.toDouble / avail) < 1e-15)
      assert(epochs === math.ceil(repeat).toLong)
      assert(epochs * avail >= target) // the epoch count really covers it
    }
    // domains absent from the recipe are excluded, not zero-target
    val none = Sampling.mixturePlan(
      docs.withColumn("lang", lit("xx")), "lang", fr, 100000L)
    assert(none.count() === 0L)
  }

  test("mixtureTemperature: shares normalize, head compressed, tail lifted") {
    val docs = tables.Tables.documents(spark, sf)
    val plan = Sampling.mixtureTemperature(docs, "lang", 100000L)
      .as[(String, Long, Double, Long, Double)].collect()
    val totalAvail = plan.map(_._2).sum.toDouble
    assert(math.abs(plan.map(_._3).sum - 1.0) < 1e-9) // fracs normalize
    plan.foreach { case (_, avail, frac, target, repeat) =>
      val raw = avail / totalAvail
      // sqrt scaling compresses toward uniform: heads shrink, tails grow
      if (raw > 1.0 / plan.length) assert(frac < raw)
      else assert(frac >= raw)
      assert(target === math.round(frac * 100000L))
      assert(math.abs(repeat - target.toDouble / avail) < 1e-15)
    }
    // ordering preserved: more available never means a smaller share
    val sorted = plan.sortBy(_._2)
    assert(sorted.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Two separable "domains": positives talk about quality, negatives
  // about noise; doc 4 is an unlabeled-style mixed doc, doc 5 blank.
  private def labeled = Seq(
    (0L, "clean curated quality prose with careful words", "en", true),
    (1L, "curated quality writing and careful clean words", "en", true),
    (2L, "spam noise junk garbage random tokens repeated junk", "en", false),
    (3L, "noise garbage spam filler junk junk junk tokens", "en", false)
  ).toDF("doc_id", "text", "lang", "label")

  private def corpus = Seq(
    (0L, "clean curated quality prose with careful words", "en"),
    (1L, "curated quality writing and careful clean words", "en"),
    (2L, "spam noise junk garbage random tokens repeated junk", "en"),
    (3L, "noise garbage spam filler junk junk junk tokens", "en"),
    (4L, "careful words about random tokens", "en"),
    (5L, "   ", "en")
  ).toDF("doc_id", "text", "lang")

  test("model counts conserve the labeled token mass") {
    val model = Classifier.nbTrain(labeled, buckets = 64)
    val Array(row) = model
      .agg(sum($"c_pos").as("p"), sum($"c_neg").as("n")).collect()
    val toks = labeled.select(explode(
      graft.functions.TextFunctions.tokens($"text"))).count()
    assert(row.getLong(0) + row.getLong(1) === toks)
    assert(model.count() <= 64)
  }

  test("scores are total, finite, and consistent with pred_hq") {
    val model = Classifier.nbTrain(labeled, buckets = 64)
    val out = Classifier.nbScore(corpus, model, labeled, buckets = 64)
      .collect()
    assert(out.length === 6, "one row per corpus doc, blank included")
    out.foreach { r =>
      assert(!r.isNullAt(3) && !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
      assert(r.getBoolean(4) === (r.getDouble(3) > 0.0))
    }
    // the blank doc scores the prior alone (n_toks = 0)
    val blank = out.find(_.getLong(0) == 5L).get
    assert(blank.getLong(2) === 0L)
  }

  test("nbScoreSelfTrained ≡ nbScore ∘ nbTrain, uni and bigram (r18 fused path)") {
    // the fused path's contract is labeled = the corpus with its
    // label column (exactly how every SparkEntry consumer builds it)
    val labeledFull = corpus.withColumn("label",
      $"doc_id".isin(0L, 1L) || $"doc_id" === 4L)
    for (bigrams <- Seq(false, true)) {
      val model = Classifier.nbTrain(labeledFull, buckets = 64,
        bigrams = bigrams)
      val old = Classifier.nbScore(corpus, model, labeledFull, buckets = 64,
        bigrams = bigrams).collect().toSeq
      val fused = Classifier.nbScoreSelfTrained(labeledFull, buckets = 64,
        bigrams = bigrams).collect().toSeq
      assert(fused === old, s"bigrams=$bigrams")
    }
  }

  test("the classifier separates the planted domains") {
    val model = Classifier.nbTrain(labeled, buckets = 64)
    val scores = Classifier.nbScore(corpus, model, labeled, buckets = 64)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    assert(scores(0L) > 0.0 && scores(1L) > 0.0,
      "positive-domain docs must score positive log-odds")
    assert(scores(2L) < 0.0 && scores(3L) < 0.0,
      "negative-domain docs must score negative log-odds")
  }

  test("bigram features widen the planted-domain margin") {
    // the two domains share no bigrams at all, while a few unigrams
    // ("words", "tokens") leak across via the mixed doc — so the
    // bigram model's evidence per doc strictly grows. Margin = min
    // positive score − max negative score over the labeled docs.
    def margin(bigrams: Boolean): Double = {
      val model = Classifier.nbTrain(labeled, buckets = 64, bigrams = bigrams)
      val s = Classifier.nbScore(corpus, model, labeled, buckets = 64,
          bigrams = bigrams)
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
      math.min(s(0L), s(1L)) - math.max(s(2L), s(3L))
    }
    val uni = margin(bigrams = false)
    val bi = margin(bigrams = true)
    assert(uni > 0.0, "unigram model must already separate the domains")
    assert(bi > uni,
      s"bigram features must widen the separation margin ($bi <= $uni)")
    // bucket ranges are disjoint: bigram model rows live in [0, 128)
    val model = Classifier.nbTrain(labeled, buckets = 64, bigrams = true)
    val bs = model.select($"b").as[Long].collect()
    assert(bs.forall(b => b >= 0 && b < 128) && bs.exists(_ >= 64),
      "bigram buckets must occupy the offset family [64, 128)")
  }

  test("unigram and bigram token streams agree on every Java \\s separator") {
    // the r11 advisor catch: WordNgrams.isSpace covered only
    // space/tab/\n/\r while the unigram path splits on \s+ (which adds
    // \f and \x0B), so form-feed text yielded disagreeing streams.
    import graft.functions.{TextFunctions, WordNgrams}
    val weird = Seq((0L, "alpha\fbeta\u000Bgamma delta"))
      .toDF("doc_id", "text")
    val uni = weird.select(explode(TextFunctions.tokens($"text")).as("w"))
      .as[String].collect().toSeq
    assert(uni === Seq("alpha", "beta", "gamma", "delta"))
    val bi = weird.select(explode(
        WordNgrams.word_ngrams($"text", 2)).as("g"))
      .as[String].collect().toSeq
    assert(bi === Seq("alpha beta", "beta gamma", "gamma delta"),
      "bigrams must derive from the same token boundaries as unigrams")
  }

  test("rocAuc: hand-computed tie-corrected Mann-Whitney, exact") {
    // pos scores {0.9, 0.5, 0.5}, neg {0.5, 0.2, 0.1}:
    // U = 3 (0.9 beats all) + 2×(2 + ½ tie) = 8 → AUC = 8/9
    val scored = Seq(
      (true, 0.9), (true, 0.5), (true, 0.5),
      (false, 0.5), (false, 0.2), (false, 0.1)
    ).toDF("label", "score")
    val Array(r) = Classifier.rocAuc(scored).collect()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 16.0 / 18.0) // exact division, no tolerance
    // perfect ranking → 1.0; inverted → 0.0; one-class → null
    def auc(rows: Seq[(Boolean, Double)]): java.lang.Double = {
      val Array(x) = Classifier.rocAuc(rows.toDF("label", "score")).collect()
      if (x.isNullAt(2)) null else x.getDouble(2)
    }
    assert(auc(Seq((true, 2.0), (true, 1.5), (false, 1.0), (false, 0.0))) === 1.0)
    assert(auc(Seq((false, 2.0), (false, 1.5), (true, 1.0), (true, 0.0))) === 0.0)
    assert(auc(Seq((true, 1.0), (true, 0.5))) === null)
    // the prefix sum is two-level: more rows than partitions still exact
    val many = (1 to 200).map(i => (i % 3 == 0, (i % 7).toDouble / 7.0))
    val Array(m) = Classifier.rocAuc(many.toDF("label", "score")).collect()
    val pos = many.filter(_._1).map(_._2); val neg = many.filterNot(_._1).map(_._2)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(m.getDouble(2) === u2.toDouble / (2.0 * pos.size * neg.size))
  }

  test("calibrationBins: unit bins, clamped tails, exact rates") {
    val scored = Seq(
      (true, -0.5), (false, -0.3),          // bin -1: rate 0.5
      (true, 0.5), (true, 0.9), (false, 0.1), // bin 0: rate 2/3
      (false, 17.9),                        // clamps to 16
      (true, -20.0)                         // clamps to -16
    ).toDF("label", "score")
    val rows = Classifier.calibrationBins(scored).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set(-16L, -1L, 0L, 16L))
    assert(rows(-1L) === ((2L, 1L, 0.5)))
    assert(rows(0L) === ((3L, 2L, 2.0 / 3.0)))
    assert(rows(16L) === ((1L, 0L, 0.0)))
    assert(rows(-16L) === ((1L, 1L, 1.0)))
  }

  test("scoring plan: model broadcasts, doc sum partially aggregates") {
    val model = Classifier.nbTrain(labeled, buckets = 64)
    val plan = Classifier.nbScore(corpus, model, labeled, buckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the bucket join must broadcast the model relation:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count")
      || plan.contains("HashAggregate"),
      s"per-doc sums must partially aggregate before the exchange:\n$plan")
  }
}

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

package graft

import org.apache.spark.sql.functions.{lit, sum, when}

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(10)),
    (2L, None, Some(10)),
    (3L, Some("b"), None),
    (4L, Some("a"), Some(20))
  ).toDF("id", "s", "v")

  test("profileExact counts rows, nulls, distincts, min/max per column") {
    val p = Profile.profileExact(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")))
    assert(p("v") === ((4L, 1L, 2L, "10", "20")))
  }

  test("embeddingGroupStats: integer-quantized exact means per (label, dim)") {
    val emb = Seq(
      (1L, Array(0.5f, -0.25f), 0),
      (2L, Array(0.1f, 0.75f), 0),
      (3L, Array(1.0f, 0.0f), 1),
      (4L, null.asInstanceOf[Array[Float]], 1) // null vec: excluded
    ).toDF("vec_id", "embedding", "label")
    val out = Profile.embeddingGroupStats(emb)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out((0, 0L)) === ((2L, 6000000L, 0.3)))   // (0.5+0.1)/2
    assert(out((0, 1L)) === ((2L, 5000000L, 0.25)))  // (-0.25+0.75)/2
    assert(out((1, 0L)) === ((1L, 10000000L, 1.0)))
    assert(out((1, 1L)) === ((1L, 0L, 0.0)))
    assert(out.size === 4)
  }

  test("profileApprox has the same shape; exact stats still exact; no Expand") {
    val ap = Profile.profileApprox(df, Seq("id", "s", "v"))
    val p = ap.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(4), r.getString(5)))).toMap
    assert(p("s") === ((4L, 1L, "a", "b")))   // n/nulls/min/max unaffected by HLL
    // the whole point of the approx variant: one flat pass, no k-way
    // row amplification before the aggregate
    val plan = ap.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    val exactPlan = Profile.profileExact(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand")) // documents the exact twin's cost
  }

  test("driftPsi: zero on identical snapshots, positive on shift, exact algebra") {
    import org.apache.spark.sql.functions.col
    val snap = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "fr"))
      .toDF("doc_id", "lang")
    val same = Profile.driftPsi(snap, snap, col("lang"))
      .as[(String, Long, Long, Double, Double, Long, Double)].collect()
    // identical shares → ln(p/q) = 0 → every term and the total are 0
    assert(same.forall(r => r._6 === 0L && r._7 === 0.0))
    val shifted = Seq((1L, "en"), (2L, "de"), (3L, "de"), (4L, "de"))
      .toDF("doc_id", "lang")
    val out = Profile.driftPsi(snap, shifted, col("lang"))
      .as[(String, Long, Long, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set("en", "de", "fr")) // union buckets, fr only in before
    // hand-replay of the quantization chain for one bucket (en: 2→1 of 4+3)
    val (q, p) = (3.0 / 7.0, 2.0 / 7.0)
    val lnq = math.round(math.log(p / q) * 1e12)
    val expected = math.round((p - q) * (lnq.toDouble / 1e12) * 1e15)
    assert(out("en")._6 === expected)
    val psi = out.values.map(_._6).sum.toDouble / 1e15
    assert(out.values.forall(_._7 === psi) && psi > 0.0)
  }

  test("observed: counters collect during the action, no extra pass, exact sum") {
    val events = tables.Tables.events(spark, sf)
      .withColumn("props", when($"event_id" % 10 === 0, lit(null)).otherwise($"props"))
    val (df, obs) = Profile.observed(events, s"audit-${System.nanoTime()}", "props", "value")
    val kept = df.filter($"value" > 100.0).count()   // ONE action drives both
    val m = obs.get
    assert(m("n_rows") === events.count())           // observed BEFORE the filter
    assert(m("n_null_guard") === events.filter($"event_id" % 10 === 0).count())
    val exact = events.agg(
      sum($"value".cast("decimal(12,2)")).cast("decimal(28,2)").cast("double"))
      .as[Double].head()
    assert(m("sum_value") === exact)                 // decimal-exact, order-free
    assert(kept > 0)
  }
}

package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** Property check: the window-based as-of join must agree with a
  * naive per-row reference implementation on randomized inputs
  * (seeded — failures reproduce).
  */
class AsOfJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("asOf equals the naive per-left-row maximum over random inputs") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val keys = 1 to 4
      val left = Seq.fill(40)((keys(rnd.nextInt(4)).toLong, ts(rnd.nextInt(100))))
      val right = Seq.fill(30)((keys(rnd.nextInt(4)).toLong, ts(rnd.nextInt(100)),
        if (rnd.nextInt(5) == 0) None else Some(s"v${rnd.nextInt(1000)}")))

      val lDf = left.toDF("k", "t")
      val rDf = right.toDF("k", "t", "v")
      val got = AsOfJoin.asOf(lDf, rDf, "k", "t", Seq("v"))
        .select("k", "t", "v")
        .as[(Long, Timestamp, Option[String])].collect()
        .sortBy(r => (r._1, r._2.getTime, r._3.toString))

      // naive reference: for each left row, the right rows at or
      // before its ts; winner = max ts, ties broken by max payload
      // (None sorts lowest) — the documented deterministic order
      val want = left.map { case (k, t) =>
        val cands = right.filter(r => r._1 == k && !r._2.after(t))
        val v = if (cands.isEmpty) None
        else cands.maxBy(r => (r._2.getTime, r._3.map("1" + _).getOrElse("0")))._3
        (k, t, v)
      }.sortBy(r => (r._1, r._2.getTime, r._3.toString))

      assert(got.toSeq === want, s"trial $trial diverged")
    }
  }

  test("asOfForward equals the naive per-left-row minimum over random inputs") {
    val rnd = new scala.util.Random(2424)
    for (trial <- 1 to 5) {
      val keys = 1 to 4
      val left = Seq.fill(40)((keys(rnd.nextInt(4)).toLong, ts(rnd.nextInt(100))))
      val right = Seq.fill(30)((keys(rnd.nextInt(4)).toLong, ts(rnd.nextInt(100)),
        if (rnd.nextInt(5) == 0) None else Some(s"v${rnd.nextInt(1000)}")))

      val got = AsOfJoin.asOfForward(left.toDF("k", "t"),
          right.toDF("k", "t", "v"), "k", "t", Seq("v"))
        .select("k", "t", "v")
        .as[(Long, Timestamp, Option[String])].collect()
        .sortBy(r => (r._1, r._2.getTime, r._3.toString))

      // naive reference: right rows AT OR AFTER the left ts; winner =
      // min ts, ties broken by MIN payload (None sorts lowest) — the
      // first() over ascending (ts, payload) order
      val want = left.map { case (k, t) =>
        val cands = right.filter(r => r._1 == k && !r._2.before(t))
        val v = if (cands.isEmpty) None
        else cands.minBy(r => (r._2.getTime, r._3.map("1" + _).getOrElse("0")))._3
        (k, t, v)
      }.sortBy(r => (r._1, r._2.getTime, r._3.toString))

      assert(got.toSeq === want, s"trial $trial diverged")
    }
  }
}

package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.RangeJoin

/** Property check for the bucketized range join: on random point and
  * interval sets the rewrite must return EXACTLY the pairs a naive
  * containment filter does — no bucket-boundary misses (an interval
  * spanning many buckets, a point on a bucket edge), no duplicates
  * (a point and an interval sharing several buckets must still match
  * once). Seeded generators, deterministic offline.
  */
class RangeJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private val pointsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(60, for {
      user <- Gen.choose(1L, 4L)
      offMs <- Gen.choose(0L, 12L * 3600 * 1000)
    } yield (user, offMs)).map(_.zipWithIndex.map {
      case ((u, o), i) => (i.toLong, u, o)
    })

  private val intervalsGen: Gen[List[(Long, Long, Long, Long)]] =
    Gen.listOfN(15, for {
      user <- Gen.choose(1L, 4L)
      startMs <- Gen.choose(0L, 10L * 3600 * 1000)
      lenMs <- Gen.choose(0L, 5L * 3600 * 1000)  // up to 5 buckets wide
    } yield (user, startMs, lenMs)).map(_.zipWithIndex.map {
      case ((u, s, l), i) => (100L + i, u, s, s + l)
    })

  test("bucketized interval overlap ≡ naive inequality join, each pair once") {
    for (seed <- 0 until 6) {
      val ivsA = intervalsGen(Gen.Parameters.default, Seed(2000L + seed)).get
        .map { case (id, u, s, e) =>
          (id, u, new Timestamp(base + s), new Timestamp(base + e)) }
      val ivsB = intervalsGen(Gen.Parameters.default, Seed(3000L + seed)).get
        .map { case (id, u, s, e) =>
          (200L + id, u, new Timestamp(base + s), new Timestamp(base + e)) }
      val a = ivsA.toDF("a_id", "a_user", "a_s", "a_e")
      val b = ivsB.toDF("b_id", "b_user", "b_s", "b_e")
      // collect as a LIST: a duplicate emission would survive a Set
      val got = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e",
          bucketWidthUs = 3600L * 1000000L)
        .select("a_id", "b_id").as[(Long, Long)].collect().toList.sorted
      val expected = (for {
        (aid, _, as_, ae) <- ivsA
        (bid, _, bs, be) <- ivsB
        if !as_.after(be) && !bs.after(ae)  // aS <= bE && bS <= aE
      } yield (aid, bid)).sorted
      assert(got === expected, s"seed $seed")
    }
  }

  test("bucketized range join ≡ naive containment filter on random data") {
    for (seed <- 0 until 6) {
      val pts = pointsGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .map { case (id, u, o) => (id, u, new Timestamp(base + o)) }
      val ivs = intervalsGen(Gen.Parameters.default, Seed(1000L + seed)).get
        .map { case (id, u, s, e) =>
          (id, u, new Timestamp(base + s), new Timestamp(base + e)) }
      val points = pts.toDF("event_id", "user_id", "ts")
      val intervals = ivs.toDF("iv_id", "user_id", "s", "e")
      val got = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
          Seq("user_id"), bucketWidthUs = 3600L * 1000000L)
        .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
      val expected = (for {
        (pid, pu, pts_) <- pts
        (ivid, iu, s, e) <- ivs
        if pu == iu && !pts_.before(s) && !pts_.after(e)
      } yield (pid, ivid)).toSet
      assert(got === expected, s"seed $seed")
    }
  }
}

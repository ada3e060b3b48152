package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Merge

/** Property tests for the merge kernel (SURVEY §7.2 step 3):
  * idempotence and last-writer-wins over arbitrary key overlaps.
  * Uses ScalaCheck generators with fixed seeds (deterministic, no
  * scalatest-plus bridge needed offline).
  */
class MergePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Double)]] = Gen.listOfN(25, for {
    id <- Gen.choose(0L, 30L)
    v  <- Gen.choose(-1000.0, 1000.0)
  } yield (id, v))

  private def cases(n: Int): Seq[(List[(Long, Double)], List[(Long, Double)])] =
    (0 until n).map { i =>
      (rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)).get,
        rowsGen.apply(Gen.Parameters.default, Seed(1000L + i)).get)
    }

  test("upsert is idempotent and keyed-unique") {
    for ((cur, upd) <- cases(8)) {
      val current = cur.toDF("id", "v").dropDuplicates("id")
      val updates = upd.toDF("id", "v").dropDuplicates("id")
      val once = Merge.upsert(current, updates, Seq("id"))
      val twice = Merge.upsert(once, updates, Seq("id"))
      val a = once.as[(Long, Double)].collect().sortBy(_._1).toSeq
      val b = twice.as[(Long, Double)].collect().sortBy(_._1).toSeq
      assert(a === b)
      assert(a.map(_._1).distinct.size === a.size) // keys unique
    }
  }

  test("upsert is last-writer-wins on every colliding key") {
    for ((cur, upd) <- cases(8)) {
      val current = cur.toDF("id", "v").dropDuplicates("id")
      val updates = upd.toDF("id", "v").dropDuplicates("id")
      val updMap = updates.as[(Long, Double)].collect().toMap
      val curMap = current.as[(Long, Double)].collect().toMap
      val merged = Merge.upsert(current, updates, Seq("id"))
        .as[(Long, Double)].collect().toMap
      assert(merged === (curMap ++ updMap))
    }
  }
}

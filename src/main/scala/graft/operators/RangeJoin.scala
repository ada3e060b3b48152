package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark has no native range join: the
  * naive `p.ts BETWEEN i.start AND i.end` theta join plans as a
  * BroadcastNestedLoopJoin — driver-bounded, dead at scale. This is
  * the standard bucketization rewrite: intervals explode into the
  * time buckets they span, points carry their single bucket, and the
  * join becomes an EQUI join on (equi keys…, bucket) with the BETWEEN
  * as a residual filter — hash/sort-merge joinable, shuffles
  * partition cleanly on the keys, and a point meets each interval via
  * exactly one bucket (its own), so no dedup pass is needed.
  *
  * `bucketWidthUs` tunes the explode factor: one bucket per
  * `width`-sized slice an interval touches. Pick it near the typical
  * interval length — intervals then land in O(1) buckets while
  * buckets stay selective. (As-of semantics live in
  * [[AsOfJoin]]; this op is for containment.)
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      equiKeys: Seq[String] = Nil,
                      bucketWidthUs: Long = 3600L * 1000000L): DataFrame = {
    def bucketOf(c: String) =
      floor(unix_micros(col(c).cast("timestamp")) / bucketWidthUs)
    val pb = points.withColumn("__bucket", bucketOf(pointCol))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    pb.join(ib, equiKeys :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}

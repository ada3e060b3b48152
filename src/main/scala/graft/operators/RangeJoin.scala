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

  /** Interval-overlap join (both sides are real intervals; endpoints
    * inclusive: overlap ⟺ lStart ≤ rEnd ∧ rStart ≤ lEnd). Same
    * bucketization rewrite as [[pointInInterval]], with one extra
    * device: an overlapping pair shares EVERY bucket of its
    * intersection, so emitting from all of them would need a distinct
    * pass over the full pair set. Instead a pair is emitted only from
    * the intersection's FIRST bucket — the bucket of the later start,
    * `greatest(bucket(lStart), bucket(rStart))`, which both sides
    * provably cover — so each pair appears exactly once and no dedup
    * shuffle exists. Callers must pre-alias clashing column names.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      equiKeys: Seq[String] = Nil,
                      bucketWidthUs: Long = 3600L * 1000000L): DataFrame = {
    def bucketOf(c: String) =
      floor(unix_micros(col(c).cast("timestamp")) / bucketWidthUs)
    val lb = left.withColumn("__bucket",
      explode(sequence(bucketOf(lStart), bucketOf(lEnd))))
    val rb = right.withColumn("__bucket",
      explode(sequence(bucketOf(rStart), bucketOf(rEnd))))
    lb.join(rb, equiKeys :+ "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bucket") === greatest(bucketOf(lStart), bucketOf(rStart)))
      .drop("__bucket")
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Reads

/** snapshotDiff presence semantics with NULLABLE value columns: presence
  * comes from per-side markers, never from value nullness, so NULL values
  * classify as changed/same rather than phantom added/removed rows.
  */
class SnapshotDiffSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) => Row(k, v) }),
      schema)

  test("NULL values never fake presence: NULL→NULL is same, NULL↔x is changed") {
    val before = df(Seq(
      (1L, null),   // NULL -> NULL      : same (filtered)
      (2L, null),   // NULL -> "b"       : changed
      (3L, "c"),    // "c"  -> NULL      : changed
      (4L, "d"),    // "d"  -> "d"       : same (filtered)
      (5L, "e")))   // key gone          : removed
    val after = df(Seq(
      (1L, null),
      (2L, "b"),
      (3L, null),
      (4L, "d"),
      (6L, null))) // new key with NULL value : added (not dropped)

    val out = Reads.snapshotDiff(before, after, "id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq

    assert(out === Seq(
      (2L, "changed", None, Some("b")),
      (3L, "changed", Some("c"), None),
      (5L, "removed", Some("e"), None),
      (6L, "added", None, None)))
  }

  test("non-null fast path unchanged: added/removed/changed classified by key") {
    val before = df(Seq((1L, "a"), (2L, "b")))
    val after  = df(Seq((2L, "B"), (3L, "c")))
    val out = Reads.snapshotDiff(before, after, "id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "removed"), (2L, "changed"), (3L, "added")))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def current = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "value")

  test("upsert: updates win on collision, new keys inserted, idempotent") {
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "name", "value")
    val merged = Merge.upsert(current, updates, Seq("id"))
    val rows = merged.orderBy($"id").as[(Long, String, Double)].collect().toSeq
    assert(rows === Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // idempotence: merging the same updates again changes nothing
    val again = Merge.upsert(merged, updates, Seq("id"))
    assert(again.orderBy($"id").collect().toSeq === merged.orderBy($"id").collect().toSeq)
  }

  test("update: phantom keys are dropped (UPDATE only touches existing rows)") {
    val updates = Seq((2L, "B", 99.0), (999L, "ghost", 0.0)).toDF("id", "name", "value")
    val updated = Merge.update(current, updates, Seq("id"))
    assert(updated.count() === 3)
    assert(updated.filter($"id" === 999L).count() === 0)
    assert(updated.filter($"id" === 2L).select("name").as[String].head() === "B")
  }

  test("partialUpdate: unspecified columns keep current values") {
    val upd = Seq((2L, "renamed")).toDF("id", "name")
    val out = Merge.partialUpdate(current, upd, Seq("id"))
    val r2 = out.filter($"id" === 2L).as[(Long, String, Double)].head()
    assert(r2 === ((2L, "renamed", 20.0)))
    assert(out.filter($"id" === 1L).as[(Long, String, Double)].head() === ((1L, "a", 10.0)))
  }

  test("delete and rows-affected") {
    val out = Merge.delete(current, $"id" === 2L)
    assert(out.count() === 2)
    assert(current.count() - out.count() === 1) // RowsAffected equivalent
  }

  test("append allows missing columns as nulls") {
    val row = Seq((9L, "z")).toDF("id", "name")
    val out = Merge.append(current, row)
    assert(out.count() === 4)
    assert(out.filter($"id" === 9L).select("value").head().isNullAt(0))
  }

  test("setWhere only touches matching rows") {
    val out = Merge.setWhere(current, $"id" === 1L, "value", lit(-1.0))
    assert(out.filter($"id" === 1L).select("value").as[Double].head() === -1.0)
    assert(out.filter($"id" === 2L).select("value").as[Double].head() === 20.0)
  }

  test("appendWithSerial: dense ids continue from the store max") {
    val rows = Seq(("x", 1.5), ("y", 2.5)).toDF("name", "value")
    val out = Merge.appendWithSerial(current, rows, "id", Seq("value"))
    assert(out.count() === 5)
    val appended = out.filter($"id" > 3L)
      .orderBy($"id").as[(Long, String, Double)].collect().toSeq
    assert(appended === Seq((4L, "x", 1.5), (5L, "y", 2.5)))
  }

  test("appendWithSerial: empty store starts ids at 1") {
    val rows = Seq(("x", 1.0)).toDF("name", "value")
    val out = Merge.appendWithSerial(current.filter($"id" < 0L), rows, "id", Seq("value"))
    assert(out.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("cdc: latest op per key wins — U/U, U/D, D/U, insert, untouched") {
    val store = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val log = Seq(
      (1L, "a1", 1L, "U"), (1L, "a2", 2L, "U"),  // double update → a2
      (2L, "x", 1L, "U"), (2L, "x", 2L, "D"),    // update then delete → gone
      (3L, "c9", 2L, "U"), (3L, "zz", 1L, "D"),  // delete superseded → c9
      (9L, "new", 1L, "I")                        // fresh key
    ).toDF("k", "v", "seq", "op")
    val out = Merge.applyChangelog(store, log, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a2", 3L -> "c9", 4L -> "d", 9L -> "new"))
  }

  test("scd2: versions chain across batches; history immutable; new keys insert") {
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    val dim0 = Seq((1L, "a", ts("2024-01-01T00:00"), null.asInstanceOf[java.time.LocalDateTime]),
        (2L, "b", ts("2024-01-01T00:00"), null.asInstanceOf[java.time.LocalDateTime]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val b1 = Seq((1L, "a2", ts("2024-02-01T00:00"))).toDF("k", "attr", "valid_from")
    val b2 = Seq((1L, "a3", ts("2024-03-01T00:00")),
        (3L, "c", ts("2024-03-01T00:00"))).toDF("k", "attr", "valid_from")
    val out = Merge.scd2(Merge.scd2(dim0, b1, Seq("k")), b2, Seq("k"))
      .orderBy($"k", $"valid_from")
      .as[(Long, String, java.time.LocalDateTime, Option[java.time.LocalDateTime])]
      .collect().toSeq
    assert(out === Seq(
      (1L, "a", ts("2024-01-01T00:00"), Some(ts("2024-02-01T00:00"))),   // history immutable
      (1L, "a2", ts("2024-02-01T00:00"), Some(ts("2024-03-01T00:00"))),  // closed by b2
      (1L, "a3", ts("2024-03-01T00:00"), None),                          // open
      (2L, "b", ts("2024-01-01T00:00"), None),                           // untouched
      (3L, "c", ts("2024-03-01T00:00"), None)))                          // new key
  }
}

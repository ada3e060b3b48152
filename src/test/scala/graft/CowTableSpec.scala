package graft

import org.apache.spark.sql.functions._

import graft.tables.CowTable

/** Copy-on-write table mechanism pins: the driver-gate cow_* queries
  * prove the DATA (snapshot contents vs plain-SQL merge semantics);
  * this spec pins the MECHANISM — manifest structure, key-stat
  * pruning (untouched buckets carried by path, never rewritten),
  * time-travel isolation, and the create-once contract.
  */
class CowTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cowspec_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def base = (0L until 100L).map(i => (i, i * 7L)).toDF("doc_id", "v")

  test("create: one snapshot, range buckets with true key stats") {
    val root = freshRoot()
    val m = CowTable.create(base, root, "doc_id", buckets = 4)
    assert(m.version === 1 && m.parent === 0)
    assert(m.entries.length === 4)
    // width = ceil(100/4) = 25: stats are the real per-bucket extremes
    assert(m.entries.map(e => (e.minKey, e.maxKey, e.rows)).sortBy(_._1) ===
      Seq((0L, 24L, 25L), (25L, 49L, 25L), (50L, 74L, 25L), (75L, 99L, 25L)))
    val got = CowTable.read(spark, root).as[(Long, Long)].collect().sorted
    assert(got === (0L until 100L).map(i => (i, i * 7L)))
    // the table is create-once — a second create must refuse
    intercept[IllegalArgumentException] {
      CowTable.create(base, root, "doc_id")
    }
  }

  test("merge: touched bucket rewrites, carried buckets keep their v1 paths") {
    val root = freshRoot()
    val m1 = CowTable.create(base, root, "doc_id", buckets = 4)
    val updates = Seq((10L, 777L), (11L, 888L), (1000L, 999L)).toDF("doc_id", "v")
    val (m2, rewritten, carried) = CowTable.merge(spark, root, updates, "doc_id")
    // keys 10/11/1000 land only in bucket [0,24] — one rewrite, three carries
    assert(rewritten === 1 && carried === 3)
    assert(m2.version === 2 && m2.parent === 1)
    // carried entries are the SAME paths as v1 (copy-on-write: data
    // not read, moved, or rewritten)
    val v1Paths = m1.entries.map(_.path).toSet
    assert(m2.entries.count(e => v1Paths(e.path)) === 3)
    val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got(10L) === 777L && got(11L) === 888L && got(1000L) === 999L)
    assert(got(12L) === 84L && got.size === 101)
  }

  test("delete prunes by stats; time travel reads stay isolated") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.merge(spark, root,
      Seq((10L, 777L), (1000L, 999L)).toDF("doc_id", "v"), "doc_id")
    val (m3, rewrittenD, _) = CowTable.delete(spark, root,
      Seq(Tuple1(30L)).toDF("doc_id"), "doc_id")
    assert(m3.version === 3)
    assert(rewrittenD >= 1) // [25,49] must rewrite; overlapping new bucket may too
    val v3 = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(!v3.contains(30L) && v3.size === 100 && v3(10L) === 777L)
    // every older snapshot still reads exactly as committed
    val v1 = CowTable.read(spark, root, Some(1)).as[(Long, Long)].collect().toMap
    assert(v1(10L) === 70L && v1.contains(30L) && !v1.contains(1000L))
    val v2 = CowTable.read(spark, root, Some(2)).as[(Long, Long)].collect().toMap
    assert(v2(10L) === 777L && v2.contains(30L) && v2(1000L) === 999L)
  }

  test("insert-only merge touches nothing: every bucket carries") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    val (m2, rewritten, carried) = CowTable.merge(spark, root,
      Seq((5000L, 1L), (6000L, 2L)).toDF("doc_id", "v"), "doc_id")
    assert(rewritten === 0 && carried === 4)
    assert(m2.entries.length === 5)
    assert(CowTable.read(spark, root).count() === 102)
  }
}

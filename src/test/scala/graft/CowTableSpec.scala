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
    assert(m.entries.map(e => (e.minKeyLong, e.maxKeyLong, e.rows)).sortBy(_._1) ===
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

  test("readWhere: zone-map pruning opens only intersecting entries") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4) // widths of 25
    val (df, scanned, skipped) =
      CowTable.readWhere(spark, root, "doc_id", 30L, 40L)
    assert(scanned === 1 && skipped === 3) // only [25,49] intersects
    assert(df.as[(Long, Long)].collect().sorted ===
      (30L to 40L).map(i => (i, i * 7L)))
    // empty intersection: nothing scanned, empty result, schema kept
    val (none, s0, k0) = CowTable.readWhere(spark, root, "doc_id", 500L, 600L)
    assert(s0 === 0 && k0 === 4 && none.count() === 0)
    assert(none.columns.toSeq === Seq("doc_id", "v"))
  }

  test("compact bin-packs small entries; content identical; big entries carry") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    // one oversized insert-entry that must CARRY through compaction
    CowTable.merge(spark, root,
      (200L until 260L).map(i => (i, i)).toDF("doc_id", "v"), "doc_id")
    val m2 = CowTable.readManifest(spark, root, 2)
    assert(m2.entries.length === 5)
    val bigPath = m2.entries.maxBy(_.rows).path // the 60-row insert entry
    val (m3, compacted, carriedC) =
      CowTable.compact(spark, root, "doc_id", targetRows = 30L)
    // four 25-row buckets qualify (<30); the 60-row entry carries
    assert(compacted === 4 && carriedC === 1)
    assert(m3.version === 3 && m3.entries.exists(_.path == bigPath))
    // 100 rows / target 30 ⇒ ceil = 4 new buckets… width-derived, so
    // pin only the invariants: fewer-or-equal entries, stats coherent
    assert(m3.entries.map(_.rows).sum === 160L)
    val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got.size === 160 && got(10L) === 70L && got(210L) === 210L)
    // pre-compaction snapshot still reads (layout change ≠ content change)
    assert(CowTable.read(spark, root, Some(2)).count() === 160)
    // no-op when fewer than two entries qualify: no new version
    val (m4, c2, _) = CowTable.compact(spark, root, "doc_id", targetRows = 1L)
    assert(c2 === 0 && m4.version === 3 &&
      CowTable.currentVersion(root) === 3)
  }

  test("changefeed reads only path-differing entries and cancels equal rows") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.merge(spark, root,
      Seq((10L, 777L), (1000L, 999L)).toDF("doc_id", "v"), "doc_id")
    CowTable.delete(spark, root, Seq(Tuple1(30L)).toDF("doc_id"), "doc_id")
    val (feed, read3, cancelled) =
      CowTable.changefeed(spark, root, "doc_id", 1, 3)
    // v1 buckets [50,74] and [75,99] carry all the way to v3 — at
    // least those two cancel on each side
    assert(cancelled >= 4 && read3 >= 2)
    val rows = feed.select(col("doc_id"), col("op"),
        col("old_v"), col("new_v"))
      .as[(Long, String, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(rows === Seq(
      (10L, "update", Some(70L), Some(777L)),
      (30L, "delete", Some(210L), None),
      (1000L, "insert", None, Some(999L))))
    // identity feed: nothing differs, nothing read
    val (self, readSelf, _) = CowTable.changefeed(spark, root, "doc_id", 2, 2)
    assert(readSelf === 0 && self.count() === 0)
  }

  test("history reports manifest stats that match the data exactly") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.merge(spark, root,
      Seq((10L, 777L), (1000L, 999L)).toDF("doc_id", "v"), "doc_id")
    CowTable.delete(spark, root, Seq(Tuple1(30L)).toDF("doc_id"), "doc_id")
    val h = CowTable.history(spark, root)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(h.map(r => (r._1, r._2, r._4)) ===
      Seq((1L, 0L, 100L), (2L, 1L, 101L), (3L, 2L, 100L)))
    // n_rows is from stats alone — cross-check against real counts
    (1 to 3).foreach { v =>
      assert(h(v - 1)._4 === CowTable.read(spark, root, Some(v)).count())
    }
  }

  test("vacuum deletes unreferenced buckets and expired manifests only") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.merge(spark, root,
      Seq((10L, 777L)).toDF("doc_id", "v"), "doc_id")
    CowTable.delete(spark, root, Seq(Tuple1(30L)).toDF("doc_id"), "doc_id")
    val before = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    val (dirs, manifests) = CowTable.vacuum(spark, root, retainVersions = 1)
    // v1's bucket [0,24] was rewritten in v2 and again around v3; at
    // least one superseded bucket dir and both old manifests must go
    assert(dirs >= 1 && manifests === 2)
    // latest still reads byte-identically
    val after = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(after === before)
    // expired versions are gone
    intercept[Exception] { CowTable.readManifest(spark, root, 1) }
    // history lists only RETAINED snapshots after vacuum (it must not
    // hardcode a scan from version 1)
    val h = CowTable.history(spark, root)
      .as[(Long, Long, Long, Long)].collect()
    assert(h.map(_._1) === Seq(3L) && h.head._4 === 99L)
    // idempotent: nothing left to collect
    assert(CowTable.vacuum(spark, root, retainVersions = 1) === ((0, 0)))
  }

  test("OCC: a racing commit is detected and the loser rebases + retries") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    // deterministic interleave: just before the outer merge commits,
    // a competing writer merges and WINS version 2. rename(2) would
    // silently clobber the winner (the pre-r12 ATOMIC_MOVE bug);
    // link(2) publish makes the loser see the conflict and rebase.
    CowTable.beforeCommitHook = () => {
      CowTable.beforeCommitHook = () => ()
      CowTable.merge(spark, root,
        Seq((60L, 6666L)).toDF("doc_id", "v"), "doc_id"): Unit
    }
    try {
      val (m, _, _) = CowTable.merge(spark, root,
        Seq((10L, 777L)).toDF("doc_id", "v"), "doc_id")
      // loser retried on the winner's snapshot: BOTH merges committed
      assert(m.version === 3)
      val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(10L) === 777L && got(60L) === 6666L && got.size === 100)
      // ≡ sequential application, and the winner's snapshot is intact
      val v2 = CowTable.read(spark, root, Some(2))
        .as[(Long, Long)].collect().toMap
      assert(v2(60L) === 6666L && v2(10L) === 70L)
      // the losing attempt's data dir is orphaned → vacuumable without
      // touching any retained snapshot
      val before = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      val (orphans, ms) = CowTable.vacuum(spark, root, retainVersions = 100)
      assert(orphans >= 1 && ms === 0)
      assert(CowTable.read(spark, root)
        .as[(Long, Long)].collect().toMap === before)
    } finally CowTable.beforeCommitHook = () => ()
  }

  test("OCC: maxAttempts=1 surfaces the conflict instead of clobbering") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.beforeCommitHook = () => {
      CowTable.beforeCommitHook = () => ()
      CowTable.merge(spark, root,
        Seq((60L, 6666L)).toDF("doc_id", "v"), "doc_id"): Unit
    }
    try {
      intercept[CowTable.ConcurrentCommitException] {
        CowTable.merge(spark, root,
          Seq((10L, 777L)).toDF("doc_id", "v"), "doc_id", maxAttempts = 1)
      }
      // the winner's commit survives untouched
      val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      assert(got(60L) === 6666L && got(10L) === 70L)
    } finally CowTable.beforeCommitHook = () => ()
  }

  test("txn: a redelivered micro-batch no-ops; watermarks carry across commits") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    val b0 = Seq((10L, 777L)).toDF("doc_id", "v")
    val (m2, _, _) = CowTable.merge(spark, root, b0, "doc_id",
      txn = Some(("streamA", 0L)))
    assert(m2.version === 2)
    // exactly-once: the SAME (app, batch) re-arrives (foreachBatch is
    // at-least-once) → no new version, current manifest returned
    val (mr, rw, cr) = CowTable.merge(spark, root, b0, "doc_id",
      txn = Some(("streamA", 0L)))
    assert(mr.version === 2 && rw === 0 && cr === 0)
    assert(CowTable.currentVersion(root) === 2)
    // an unrelated DELETE carries the watermark forward…
    CowTable.delete(spark, root, Seq(Tuple1(30L)).toDF("doc_id"), "doc_id")
    // …so the replay still no-ops on the new parent
    val (mr2, _, _) = CowTable.merge(spark, root, b0, "doc_id",
      txn = Some(("streamA", 0L)))
    assert(mr2.version === 3 && CowTable.currentVersion(root) === 3)
    // the NEXT batch commits; an independent stream has its own watermark
    val (m4, _, _) = CowTable.merge(spark, root,
      Seq((11L, 888L)).toDF("doc_id", "v"), "doc_id",
      txn = Some(("streamA", 1L)))
    assert(m4.version === 4)
    val (m5, _, _) = CowTable.merge(spark, root,
      Seq((12L, 999L)).toDF("doc_id", "v"), "doc_id",
      txn = Some(("streamB", 0L)))
    assert(m5.version === 5)
    val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got(10L) === 777L && got(11L) === 888L && got(12L) === 999L &&
      !got.contains(30L))
  }

  test("string keys: hash-range buckets, lexicographic stats, same MERGE semantics") {
    val root = freshRoot()
    val baseS = (0L until 100L).map(i => (f"k$i%03d", i * 7L)).toDF("k", "v")
    val m1 = CowTable.create(baseS, root, "k", buckets = 4)
    assert(m1.entries.length === 4 && m1.entries.map(_.rows).sum === 100L)
    // stats are real lexicographic extremes of each hash bucket
    m1.entries.foreach(e => assert(e.minKey <= e.maxKey))
    val (m2, rew, _) = CowTable.merge(spark, root,
      Seq(("k010", 777L), ("k011", 888L)).toDF("k", "v"), "k")
    assert(m2.version === 2 && rew >= 1)
    // an insert whose key exceeds every bucket's max prunes EVERYTHING
    val (_, rew3, car3) = CowTable.merge(spark, root,
      Seq(("zzz", 1L)).toDF("k", "v"), "k")
    assert(rew3 === 0 && car3 === m2.entries.length)
    CowTable.delete(spark, root, Seq(Tuple1("k050")).toDF("k"), "k")
    val got = CowTable.read(spark, root).as[(String, Long)].collect().toMap
    assert(got("k010") === 777L && got("k011") === 888L &&
      got("zzz") === 1L && !got.contains("k050") && got.size === 100)
    // time travel unaffected
    assert(CowTable.read(spark, root, Some(1)).count() === 100)
  }

  test("schema evolution: new update columns widen; time travel keeps old schemas") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    val upd = Seq((10L, 777L, "en"), (1000L, 999L, "de"))
      .toDF("doc_id", "v", "lang")
    val (m2, _, _) = CowTable.merge(spark, root, upd, "doc_id")
    assert(m2.schema.fieldNames.toSeq === Seq("doc_id", "v", "lang"))
    val rows = CowTable.read(spark, root)
      .select("doc_id", "v", "lang")
      .as[(Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(10L) === ((777L, Some("en"))))
    assert(rows(1000L) === ((999L, Some("de"))))
    // carried old rows null-fill the evolved column
    assert(rows(50L) === ((350L, None)) && rows.size === 101)
    // time travel reads v1 under ITS schema — no lang column
    assert(CowTable.read(spark, root, Some(1)).columns.toSeq ===
      Seq("doc_id", "v"))
    // updates may also OMIT table columns (null-filled on insert)
    val (m3, _, _) = CowTable.merge(spark, root,
      Seq(Tuple2(2000L, "fr")).toDF("doc_id", "lang"), "doc_id")
    assert(m3.schema.fieldNames.toSeq === Seq("doc_id", "v", "lang"))
    val r3 = CowTable.read(spark, root).filter(col("doc_id") === 2000L)
      .select("v", "lang").as[(Option[Long], Option[String])].head()
    assert(r3 === ((None, Some("fr"))))
    // type conflicts refuse loudly — a silent upcast would change what
    // time travel reads back
    intercept[IllegalArgumentException] {
      CowTable.merge(spark, root,
        Seq(Tuple2(5L, "not a long")).toDF("doc_id", "v"), "doc_id")
    }
  }

  test("deleteMor: deletion vectors, zero rewrite, exact accounting") {
    val root = freshRoot()
    val m1 = CowTable.create(base, root, "doc_id", buckets = 4)
    val (m2, changed, carried) = CowTable.deleteMor(spark, root,
      (10L until 15L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
    // keys [10,15) live in bucket [0,24]: ONE vector written, ZERO
    // buckets rewritten — every data path carries
    assert(changed === 1 && carried === 3)
    assert(m2.entries.map(_.path).toSet === m1.entries.map(_.path).toSet)
    val dvd = m2.entries.filter(_.dv != null)
    assert(dvd.length === 1 && dvd.head.dvRows === 5L &&
      dvd.head.liveRows === 20L)
    val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got.size === 95 && !got.contains(12L) && got(9L) === 63L)
    // history derives live counts from manifest stats alone
    val h = CowTable.history(spark, root)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(h.map(_._4) === Seq(100L, 95L))
    // double-delete (overlap [12,20)): re-deleted keys absorb, the
    // vector grows by exactly the newly-matched live keys
    val (m3, chg3, _) = CowTable.deleteMor(spark, root,
      (12L until 20L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
    assert(chg3 === 1)
    val dv3 = m3.entries.filter(_.dv != null)
    assert(dv3.head.dvRows === 10L) // [10,20) distinct
    assert(CowTable.read(spark, root).count() === 90)
    // pure re-delete: identical vector → entry keeps its OLD sidecar
    // path and no entry reads as changed
    val (m4, chg4, _) = CowTable.deleteMor(spark, root,
      (12L until 15L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
    assert(chg4 === 0)
    assert(m4.entries.filter(_.dv != null).head.dv === dv3.head.dv)
    // absent keys delete nothing anywhere
    val (m5, chg5, _) = CowTable.deleteMor(spark, root,
      Seq(Tuple1(5000L)).toDF("doc_id"), "doc_id")
    assert(chg5 === 0 && CowTable.read(spark, root).count() === 90)
    assert(m5.version === 5)
    // pruned reads apply the vectors of the hit entries
    val (w, scanned, _) = CowTable.readWhere(spark, root, "doc_id", 5L, 24L)
    assert(scanned === 1)
    assert(w.as[(Long, Long)].collect().map(_._1).sorted ===
      (5L until 10L) ++ (20L until 25L))
  }

  test("deleteMor: rewrites materialize vectors; re-inserted keys come back") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.deleteMor(spark, root,
      (10L until 20L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
    // MERGE touching the dv'd bucket: survivors are LIVE rows, the
    // rewritten entry carries no vector, and a previously-deleted key
    // re-inserted by the update reads back
    val (m3, rew, _) = CowTable.merge(spark, root,
      Seq((12L, 7777L), (23L, 8888L)).toDF("doc_id", "v"), "doc_id")
    assert(rew === 1)
    assert(m3.entries.forall(_.dv == null))
    val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got(12L) === 7777L && got(23L) === 8888L)
    assert(!got.contains(11L) && got.size === 91) // 90 live − upserted 23 + {12, 23}
    // history stays exact through the materialization
    val h = CowTable.history(spark, root)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(h.map(_._4) === Seq(100L, 90L, 91L))
    // changefeed across the dv version: entry identity is (path, dv),
    // so the dv'd bucket diffs against v1 even though its data path
    // never changed
    val (feed, _, cancelled12) = CowTable.changefeed(spark, root, "doc_id", 1, 2)
    assert(cancelled12 === 6) // 3 untouched entries cancel on each side
    val dels = feed.as[(Long, String, Option[Long], Option[Long])].collect()
    assert(dels.length === 10 && dels.forall(_._2 == "delete"))
    // compact materializes whatever vectors remain
    val root2 = freshRoot()
    CowTable.create(base, root2, "doc_id", buckets = 4)
    CowTable.deleteMor(spark, root2,
      (10L until 20L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
    val (mc, compacted, _) =
      CowTable.compact(spark, root2, "doc_id", targetRows = 1L << 20)
    assert(compacted === 4 && mc.entries.forall(_.dv == null))
    assert(CowTable.read(spark, root2).count() === 90)
    // a replaced sidecar is vacuum fodder; retained reads unaffected
    CowTable.deleteMor(spark, root,
      Seq(Tuple1(23L)).toDF("doc_id"), "doc_id") // new vector on rewritten bucket
    val before = CowTable.read(spark, root).count()
    val (orphans, _) = CowTable.vacuum(spark, root, retainVersions = 1)
    assert(orphans >= 1)
    assert(CowTable.read(spark, root).count() === before)
  }

  test("deleteMor: fully-vectored entry drops; whole-table MoR delete stays readable") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    // delete every key of bucket [0,24]: the entry (and its sidecar)
    // drop from the manifest entirely
    val (m2, chg, _) = CowTable.deleteMor(spark, root,
      (0L until 25L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
    assert(chg === 1 && m2.entries.length === 3 &&
      m2.entries.forall(_.dv == null))
    assert(CowTable.read(spark, root).count() === 75)
    // and the degenerate end state: everything deleted merge-on-read
    val (m3, _, _) = CowTable.deleteMor(spark, root,
      (0L until 100L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
    assert(m3.entries.isEmpty)
    val empty = CowTable.read(spark, root)
    assert(empty.count() === 0 && empty.columns.toSeq === Seq("doc_id", "v"))
  }

  test("timestamp travel: readAsOf resolves the snapshot current at a wall-clock") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 2)
    val t1 = CowTable.readManifest(spark, root, 1).committedAt
    assert(t1 > 0L)
    Thread.sleep(5) // commits are ms-stamped; force distinct stamps
    CowTable.merge(spark, root, Seq((10L, 777L)).toDF("doc_id", "v"), "doc_id")
    val t2 = CowTable.readManifest(spark, root, 2).committedAt
    assert(t2 >= t1)
    assert(CowTable.versionAsOf(spark, root, t1) === 1)
    assert(CowTable.versionAsOf(spark, root, t2) === 2)
    assert(CowTable.versionAsOf(spark, root, t2 + 60000L) === 2)
    val v1 = CowTable.readAsOf(spark, root, t1)
      .as[(Long, Long)].collect().toMap
    assert(v1(10L) === 70L)
    val v2 = CowTable.readAsOf(spark, root, t2 + 1L)
      .as[(Long, Long)].collect().toMap
    assert(v2(10L) === 777L)
    intercept[IllegalArgumentException] {
      CowTable.versionAsOf(spark, root, t1 - 1L)
    }
  }

  test("changesSince: per-step feed, create as inserts, layout steps empty") {
    val root = freshRoot()
    val small = (0L until 10L).map(i => (i, i * 7L)).toDF("doc_id", "v")
    CowTable.create(small, root, "doc_id", buckets = 2)
    CowTable.merge(spark, root, Seq((3L, 999L)).toDF("doc_id", "v"), "doc_id")
    CowTable.deleteMor(spark, root, Seq(Tuple1(7L)).toDF("doc_id"), "doc_id")
    CowTable.compact(spark, root, "doc_id", targetRows = 1L << 20)
    val feed = CowTable.changesSince(spark, root, "doc_id", fromVersion = 0)
      .select("version", "doc_id", "op")
      .as[(Long, Long, String)].collect().sorted.toSeq
    // v1 = 10 inserts; v2 = 1 update; v3 = 1 MoR delete (the dv
    // changes the entry identity); v4 compact = layout-only, empty
    assert(feed.count(_._1 == 1L) === 10)
    assert(feed.filter(_._1 == 2L) === Seq((2L, 3L, "update")))
    assert(feed.filter(_._1 == 3L) === Seq((3L, 7L, "delete")))
    assert(feed.count(_._1 == 4L) === 0)
    // replaying the feed reconstructs the live table: inserts − deletes
    assert(feed.count(_._3 == "insert") - feed.count(_._3 == "delete") ===
      CowTable.read(spark, root).count())
  }

  test("maintainedAgg: deltas equal the direct aggregate, across group moves") {
    val root = freshRoot()
    val data = (0L until 60L).map(i => (i, i * 3L, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "v", "g")
    CowTable.create(data, root, "doc_id", buckets = 3)
    // churn: an in-group update, a GROUP-MOVING update (a→b), an
    // insert, a CoW delete, a MoR delete, and a layout-only compact
    CowTable.merge(spark, root,
      Seq((4L, 999L, "a"), (6L, 5L, "b"), (100L, 7L, "a"))
        .toDF("doc_id", "v", "g"), "doc_id")
    CowTable.delete(spark, root, Seq(Tuple1(1L)).toDF("doc_id"), "doc_id")
    CowTable.deleteMor(spark, root, Seq(Tuple1(3L)).toDF("doc_id"), "doc_id")
    CowTable.compact(spark, root, "doc_id", targetRows = 1L << 20)
    val maintained = CowTable
      .maintainedAgg(spark, root, "doc_id", "g", "v", fromVersion = 1)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = CowTable.read(spark, root)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(maintained === direct)
    // and from a mid-lifecycle base too
    val m3 = CowTable
      .maintainedAgg(spark, root, "doc_id", "g", "v", fromVersion = 3)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m3 === direct)
  }

  test("column stats + z-order: secondary-column skipping needs the z layout") {
    val root = freshRoot()
    // v = a value UNCORRELATED with the key under key-range layout:
    // v = (doc_id * 37) % 100 scatters every v range across every
    // key bucket, so pre-z-order a v query can skip NOTHING
    val data = (0L until 400L).map(i => (i, (i * 37L) % 100L))
      .toDF("doc_id", "v")
    CowTable.create(data, root, "doc_id", buckets = 8,
      statsCols = Seq("v"))
    val m1 = CowTable.readManifest(spark, root, 1)
    assert(m1.statsCols === Seq("v"))
    assert(m1.entries.forall(_.colStats.contains("v")))
    val (r1, scanned1, skipped1) =
      CowTable.readWhereNum(spark, root, "v", 10.0, 19.0)
    assert(skipped1 === 0, "key layout cannot skip on the scattered column")
    assert(r1.count() === 40) // 40 of 400: v uniform over 0..99
    // OPTIMIZE ZORDER BY (v, doc_id): same content, clustered layout
    val (m2, rewritten) =
      CowTable.compactZOrder(spark, root, Seq("v", "doc_id"),
        targetBuckets = 16)
    assert(rewritten === 8 && m2.statsCols.toSet === Set("v", "doc_id"))
    assert(CowTable.read(spark, root).as[(Long, Long)].collect().sorted ===
      data.as[(Long, Long)].collect().sorted)
    val (r2, scanned2, skipped2) =
      CowTable.readWhereNum(spark, root, "v", 10.0, 19.0)
    assert(skipped2 > 0, "z layout must skip buckets on the z column")
    assert(scanned2 < scanned1 + skipped1)
    assert(r2.as[(Long, Long)].collect().sorted ===
      r1.as[(Long, Long)].collect().sorted)
    // the key dimension still prunes through its own zone maps
    val (r3, _, skipped3) =
      CowTable.readWhereNum(spark, root, "doc_id", 0.0, 49.0)
    assert(skipped3 > 0 && r3.count() === 50)
    // CONJUNCTIVE pruning: both dimensions at once skips at least as
    // much as either alone — the read shape Morton order exists for
    val (_, sv, _) = CowTable.readWhereNum(spark, root, "v", 10.0, 19.0)
    val (_, sd, _) = CowTable.readWhereNum(spark, root, "doc_id", 0.0, 49.0)
    val (r2d, scanned2d, skipped2d) = CowTable.readWhereNums(spark, root,
      Map("v" -> ((10.0, 19.0)), "doc_id" -> ((0.0, 49.0))))
    assert(scanned2d <= math.min(sv, sd) && skipped2d > 0)
    assert(r2d.as[(Long, Long)].collect().sorted ===
      (0L until 50L).filter(i => (i * 37) % 100 >= 10 && (i * 37) % 100 <= 19)
        .map(i => (i, (i * 37) % 100)).sorted)
    // time travel to the pre-z-order layout is unaffected
    assert(CowTable.read(spark, root, Some(1)).count() === 400)
    // stats survive a subsequent MERGE rewrite (statsCols carry)
    CowTable.merge(spark, root, Seq((10L, 999L)).toDF("doc_id", "v"), "doc_id")
    val m3 = CowTable.readManifest(spark, root, 3)
    assert(m3.statsCols.toSet === Set("v", "doc_id"))
    assert(m3.entries.forall(_.colStats.contains("v")))
    assert(CowTable.readWhereNum(spark, root, "v", 999.0, 999.0)._1
      .count() === 1)
  }

  test("bloom sidecars: point lookups on hash-bucketed string tables prune") {
    val root = freshRoot()
    val baseS = (0L until 400L).map(i => (f"k$i%04d", i * 3L)).toDF("k", "v")
    CowTable.create(baseS, root, "k", buckets = 8, bloomKeys = true)
    val m1 = CowTable.readManifest(spark, root, 1)
    assert(m1.bloomKeys && m1.entries.forall(_.bloom != null))
    // hash buckets: every bucket's lexicographic range spans the key
    // space, so WITHOUT blooms a point lookup scans all 8
    val (r1, scanned, skipped) = CowTable.lookupKey(spark, root, "k0123")
    assert(r1.as[(String, Long)].collect() === Array(("k0123", 369L)))
    assert(skipped > 0 && scanned < 8,
      s"bloom must prune hash buckets (scanned=$scanned skipped=$skipped)")
    // absent key: usually zero buckets scanned, always zero rows
    val (r0, s0, _) = CowTable.lookupKey(spark, root, "nope")
    assert(r0.count() === 0 && s0 <= 1)
    // MERGE rewrites rebuild sidecars; carried entries keep theirs
    val (m2, rew, _) = CowTable.merge(spark, root,
      Seq(("k0123", 999L), ("zzzz", 1L)).toDF("k", "v"), "k")
    assert(rew >= 1 && m2.entries.forall(_.bloom != null))
    val (r2, _, sk2) = CowTable.lookupKey(spark, root, "k0123")
    assert(r2.as[(String, Long)].collect() === Array(("k0123", 999L)))
    assert(sk2 > 0)
    assert(CowTable.lookupKey(spark, root, "zzzz")._1.count() === 1)
    // superseded sidecars vacuum with their buckets
    val before = CowTable.read(spark, root).count()
    val (orphans, _) = CowTable.vacuum(spark, root, retainVersions = 1)
    assert(orphans >= 1 && CowTable.read(spark, root).count() === before)
    assert(CowTable.lookupKey(spark, root, "k0123")._1.count() === 1)
    // bigint tables prune by range alone: bloom-less lookup still works
    val root2 = freshRoot()
    CowTable.create(base, root2, "doc_id", buckets = 4)
    val (rb, sb, kb) = CowTable.lookupKey(spark, root2, 30L)
    assert(rb.as[(Long, Long)].collect() === Array((30L, 210L)))
    assert(sb === 1 && kb === 3)
  }

  test("a fully-emptied table stays readable, feedable, and mergeable") {
    val root = freshRoot()
    val small = (0L until 10L).map(i => (i, i)).toDF("doc_id", "v")
    CowTable.create(small, root, "doc_id", buckets = 2)
    val (m2, _, _) = CowTable.delete(spark, root,
      small.select("doc_id"), "doc_id")
    assert(m2.entries.isEmpty)
    // empty-entry snapshot reads as an EMPTY frame with the schema
    val empty = CowTable.read(spark, root)
    assert(empty.count() === 0 && empty.columns.toSeq === Seq("doc_id", "v"))
    // history and changefeed survive the empty snapshot
    assert(CowTable.history(spark, root).count() === 2)
    val (feed, _, _) = CowTable.changefeed(spark, root, "doc_id", 1, 2)
    assert(feed.filter(col("op") === "delete").count() === 10)
    // and the table accepts new data again
    CowTable.merge(spark, root, Seq((5L, 55L)).toDF("doc_id", "v"), "doc_id")
    assert(CowTable.read(spark, root).as[(Long, Long)].collect() ===
      Array((5L, 55L)))
  }
}

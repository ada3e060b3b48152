package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import graft.tables.CowTable

/** Concurrency torture for the [[CowTable]] OCC protocol — the
  * lakehouse twin of IndexCatalogStressSpec: seeded random schedules
  * of {merge, delete, compact, vacuum} across three writer threads
  * (disjoint key ranges, so the expected final state is deterministic
  * regardless of interleaving — OCC must serialize the commits
  * without losing any writer's rows), plus a polling reader that must
  * never catch a committed head pointing at swept files.
  *
  * Also pins the r16 vacuum fix deterministically: vacuum sweeps only
  * version dirs targeting ≤ the head version, so an IN-FLIGHT
  * writer's pre-commit data dirs (targeting head+1) survive a
  * concurrent vacuum — unguarded, the vacuum deletes them as
  * "unreferenced orphans" and the writer then commits pointers at
  * deleted directories (the gc TOCTOU, at table granularity).
  */
class CowTableStressSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cowstress_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("vacuum racing an in-flight merge never sweeps its pre-commit dirs") {
    val root = freshRoot()
    CowTable.create((0L until 40L).map(i => (i, 0L)).toDF("doc_id", "v"),
      root, "doc_id", buckets = 4)
    // between the merge's data write and its commit, a vacuum runs:
    // the merge's fresh v2-* dirs are unreferenced at that instant —
    // the in-flight frontier must leave them alone
    var armed = true
    CowTable.beforeCommitHook = () =>
      if (armed) { armed = false; CowTable.vacuum(spark, root, 1): Unit }
    try CowTable.merge(spark, root,
      Seq((1L, 999L), (100L, 5L)).toDF("doc_id", "v"), "doc_id"): Unit
    finally CowTable.beforeCommitHook = () => ()
    // the merge committed and the table reads through its new dirs
    val rows = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(rows(1L) === 999L && rows(100L) === 5L && rows.size === 41)
  }

  test("concurrent publishBranchRebasing from 3 branches: rebase-retry lands every branch's edits, none lost") {
    val root = freshRoot()
    val nBranches = 3
    val keysPer = 20
    CowTable.create(
      (0L until (nBranches * keysPer).toLong).map(i => (i, -1L))
        .toDF("doc_id", "v"),
      root, "doc_id", buckets = 4)
    // branch w edits its own disjoint key range: merge all to 1000+w,
    // delete its first key — expected main state is deterministic
    (0 until nBranches).foreach { w =>
      CowTable.createBranch(spark, root, s"exp$w")
      val br = CowTable.branchRoot(root, s"exp$w")
      CowTable.merge(spark, br,
        (w * keysPer until (w + 1) * keysPer)
          .map(k => (k.toLong, 1000L + w)).toDF("doc_id", "v"),
        "doc_id")
      CowTable.delete(spark, br,
        Seq((w * keysPer).toLong).toDF("doc_id"), "doc_id")
    }
    // all three publish CONCURRENTLY: at most one fast-forwards, the
    // others take BranchDivergedException → rebaseBranch (the r16
    // claimed-swap path) → retry, under real thread contention
    val errors = new ConcurrentLinkedQueue[String]
    val threads = (0 until nBranches).map { w =>
      new Thread(() => {
        try CowTable.publishBranchRebasing(spark, root, s"exp$w",
          "doc_id"): Unit
        catch { case e: Throwable => errors.add(s"exp$w: $e") }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(180000))
    assert(errors.isEmpty, errors.asScala.mkString("; "))
    val expected = (0 until nBranches).flatMap { w =>
      (w * keysPer + 1 until (w + 1) * keysPer)
        .map(k => k.toLong -> (1000L + w))
    }.toMap
    val got = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got === expected, "a concurrent publish lost a branch's edits")
    // no rebase debris: every temp gone, branches still listable
    (0 until nBranches).foreach { w =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"$root/_branches/.rebase_exp$w")))
    }
  }

  test("seeded concurrent merge/delete/compact/vacuum schedules: OCC serializes, nothing lost, head always readable") {
    for (seed <- 0 until 4) {
      val root = freshRoot()
      val rnd = new scala.util.Random(seed)
      val nWriters = 3
      val keysPer = 20
      CowTable.create(
        (0L until (nWriters * keysPer).toLong).map(i => (i, -1L))
          .toDF("doc_id", "v"),
        root, "doc_id", buckets = 4)
      // writer w owns keys [w*keysPer, (w+1)*keysPer): ops commute
      // across writers, so the final state is the per-writer
      // sequential outcome regardless of interleaving
      sealed trait Op
      case class Merge(tag: Long) extends Op
      case object Delete extends Op // kills the writer's first 2 keys
      case object Compact extends Op
      case object Vacuum extends Op
      val plans: Seq[Seq[Op]] = (0 until nWriters).map { w =>
        (0 until 3).map { i =>
          rnd.nextInt(6) match {
            case 0 | 1 | 2 => Merge(100L * w + i)
            case 3 => Delete
            case 4 => Compact
            case 5 => Vacuum
          }
        }
      }
      val violations = new ConcurrentLinkedQueue[String]
      @volatile var stop = false
      val reader = new Thread(() => {
        while (!stop) {
          val v = CowTable.currentVersion(root)
          try { CowTable.read(spark, root, Some(v)).count(): Unit }
          catch {
            case e: Throwable =>
              // only a violation if that snapshot is STILL the head —
              // an older snapshot may age out of vacuum retention
              if (CowTable.currentVersion(root) == v)
                violations.add(s"seed=$seed: head v$v unreadable: " +
                  s"${e.getMessage.take(120)}")
          }
        }
      })
      // the documented OCC contract: withRetry(5) CAN exhaust under
      // hot contention and throw — the caller's move is to retry (a
      // failed commit changed nothing; its dirs are sweepable
      // orphans). The stress retries so the invariant stays "every op
      // that RETURNED is reflected in the final state".
      def retryOcc(f: => Unit): Unit = {
        var attempts = 0
        while ({
          attempts += 1
          try { f; false }
          catch {
            case _: CowTable.ConcurrentCommitException if attempts < 20 =>
              true
          }
        }) ()
      }
      val writers = plans.zipWithIndex.map { case (plan, w) =>
        new Thread(() => {
          try plan.foreach {
            case Merge(tag) => retryOcc {
              CowTable.merge(spark, root,
                (w * keysPer until (w + 1) * keysPer)
                  .map(k => (k.toLong, tag)).toDF("doc_id", "v"),
                "doc_id"): Unit
            }
            case Delete => retryOcc {
              CowTable.delete(spark, root,
                Seq((w * keysPer).toLong, (w * keysPer + 1).toLong)
                  .toDF("doc_id"), "doc_id"): Unit
            }
            case Compact => retryOcc {
              CowTable.compact(spark, root, "doc_id", 1000L): Unit
            }
            case Vacuum =>
              CowTable.vacuum(spark, root, 4): Unit
          } catch {
            case e: Throwable =>
              violations.add(s"seed=$seed writer$w: $e")
          }
        })
      }
      val threads = reader +: writers
      threads.foreach(_.start())
      writers.foreach(_.join(120000))
      stop = true
      reader.join(120000)
      assert(violations.isEmpty,
        s"seed=$seed: ${violations.asScala.mkString("; ")}")
      // expected = per-writer sequential replay over its own range
      val expected = (0 until nWriters).flatMap { w =>
        var state = (w * keysPer until (w + 1) * keysPer)
          .map(k => k.toLong -> -1L).toMap
        plans(w).foreach {
          case Merge(tag) => state = state.keySet
              .union((w * keysPer until (w + 1) * keysPer)
                .map(_.toLong).toSet)
              .map(k => k -> tag).toMap
          case Delete =>
            state = state - (w * keysPer).toLong - (w * keysPer + 1).toLong
          case _ => ()
        }
        state
      }.toMap
      val got = CowTable.read(spark, root).as[(Long, Long)]
        .collect().toMap
      assert(got === expected, s"seed=$seed final state diverged")
      // post-quiescence vacuum must not move the state
      CowTable.vacuum(spark, root, 2): Unit
      assert(CowTable.read(spark, root).as[(Long, Long)]
        .collect().toMap === expected)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.tables.CowTable

/** Write-audit-publish branches: fork isolation, O(manifest)
  * branching, publish fast-forward + file re-homing, divergence
  * detection, abandon semantics, and branch-aware vacuum.
  */
class CowBranchSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cowbranch_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def base = (0L until 100L).map(i => (i, i * 7L)).toDF("doc_id", "v")

  test("branch writes stay invisible to main until publish") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    val baseV = CowTable.createBranch(spark, root, "exp")
    assert(baseV === 1)
    val br = CowTable.branchRoot(root, "exp")
    // branching copied a manifest, not data: branch entries are main's
    assert(CowTable.readManifest(spark, br, 1).entries.map(_.path) ===
      CowTable.readManifest(spark, root, 1).entries.map(_.path))
    CowTable.merge(spark, br,
      Seq((10L, 999L), (200L, 1L)).toDF("doc_id", "v"), "doc_id")
    // the branch sees the write; main does not
    assert(CowTable.read(spark, br).as[(Long, Long)].collect().toMap
      .get(200L) === Some(1L))
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 70L && !main.contains(200L))
    assert(CowTable.currentVersion(root) === 1)
    assert(CowTable.listBranches(root) === Seq("exp"))
  }

  test("publish fast-forwards main and re-homes branch files") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L), (200L, 1L)).toDF("doc_id", "v"), "doc_id")
    val v = CowTable.publishBranch(spark, root, "exp")
    assert(v === 2 && CowTable.currentVersion(root) === 2)
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 999L && main(200L) === 1L && main.size === 101)
    // published entries live under MAIN's tree — dropping the branch
    // must not strand them
    val m2 = CowTable.readManifest(spark, root, 2)
    assert(m2.entries.forall(e => !e.path.contains("_branches")))
    CowTable.dropBranch(root, "exp")
    assert(CowTable.listBranches(root).isEmpty)
    assert(CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      .apply(200L) === 1L)
    // time travel still sees pre-publish main
    assert(CowTable.read(spark, root, Some(1)).as[(Long, Long)]
      .collect().toMap.get(200L).isEmpty)
  }

  test("rebase replays the branch's net changes onto the new head; publish then lands") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    // branch: upsert 10→999, insert 200→1, delete 20, and churn 30
    // twice (31 then 32 — the changefeed must carry only the NET 32)
    CowTable.merge(spark, br,
      Seq((10L, 999L), (200L, 1L), (30L, 31L)).toDF("doc_id", "v"), "doc_id")
    CowTable.merge(spark, br, Seq((30L, 32L)).toDF("doc_id", "v"), "doc_id")
    CowTable.delete(spark, br, Seq(20L).toDF("doc_id"), "doc_id")
    // meanwhile main commits: 40→444 (disjoint) and 10→111 (conflict)
    CowTable.merge(spark, root,
      Seq((40L, 444L), (10L, 111L)).toDF("doc_id", "v"), "doc_id")
    intercept[CowTable.BranchDivergedException] {
      CowTable.publishBranch(spark, root, "exp")
    }
    val newBase = CowTable.rebaseBranch(spark, root, "exp", "doc_id")
    assert(newBase === CowTable.currentVersion(root))
    val v = CowTable.publishBranch(spark, root, "exp")
    CowTable.dropBranch(root, "exp")
    assert(v === CowTable.currentVersion(root))
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    // final state ≡ sequential: main's commit applied, then the branch
    assert(main(40L) === 444L)           // main-only key preserved
    assert(main(10L) === 999L)           // conflict: branch wins
    assert(main(200L) === 1L)            // branch insert
    assert(main(30L) === 32L)            // net of the branch's churn
    assert(!main.contains(20L))          // branch delete
    assert(main.size === 100)            // 100 base − 1 delete + 1 insert
    // the rebase staging dir is gone and never looked like a branch
    assert(CowTable.listBranches(root).isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/_branches/.rebase_exp")))
  }

  test("publishBranchRebasing retries through concurrent main commits") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br, Seq((5L, 555L)).toDF("doc_id", "v"), "doc_id")
    CowTable.merge(spark, root, Seq((6L, 666L)).toDF("doc_id", "v"), "doc_id")
    val v = CowTable.publishBranchRebasing(spark, root, "exp", "doc_id")
    assert(v === CowTable.currentVersion(root))
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(5L) === 555L && main(6L) === 666L)
  }

  test("publish recovers crashed states: partial moves skip-and-finish; a lost main commit re-runs") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L), (200L, 1L)).toDF("doc_id", "v"), "doc_id")
    // crash emulation 1: SOME branch-local dirs already sit under main
    // (a publish died mid-move) — the re-run must skip those and move
    // the rest; deriving the move list from the branch prefix would
    // move nothing once the re-homed manifest is committed
    val head = CowTable.readManifest(spark, br, CowTable.currentVersion(br))
    val brDirs = head.entries.map(_.path)
      .filter(_.startsWith(s"$br/data/"))
      .map(_.stripPrefix(s"$br/data/").takeWhile(_ != '/')).distinct
    assert(brDirs.nonEmpty)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/data"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$br/data/${brDirs.head}"),
      java.nio.file.Paths.get(s"$root/data/${brDirs.head}"))
    val v = CowTable.publishBranch(spark, root, "exp")
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 999L && main(200L) === 1L && main.size === 101)
    // crash emulation 2: publish completed the moves and the branch
    // re-commit but LOST the main commit — delete main's head manifest
    // and re-run; everything is already moved, so the re-run is a pure
    // idempotent re-commit
    assert(java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(f"$root/_manifests/v$v%05d.json")))
    assert(CowTable.publishBranch(spark, root, "exp") === v)
    assert(CowTable.read(spark, root).as[(Long, Long)].collect()
      .toMap === main)
  }

  test("publish refuses when main advanced past the fork point") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br, Seq((10L, 999L)).toDF("doc_id", "v"), "doc_id")
    // main moves on independently
    CowTable.merge(spark, root, Seq((20L, 123L)).toDF("doc_id", "v"), "doc_id")
    intercept[CowTable.BranchDivergedException] {
      CowTable.publishBranch(spark, root, "exp")
    }
    // nothing published; the failed publish left BOTH sides readable
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 70L && main(20L) === 123L)
    assert(CowTable.read(spark, br).as[(Long, Long)].collect().toMap
      .apply(10L) === 999L)
  }

  test("abandoned branch dies with its local files; main untouched") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "bad")
    val br = CowTable.branchRoot(root, "bad")
    CowTable.merge(spark, br, Seq((5L, -1L)).toDF("doc_id", "v"), "doc_id")
    CowTable.dropBranch(root, "bad")
    assert(!new java.io.File(br).exists())
    assert(CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      .apply(5L) === 35L)
  }

  test("vacuum on main keeps files a live branch still references") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    // churn main so v1's rewritten buckets become main-unreferenced
    (1 to 3).foreach { i =>
      CowTable.merge(spark, root,
        Seq((10L, i.toLong)).toDF("doc_id", "v"), "doc_id")
    }
    CowTable.vacuum(spark, root, retainVersions = 1)
    // the branch still reads its full fork snapshot (v1 files live)
    val got = CowTable.read(spark, br).as[(Long, Long)].collect().toMap
    assert(got(10L) === 70L && got.size === 100)
    // after the branch is gone, the same vacuum may collect them
    CowTable.dropBranch(root, "exp")
    val (dirs, _) = CowTable.vacuum(spark, root, retainVersions = 1)
    assert(dirs > 0)
    assert(CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      .apply(10L) === 3L)
  }

  test("shallow clone: zero-copy snapshot, then independent evolution") {
    val root = freshRoot()
    val cl = freshRoot() + "/clone"
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.merge(spark, root, Seq((3L, 33L)).toDF("doc_id", "v"), "doc_id")
    val m = CowTable.cloneAt(spark, root, cl, Some(2))
    // zero data copy: the clone's v1 entries ARE the source's v2 paths
    assert(m.entries.map(_.path) ===
      CowTable.readManifest(spark, root, 2).entries.map(_.path))
    assert(CowTable.read(spark, cl).as[(Long, Long)].collect().toMap
      .apply(3L) === 33L)
    // clone evolves; source does not see it
    CowTable.merge(spark, cl, Seq((5L, 500L)).toDF("doc_id", "v"), "doc_id")
    assert(CowTable.read(spark, cl).as[(Long, Long)].collect().toMap
      .apply(5L) === 500L)
    assert(CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      .apply(5L) === 35L)
    // source evolves; clone does not see it
    CowTable.merge(spark, root, Seq((7L, 700L)).toDF("doc_id", "v"), "doc_id")
    assert(CowTable.read(spark, cl).as[(Long, Long)].collect().toMap
      .apply(7L) === 49L)
    // clone target must be empty
    intercept[IllegalArgumentException] {
      CowTable.cloneAt(spark, root, cl)
    }
    assert(CowTable.listClones(root) === Seq(cl))
  }

  test("vacuum on the source keeps files a live clone references") {
    val root = freshRoot()
    val cl = freshRoot() + "/clone"
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.cloneAt(spark, root, cl)
    // churn the source so v1's buckets become source-unreferenced
    (1 to 3).foreach { i =>
      CowTable.merge(spark, root,
        Seq((10L, i.toLong)).toDF("doc_id", "v"), "doc_id")
    }
    CowTable.vacuum(spark, root, retainVersions = 1)
    val got = CowTable.read(spark, cl).as[(Long, Long)].collect().toMap
    assert(got(10L) === 70L && got.size === 100)
    // a deleted clone detaches: the same vacuum may then collect
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    rm(new java.io.File(cl))
    val (dirs, _) = CowTable.vacuum(spark, root, retainVersions = 1)
    assert(dirs > 0)
    assert(CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      .apply(10L) === 3L)
  }

  test("WAP audit loop: failing gate abandons, passing gate publishes") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    // attempt 1: writes a negative value; the audit gate rejects it
    CowTable.createBranch(spark, root, "wap")
    val br = CowTable.branchRoot(root, "wap")
    CowTable.merge(spark, br, Seq((7L, -7L)).toDF("doc_id", "v"), "doc_id")
    def audit(r: String): Boolean =
      CowTable.read(spark, r).filter(col("v") < 0).isEmpty
    assert(!audit(br))
    CowTable.dropBranch(root, "wap")
    // attempt 2: clean write passes the gate and publishes
    CowTable.createBranch(spark, root, "wap")
    CowTable.merge(spark, CowTable.branchRoot(root, "wap"),
      Seq((7L, 700L)).toDF("doc_id", "v"), "doc_id")
    assert(audit(CowTable.branchRoot(root, "wap")))
    assert(CowTable.publishBranch(spark, root, "wap") === 2)
    assert(CowTable.read(spark, root).as[(Long, Long)].collect().toMap
      .apply(7L) === 700L)
  }

  test("publish crashed between the re-homed commit and the moves recovers — even after main diverges") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L), (200L, 1L)).toDF("doc_id", "v"), "doc_id")
    // crash emulation: the publish committed the RE-HOMED head but
    // died before moving a single dir — replicate its first half
    val head = CowTable.readManifest(spark, br, CowTable.currentVersion(br))
    def patch(p: String): String =
      if (p == null) null
      else if (p.startsWith(s"$br/")) s"$root/${p.stripPrefix(s"$br/")}"
      else p
    val rehomed = head.entries.map(e =>
      e.copy(path = patch(e.path), dv = patch(e.dv),
        bloom = patch(e.bloom)))
    assert(rehomed !== head.entries)
    CowTable.commit(br, head.copy(version = head.version + 1,
      parent = head.version, entries = rehomed))
    // ...and main advances past the fork point while it lay crashed
    CowTable.merge(spark, root,
      Seq((40L, 444L)).toDF("doc_id", "v"), "doc_id")
    // the branch head references main paths whose dirs never moved;
    // the publish re-run repairs that state FIRST, then (correctly)
    // refuses the fast-forward
    intercept[CowTable.BranchDivergedException] {
      CowTable.publishBranch(spark, root, "exp")
    }
    // repaired: the branch reads again, and rebase → publish completes
    val rows = CowTable.read(spark, br).as[(Long, Long)].collect().toMap
    assert(rows(10L) === 999L && rows(200L) === 1L)
    CowTable.rebaseBranch(spark, root, "exp", "doc_id")
    val v = CowTable.publishBranch(spark, root, "exp")
    assert(v === CowTable.currentVersion(root))
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 999L && main(200L) === 1L && main(40L) === 444L)
    assert(main.size === 101)
  }

  test("rebase crashed mid-swap loses nothing: the next publish completes the swap") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L), (200L, 1L)).toDF("doc_id", "v"), "doc_id")
    CowTable.delete(spark, br, Seq(20L).toDF("doc_id"), "doc_id")
    CowTable.merge(spark, root,
      Seq((40L, 444L)).toDF("doc_id", "v"), "doc_id")
    // crash right after the ready marker, before the old→new swap
    CowTable.rebaseSwapHook = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] {
      CowTable.rebaseBranch(spark, root, "exp", "doc_id")
    } finally CowTable.rebaseSwapHook = () => ()
    // the complete rebased branch awaits its swap under the hidden
    // temp; the old branch is intact and the temp never lists
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$root/_branches/.rebase_exp/_rebase_ready.json")))
    assert(CowTable.listBranches(root) === Seq("exp"))
    // publish recovers: completes the swap, then fast-forwards (the
    // rebased branch forked from main's CURRENT head — no divergence)
    val v = CowTable.publishBranch(spark, root, "exp")
    assert(v === CowTable.currentVersion(root))
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 999L && main(200L) === 1L && main(40L) === 444L)
    assert(!main.contains(20L))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$root/_branches/.rebase_exp")))
  }

  test("createBranch after a crashed swap completes the recovery and refuses, never minting a clobberable branch") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L)).toDF("doc_id", "v"), "doc_id")
    CowTable.merge(spark, root,
      Seq((40L, 444L)).toDF("doc_id", "v"), "doc_id")
    CowTable.rebaseSwapHook = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] {
      CowTable.rebaseBranch(spark, root, "exp", "doc_id")
    } finally CowTable.rebaseSwapHook = () => ()
    // ... and the crash really happened one step later: the old
    // branch dir is already gone, the ready-marked temp awaits
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    rm(new java.io.File(br))
    // createBranch must FIRST finish the swap, then refuse — a fresh
    // branch minted here would be silently clobbered by the next
    // entry point's recovery
    val e = intercept[IllegalArgumentException] {
      CowTable.createBranch(spark, root, "exp")
    }
    assert(e.getMessage.contains("already exists"))
    val rows = CowTable.read(spark, br).as[(Long, Long)].collect().toMap
    assert(rows(10L) === 999L && rows(40L) === 444L)
  }

  test("rebase crashed before completion leaves the old branch authoritative; the re-run sweeps and succeeds") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L)).toDF("doc_id", "v"), "doc_id")
    CowTable.merge(spark, root,
      Seq((40L, 444L)).toDF("doc_id", "v"), "doc_id")
    // crash the temp build: the first commit inside the rebase (the
    // delta replay onto the fork) throws once — no marker lands
    var armed = true
    CowTable.beforeCommitHook = () =>
      if (armed) { armed = false; throw new RuntimeException("boom") }
    try intercept[RuntimeException] {
      CowTable.rebaseBranch(spark, root, "exp", "doc_id")
    } finally CowTable.beforeCommitHook = () => ()
    // no marker ⇒ the old branch is authoritative and still reads
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$root/_branches/.rebase_exp/_rebase_ready.json")))
    assert(CowTable.read(spark, br).as[(Long, Long)].collect()
      .toMap.apply(10L) === 999L)
    // a YOUNG marker-less temp might be a live rebase in another
    // process — recovery refuses to sweep it (descriptive error)...
    val e = intercept[IllegalStateException] {
      CowTable.rebaseBranch(spark, root, "exp", "doc_id")
    }
    assert(e.getMessage.contains("in flight or freshly crashed"))
    // ...but past the freshness bound the re-run sweeps and lands
    CowTable.rebaseTempFreshnessMs = -1L
    try assert(CowTable.rebaseBranch(spark, root, "exp", "doc_id") ===
      CowTable.currentVersion(root))
    finally CowTable.rebaseTempFreshnessMs = 10 * 60 * 1000L
    val v = CowTable.publishBranch(spark, root, "exp")
    assert(v === CowTable.currentVersion(root))
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 999L && main(40L) === 444L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$root/_branches/.rebase_exp")))
  }

  test("recovery racing the rebase's own swap cannot lose the branch: the swap is claimed") {
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L)).toDF("doc_id", "v"), "doc_id")
    // the r15 race: ANOTHER entry point runs recovery between the
    // ready marker and the rebase's own rm/move. createBranch sees
    // the marker, CLAIMS the swap, completes it, then refuses the
    // duplicate name. Unclaimed, the resuming rebase would rm() the
    // just-swapped-in branch and lose the whole tree; claimed, it
    // observes the lost claim, waits the other actor out, verifies.
    CowTable.rebaseSwapHook = () => {
      val e = intercept[IllegalArgumentException] {
        CowTable.createBranch(spark, root, "exp")
      }
      assert(e.getMessage.contains("already exists"))
    }
    try CowTable.rebaseBranch(spark, root, "exp", "doc_id"): Unit
    finally CowTable.rebaseSwapHook = () => ()
    // the branch survived, rebased content intact, temp gone
    val rows = CowTable.read(spark, br).as[(Long, Long)].collect().toMap
    assert(rows(10L) === 999L && rows.size === 100)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$root/_branches/.rebase_exp")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(br)))
    // and the branch still publishes
    CowTable.publishBranch(spark, root, "exp"): Unit
    assert(CowTable.read(spark, root).as[(Long, Long)].collect()
      .toMap.apply(10L) === 999L)
  }

  test("a claimant that crashed between claim and swap: fresh claim is left alone, stale claim is re-claimed and completed") {
    import java.nio.file.{Files => F, Paths => P}
    val root = freshRoot()
    CowTable.create(base, root, "doc_id", buckets = 4)
    CowTable.createBranch(spark, root, "exp")
    val br = CowTable.branchRoot(root, "exp")
    CowTable.merge(spark, br,
      Seq((10L, 999L)).toDF("doc_id", "v"), "doc_id")
    CowTable.rebaseSwapHook = () => throw new RuntimeException("boom")
    try intercept[RuntimeException] {
      CowTable.rebaseBranch(spark, root, "exp", "doc_id")
    } finally CowTable.rebaseSwapHook = () => ()
    val tmp = s"$root/_branches/.rebase_exp"
    // simulate the claimant crashing AFTER its atomic claim: the
    // marker is renamed to a claim file, no swap happened
    F.move(P.get(s"$tmp/_rebase_ready.json"),
      P.get(s"$tmp/_rebase_claim_dead0001")): Unit
    // FRESH claim (within the freshness bound): recovery must leave
    // the temp alone — the claimant may be mid-swap right now
    val e = intercept[IllegalArgumentException] {
      CowTable.createBranch(spark, root, "exp")
    }
    assert(e.getMessage.contains("already exists"))
    assert(F.exists(P.get(s"$tmp/_rebase_claim_dead0001")))
    // STALE claim (past the bound): the next entry point re-claims
    // (atomic rename, one winner) and finishes the crashed swap
    CowTable.rebaseTempFreshnessMs = -1L
    try CowTable.publishBranch(spark, root, "exp"): Unit
    finally CowTable.rebaseTempFreshnessMs = 10 * 60 * 1000L
    assert(!F.exists(P.get(tmp)))
    val main = CowTable.read(spark, root).as[(Long, Long)].collect().toMap
    assert(main(10L) === 999L && main.size === 100)
    // no claim or marker debris rode the swap into the branch
    assert(Option(new java.io.File(br).listFiles()).toSeq.flatten
      .forall(f => !f.getName.startsWith("_rebase_")))
  }
}

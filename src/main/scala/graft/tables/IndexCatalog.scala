package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}

/** GENERATION POINTER + OCC for persisted search indexes — the tiny
  * manifest [[InvertedIndex]]/[[VectorIndex]] maintenance needs to be
  * safe under CONCURRENT append and compaction. Without it,
  * `compactTo` + caller-side pointer flip has a lost-update window: an
  * append landing between the compaction's snapshot of the batch
  * roots and the flip is silently absent from the new generation —
  * the loss mode [[CowTable]]'s link(2) manifest commit exists to
  * prevent, now applied at index granularity.
  *
  * Layout under the catalog root:
  *
  *   root/_catalog/v<N>.json   {"generation": "<dir>", "batches": […]}
  *   root/g<K>/                index generations (full index roots)
  *
  * The head version IS the serving state: which generation directory
  * to read, and which batch ids within it are COMMITTED (readers pass
  * the registered set to the index's `only` filter, so an in-flight
  * or crashed-before-commit append is never served). Commits use the
  * same `link(2)` discipline as [[CowTable.commit]]: creating
  * `v<N>.json` atomically fails if the version exists, so exactly one
  * writer wins each version and the loser re-reads and retries.
  *
  * - [[append]]: write the batch's increments into the CURRENT
  *   generation under a fresh id, then CAS-register the id. If a
  *   compaction flipped the generation in between, the physical
  *   write re-runs into the new generation (the old files are
  *   orphaned in the dead generation — harmless, GC'd with it) — "a
  *   concurrent append either lands in the new generation or
  *   re-homes itself".
  * - [[compact]]: snapshot the head, fold EXACTLY the registered
  *   batches into a fresh generation dir, then CAS-flip the pointer.
  *   If an append registered meanwhile, the commit loses and the
  *   compaction re-runs over the grown batch set — no append is ever
  *   silently dropped. Unregistered batch files present in the source
  *   generation (a concurrent append's in-flight write) are excluded
  *   by the `only` filter, so they can never be double-counted when
  *   that append later re-homes.
  */
object IndexCatalog {

  /** One committed catalog state: the serving generation dir and the
    * batch ids committed into it. `barrier` marks a [[gc]]-minted
    * head copy — not a state the user made, so retention counting
    * skips it. */
  final case class State(version: Int, generation: String,
                         batches: Seq[String], barrier: Boolean = false)

  final class ConcurrentCatalogCommit(val version: Int)
    extends RuntimeException(s"catalog version $version already committed")

  /** Test seam: runs after a writer computed its new state but before
    * the atomic commit — lets a spec interleave a competing commit. */
  private[graft] var beforeCommitHook: () => Unit = () => ()

  private def catDir(root: String) = s"$root/_catalog"

  private def versionOf(name: String): Option[Int] =
    if (name.startsWith("v") && name.endsWith(".json"))
      name.stripPrefix("v").stripSuffix(".json").toIntOption
    else None

  /** The head state — one directory listing + one tiny JSON read. */
  def current(root: String): State = {
    val vs = committedVersions(root)
    require(vs.nonEmpty, s"no index catalog at $root")
    stateAt(root, vs.max)
  }

  /** TIME TRAVEL: the state as of catalog version `v` — readable as
    * long as [[gc]]'s `retainVersions` kept it (the generation dirs
    * retained states reference are never swept). Mirrors
    * [[CowTable.readManifest]]'s versioned read at index granularity. */
  def at(root: String, v: Int): State = {
    require(committedVersions(root).contains(v),
      s"no committed catalog version $v at $root")
    stateAt(root, v)
  }

  /** Committed = non-empty: a zero-byte `v<N>.json` is the CLAIM of
    * the no-hard-link commit fallback whose writer crashed between
    * claim and publish — not a state. Readers skip it (so the head
    * stays servable past the documented window) and [[gc]] deletes it
    * once stale; only [[commit]]'s claim/replace logic ever treats
    * the file as meaningful. */
  private def committedVersions(root: String): Seq[Int] =
    Option(new java.io.File(catDir(root)).listFiles()).toSeq
      .flatten.filter(_.length() > 0)
      .flatMap(f => versionOf(f.getName)).sorted

  /** Crashed-claim TTL: a zero-byte version file older than this is a
    * dead claim — [[commit]] reclaims it, [[gc]] deletes it. A
    * younger one may be a LIVE fallback commit mid-publish and is
    * left alone. Settable seam for crash tests. */
  private[graft] var staleClaimTtlMs: Long = 60 * 1000L

  private def isStaleClaim(f: java.io.File): Boolean =
    f.exists() && f.length() == 0 &&
      f.lastModified() < System.currentTimeMillis() - staleClaimTtlMs

  private def stateAt(root: String, v: Int): State = {
    val body = new String(
      Files.readAllBytes(Paths.get(s"${catDir(root)}/v$v.json")), "UTF-8")
    val gen = """"generation"\s*:\s*"([^"]*)"""".r
      .findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalStateException(s"bad catalog v$v at $root"))
    val batches = """"batches"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    val barrier = """"barrier"\s*:\s*true""".r.findFirstIn(body).isDefined
    State(v, gen, batches, barrier)
  }

  /** Commit `state` as version `state.version` — link(2) atomic; the
    * loser of a race gets [[ConcurrentCatalogCommit]]. The
    * no-hard-link fallback (exclusive create claims, move publishes)
    * shares [[CowTable.commit]]'s documented limitation: a crash
    * between claim and publish leaves a zero-byte claimed version
    * that must be removed by hand — on link-capable filesystems
    * (the deployment assumption) the window does not exist. */
  private def commit(root: String, state: State): Unit = {
    val dir = Paths.get(catDir(root))
    Files.createDirectories(dir)
    val body = s"""{"generation": "${state.generation}", "batches": [${
      state.batches.map(b => s""""$b"""").mkString(", ")}]${
      if (state.barrier) """, "barrier": true""" else ""}}"""
    val tmp = dir.resolve(s".tmp_v${state.version}_${System.nanoTime()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    val target = dir.resolve(s"v${state.version}.json")
    var reclaimed = false
    try {
      while (true) {
        try {
          try Files.createLink(target, tmp)
          catch {
            case _: UnsupportedOperationException =>
              Files.createFile(target) // atomic claim; throws if committed
              Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
          }
          return
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            // a zero-byte target past the claim TTL is a dead claim
            // (fallback writer crashed between claim and publish) —
            // reclaim it ONCE so the version line is not wedged;
            // anything else is a genuine concurrent commit
            if (!reclaimed && isStaleClaim(target.toFile)) {
              Files.deleteIfExists(target): Unit
              reclaimed = true
            } else throw new ConcurrentCatalogCommit(state.version)
        }
      }
    } finally {
      Files.deleteIfExists(tmp): Unit
    }
  }

  /** Create the catalog: `build` writes generation 1 into its dir,
    * then v1 commits the pointer. The generation dir carries a uniq
    * suffix, so concurrent or retried creates NEVER collide on disk:
    * the v1 CAS picks exactly one winner, the loser fails loudly with
    * [[ConcurrentCatalogCommit]] and its build is an orphan a later
    * [[gc]] collects — no sweep that could gut a committed winner's
    * dir, and a create that crashed before its commit simply re-runs
    * into a fresh dir (crash-retryable by construction). */
  def create(root: String)(build: String => Unit): State = {
    require(committedVersions(root).isEmpty,
      s"index catalog at $root already exists")
    val gen = s"$root/g1_${
      java.util.UUID.randomUUID().toString.take(8)}"
    build(gen)
    val s = State(1, gen, Seq.empty)
    beforeCommitHook()
    commit(root, s)
    s
  }

  /** Register one appended batch: `write(generationDir, batchId)`
    * performs the physical increment write (e.g.
    * [[InvertedIndex.append]] with that batch id — idempotent under
    * overwrite), then the id CAS-commits onto the head. Retries
    * re-read the head; if a compaction flipped the generation since
    * the write, the increment re-writes into the new generation
    * before re-committing (same id ⇒ overwrite, never double). */
  def append(root: String)(write: (String, String) => Unit): State = {
    val id = java.util.UUID.randomUUID().toString.replace("-", "")
    var s = current(root)
    write(s.generation, id)
    while (true) {
      val cand = State(s.version + 1, s.generation, s.batches :+ id)
      beforeCommitHook()
      try { commit(root, cand); return cand }
      catch {
        case _: ConcurrentCatalogCommit =>
          val head = current(root)
          if (head.generation != s.generation) write(head.generation, id)
          s = head
      }
    }
    sys.error("unreachable")
  }

  /** [[append]] with a CALLER-SUPPLIED batch id — the exactly-once
    * shape for STREAM-driven maintenance: the indexer derives the id
    * from the micro-batch's batchId, so an at-least-once redelivery
    * finds its id already registered and no-ops entirely (no physical
    * rewrite, no second registration — state unchanged). A crash
    * between the physical write and the CAS re-runs both on
    * redelivery (the write is an idempotent same-id overwrite).
    * CONTRACT: the redelivery window must close before a compaction
    * folds the id (Structured Streaming redeliveries are immediate
    * same-batch retries, never arbitrarily late) — a fold clears the
    * id from the registered set, so a post-fold redelivery would
    * re-append rows the new generation already contains. */
  def appendAs(root: String, id: String)
              (write: (String, String) => Unit): State = {
    var s = current(root)
    if (s.batches.contains(id)) return s
    write(s.generation, id)
    while (true) {
      if (s.batches.contains(id)) return s
      val cand = State(s.version + 1, s.generation, s.batches :+ id)
      beforeCommitHook()
      try { commit(root, cand); return cand }
      catch {
        case _: ConcurrentCatalogCommit =>
          val head = current(root)
          if (head.generation != s.generation &&
              !head.batches.contains(id)) write(head.generation, id)
          s = head
      }
    }
    sys.error("unreachable")
  }

  /** Fold the head's registered batches into a fresh generation and
    * CAS-flip the pointer: `fold(srcGen, registeredBatchIds, dstGen)`
    * builds the new generation (e.g. [[InvertedIndex.compactTo]] with
    * `only = registered` — unregistered in-flight files excluded). A
    * losing CAS means an append registered meanwhile: the fold
    * re-runs over the grown batch set into a fresh dir — nothing is
    * ever dropped. Superseded generation dirs are left for GC (the
    * write-new / flip / GC-old discipline). */
  def compact(root: String)
             (fold: (String, Set[String], String) => Unit): State = {
    var s = current(root)
    while (true) {
      // uniq suffix: two racing compacts of the same snapshot must
      // not collide on the destination dir (the loser's build is
      // orphaned-but-harmless, like CowTable's losing data dirs)
      val dst = s"$root/g${s.version + 1}_${
        java.util.UUID.randomUUID().toString.take(8)}"
      fold(s.generation, s.batches.toSet, dst)
      val cand = State(s.version + 1, dst, Seq.empty)
      beforeCommitHook()
      try { commit(root, cand); return cand }
      catch { case _: ConcurrentCatalogCommit => s = current(root) }
    }
    sys.error("unreachable")
  }

  /** GC — the third step of write-new / flip / GC-old: delete every
    * generation dir no retained catalog version references (dead
    * generations a compact superseded, and losing-OCC orphan builds),
    * plus catalog versions older than the newest `retainVersions`
    * states.
    *
    * gc is a first-class OCC PARTICIPANT: before deleting anything it
    * CAS-commits a head-copying barrier version. Any compaction that
    * snapshotted the pre-gc head loses its own CAS, re-reads, and
    * re-folds into a fresh destination — so gc sweeping that
    * compaction's in-flight (uncommitted, unreferenced) build dir can
    * never become a committed pointer at a gutted directory. If gc's
    * own barrier loses (an append/compact committed first), gc
    * re-reads and retries — deletions happen only AFTER the barrier
    * wins, against the referenced set that includes it. Generation
    * dirs are recognized by the `g<version>[_<uniq>]` names
    * [[create]]/[[compact]] mint — sibling trees (the `_catalog`
    * dir, foreign files) are never candidates. Returns
    * (generationsDeleted, versionsDeleted). */
  def gc(root: String, retainVersions: Int = 1,
         advanceBarrier: Boolean = false): (Int, Int) = {
    // Claim the BARRIER: a head-copying commit that every concurrent
    // writer whose snapshot predates it must lose to. A head that
    // already IS a barrier (a previous gc with no writes since) is
    // reused — stacking a fresh barrier per gc would pile bookkeeping
    // versions onto an idle catalog — UNLESS `advanceBarrier`: a
    // reused barrier never advances barrierV, so an orphaned
    // generation targeting a version past it (a compact that
    // snapshotted the barrier then crashed) leaks forever on an idle
    // catalog. Minting one fresh barrier pushes barrierV past the
    // crashed build's target — the build's writer now provably cannot
    // win its CAS, so the orphan becomes collectable THIS gc.
    var head = current(root)
    var needFresh = advanceBarrier
    while (!head.barrier || needFresh) {
      val cand = State(head.version + 1, head.generation, head.batches,
        barrier = true)
      beforeCommitHook()
      try { commit(root, cand); head = cand; needFresh = false }
      catch {
        case _: ConcurrentCatalogCommit =>
          val h = current(root)
          // a version that landed since we read `head` postdates this
          // gc call — if it is itself a barrier it is as fresh as the
          // one we lost minting
          if (h.barrier && h.version > head.version) needFresh = false
          head = h
      }
    }
    val barrierV = head.version
    val vs = committedVersions(root)
    // retention counts USER states only (barriers are gc
    // bookkeeping): keep the newest `retainVersions` non-barrier
    // states and everything at or after the oldest kept — interleaved
    // barriers ride along, so repeated gcs never erode history
    val userVs = vs.filter(v => !stateAt(root, v).barrier)
    val keepFrom = userVs.takeRight(retainVersions).headOption
      .getOrElse(vs.min)
    val keptGens = vs.filter(_ >= keepFrom)
      .map(v => stateAt(root, v).generation).toSet + head.generation
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    // Sweep ONLY dirs whose TARGET version (the leading number in the
    // g<V>[_uniq] name) is at or below the barrier: such a build's
    // writer either committed (kept above) or must lose its CAS to a
    // version ≤ barrierV that already exists — provably dead. A dir
    // targeting V > barrierV may be a compaction that snapshotted the
    // barrier itself and can still WIN v(V) — in-flight, never
    // touched (if it crashed instead, a later gc whose barrier passed
    // V collects it). This closes the post-barrier TOCTOU window:
    // nothing gc deletes can ever become a committed pointer.
    var gens = 0
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter { f =>
        f.isDirectory && f.getName.matches("g\\d+(_[0-9a-f]+)?") &&
          f.getName.drop(1).takeWhile(_.isDigit).toInt <= barrierV &&
          !keptGens.contains(s"$root/${f.getName}")
      }
      .foreach { f => rm(f); gens += 1 }
    var dropped = 0
    vs.filter(_ < keepFrom).foreach { v =>
      if (Files.deleteIfExists(Paths.get(s"${catDir(root)}/v$v.json")))
        dropped += 1
    }
    // sweep DEAD CLAIMS: zero-byte v<N>.json past the TTL (fallback
    // commits that crashed between claim and publish). Readers
    // already skip them; removing them un-wedges the version line for
    // future writers of that number.
    Option(new java.io.File(catDir(root)).listFiles()).toSeq.flatten
      .filter(f => versionOf(f.getName).isDefined && isStaleClaim(f))
      .foreach { f =>
        if (f.delete()) dropped += 1
      }
    (gens, dropped)
  }
}

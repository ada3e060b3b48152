package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.tables.IndexCatalog

/** Generated-schedule torture for the [[IndexCatalog]] OCC protocol —
  * the follow-up to two review rounds that found 16 hand-picked
  * schedule bugs (gc TOCTOU, retention erosion, create-sweep race,
  * …): instead of hand-picking interleavings through
  * `beforeCommitHook`, run SEEDED RANDOM schedules of
  * {append, compact, gc} across three writer threads plus a
  * continuously-polling reader, and assert the protocol invariants:
  *
  *   1. no committed append is ever lost (final served content =
  *      base ∪ every appended payload — sequential equivalence for a
  *      grow-only set);
  *   2. the served head is ALWAYS readable (the reader never catches
  *      a committed state pointing at swept or missing files);
  *   3. gc never breaks 1 or 2, and the retention floor holds.
  *
  * The "index" is a deterministic fake over plain files (a batch id
  * writes one token file; a fold merges base + registered batch
  * files) — the protocol under test is the catalog's, not Spark's,
  * and the fake keeps 100 schedules inside seconds.
  *
  * Harness-bites validation (r16): hand-reverting the r15
  * post-barrier gc guard (sweeping `g<V>` dirs with V > barrierV) was
  * reproduced by these schedules — gc gutted an in-flight compact's
  * build dir that then committed, and the reader/content invariants
  * caught it (multiple seeds). The guard is IndexCatalog.scala's
  * `<= barrierV` sweep condition.
  */
class IndexCatalogStressSpec extends AnyFunSuite with Matchers {

  private def freshRoot(): String = {
    val dir = Files.createTempDirectory("graft_idxcat_stress_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  // ----- the deterministic fake index over plain files -----

  private def writeBase(gen: String, tokens: Set[String]): Unit = {
    Files.createDirectories(Paths.get(gen))
    Files.write(Paths.get(s"$gen/base.txt"),
      tokens.toSeq.sorted.mkString("\n").getBytes("UTF-8")): Unit
  }

  private def writeBatch(gen: String, id: String, token: String): Unit = {
    Files.createDirectories(Paths.get(gen))
    Files.write(Paths.get(s"$gen/batch_$id.txt"),
      token.getBytes("UTF-8")): Unit
  }

  private def readTokens(p: String): Set[String] =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSet

  /** Served content of a committed state — throws if the state
    * references swept/missing files (what invariant 2 polls for). */
  private def content(st: IndexCatalog.State): Set[String] =
    readTokens(s"${st.generation}/base.txt") ++
      st.batches.flatMap(id => readTokens(s"${st.generation}/batch_$id.txt"))

  private def fold(src: String, only: Set[String], dst: String): Unit =
    writeBase(dst, readTokens(s"$src/base.txt") ++
      only.flatMap(id => readTokens(s"$src/batch_$id.txt")))

  test("100 seeded random schedules of append/compact/gc across 3 writers: no append lost, head always readable") {
    for (seed <- 0 until 100) {
      val root = freshRoot()
      val rnd = new scala.util.Random(seed)
      IndexCatalog.create(root)(gen => writeBase(gen, Set("base")))
      // per-writer op scripts derived from the seed: 2-4 ops each,
      // weighted toward appends so content actually grows
      val plans: Seq[Seq[Int]] = (0 until 3).map(_ =>
        (0 until (2 + rnd.nextInt(3))).map(_ => rnd.nextInt(5)))
      // shake the thread schedules: a tiny jitter right before every
      // CAS commit (the window every historical bug lived in)
      IndexCatalog.beforeCommitHook = () =>
        if (java.util.concurrent.ThreadLocalRandom.current()
              .nextInt(3) == 0) Thread.sleep(0, 100000)
      val violations = new ConcurrentLinkedQueue[String]
      val appended = new ConcurrentLinkedQueue[String]
      @volatile var stop = false
      val reader = new Thread(() => {
        while (!stop) {
          try {
            val st = IndexCatalog.current(root)
            try { content(st): Unit }
            catch {
              case _: java.nio.file.NoSuchFileException |
                   _: java.io.FileNotFoundException =>
                // only a violation if that state is STILL the head —
                // a superseded state may age out of retention
                if (IndexCatalog.current(root).version == st.version)
                  violations.add(
                    s"seed=$seed: head v${st.version} unreadable")
            }
          } catch {
            case e: Throwable =>
              violations.add(s"seed=$seed reader: $e")
          }
        }
      })
      val writers = plans.zipWithIndex.map { case (plan, w) =>
        new Thread(() => {
          try plan.zipWithIndex.foreach { case (op, i) =>
            op match {
              case 0 | 1 | 2 => // append (weight 3/5)
                val tok = s"s${seed}_w${w}_$i"
                IndexCatalog.append(root)((gen, id) =>
                  writeBatch(gen, id, tok)): Unit
                appended.add(tok): Unit
              case 3 =>
                IndexCatalog.compact(root)(fold): Unit
              case 4 =>
                IndexCatalog.gc(root, retainVersions = 4): Unit
            }
          } catch {
            case e: Throwable =>
              violations.add(s"seed=$seed writer$w: $e")
          }
        })
      }
      val threads = reader +: writers
      threads.foreach(_.start())
      writers.foreach(_.join(60000))
      stop = true
      reader.join(60000)
      IndexCatalog.beforeCommitHook = () => ()
      assert(violations.isEmpty,
        s"seed=$seed violations: ${violations.asScala.mkString("; ")}")
      // invariant 1: sequential equivalence for the grow-only set
      content(IndexCatalog.current(root)) shouldBe
        (Set("base") ++ appended.asScala)
      // gc after quiescence must not move the served content, and
      // the retention floor must hold (barriers don't count)
      IndexCatalog.gc(root, retainVersions = 2): Unit
      content(IndexCatalog.current(root)) shouldBe
        (Set("base") ++ appended.asScala)
    }
  }

  test("appendAs: caller-supplied ids are exactly-once — redelivery no-ops, crashed write re-runs") {
    val root = freshRoot()
    IndexCatalog.create(root)(gen => writeBase(gen, Set("base")))
    var writes = 0
    def w(gen: String, id: String): Unit = {
      writes += 1; writeBatch(gen, id, s"tok_$id")
    }
    val s1 = IndexCatalog.appendAs(root, "b0")(w)
    s1.batches shouldBe Seq("b0")
    writes shouldBe 1
    // at-least-once redelivery: id committed → NO write, NO version
    IndexCatalog.appendAs(root, "b0")(w) shouldBe s1
    writes shouldBe 1
    IndexCatalog.current(root).version shouldBe s1.version
    // crash between the physical write and the CAS: the redelivery
    // re-runs the (idempotent) write and completes the registration
    IndexCatalog.beforeCommitHook = () => {
      IndexCatalog.beforeCommitHook = () => ()
      throw new RuntimeException("boom")
    }
    intercept[RuntimeException] { IndexCatalog.appendAs(root, "b1")(w) }
    writes shouldBe 2
    IndexCatalog.current(root).batches shouldBe Seq("b0")
    val s3 = IndexCatalog.appendAs(root, "b1")(w)
    writes shouldBe 3
    s3.batches shouldBe Seq("b0", "b1")
    content(s3) shouldBe Set("base", "tok_b0", "tok_b1")
  }

  // ----- sequential gc/retention property (ScalaCheck, ≥500 seqs) -----

  /** Op alphabet for the generated sequential histories. */
  private sealed trait Op
  private case object Append extends Op
  private case object Compact extends Op
  private case class Gc(retain: Int, advance: Boolean) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.const(Append),
    2 -> Gen.const(Compact),
    3 -> (for {
      r <- Gen.choose(1, 3)
      a <- Gen.oneOf(true, false)
    } yield Gc(r, a)))

  private val seqGen: Gen[List[Op]] = Gen.listOfN(12, opGen)

  test("gc/retention property over 500 generated histories: every listed state readable, floor never erodes, barriers never counted") {
    for (i <- 0 until 500) {
      val ops = seqGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val root = freshRoot()
      IndexCatalog.create(root)(gen => writeBase(gen, Set("base")))
      var nAppends = 0
      var avail = 1 // surviving user states (the create's v1)
      ops.foreach {
        case Append =>
          nAppends += 1
          avail += 1
          val tok = s"t$nAppends"
          IndexCatalog.append(root)((gen, id) =>
            writeBatch(gen, id, tok)): Unit
        case Compact =>
          avail += 1
          IndexCatalog.compact(root)(fold): Unit
        case Gc(r, a) =>
          IndexCatalog.gc(root, retainVersions = r, advanceBarrier = a): Unit
          // retention floor: min(r, user states still available) —
          // retention is not monotone (an earlier gc(1) legitimately
          // dropped history), but THIS gc must keep the newest r of
          // what exists, and repeated gcs (and their barrier
          // bookkeeping) must never erode below that
          val userStates = listedVersions(root)
            .map(IndexCatalog.at(root, _)).filterNot(_.barrier)
          userStates.size should be >= math.min(r, avail)
          avail = userStates.size
      }
      // every still-listed version is READABLE: its generation and
      // registered batch files all exist (time travel contract), and
      // barrier states mirror their parent's content (head copies)
      val expect = Set("base") ++ (1 to nAppends).map(n => s"t$n")
      listedVersions(root).foreach { v =>
        val st = IndexCatalog.at(root, v)
        noException should be thrownBy content(st)
      }
      content(IndexCatalog.current(root)) shouldBe expect
    }
  }

  private def listedVersions(root: String): Seq[Int] =
    Option(new java.io.File(s"$root/_catalog").listFiles()).toSeq.flatten
      .filter(_.length() > 0)
      .flatMap(f => "^v(\\d+)\\.json$".r.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
      .sorted
}

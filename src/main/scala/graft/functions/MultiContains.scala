package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** `multi_contains_any(text, phrases)` — does `text` contain ANY of
  * the phrases? One Aho–Corasick automaton scan per row: O(len(text))
  * regardless of phrase count, versus the O(len · |phrases|) of a
  * per-phrase `contains` disjunction (how the broadcast nested-loop
  * decontamination join prices out). The automaton builds ONCE on the
  * driver from the phrase list (policy/blocklist-sized by nature —
  * same boundedness argument as broadcasting it) and ships to
  * executors as a codegen reference object, so the scan stays inside
  * whole-stage codegen.
  *
  * Byte-level automaton over UTF-8: exact `contains` semantics for
  * any Unicode phrase (a UTF-8 byte sequence matches iff the string
  * matches — no code-point decoding needed). Empty phrases match
  * everything, matching `contains(text, '')`.
  */
case class MultiContainsAny(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "multi_contains_any"

  @transient private lazy val automaton =
    new AhoCorasick(phrases.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(t: Any): Any =
    automaton.matchesAny(t.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.matchesAny(($c).getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContainsAny =
    copy(child = newChild)
}

/** Classic Aho–Corasick over bytes, finalized to flat arrays: per
  * state a sorted byte-key array + parallel target array (state
  * fan-out is tiny, linear probe beats a boxed map), a failure link,
  * and a terminal bit (propagated through failure links at build
  * time, so matching tests one bit per step).
  */
final class AhoCorasick(patterns: Array[Array[Byte]]) extends Serializable {

  private val (keys, targets, fail, out) = {
    import scala.collection.mutable
    val gotoM = mutable.ArrayBuffer(mutable.LinkedHashMap.empty[Byte, Int])
    val outB = mutable.ArrayBuffer(false)
    patterns.foreach { p =>
      if (p.isEmpty) outB(0) = true
      else {
        var s = 0
        p.foreach { b =>
          s = gotoM(s).getOrElseUpdate(b, {
            gotoM += mutable.LinkedHashMap.empty[Byte, Int]
            outB += false
            gotoM.size - 1
          })
        }
        outB(s) = true
      }
    }
    val n = gotoM.size
    val failA = new Array[Int](n)
    val q = mutable.Queue.empty[Int]
    gotoM(0).valuesIterator.foreach { s => failA(s) = 0; q.enqueue(s) }
    while (q.nonEmpty) {
      val r = q.dequeue()
      gotoM(r).foreach { case (b, u) =>
        q.enqueue(u)
        // v walks proper-suffix states of r; v < r in BFS depth, so
        // goto(v)(b) can never be u itself
        var v = failA(r)
        while (v != 0 && !gotoM(v).contains(b)) v = failA(v)
        failA(u) = gotoM(v).getOrElse(b, 0)
        if (outB(failA(u))) outB(u) = true
      }
    }
    val ks = new Array[Array[Byte]](n)
    val ts = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val entries = gotoM(i).toArray.sortBy(_._1)
      ks(i) = entries.map(_._1)
      ts(i) = entries.map(_._2)
      i += 1
    }
    (ks, ts, failA, outB.toArray)
  }

  private def step(state: Int, b: Byte): Int = {
    var s = state
    while (true) {
      val k = keys(s)
      var i = 0
      while (i < k.length) {
        if (k(i) == b) return targets(s)(i)
        i += 1
      }
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  def matchesAny(bytes: Array[Byte]): Boolean = {
    if (out(0)) return true // an empty pattern matches everything
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = step(s, bytes(i))
      if (out(s)) return true
      i += 1
    }
    false
  }
}

object MultiContains {
  def multi_contains_any(text: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(MultiContainsAny(
      ColumnBridge.expression(text), phrases))
}

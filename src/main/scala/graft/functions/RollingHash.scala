package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling-hash document fingerprint.
  *
  * Slides a `window`-byte polynomial hash (base 257, natural 2^64
  * wrap) over the UTF-8 bytes and returns the MINIMUM window hash —
  * a winnowing-style content fingerprint that is stable under
  * appends/prepends outside the minimizing window, unlike a whole-doc
  * digest. Strings shorter than the window hash their full length.
  *
  * Native Catalyst `Expression` with `doGenCode`: the O(bytes) loop
  * runs inside whole-stage codegen — no UDF boxing, no iterator
  * breaks — so fingerprinting rides the same generated loop as the
  * parquet scan at 100 TB.
  */
case class RollingHash(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.minWindowHash(input.asInstanceOf[UTF8String].getBytes, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.minWindowHash($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 257L

  /** Min rolling hash over all `window`-byte windows (whole array if
    * shorter). Referenced from both interpreted eval and generated
    * code — keep it static, branch-free in the hot loop.
    */
  def minWindowHash(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) for the roll-off term
    var pow = 1L
    var i = 1
    while (i < w) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-level entry point (via [[ColumnBridge]]). */
  def rolling_hash(c: Column, window: Int): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), window))
}

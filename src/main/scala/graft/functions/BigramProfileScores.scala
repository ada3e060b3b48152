package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language bigram-profile overlap scores in one pass over the
  * text bytes: score(p) = |distinct text bigrams ∩ profile_p| /
  * |profile_p|, returned as `array<double>` in profile order.
  *
  * Native replacement for the HOF formulation (build the distinct
  * char-bigram array, then N `array_intersect`s against literal
  * arrays) — that materializes ~|text| two-char strings per row and
  * evaluates interpreted. Here each profile is a sorted int array
  * (two lowercased bytes packed) probed with binary search; a
  * seen-bitmask per profile counts distinct matches.
  */
case class BigramProfileScores(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  require(profiles.nonEmpty && profiles.forall(p => p.nonEmpty && p.size <= 64),
    "each profile needs 1..64 bigrams (seen-set is a Long bitmask)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bigram_profile_scores"

  @transient private lazy val packed: Array[Array[Int]] =
    profiles.map(_.map { bg =>
      require(bg.length == 2, s"bigram expected, got '$bg'")
      BigramProfileScores.pack(bg.charAt(0).toLower.toByte, bg.charAt(1).toLower.toByte)
    }.distinct.sorted.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    BigramProfileScores.scores(input.asInstanceOf[UTF8String], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("profiles", packed, "int[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramProfileScores.scores($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramProfileScores =
    copy(child = newChild)
}

object BigramProfileScores {

  private[functions] def pack(a: Byte, b: Byte): Int = ((a & 0xff) << 8) | (b & 0xff)

  private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** One pass over the bytes; per profile a binary-search probe and a
    * bitmask of which profile entries were seen.
    */
  def scores(text: UTF8String, profiles: Array[Array[Int]]): ArrayData = {
    val bytes = text.getBytes
    val np = profiles.length
    val seen = new Array[Long](np)
    var i = 0
    while (i + 1 < bytes.length) {
      val bg = pack(lower(bytes(i)), lower(bytes(i + 1)))
      var p = 0
      while (p < np) {
        val idx = java.util.Arrays.binarySearch(profiles(p), bg)
        if (idx >= 0) seen(p) |= 1L << idx
        p += 1
      }
      i += 1
    }
    val out = new Array[Double](np)
    var p = 0
    while (p < np) {
      out(p) = java.lang.Long.bitCount(seen(p)).toDouble / profiles(p).length
      p += 1
    }
    new GenericArrayData(out)
  }

  def bigram_profile_scores(c: Column, profiles: Seq[Seq[String]]): Column =
    ColumnBridge.column(BigramProfileScores(ColumnBridge.expression(c), profiles))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All the per-document counts quality scoring needs, in ONE pass
  * over the characters: whitespace token count, stopword hits,
  * non-whitespace char count, punctuation count, total char count.
  *
  * Semantics bit-match the SQL formulation the oracle runs —
  * tokens are maximal `\s+`-free runs (Java `\s` = space, tab, LF,
  * VT, FF, CR), punctuation is any char outside `[A-Za-z0-9 ]`,
  * stopword matches are exact (no case folding), all counts over
  * code points. The Column formulation evaluated `split` once per
  * consuming expression (~8 regex passes per row after
  * CollapseProject inlined the producer — the r1 pitfall in its
  * plain-projection form).
  */
case class QualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = QualityStats.schema
  override def prettyName: String = "quality_stats"

  @transient private lazy val stopArr: Array[String] = stopwords.toArray

  override def nullSafeEval(input: Any): Any =
    QualityStats.compute(input.asInstanceOf[UTF8String], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stopwords", stopArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityStats.compute($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityStats =
    copy(child = newChild)
}

object QualityStats {

  val schema: StructType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("stops", LongType, nullable = false),
    StructField("nows", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  def compute(text: UTF8String, stopwords: Array[String]): InternalRow = {
    val s = text.toString
    val len = s.length
    var nChars = 0L
    var nows = 0L
    var punct = 0L
    var nToks = 0L
    var stops = 0L
    var tokStart = -1
    var i = 0

    def closeToken(endExclusive: Int): Unit =
      if (tokStart >= 0) {
        nToks += 1
        var k = 0
        var hit = false
        while (k < stopwords.length && !hit) {
          val w = stopwords(k)
          if (w.length == endExclusive - tokStart &&
            s.regionMatches(tokStart, w, 0, w.length)) hit = true
          k += 1
        }
        if (hit) stops += 1
        tokStart = -1
      }

    while (i < len) {
      val cp = s.codePointAt(i)
      nChars += 1
      // punct mirrors regexp [^A-Za-z0-9 ]: tab/LF count as punct
      // (only the plain space is in the allowed class), exactly as
      // the oracle's regexp_replace does
      val alnumOrSpace = cp < 128 &&
        ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= '0' && cp <= '9') || cp == ' ')
      if (!alnumOrSpace) punct += 1
      if (isWs(cp)) {
        closeToken(i)
      } else {
        nows += 1
        if (tokStart < 0) tokStart = i
      }
      i += Character.charCount(cp)
    }
    closeToken(len)
    new GenericInternalRow(Array[Any](nToks, stops, nows, punct, nChars))
  }

  def quality_stats(c: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(QualityStats(ColumnBridge.expression(c), stopwords))
}

package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition counts for Gopher-style corpus quality
  * filters (Rae et al. 2021 §A1.1, the standard public heuristics),
  * in ONE pass over the characters:
  *
  *   - line histogram → duplicate-line count and duplicate-line
  *     character mass (lines split on '\n', empty lines excluded,
  *     lengths in code points — DuckDB `len()` semantics);
  *   - word-bigram histogram → the most frequent bigram, its count
  *     and code-point length. Ties break on the bigram's UTF-8
  *     binary order (DuckDB VARCHAR ORDER BY semantics), so the
  *     winner is engine-independent.
  *
  * Emits integer counts only — the ratios are assembled by the
  * caller as guarded double divisions, keeping the cross-engine
  * contract in the integer domain until a single final division.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = true),
    StructField("top_gram_count", LongType, nullable = false),
    StructField("top_gram_len", LongType, nullable = false)))

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString

    // ---- line histogram (split on '\n', empty lines excluded) ----
    val lineCounts = mutable.HashMap.empty[String, Int]
    var from = 0
    while (from <= s.length) {
      val nl = s.indexOf('\n', from)
      val end = if (nl < 0) s.length else nl
      if (end > from) {
        val line = s.substring(from, end)
        lineCounts.updateWith(line) { c => Some(c.getOrElse(0) + 1) }
      }
      from = end + 1
    }
    var nLines = 0L
    var lineChars = 0L
    var dupLineChars = 0L
    lineCounts.foreach { case (line, c) =>
      val cl = line.codePointCount(0, line.length).toLong
      nLines += c
      lineChars += c * cl
      dupLineChars += (c - 1) * cl
    }
    val nDupLines = nLines - lineCounts.size

    // ---- word-bigram histogram (whitespace tokens, single-space
    // joined — identical to the oracle's array_to_string(w[i:i+1])) --
    val bigramCounts = mutable.HashMap.empty[String, Int]
    var prev: String = null
    var tokStart = -1
    var i = 0
    def closeToken(endExclusive: Int): Unit =
      if (tokStart >= 0) {
        val tok = s.substring(tokStart, endExclusive)
        if (prev != null)
          bigramCounts.updateWith(prev + " " + tok) { c => Some(c.getOrElse(0) + 1) }
        prev = tok
        tokStart = -1
      }
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isWs(cp)) closeToken(i)
      else if (tokStart < 0) tokStart = i
      i += Character.charCount(cp)
    }
    closeToken(s.length)

    var topGram: String = null
    var topCount = 0
    bigramCounts.foreach { case (g, c) =>
      if (c > topCount || (c == topCount && topGram != null &&
          UTF8String.fromString(g).compareTo(UTF8String.fromString(topGram)) < 0)) {
        topGram = g; topCount = c
      }
    }
    val topLen =
      if (topGram == null) 0L
      else topGram.codePointCount(0, topGram.length).toLong
    new GenericInternalRow(Array[Any](
      nLines, nDupLines, lineChars, dupLineChars,
      if (topGram == null) null else UTF8String.fromString(topGram),
      topCount.toLong, topLen))
  }

  def repetition_stats(c: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Consecutive word n-grams of a text as strings (tokens joined by a
  * single space), WITH multiplicity — the frequency-counting
  * complement of [[WordShingleHashes]] (which returns the sorted
  * distinct hash set). One pass over the UTF-8 bytes; a text with
  * fewer than n tokens yields an empty array.
  *
  * Native replacement for the
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))`
  * HOF chain, which evaluates interpreted and — when Catalyst inlines
  * the token producer into the lambda — re-tokenizes the text once per
  * gram (the r1 lambda-inlining pitfall; see PLANS.md).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  // the FULL Java \s set [ \t\n\x0B\f\r] — the token boundary must
  // agree with TextFunctions.tokens (split on \s+), or unigram and
  // bigram feature streams of the same text diverge on form-feed /
  // vertical-tab input (latent on ASCII fixtures, real on crawl text)
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
      b == 0x0b || b == 0x0c

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token boundary scan
    var starts = new Array[Int](math.max(8, len / 8))
    var ends = new Array[Int](starts.length)
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      val s = i
      while (i < len && !isSpace(bytes(i))) i += 1
      if (i > s) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s; ends(nTok) = i; nTok += 1
      }
    }
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    var g = 0
    while (g < out.length) {
      var size = n - 1 // single-space joiners
      var j = 0
      while (j < n) { size += ends(g + j) - starts(g + j); j += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val w = ends(g + j) - starts(g + j)
        System.arraycopy(bytes, starts(g + j), buf, pos, w)
        pos += w
        j += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }

  def word_ngrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))
}

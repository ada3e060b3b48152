package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct 64-bit hashes of the k-word shingles of a text, in
  * ONE pass over the UTF-8 bytes: whitespace tokenization, per-token
  * xxhash64, rolling k-window hash chain, then sort+dedupe.
  *
  * This is the native replacement for the string pipeline
  * `tokens → wordShingles → shingleHashes → array_sort` (three
  * projections of interpreted higher-order functions that materialize
  * every token and shingle string). Near-dedup only ever consumes the
  * shingle *set* — minhash seeding, band keys, Jaccard — so the
  * string forms are pure overhead. Output is sorted, so
  * [[SortedIntersectCount]] consumes it directly and set semantics
  * (`array_distinct`) are built in.
  *
  * Texts with fewer than k tokens produce one whole-text shingle
  * (same contract as `TextFunctions.wordShingles`); empty/blank text
  * produces an empty array.
  */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {

  private final val Seed = 42L

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  /** One pass: token hashes → rolling k-window chained hashes →
    * sorted distinct array.
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // first pass: hash each whitespace-delimited token
    var tokenHashes = new Array[Long](math.max(8, n / 4))
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (nTok == tokenHashes.length) {
          val bigger = new Array[Long](tokenHashes.length * 2)
          System.arraycopy(tokenHashes, 0, bigger, 0, nTok)
          tokenHashes = bigger
        }
        tokenHashes(nTok) = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array.emptyLongArray)
    // shingle chain: for each window of k tokens (or one whole-text
    // shingle when nTok < k), fold the token hashes through hashLong
    val nShingles = math.max(nTok - (k - 1), 1)
    val width = math.min(k, nTok)
    val out = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      var h = Seed
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokenHashes(s + j), h); j += 1 }
      out(s) = h
      s += 1
    }
    // sort + dedupe in place
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < nShingles) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == nShingles) out else java.util.Arrays.copyOf(out, w))
  }

  def word_shingle_hashes(c: Column, k: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(c), k))
}

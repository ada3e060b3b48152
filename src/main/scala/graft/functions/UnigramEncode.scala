package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_pieces(word, scores, maxPieceLen)` — Viterbi best-path
  * segmentation of ONE word under a unigram piece model (Kudo 2018
  * "Subword Regularization" §3.1 inference): maximize the path's
  * total piece score, tie-break to FEWEST pieces, then LARGEST piece
  * at each boundary — all three rules folded into one exact integer
  * objective so the DuckDB oracle replays the DP bit-for-bit:
  *
  *   key(path) = 256 · Σ score_q(piece) − n_pieces
  *
  * where score_q is the caller's `round(ln · 1e12)`-quantized log
  * probability (the established transcendental discipline: ln takes
  * an exact integer argument upstream, everything after is integer
  * arithmetic). n_pieces < 256 for any real token, so the packing is
  * a lexicographic (score, −n_pieces) compare; a longer token would
  * bleed count into score bits IDENTICALLY on both engines — the
  * pin cannot drift even then. A single code point absent from the
  * model scores [[UnigramPieces.UnkScore]] (so the walk is total);
  * multi-char pieces must be in the model to be used.
  *
  * The scores ship as a codegen reference object (the
  * [[WordpiecePieces]] / [[MultiContainsAny]] discipline — the model
  * is vocabulary-sized), the DP is O(len · maxPieceLen) per word, and
  * the caller runs it once per DISTINCT word (never per occurrence).
  * Matching is CODE-POINT based, mirroring SQL substr.
  */
case class UnigramPieces(child: Expression, scores: Map[String, Long],
                         maxPieceLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 2)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_pieces"

  @transient private lazy val table = UnigramPieces.buildTable(scores)

  override def nullSafeEval(input: Any): Any =
    UnigramPieces.encode(input.asInstanceOf[UTF8String], table, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramScores", table,
      classOf[java.util.HashMap[String, java.lang.Long]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramPieces.encode($c, $ref, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramPieces =
    copy(child = newChild)
}

object UnigramPieces {

  /** Fixed penalty for a single code point absent from the model —
    * mirrored verbatim by the oracle's coalesce fallback.
    */
  val UnkScore: Long = -40000000000000L

  private val Sentinel: Long = Long.MinValue / 2

  def buildTable(scores: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](
      math.max(16, scores.size * 2))
    scores.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Viterbi over code points: forward pass stores, per boundary, the
    * best key and its argmax piece length (ties → LARGEST length —
    * ascending-L scan with strict/equal split); backtrace reads the
    * stored lengths. Concatenating the pieces reproduces the word.
    */
  def encode(word: UTF8String,
             scores: java.util.HashMap[String, java.lang.Long],
             maxLen: Int): ArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = s.codePointCount(0, s.length)
    // char (UTF-16) offset of each code-point boundary 0..n
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = s.offsetByCodePoints(off(i), 1); i += 1 }
    val best = new Array[Long](n + 1)
    val bestL = new Array[Int](n + 1)
    var b = 1
    while (b <= n) {
      var bk = Sentinel
      var bl = 0
      var l = 1
      val lMax = math.min(maxLen, b)
      while (l <= lMax) {
        val piece = s.substring(off(b - l), off(b))
        val sc: java.lang.Long =
          if (l == 1 && !scores.containsKey(piece)) UnkScore
          else scores.get(piece)
        if (sc != null) {
          val cand = best(b - l) + 256L * sc.longValue - 1L
          if (cand >= bk) { bk = cand; bl = l } // >= : larger L wins ties
        }
        l += 1
      }
      best(b) = bk; bestL(b) = bl
      b += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(n, 16))
    var p = n
    while (p > 0) {
      val l = bestL(p)
      out += UTF8String.fromString(s.substring(off(p - l), off(p)))
      p -= l
    }
    new GenericArrayData(out.reverse.toArray)
  }

  def unigram_pieces(c: Column, scores: Map[String, Long], maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramPieces(ColumnBridge.expression(c), scores, maxPieceLen))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_pieces(word, vocab, maxPieceLen)` — greedy
  * longest-match-first subword segmentation of ONE word (WordPiece
  * inference: Devlin et al. 2019 BERT §4; Song et al. 2021 "Fast
  * WordPiece Tokenization" formalize the same MaxMatch loop): at each
  * position take the LONGEST vocab piece (≤ `maxPieceLen` code
  * points) starting there; if none of length ≥ 2 matches, emit the
  * single code point and advance — total for any input by
  * construction (single-char fallback never stalls), so there is no
  * unk sentinel to desynchronize engines over.
  *
  * The vocab ships as a codegen reference object (the
  * [[MultiContainsAny]] discipline — vocabulary-sized by nature, same
  * boundedness argument as broadcasting it), so the scan stays inside
  * whole-stage codegen. Matching is CODE-POINT based, mirroring SQL
  * `substr` semantics (DuckDB counts code points, not UTF-16 units) —
  * the oracle replays the greedy walk with `substr` + vocab `IN`
  * probes in a recursive CTE, bit-for-bit.
  */
case class WordpiecePieces(child: Expression, vocab: Seq[String],
                           maxPieceLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 2)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_pieces"

  @transient private lazy val table = WordpiecePieces.buildTable(vocab)

  override def nullSafeEval(input: Any): Any =
    WordpiecePieces.encode(input.asInstanceOf[UTF8String], table, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceVocab", table,
      classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordpiecePieces.encode($c, $ref, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpiecePieces =
    copy(child = newChild)
}

object WordpiecePieces {

  def buildTable(vocab: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, vocab.size * 2))
    vocab.foreach(s.add)
    s
  }

  /** Greedy longest-match over code points. Returns the piece array;
    * concatenating the pieces always reproduces the word exactly.
    */
  def encode(word: UTF8String, vocab: java.util.HashSet[String],
             maxLen: Int): ArrayData = {
    val s = word.toString
    val nChars = s.length
    if (nChars == 0) return new GenericArrayData(Array.empty[Any])
    val n = s.codePointCount(0, nChars)
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(n, 16))
    var cp = 0 // code-point index
    var ci = 0 // char (UTF-16) index
    while (cp < n) {
      var l = math.min(maxLen, n - cp)
      var matched = 0
      var matchedCi = 0
      while (matched == 0 && l >= 2) {
        val endCi = s.offsetByCodePoints(ci, l)
        if (vocab.contains(s.substring(ci, endCi))) {
          matched = l; matchedCi = endCi
        } else l -= 1
      }
      if (matched == 0) { matched = 1; matchedCi = s.offsetByCodePoints(ci, 1) }
      out += UTF8String.fromString(s.substring(ci, matchedCi))
      cp += matched
      ci = matchedCi
    }
    new GenericArrayData(out.toArray)
  }

  def wordpiece_pieces(c: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    ColumnBridge.column(WordpiecePieces(ColumnBridge.expression(c), vocab, maxPieceLen))
}

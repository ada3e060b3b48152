package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash of a feature-hash set: bit i of the result is the
  * sign of Σ over features of (±1 according to bit i of the feature
  * hash).
  *
  * SimHash is per-document — a pure function of the row's shingle
  * hash set — so it belongs in a row-local expression. The relational
  * formulation this replaces (explode the shingles, 64 partial-sum
  * aggregates, groupBy(doc_id)) paid a full shuffle of every
  * (doc, shingle) pair for something that never needed to leave its
  * row; here the whole signature computes inside whole-stage codegen
  * with zero data movement.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Same arithmetic as the relational form: bitSum_i = Σ ((h>>i)&1)
    * * 2 - 1; bit i of the output set iff bitSum_i > 0.
    */
  def compute(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val sums = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < 64) {
        sums(i) += (((h >>> i) & 1L).toInt * 2) - 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}

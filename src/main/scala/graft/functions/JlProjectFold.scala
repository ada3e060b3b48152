package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native Johnson–Lindenstrauss ±1 projection: `array<float>` embedding
  * × `array<double>` flattened sign matrix (signs[j·dimIn + i]) →
  * `array<float>` of `dimOut` projected components.
  *
  * Codegen'd replacement for the equivalent HOF composition in
  * [[graft.operators.Similarity.jlProject]]
  * (`transform(sequence(...), j -> aggregate(sequence(1, dimIn), 0.0d,
  * (acc,i) -> acc + emb[i]·signs[j·dimIn+i]) / scale)`): higher-order
  * functions evaluate interpreted with per-element boxing, which puts
  * dimOut·dimIn boxed multiply-adds on every row — ~0.8 s of the
  * jl_project bench row. The same arithmetic here is one flat
  * primitive loop inside whole-stage codegen.
  *
  * Bit-exactness: identical IEEE operation sequence as the HOF form —
  * double accumulation ascending in i (float widened exactly), one
  * division by the baked `scale` at the end, one double→float
  * narrowing cast — so every output float is unchanged and the DuckDB
  * oracle's left-to-right fold still reproduces it.
  */
case class JlProjectFold(left: Expression, right: Expression,
                         dimIn: Int, dimOut: Int, scale: Double)
    extends BinaryExpression {

  require(dimIn > 0 && dimOut > 0)

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "jl_project_fold"

  override def nullSafeEval(emb: Any, signs: Any): Any =
    JlProjectFold.project(emb.asInstanceOf[ArrayData],
      signs.asInstanceOf[ArrayData], dimIn, dimOut, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, s) =>
      s"graft.functions.JlProjectFold.project($e, $s, $dimIn, $dimOut, ${scale}D)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JlProjectFold =
    copy(left = newLeft, right = newRight)
}

object JlProjectFold {

  /** proj[j] = (Σ_{i<dimIn} emb[i]·signs[j·dimIn+i]) / scale, double
    * accumulation, float output. Called from both interpreted and
    * generated code.
    *
    * Inputs must be dense non-null arrays of exactly dimIn /
    * dimIn·dimOut elements — a short array would read out of bounds
    * and a null element reads as garbage through `getFloat`, so both
    * are rejected loudly rather than silently projected.
    */
  def project(emb: ArrayData, signs: ArrayData,
              dimIn: Int, dimOut: Int, scale: Double): ArrayData = {
    if (emb.numElements != dimIn)
      throw new IllegalArgumentException(
        s"jl_project_fold: embedding has ${emb.numElements} elements, expected $dimIn")
    if (signs.numElements != dimIn * dimOut)
      throw new IllegalArgumentException(
        s"jl_project_fold: sign matrix has ${signs.numElements} elements, expected ${dimIn * dimOut}")
    val out = new Array[Float](dimOut)
    var j = 0
    while (j < dimOut) {
      val base = j * dimIn
      var acc = 0.0d
      var i = 0
      while (i < dimIn) {
        acc += emb.getFloat(i).toDouble * signs.getDouble(base + i)
        i += 1
      }
      out(j) = (acc / scale).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  def jl_project_fold(emb: Column, signs: Column,
                      dimIn: Int, dimOut: Int, scale: Double): Column =
    ColumnBridge.column(JlProjectFold(ColumnBridge.expression(emb),
      ColumnBridge.expression(signs), dimIn, dimOut, scale))
}

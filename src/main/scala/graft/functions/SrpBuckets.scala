package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signed-random-projection bucket ids for `tables` independent
  * hyperplane sets in ONE codegen'd pass over the embedding: bit p of
  * bucket t is the sign of `emb · plane(t,p)`.
  *
  * Numerically identical to the HOF formulation (per-plane
  * `aggregate(zip_with(emb, plane, *), 0.0, +)` with left-to-right
  * double accumulation, bit set when the dot is ≥ 0, planes drawn from
  * `new Random(seed + table)` in row-major order) — but the HOF chain
  * evaluates interpreted, re-walking the array per plane per table;
  * this expression walks the flattened plane matrix once per row
  * inside whole-stage codegen.
  */
case class SrpBuckets(child: Expression, planes: Int, tables: Int,
                      dim: Int, seed: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  @transient private lazy val matrix: Array[Double] =
    SrpBuckets.planesFor(planes, tables, dim, seed)

  override def nullSafeEval(emb: Any): Any =
    SrpBuckets.buckets(emb.asInstanceOf[ArrayData], matrix, planes, tables, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("srpMatrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpBuckets.buckets($c, $matRef, $planes, $tables, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {

  /** Deterministic plane matrix, flattened (table, plane, dim)
    * row-major; table t draws from `Random(seed + t)` exactly like the
    * original per-table `hyperplanes` helper, so bucket ids are stable
    * across engine versions.
    */
  def planesFor(planes: Int, tables: Int, dim: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](tables * planes * dim)
    var idx = 0
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(seed + t)
      var p = 0
      while (p < planes) {
        var i = 0
        while (i < dim) { out(idx) = rnd.nextDouble() * 2 - 1; idx += 1; i += 1 }
        p += 1
      }
      t += 1
    }
    out
  }

  def buckets(emb: ArrayData, matrix: Array[Double], planes: Int,
              tables: Int, dim: Int): ArrayData = {
    val n = math.min(dim, emb.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var d = 0.0
        var i = 0
        while (i < n) { d += emb.getFloat(i).toDouble * matrix(base + i); i += 1 }
        if (d >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def srp_buckets(emb: Column, planes: Int, tables: Int, dim: Int, seed: Long): Column =
    ColumnBridge.column(SrpBuckets(ColumnBridge.expression(emb), planes, tables, dim, seed))
}

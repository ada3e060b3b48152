package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-centroid id by cosine over a broadcast centroid array:
  * `nearest_centroid(embedding, cents)` where `cents` is
  * `array<struct<centroid_id: bigint, centroid: array<float>>>`.
  *
  * This is the row-local argmin that keeps IVF assignment off the
  * shuffle: the relational formulation (crossJoin(centroids) → window
  * partitionBy(vec_id) → row_number = 1) exchanges corpus × nlist rows
  * *carrying the embedding column* to compute a value that is a pure
  * function of its own row — at 100 TB with nlist=16 that is a 16×
  * amplified full-corpus shuffle. Here the centroid set rides in as a
  * single broadcast row and the argmin runs inside whole-stage codegen;
  * the corpus never exchanges at all.
  *
  * Determinism contract (the property the window formulation lacked):
  * strictly greater cosine wins; an exact cosine tie keeps the smaller
  * centroid_id; NaN scores (zero-norm inputs) never win unless every
  * score is NaN, in which case the smallest centroid_id is returned —
  * so the result is independent of the centroid array's order, and
  * therefore of `collect_list`'s partition-dependent ordering.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(emb: Any, cents: Any): Any = {
    val c = cents.asInstanceOf[ArrayData]
    if (c.numElements() == 0) null
    else NearestCentroid.nearest(emb.asInstanceOf[ArrayData], c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, cents) =>
      s"""
         |if ($cents.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.NearestCentroid.nearest($emb, $cents);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {

  /** Order-independent argmax of cosine(emb, centroid_i) over a
    * non-empty struct array; see the class doc for the tie/NaN rules.
    */
  def nearest(emb: ArrayData, cents: ArrayData): Long = {
    val n = cents.numElements()
    var best = 0.0
    var bestId = 0L
    var hasBest = false
    var minId = Long.MaxValue
    var i = 0
    while (i < n) {
      val row = cents.getStruct(i, 2)
      val id = row.getLong(0)
      if (id < minId) minId = id
      // A null centroid vector (null embedding sampled into the
      // centroid set) scores like NaN: it can never win.
      val vec = row.getArray(1)
      if (vec != null) {
        val c = CosineSimilarity.cosine(emb, vec)
        if (!c.isNaN && (!hasBest || c > best || (c == best && id < bestId))) {
          hasBest = true; best = c; bestId = id
        }
      }
      i += 1
    }
    if (hasBest) bestId else minId
  }

  def nearest_centroid(emb: Column, cents: Column): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(emb), ColumnBridge.expression(cents)))
}

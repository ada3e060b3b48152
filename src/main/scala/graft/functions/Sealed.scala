package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports `deterministic = false` so the
  * optimizer treats the wrapped value as compute-once-where-declared:
  * a filter referencing a Sealed projection cannot be rewritten
  * through the Project and pushed into a join condition, because
  * predicate pushdown through a projection requires every referenced
  * alias to be deterministic.
  *
  * Why this exists (r17, guide §1.2/§4.4): the dedup family's verify
  * stages compute an expensive per-pair kernel (sorted-merge set
  * intersection over shingle arrays, cosine over embeddings) in a
  * Project directly above the candidate join, then threshold-filter
  * it. PushPredicateThroughJoin substitutes the alias and moves the
  * WHOLE scoring expression into the join condition, where it (a) is
  * re-evaluated per joined row ONCE PER TEXTUAL REFERENCE (the
  * Jaccard guard references the intersection twice — join conditions
  * get no subexpression elimination), (b) runs BEFORE the cheap
  * size/ordering prunes that sit to its right in the merged
  * conjunction, and (c) still re-evaluates in the Project above for
  * the surviving rows. Measured on ngram_jaccard_pairs at sf0.1:
  * 2.63 s → 0.91 s from sealing the intersection alone.
  *
  * The wrapped child MUST itself be pure — Sealed lies to the
  * optimizer about determinism, it does not add state; results are
  * bit-identical, task retries recompute the same value. Use it only
  * in Project nodes (nondeterministic expressions are rejected inside
  * aggregates and join conditions), and only where the duplicated
  * evaluation is provably more expensive than the pushdown it blocks:
  * sealing a field blocks pushing EVERY filter through that Project.
  */
case class Sealed(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Sealed {
  /** Column-level helper: `sealedCol(expensiveScore)`.
    * `-Dgraft.seal.off=true` disables every barrier (A/B debugging aid
    * — lets a plan regression be bisected to the barriers without a
    * rebuild; read once at JVM start).
    */
  private val off = java.lang.Boolean.getBoolean("graft.seal.off")
  def sealedCol(c: Column): Column =
    if (off) c else ColumnBridge.column(Sealed(ColumnBridge.expression(c)))
}

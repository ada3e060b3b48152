package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** Identity wrapper that (a) blocks constant folding and (b) pins its
  * child's codegen result into NAMED LOCALS, so every downstream
  * consumer sees a variable, never an inlined literal.
  *
  * Why this exists: Spark's `BloomFilterMightContain.doGenCode` emits
  * `bf.mightContainLong((Long)<value>)`. When the probe key constant-
  * folds to a NEGATIVE long literal (e.g. `xxhash64('m-7')` under
  * ConstantFolding), the generated text is `(Long)-863…L`, which
  * janino parses as the subtraction `java.lang.Long − 863…L` (the
  * classic cast-vs-minus grammar ambiguity) and rejects with
  * `Expression "java.lang.Long" is not an rvalue` — whole-stage
  * codegen then silently falls back to the interpreter. That is an
  * upstream Spark bug reachable only through literal probe keys;
  * wrapping the foldable hash in this expression makes the emitted
  * cast `(Long)matValue_0`, which compiles. Column-shaped keys (every
  * production path) are untouched — [[BloomFunctions]] wraps ONLY
  * when the hashed key is foldable, so the hot path keeps its exact
  * codegen shape.
  */
case class CodegenMaterialized(child: Expression) extends UnaryExpression {
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val isNull = ctx.freshName("matNull")
    val value = ctx.freshName("matValue")
    val jt = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        boolean $isNull = ${c.isNull};
        $jt $value = ${c.value};""",
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, dataType))
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compressed size of a string's UTF-8 bytes — the raw
  * ingredient of the compression-ratio quality signal web-scale
  * pipelines use (Gopher/RefinedWeb-style: highly repetitive
  * boilerplate compresses far below prose; random noise barely
  * compresses at all). Returns the compressed BYTE COUNT as a long;
  * callers derive ratio = deflate_size / n_bytes downstream — keeping
  * the expression integer-exact and division-free.
  *
  * Native Catalyst `Expression` with `doGenCode`: the compressor runs
  * inside whole-stage codegen on the scan's generated loop (no UDF
  * boxing). Level is fixed (6, zlib default) and `nowrap` drops the
  * 6-byte zlib header so tiny strings aren't dominated by framing.
  * java.util.zip wraps the JDK's bundled zlib — deterministic per
  * runtime, which is why this signal is spec-pinned (ordering and
  * idempotence contracts) rather than oracle-hashed: DuckDB has no
  * DEFLATE surface to mirror it.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.compressedSize(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateSize.compressedSize($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  /** Column-level entry point (via [[ColumnBridge]]). */
  def deflate_size(text: Column): Column =
    ColumnBridge.column(DeflateSize(ColumnBridge.expression(text)))

  /** Raw-DEFLATE byte count at level 6, nowrap. Static — referenced
    * from both interpreted eval and generated code. A fresh Deflater
    * per call keeps it thread-safe across codegen tasks; `end()` frees
    * the native zlib state eagerly (finalizer pressure at 100 TB row
    * counts would stall executors otherwise).
    */
  def compressedSize(bytes: Array[Byte]): Long = {
    if (bytes.length == 0) return 0L
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

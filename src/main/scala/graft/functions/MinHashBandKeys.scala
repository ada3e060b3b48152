package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash-LSH band keys: `array<long>` of base shingle hashes
  * → `array<long>` of `bands` band keys, where band b combines the
  * minima of `rowsPerBand` seeded xxhash64 rehashes.
  *
  * This is the codegen'd replacement for the equivalent
  * `transform(sequence(...), b -> xxhash64(array_min(transform(...))))`
  * composition ([[TextFunctions.minhashBandKeys]]): higher-order
  * functions evaluate interpreted (CodegenFallback) with per-element
  * boxing, which puts bands·rows·|shingles| boxed hash calls on every
  * row — the dominant cost of near-dedup at corpus scale. Here the
  * same arithmetic is one flat primitive loop (seeds outer, shingles
  * inner) emitted straight into whole-stage codegen.
  */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands > 0 && rowsPerBand > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBandKeys.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {

  /** All band keys in one pass: for seed s = b·r+j, min over the base
    * hashes of xxhash64(h, seed=s); band key chains its r minima
    * through xxhash64. Called from both interpreted and generated code.
    */
  def compute(baseHashes: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = baseHashes.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        val seed = b * rowsPerBand + j
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = XXH64.hashLong(baseHashes.getLong(i), seed)
          if (h < min) min = h
          i += 1
        }
        key = XXH64.hashLong(min, key)
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  def minhash_band_keys(c: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(MinHashBandKeys(ColumnBridge.expression(c), bands, rowsPerBand))
}

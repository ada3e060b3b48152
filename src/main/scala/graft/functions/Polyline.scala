package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Google encoded-polyline codec as native codegen expressions — the
  * activity-route column shape of the reference schema
  * (reference: internal/db/activities.go:29, `map_polyline TEXT`,
  * the Strava API's encoded summary polyline).
  *
  * The algorithm is Google's public polyline encoding: coordinates
  * quantized to 1e-5 degrees, delta-encoded point to point, each
  * signed delta zig-zagged and emitted as base-63-offset 5-bit
  * varint chunks. Both directions are pure row-local byte loops —
  * no shuffle, fully inside whole-stage codegen, the cheapest shape
  * a per-row transform can have at any corpus size.
  *
  * Exactness: a decoded coordinate is exactly `q / 1e5` for the
  * integer `q` carried by the wire format, and [[PolylineEncode]]
  * re-quantizes via `Math.round(lat * 1e5)` — for any value that came
  * out of the decoder the product is within 1 ulp of the integer, so
  * `encode(decode(s)) == s` for every canonically-encoded string
  * (round-trip pinned by the polyline_decode oracle row and
  * PolylineSpec's published test vectors).
  */
case class PolylineDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Polyline.pointArrayType
  override def prettyName: String = "polyline_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"polyline_decode needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Polyline.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Polyline.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): PolylineDecode =
    copy(child = newChild)
}

/** `array<struct<lat double, lng double>>` → encoded polyline string.
  * See [[PolylineDecode]] for the codec contract.
  */
case class PolylineEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "polyline_encode"

  override def nullSafeEval(input: Any): Any =
    Polyline.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Polyline.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): PolylineEncode =
    copy(child = newChild)
}

object Polyline {

  val pointType: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lng", DoubleType, nullable = false)))

  val pointArrayType: ArrayType = ArrayType(pointType, containsNull = false)

  /** Encoded polyline → array of (lat, lng) structs. Malformed input
    * (a truncated varint) throws — a corrupt route column should be a
    * named failure, not silent garbage.
    */
  def decode(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // each point costs >= 2 bytes on the wire
    val out = new java.util.ArrayList[AnyRef](math.max(4, n / 4))
    var i = 0
    var lat = 0L
    var lng = 0L
    while (i < n) {
      var shift = 0
      var result = 0L
      var b = 0x20
      while (b >= 0x20) {
        if (i >= n)
          throw new IllegalArgumentException(
            s"polyline_decode: truncated varint at byte $i")
        b = bytes(i) - 63
        i += 1
        result |= (b & 0x1fL) << shift
        shift += 5
      }
      lat += (if ((result & 1) != 0) ~(result >> 1) else result >> 1)
      shift = 0
      result = 0L
      b = 0x20
      while (b >= 0x20) {
        if (i >= n)
          throw new IllegalArgumentException(
            s"polyline_decode: truncated varint at byte $i")
        b = bytes(i) - 63
        i += 1
        result |= (b & 0x1fL) << shift
        shift += 5
      }
      lng += (if ((result & 1) != 0) ~(result >> 1) else result >> 1)
      out.add(new GenericInternalRow(Array[Any](lat / 1e5, lng / 1e5)))
    }
    new GenericArrayData(out.toArray)
  }

  /** Array of (lat, lng) structs → encoded polyline string. */
  def encode(points: ArrayData): UTF8String = {
    val n = points.numElements()
    val sb = new java.lang.StringBuilder(n * 6)
    var prevLat = 0L
    var prevLng = 0L
    var i = 0
    while (i < n) {
      val p = points.getStruct(i, 2)
      val lat = Math.round(p.getDouble(0) * 1e5)
      val lng = Math.round(p.getDouble(1) * 1e5)
      writeVarint(sb, lat - prevLat)
      writeVarint(sb, lng - prevLng)
      prevLat = lat
      prevLng = lng
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def writeVarint(sb: java.lang.StringBuilder, v: Long): Unit = {
    var x = if (v < 0) ~(v << 1) else v << 1
    while (x >= 0x20) {
      sb.append(((0x20 | (x & 0x1f)) + 63).toChar)
      x >>= 5
    }
    sb.append((x + 63).toChar)
  }

  def polyline_decode(c: Column): Column =
    ColumnBridge.column(PolylineDecode(ColumnBridge.expression(c)))

  def polyline_encode(c: Column): Column =
    ColumnBridge.column(PolylineEncode(ColumnBridge.expression(c)))
}

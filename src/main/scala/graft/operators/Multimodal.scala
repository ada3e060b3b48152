package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with decode / feature
  * extraction as per-partition batch transforms.
  *
  * The Spark-side contract is real and tested — schema, partition
  * batching, output shape. The codec itself is a STUB: this container
  * has no image/audio libraries, so [[fakeDecodeFeatures]] derives a
  * deterministic feature vector from the payload bytes. A real
  * deployment swaps `decodeBatch`'s body for an actual decoder (JNI /
  * javacv / a Pandas UDF in the PySpark binding) — the dataflow
  * around it does not change.
  *
  * Scale notes: payloads stay off the shuffle path (decode happens
  * before any wide transform); `mapPartitions` keeps per-batch codec
  * state (a real decoder is expensive to init per row); feature
  * vectors, not payloads, flow into downstream joins/ANN.
  */
object Multimodal {

  /** Typed media record: opaque payload + structured metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String,           // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Synthesize a media table from `documents` (text bytes stand in
    * for encoded payloads — deterministic, so specs and the driver can
    * rely on byte-identical runs).
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 32).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))

  /** STUB decoder: a real implementation would decode the payload and
    * run a feature extractor; here the "features" are a deterministic
    * 8-dim byte-histogram moment vector so the plumbing is testable.
    */
  private[operators] def fakeDecodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below.
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / math.max(payload.length, 1); j += 1 }
    out
  }

  /** Per-partition batch decode: one codec init per partition, rows
    * streamed through it. Output is the feature relation (payload
    * dropped — never shuffle multi-MB blobs).
    */
  def decodeBatch(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real codec/session init would happen here, once per partition
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          fakeDecodeFeatures(r.payload))
      }
    }
  }

  /** Feature summary per media kind — the downstream-aggregation shape
    * (joins features back to typed metadata, no payload in the plan).
    */
  def featureStats(media: DataFrame): DataFrame =
    decodeBatch(media).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(element_at(col("features"), 1)).as("mean_f0"))
      .orderBy(col("kind"))
}

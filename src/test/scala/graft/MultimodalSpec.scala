package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media has the contract schema") {
    val media = Multimodal.syntheticMedia(tables.Tables.documents(spark, sf))
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "width", "height", "duration_ms"))
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.select("kind").distinct().count() === 3)
  }

  test("decodeBatch emits fixed-shape deterministic features, payload dropped") {
    val media = Multimodal.syntheticMedia(tables.Tables.documents(spark, sf)).limit(20)
    val f1 = Multimodal.decodeBatch(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeBatch(media).collect().sortBy(_.media_id)
    assert(f1.length === 20)
    assert(f1.forall(_.features.length === 8))
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("featureStats aggregates per kind") {
    val media = Multimodal.syntheticMedia(tables.Tables.documents(spark, sf))
    val stats = Multimodal.featureStats(media).collect()
    assert(stats.length === 3)
    assert(stats.map(_.getAs[Long]("n_media")).sum === media.count())
  }
}

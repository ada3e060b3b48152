package graft

import org.apache.spark.sql.functions._

import graft.functions.Polyline.{polyline_decode, polyline_encode}

class PolylineSpec extends SparkSpec {
  import spark.implicits._

  // The worked example from Google's published polyline-algorithm
  // documentation: three points, encoded "_p~iF~ps|U_ulLnnqC_mqNvxq`@".
  private val GoogleVector = "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
  private val GooglePoints =
    Seq((38.5, -120.2), (40.7, -120.95), (43.252, -126.453))

  test("decodes the published Google test vector") {
    val rows = Seq(GoogleVector).toDF("enc")
      .select(explode(polyline_decode(col("enc"))).as("p"))
      .select($"p.lat", $"p.lng").as[(Double, Double)].collect().toSeq
    assert(rows === GooglePoints)
  }

  test("encodes the published points back to the exact vector") {
    val enc = GooglePoints.toDF("lat", "lng")
      .agg(collect_list(struct($"lat", $"lng")).as("pts"))
      .select(polyline_encode(col("pts"))).as[String].head()
    assert(enc === GoogleVector)
  }

  test("encode . decode is the identity on canonical strings") {
    val rt = Seq(GoogleVector).toDF("enc")
      .select(polyline_encode(polyline_decode(col("enc"))).as("rt"))
      .as[String].head()
    assert(rt === GoogleVector)
  }

  test("single point and negative-zero-delta edge shapes round-trip") {
    // one point; repeated identical points (zero deltas); a southern/
    // western route (all-negative quantities)
    val cases = Seq(
      Seq((0.0, 0.0)),
      Seq((1.00001, -2.00002)),
      Seq((10.0, 20.0), (10.0, 20.0), (10.0, 20.0)),
      Seq((-85.0, -179.99999), (-84.99999, -179.0)))
    cases.foreach { pts =>
      val df = pts.toDF("lat", "lng")
        .agg(collect_list(struct($"lat", $"lng")).as("pts"))
      val enc = df.select(polyline_encode(col("pts"))).as[String].head()
      val dec = Seq(enc).toDF("e")
        .select(explode(polyline_decode(col("e"))).as("p"))
        .select($"p.lat", $"p.lng").as[(Double, Double)].collect().toSeq
      assert(dec === pts, s"round-trip failed for $pts (wire: $enc)")
    }
  }

  test("empty string decodes to an empty array; null propagates") {
    val empty = Seq("").toDF("enc")
      .select(size(polyline_decode(col("enc"))).as("n")).as[Int].head()
    assert(empty === 0)
    val nul = Seq(Option.empty[String]).toDF("enc")
      .select(polyline_decode(col("enc")).as("p"))
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("truncated varint is a named failure, not silent garbage") {
    val ex = intercept[Exception] {
      Seq("_p~iF~ps|").toDF("enc")
        .select(polyline_decode(col("enc"))).collect()
    }
    assert(ex.getMessage != null)
  }
}

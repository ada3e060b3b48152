package graft

import graft.tables.Tables

/** Loader-contract guard: asserts the Spark dtype of every column of
  * every driver-provided table at sf0.001, as loaded through the
  * canonical [[graft.tables.Tables]] readers (FIXTURES.md §B).
  *
  * Purpose: the driver regenerates `/root/testdata` between rounds and
  * has already changed a physical type once (`events.ts` went from
  * INT64 TIMESTAMP(NANOS) to plain timestamp[us] between r6 and r7,
  * breaking 79 bench queries at analysis time). This spec turns any
  * future regeneration drift into ONE named failure instead of a sea
  * of anonymous reds. Reference analogue: the schema probe in
  * `scripts/test_db.sh:78`.
  */
class FixturesSpec extends SparkSpec {

  private def schemaOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  private def assertSchema(name: String, actual: Map[String, String], expected: Seq[(String, String)]): Unit = {
    val exp = expected.toMap
    val missing  = exp.keySet -- actual.keySet
    val extra    = actual.keySet -- exp.keySet
    val mismatch = exp.keySet.intersect(actual.keySet).filter(k => exp(k) != actual(k))
    assert(missing.isEmpty && extra.isEmpty && mismatch.isEmpty,
      s"table `$name` schema drifted (testdata regenerated?): " +
        s"missing=${missing.mkString(",")} extra=${extra.mkString(",")} " +
        mismatch.map(k => s"$k: expected ${exp(k)} got ${actual(k)}").mkString("; "))
  }

  test("events loads with the canonical schema (ts is TIMESTAMP_NTZ)") {
    assertSchema("events", schemaOf(Tables.events(spark, sf)), Seq(
      "event_id" -> "bigint", "ts" -> "timestamp_ntz", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"))
  }

  test("customer loads with the canonical schema") {
    assertSchema("customer", schemaOf(Tables.customer(spark, sf)), Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"))
  }

  test("orders loads with the canonical schema") {
    assertSchema("orders", schemaOf(Tables.orders(spark, sf)), Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint", "o_orderstatus" -> "string",
      "o_totalprice" -> "double", "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"))
  }

  test("lineitem loads with the canonical schema") {
    assertSchema("lineitem", schemaOf(Tables.lineitem(spark, sf)), Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
      "l_linenumber" -> "int", "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double", "l_returnflag" -> "string",
      "l_linestatus" -> "string", "l_shipdate" -> "timestamp_ntz"))
  }

  test("part loads with the canonical schema") {
    assertSchema("part", schemaOf(Tables.part(spark, sf)), Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"))
  }

  test("supplier loads with the canonical schema") {
    assertSchema("supplier", schemaOf(Tables.supplier(spark, sf)), Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"))
  }

  test("nation loads with the canonical schema") {
    assertSchema("nation", schemaOf(Tables.nation(spark, sf)), Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"))
  }

  test("region loads with the canonical schema") {
    assertSchema("region", schemaOf(Tables.region(spark, sf)), Seq(
      "r_regionkey" -> "int", "r_name" -> "string"))
  }

  test("documents loads with the canonical schema") {
    assertSchema("documents", schemaOf(Tables.documents(spark, sf)), Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"))
  }

  test("embeddings loads with the canonical schema") {
    assertSchema("embeddings", schemaOf(Tables.embeddings(spark, sf)), Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))
  }

  test("events reader accepts both physical ts generations (long nanos branch)") {
    // Write a nanos-as-long copy the way the pre-r7 driver data loaded
    // (LongType under nanosAsLong=true) and confirm the shim branch
    // yields the same instants as the timestamp[us] generation.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_fixtures_ns").toString
    val now = Tables.events(spark, sf)
    now.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir)
    assert(back.schema("ts").dataType.simpleString == "timestamp_ntz")
    val diff = back.as("b").join(now.as("n"), "event_id")
      .where(col("b.ts") =!= col("n.ts")).count()
    assert(diff == 0, s"ns-long branch disagrees with timestamp branch on $diff rows")
  }
}

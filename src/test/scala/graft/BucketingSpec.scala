package graft

import org.apache.spark.sql.functions._

import graft.tables.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {

  test("aggregation over a bucketed table plans without a shuffle") {
    // drop any table AND stale warehouse dir from a previous JVM (the
    // in-memory catalog forgets the table, the filesystem doesn't)
    spark.sql("DROP TABLE IF EXISTS events_bucketed")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "events_bucketed")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    Bucketing.writeBucketed(
      Tables.events(spark, sf), "events_bucketed", "user_id", 8)
    val agg = spark.table("events_bucketed")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
    // and it still computes the right thing
    val direct = Tables.events(spark, sf).groupBy(col("user_id")).count().count()
    assert(agg.count() === direct)
  }
}

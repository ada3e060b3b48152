package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical readers for the driver-provided parquet tables
  * (`/root/repo/TESTDATA.md`, `/root/repo/FIXTURES.md` §B).
  *
  * Role mapping against the reference's relational model
  * (SURVEY.md §1; reference `internal/db/activities.go:8-50`,
  * `internal/db/user.go:8-17`, `internal/db/user_api_keys.go:9-18`):
  * `events` plays `activities` (timestamped fact rows keyed by id),
  * `customer` plays `users`, and the TPC-H-ish dimensions plus
  * `documents`/`embeddings` feed the analytics / training-data
  * extension operators.
  *
  * Conventions:
  *  - All timestamps are surfaced as TIMESTAMP_NTZ. The driver's
  *    DuckDB oracle reads the same parquet as naive timestamps, so
  *    keeping everything NTZ (session TZ pinned UTC) makes Spark
  *    output and oracle output bit-identical.
  *  - `events.ts` has shipped in two physical encodings across
  *    driver testdata generations: INT64 TIMESTAMP(NANOS) (loads as
  *    LongType under `spark.sql.legacy.parquet.nanosAsLong=true`,
  *    which [[graft.GraftSession]] keeps set) and plain
  *    `timestamp[us]` (loads as a timestamp type directly).
  *    [[events]] branches on the *loaded* dtype so both generations
  *    read identically: longs get the ns→µs integer truncation
  *    DuckDB applies, timestamps are just re-tagged NTZ.
  */
object Tables {

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fact table standing in for `activities`. Columns:
    * event_id long, ts timestamp_ntz, user_id long, event_type string,
    * value double, props string (JSON).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long generation: ns→µs truncation, integer-exact (a
        // double division would lose precision above 2^53 ns); then to
        // NTZ (session TZ is UTC so the cast is an identity re-tag).
        raw.withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
      case TimestampNTZType =>
        raw
      case _: TimestampType =>
        // micros generation read as LTZ: session TZ is UTC, so this is
        // an identity re-tag to the NTZ contract.
        raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unexpected dtype $other — testdata regenerated with a new physical type?")
    }
  }

  /** Dimension standing in for `users`. */
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")

  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")

  /** Text corpus for the dedup / text-analysis extension operators. */
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")

  /** 64-dim float embeddings for the similarity-search extension. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}

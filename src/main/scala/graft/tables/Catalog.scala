package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog bootstrap — the Spark-native shape of the reference's DDL
  * layer (`InitSchema`, `internal/db/db.go:47-51` + per-table
  * `CREATE TABLE IF NOT EXISTS` strings) and its
  * `information_schema.tables` existence probe
  * (`scripts/test_db.sh:78`).
  *
  * Idempotent like the reference: re-registering is a no-op. Tables
  * are temp views over the parquet dirs here; on a real deployment
  * the same calls target a persistent catalog (`CREATE TABLE … USING
  * parquet LOCATION …`) so every session and engine shares the schema.
  */
object Catalog {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view over `dir` (CREATE
    * TABLE IF NOT EXISTS semantics: existing views are replaced with
    * an identical definition, never dropped).
    */
  def initSchema(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, dir)
        else spark.read.parquet(s"$dir/$name.parquet")
      df.createOrReplaceTempView(name)
    }

  /** `information_schema.tables` probe equivalent. */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** JSON sink (reference serves rows as a JSON array over HTTP,
    * `internal/api/api.go:234-235`): one JSON line per row.
    */
  def toJsonLines(df: DataFrame): DataFrame =
    df.toJSON.toDF("json")
}

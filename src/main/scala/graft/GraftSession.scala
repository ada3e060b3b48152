package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configs every graft entry point needs.
  *
  * Central so Verify/Bench/tests cannot drift: UTC session TZ (oracle
  * parity), shuffle partitions sized to local cores (not the 200
  * default — on a real cluster this is set per-job or left to AQE),
  * AQE on (runtime coalescing + skew-join splitting at scale), and the
  * legacy nanos flag required to read `events.parquet`
  * (INT64 TIMESTAMP(NANOS) — see [[graft.tables.Tables.events]]).
  */
object GraftSession {

  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft_warehouse"))
      .config("spark.ui.enabled", "false")

  /** Local session: `local[cores]`, with the engine's native kernels
    * registered as SQL functions (see [[GraftExtensions]]).
    */
  def local(cores: Int): SparkSession = {
    val spark = builder(s"local[$cores]", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark
  }
}

package graft

/** Dev utility: run one or more SparkEntry queries by name against a
  * scale-factor dir and print row counts + head. Not part of the driver
  * contract (that's Verify/Bench); kept for fast single-query iteration:
  *   sbt "runMain graft.RunQuery /root/testdata/sf0.001 streaming_hourly"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
        val rows = df.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[runquery] $name: ${rows.length} rows in $sec%.2f s")
        println(df.schema.treeString)
        rows.take(5).foreach(r => println(s"  $r"))
      } catch {
        case e: Throwable =>
          println(s"[runquery] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}

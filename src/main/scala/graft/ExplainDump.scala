package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.FormattedMode

/** Dump `explain("formatted")` for named queries to per-query files —
  * the optimization rounds' plan-evidence artifact (plans/rNN/name.txt).
  * No action runs: the dump is the analyzed plan as the planner will
  * execute it (AQE re-optimization aside), so it is cheap enough to
  * run for every query in one JVM.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> [name ...]
  * (no names = every declared query).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    Files.createDirectories(outDir)
    val names =
      if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(FormattedMode)
        Files.writeString(outDir.resolve(s"$name.txt"), plan)
        println(s"[explain] $name: ${plan.linesIterator.size} lines")
      } catch {
        case e: Throwable =>
          println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

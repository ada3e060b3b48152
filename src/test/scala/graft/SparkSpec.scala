package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one lazy local session per JVM (suites reuse it
  * via getOrCreate), UTC + nanos flag per GraftSession.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val sf: String = "/root/testdata/sf0.001"
}

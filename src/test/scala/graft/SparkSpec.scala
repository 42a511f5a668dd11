package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; Spark
  * getOrCreate makes this cheap across suites).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.build("graft-test", cores = 4)
  val sfDir = "/root/testdata/sf0.001"
}

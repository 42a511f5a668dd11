package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; Spark
  * getOrCreate makes this cheap across suites).
  *
  * Operator-persisted intermediates are drained after EVERY test (the
  * same CacheBin discipline the bench applies between queries): with
  * one JVM-wide session, a frame persisted by an operator in one test
  * stays registered until drained, and the next invocation of the same
  * operator on the same input re-persists an identical plan — the
  * "WARN CacheManager: asked to cache already cached data" class that
  * masked a real cache regression in round 8. Suite-shared fixtures
  * that must survive the drain should hold driver-side values (collected
  * rows, models) rather than cached DataFrames with operator lineage.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark: SparkSession = graft.core.GraftSession.build("graft-test", cores = 4)
  val sfDir = "/root/testdata/sf0.001"

  override protected def afterEach(): Unit = {
    graft.core.CacheBin.drain()
    super.afterEach()
  }
}

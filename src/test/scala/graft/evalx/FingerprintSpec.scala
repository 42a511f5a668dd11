package graft.evalx

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The commutative column-fingerprint sketch must be order- and
  * partitioning-insensitive, value-sensitive, and tolerant at 2 dp —
  * it is the equivalence-grouping primitive for candidate selection.
  */
class FingerprintSpec extends SparkSpec {

  private def df(rows: Seq[(Int, Double, String)], parts: Int) = {
    import spark.implicits._
    rows.toDF("k", "v", "s").repartition(parts)
  }

  private val base = Seq((1, 1.004, "a"), (2, 2.0, "b"), (3, 3.5, null: String))

  test("fingerprints invariant under row order and partitioning") {
    val f1 = ResultComparator.columnFingerprints(df(base, 1))
    val f2 = ResultComparator.columnFingerprints(df(base.reverse, 7))
    assert(f1 == f2)
  }

  test("fingerprints equal at 2dp rounding granularity") {
    val f1 = ResultComparator.columnFingerprints(df(base, 2))
    val f2 = ResultComparator.columnFingerprints(
      df(base.map { case (k, v, s) => (k, v + 0.001, s) }, 2))
    // 1.004+0.001 rounds to 1.00 vs 1.00; 2.001→2.00; 3.501→3.50
    assert(f1("v") == f2("v"))
  }

  test("fingerprints differ for different values and multiplicities") {
    val f1 = ResultComparator.columnFingerprints(df(base, 2))
    val changed = ResultComparator.columnFingerprints(
      df(base.updated(0, (1, 9.9, "a")), 2))
    assert(f1("v") != changed("v") && f1("k") == changed("k"))
    val dup = ResultComparator.columnFingerprints(df(base ++ base.take(1), 2))
    assert(f1("k") != dup("k"))
  }

  test("fingerprints handle empty and null-only columns") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Double, String)].toDF("k", "v", "s")
    val fe = ResultComparator.columnFingerprints(empty)
    assert(fe.keySet == Set("k", "v", "s"))
    val nulls = Seq((1, 1.0, null: String), (2, 2.0, null: String)).toDF("k", "v", "s")
    assert(ResultComparator.columnFingerprints(nulls)("s") != fe("s"))
  }
}

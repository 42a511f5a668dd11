package graft.evalx

import org.scalatest.funsuite.AnyFunSuite

/** Fixture table from FIXTURES.md §6 — the reference EX semantics. */
class ResultComparatorSpec extends AnyFunSuite {

  private def rows(r: Seq[Any]*): Seq[Seq[Any]] = r

  test("pred may have extra columns by default") {
    val gold = rows(Seq(1, "a"), Seq(2, "b"))
    val pred = rows(Seq(1, "a", 9.9), Seq(2, "b", 8.8))
    assert(ResultComparator.compareRows(pred, gold) == 1)
  }

  test("strict_columns rejects shape mismatch") {
    val gold = rows(Seq(1, "a"), Seq(2, "b"))
    val pred = rows(Seq(1, "a", 9.9), Seq(2, "b", 8.8))
    assert(ResultComparator.compareRows(pred, gold, strictColumns = true) == 0)
  }

  test("ignore_order makes shuffled rows equivalent") {
    val gold = rows(Seq(1), Seq(2), Seq(3))
    val pred = rows(Seq(3), Seq(1), Seq(2))
    assert(ResultComparator.compareRows(pred, gold, ignoreOrder = true) == 1)
    assert(ResultComparator.compareRows(pred, gold, ignoreOrder = false) == 0)
  }

  test("numeric tolerance 1e-2") {
    val gold = rows(Seq(3.141))
    val ok = rows(Seq(3.1485))
    val bad = rows(Seq(3.16))
    assert(ResultComparator.compareRows(ok, gold) == 1)
    assert(ResultComparator.compareRows(bad, gold) == 0)
  }

  test("int and double cross-compare numerically") {
    assert(ResultComparator.compareRows(rows(Seq(3.0)), rows(Seq(3)) ) == 1)
  }

  test("NA == NA") {
    val gold = rows(Seq(null, 1.0), Seq(Double.NaN, 2.0))
    val pred = rows(Seq(Double.NaN, 1.0), Seq(null, 2.0))
    assert(ResultComparator.compareRows(pred, gold) == 1)
  }

  test("distinct-column bipartite matching: one pred column cannot satisfy two gold columns") {
    val gold = rows(Seq(1, 1), Seq(2, 2)) // two identical gold columns
    val predOneCol = rows(Seq(1), Seq(2))
    assert(ResultComparator.compareRows(predOneCol, gold) == 0)
    val predTwoCols = rows(Seq(1, 1), Seq(2, 2))
    assert(ResultComparator.compareRows(predTwoCols, gold) == 1)
  }

  test("empty gold column list scores 1") {
    assert(ResultComparator.compareRows(rows(Seq(1)), Seq.empty) == 1)
  }

  test("quick_reject: shape, normalization, within-row sort") {
    assert(ResultComparator.quickReject(rows(Seq(1)), rows(Seq(1), Seq(2)), ignoreOrder = false))
    // rounded floats at 2dp considered equal
    assert(!ResultComparator.quickReject(rows(Seq(1.004)), rows(Seq(1.0)), ignoreOrder = false))
    // within-row sort makes column order irrelevant
    assert(!ResultComparator.quickReject(rows(Seq("x", 1)), rows(Seq(1, "x")), ignoreOrder = false))
    // ignore_order sorts rows as multiset
    assert(!ResultComparator.quickReject(rows(Seq(2), Seq(1)), rows(Seq(1), Seq(2)), ignoreOrder = true))
    assert(ResultComparator.quickReject(rows(Seq(2), Seq(1)), rows(Seq(1), Seq(2)), ignoreOrder = false))
  }

  test("condition_cols restricts gold columns compared") {
    val gold = rows(Seq(1, "zzz"), Seq(2, "yyy"))
    val pred = rows(Seq(1), Seq(2))
    assert(ResultComparator.compareRows(pred, gold, conditionCols = Seq(0)) == 1)
    assert(ResultComparator.compareRows(pred, gold) == 0)
  }
}

package graft.evalx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Execution-accuracy (EX) result-table equivalence.
  *
  * Semantically faithful re-implementation of the reference comparator
  * (`core/evaluate.py:408-499`): pred may carry extra columns unless
  * `strictColumns`; every gold column must match a *distinct* pred column
  * (greedy first-fit assignment, as the reference does); numeric values
  * compare with absolute tolerance 1e-2; NA==NA; `ignoreOrder` sorts each
  * column before the element-wise walk.
  *
  * Two paths:
  *  - `equivalent`: collect both results (benchmark result tables are
  *    small — the reference also materializes to pandas) and compare on
  *    the driver.
  *  - `columnFingerprints`: distributed canonicalization for large
  *    results — per column, values rounded to 2 dp, sorted, hashed —
  *    letting equivalence-grouping of N candidate results (FastExec
  *    selection) run without collecting any of them.
  */
object ResultComparator {

  val Tolerance = 1e-2

  private def isNa(x: Any): Boolean = x match {
    case null => true
    case d: Double => d.isNaN
    case f: Float => f.isNaN
    case _ => false
  }

  /** Reference sort key: (is-NA, type name, string form). */
  private def sortKey(x: Any): (Boolean, String, String) =
    (isNa(x), if (x == null) "null" else x.getClass.getSimpleName, String.valueOf(x))

  private def asNum(x: Any): Option[Double] = x match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }

  /** Element equality: NA==NA, numeric within abs tolerance, else ==. */
  private def elemEqual(a: Any, b: Any): Boolean =
    if (isNa(a) && isNa(b)) true
    else (asNum(a), asNum(b)) match {
      case (Some(x), Some(y)) => math.abs(x - y) <= Tolerance
      case _ => a == b
    }

  private def vectorsMatch(v1: IndexedSeq[Any], v2: IndexedSeq[Any],
      ignoreOrder: Boolean): Boolean = {
    if (v1.length != v2.length) return false
    val (a, b) =
      if (ignoreOrder)
        (v1.sortBy(sortKey), v2.sortBy(sortKey))
      else (v1, v2)
    a.iterator.zip(b.iterator).forall { case (x, y) => elemEqual(x, y) }
  }

  /** Round-half-even to 2 dp — matches Python's `round(x, 2)` used by
    * the reference's quick_reject normalization.
    */
  private def round2(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  private def normalizeAndSortRow(row: Seq[Any]): Seq[Any] = {
    val normalized = row.map { x =>
      if (isNa(x)) null
      else x match {
        case d: Double => round2(d)
        case f: Float => round2(f.toDouble)
        case v => v
      }
    }
    normalized.sortBy(sortKey)
  }

  /** Fast non-equivalence check (`core/evaluate.py:408-433`): shape
    * mismatch, or normalized within-row-sorted rows differ (as multiset
    * when `ignoreOrder`).
    */
  def quickReject(pred: Seq[Seq[Any]], gold: Seq[Seq[Any]], ignoreOrder: Boolean): Boolean = {
    if (pred.length != gold.length) return true
    val pw = pred.headOption.map(_.length).getOrElse(0)
    val gw = gold.headOption.map(_.length).getOrElse(0)
    if (pw != gw) return true
    val p = pred.map(normalizeAndSortRow)
    val g = gold.map(normalizeAndSortRow)
    if (ignoreOrder) {
      val key = (r: Seq[Any]) => r.map(sortKey)
      p.map(key).sortBy(_.toString()) != g.map(key).sortBy(_.toString())
    } else p != g
  }

  /** Row-major comparison with the reference's semantics; returns 1/0.
    * `predWidth`/`goldWidth` carry the COLUMN counts when known (a
    * zero-row result still has columns — deriving width from data rows
    * would make ANY pred "match" a gold that returned no rows, while
    * the reference compares empty column vectors, which only match
    * other empty vectors).
    */
  def compareRows(pred: Seq[Seq[Any]], gold: Seq[Seq[Any]],
      conditionCols: Seq[Int] = Nil, ignoreOrder: Boolean = false,
      strictColumns: Boolean = false,
      predWidth: Int = -1, goldWidth: Int = -1): Int = {
    if (strictColumns && quickReject(pred, gold, ignoreOrder)) return 0

    def transpose(rows: Seq[Seq[Any]], width: Int): IndexedSeq[IndexedSeq[Any]] = {
      val w = rows.headOption.map(_.length)
        .getOrElse(math.max(width, 0))
      IndexedSeq.tabulate(w)(j => rows.map(_(j)).toIndexedSeq)
    }
    val goldCols0 = transpose(gold, goldWidth)
    val goldCols =
      if (conditionCols.nonEmpty) conditionCols.map(goldCols0(_)).toIndexedSeq
      else goldCols0
    val predCols = transpose(pred, predWidth)
    if (goldCols.isEmpty) return 1

    // Greedy first-fit: each gold column claims the first unused pred column.
    val used = scala.collection.mutable.Set[Int]()
    goldCols.foreach { g =>
      val idx = predCols.indices.find(j => !used.contains(j) &&
        vectorsMatch(g, predCols(j), ignoreOrder))
      idx match {
        case Some(j) => used += j
        case None => return 0
      }
    }
    1
  }

  /** Row front door for callers that already collected under a
    * watchdog (Evaluator): judges exactly the rows the governed run
    * produced, no re-execution.
    */
  def equivalentRows(pred: Seq[org.apache.spark.sql.Row],
      gold: Seq[org.apache.spark.sql.Row],
      predWidth: Int, goldWidth: Int,
      conditionCols: Seq[Int] = Nil, ignoreOrder: Boolean = false,
      strictColumns: Boolean = false): Int =
    compareRows(
      pred.map(_.toSeq.map(scalaValue)), gold.map(_.toSeq.map(scalaValue)),
      conditionCols, ignoreOrder, strictColumns, predWidth, goldWidth)

  /** DataFrame front door: collects both sides (EX result tables are small). */
  def equivalent(pred: DataFrame, gold: DataFrame,
      conditionCols: Seq[Int] = Nil, ignoreOrder: Boolean = false,
      strictColumns: Boolean = false, maxRows: Int = 100000): Int = {
    val p = pred.limit(maxRows + 1).collect().map(_.toSeq.map(scalaValue)).toSeq
    val g = gold.limit(maxRows + 1).collect().map(_.toSeq.map(scalaValue)).toSeq
    compareRows(p, g, conditionCols, ignoreOrder, strictColumns,
      predWidth = pred.schema.size, goldWidth = gold.schema.size)
  }

  private def scalaValue(v: Any): Any = v match {
    case d: java.math.BigDecimal => d.doubleValue()
    case d: BigDecimal => d.toDouble
    case other => other
  }

  /** Distributed canonical fingerprint per column: values rounded to the
    * comparator's 2 dp, cast to string, xxhash64'd per row, then reduced
    * with a commutative (order-insensitive) multiset sketch —
    * (sum of hashes as decimal, xor of hashes, count). Two result
    * DataFrames with equal fingerprints for a column are
    * order-insensitively equal at tolerance granularity.
    *
    * This is the scale path for grouping N candidate-query results
    * without collecting them: unlike sort_array(collect_list(...)) it
    * never materializes a column as one array in a single aggregation
    * buffer — partial aggregation combines map-side and the final state
    * is three scalars per column regardless of row count.
    */
  def columnFingerprints(df: DataFrame): Map[String, Long] = {
    import org.apache.spark.sql.types._
    import scala.util.hashing.MurmurHash3
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val base = f.dataType match {
        case DoubleType | FloatType | _: DecimalType =>
          // NaN folds into the NULL sentinel: elemEqual treats NaN and
          // null as the same NA, so fingerprints must too or one true
          // equivalence group splits in two
          format_number(bround(
            nanvl(col(f.name).cast("double"), lit(null).cast("double")), 2), 5)
        case _ => col(f.name).cast("string")
      }
      val canon = coalesce(base, lit("\u0000NULL"))
      val h = xxhash64(canon)
      Seq(
        sum(h.cast(DecimalType(38, 0))).as(f.name + "__sum"),
        call_function("bit_xor", h).as(f.name + "__xor"),
        count(h).as(f.name + "__cnt"))
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    fields.map(_.name).zipWithIndex.map { case (n, i) =>
      val sketch = Seq(row.get(3 * i), row.get(3 * i + 1), row.get(3 * i + 2))
        .map(String.valueOf).mkString("|")
      n -> ((MurmurHash3.stringHash(sketch).toLong << 32) |
        (MurmurHash3.stringHash(sketch.reverse).toLong & 0xffffffffL))
    }.toMap
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data clustering:
  * sort/range-partition by `zValue(a, b)` and files become clustered in
  * BOTH keys at once, so parquet min/max footer pruning works for
  * filters on either dimension — the standard layout technique for
  * 100 TB tables queried by more than one key.
  *
  * The 21-bit-per-dimension interleave is built from shift/mask steps
  * shared between the Spark Column expression and the DuckDB oracle SQL
  * (`oZValue`), so z-values are engine-checkable integers, not an
  * implementation detail.
  */
object ZOrder {

  /** Magic-number bit-spreading steps: after masking to 31 bits, each
    * (shift, mask) pair doubles the gap until bits sit two apart.
    */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  val DimMask: Long = 0x7FFFFFFFL // 31 bits per dimension → 62-bit z

  private def spread(v: Column): Column =
    SpreadSteps.foldLeft(v.bitwiseAND(lit(DimMask))) { case (x, (s, m)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** Interleaved 2-D z-value of two non-negative (< 2^31) keys. */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Reference implementation for property tests (bit-by-bit). */
  def zValueRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** DuckDB expression computing the identical interleave. */
  def oZValue(a: String, b: String): String = {
    def oSpread(v: String): String =
      SpreadSteps.foldLeft(s"(CAST($v AS BIGINT) & ${DimMask})") { case (x, (s, m)) =>
        s"(($x | ($x << $s)) & $m)"
      }
    s"(${oSpread(a)} | (${oSpread(b)} << 1))"
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-flattened source mixture — THE standard pretraining mix
  * (multilingual/multi-domain sampling ∝ n^α, α<1 upweights small
  * sources): per-segment quotas proportional to count^α are rounded by
  * the largest-remainder method to hit `totalDocs` exactly, and each
  * segment contributes its quota's smallest hash-draws.
  * [[RowOps.tokenBudgetSample]] caps each source at a token budget;
  * this REBALANCES sources against each other.
  *
  * Everything after one IEEE-exact `sqrt`-family operation is integer
  * arithmetic: weights are `floor(1e6·n^α)` (for α = 0.5 computed via
  * `sqrt`, which IEEE 754 requires correctly rounded — bit-identical
  * on every engine, unlike the general `pow`), so quotas, remainders,
  * and the kept row set replay exactly in the DuckDB oracle. Segment
  * counts collect to the driver (#segments rows — the same bounded
  * inventory as IVF centroids); selection is a per-segment
  * rank-filtered window, partitioned on the segment key.
  *
  * When a segment's quota exceeds its size the quota caps there (no
  * redistribution — deterministic and replayable; the output may then
  * undershoot `totalDocs`, documented rather than papered over).
  */
object TemperatureMix {

  private val P = 1000000007L
  private val A = 2654435761L

  /** α = 0.5 temperature sample of `totalDocs` rows across segments.
    * Rows with a null segment are excluded (a null segment is not a
    * mixture source); quota arithmetic runs in BigInt — at the target
    * scale `totalDocs * weight` overflows a long (1e9 docs against a
    * 2.5e10-doc segment is past 2^63) and a silent wraparound would
    * drop whole segments.
    */
  def sampleSqrtTemperature(df: DataFrame, segCol: String, idCol: String,
      totalDocs: Long): DataFrame = {
    require(totalDocs > 0, "totalDocs must be positive")
    val nonNull = df.filter(col(segCol).isNotNull)
    val counts = nonNull.groupBy(col(segCol).cast("string").as("__seg"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    // integer weights after the one exactly-rounded float op
    val weighted = counts.map { case (seg, n) =>
      (seg, n, BigInt((1e6 * math.sqrt(n.toDouble)).toLong))
    }
    val w = weighted.map(_._3).sum
    val base = weighted.map { case (seg, n, wt) =>
      (seg, n, (BigInt(totalDocs) * wt / w).toLong, BigInt(totalDocs) * wt % w)
    }
    val leftover = totalDocs - base.map(_._3).sum
    // largest remainder first, ties to the lexicographically first seg
    val bump = base.sortBy { case (seg, _, _, rem) => (-rem, seg) }
      .take(leftover.toInt).map(_._1).toSet
    val quotas = base.map { case (seg, n, q0, _) =>
      (seg, math.min(q0 + (if (bump(seg)) 1L else 0L), n))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val quotaDf = quotas.toSeq.toDF("__seg", "__quota")
    val draw = pmod(pmod(col(idCol).cast("long"), lit(P)) * lit(A), lit(P))
    val rk = row_number().over(
      Window.partitionBy(col("__seg")).orderBy(draw, col(idCol)))
    nonNull.withColumn("__seg", col(segCol).cast("string"))
      .withColumn("__rk", rk)
      .join(broadcast(quotaDf), "__seg")
      .filter(col("__rk") <= col("__quota"))
      .drop("__seg", "__rk", "__quota")
  }
}

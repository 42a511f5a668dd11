package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.operators.ProductQuant

/** The codegen'd PQ kernels (PqCells / PqAdcDist) must be
  * VALUE-IDENTICAL to their composable HOF definitions — the HOF forms
  * define the semantics (and the DuckDB oracles); the kernels run the
  * hot paths. Same contract as HashEquivalenceSpec.
  */
class PqEquivalenceSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private lazy val books =
    ProductQuant.trainCodebooks(emb, "vec_id", "embedding", 8, 16, iters = 2)

  test("PqCells == the per-subspace argmin HOF definition") {
    val fast = emb.select(col("vec_id"),
      ProductQuant.pqCodes(col("embedding"), books).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = emb.select(col("vec_id"),
      ProductQuant.pqCodesHof(col("embedding"), books).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fast === hof)
  }

  test("PqAdcDist == the literal-LUT HOF definition, bit-for-bit") {
    val withCodes = emb.select(col("vec_id"), col("embedding"),
      ProductQuant.pqCodes(col("embedding"), books).as("c"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pairs = withCodes.crossJoin(broadcast(q))
    val fast = pairs.select(col("qid"), col("vec_id"),
      ProductQuant.adcDist(col("qv"), col("c"), books).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hof = pairs.select(col("qid"), col("vec_id"),
      ProductQuant.adcDistHof(col("qv"), col("c"), books).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fast.size === hof.size)
    fast.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(hof(k)), s"pair $k")
    }
  }
}

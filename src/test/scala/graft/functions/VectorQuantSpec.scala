package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

class VectorQuantSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("dequantization error is bounded by scale/2 per element") {
    import VectorQuant._
    val checked = emb
      .withColumn("scale", quantScale(col("embedding")))
      .withColumn("deq", dequantize(quantize(col("embedding"), col("scale")), col("scale")))
      .withColumn("max_err",
        array_max(zip_with(col("embedding"), col("deq"),
          (x, y) => abs(x.cast("double") - y))))
      .select(max(col("max_err") - col("scale") * 0.5000001).as("worst"))
      .head().getDouble(0)
    assert(checked <= 0.0, s"reconstruction error exceeds scale/2 by $checked")
  }

  test("quantized cosine tracks exact cosine within a few percent") {
    import VectorQuant._
    val deq = emb
      .withColumn("scale", quantScale(col("embedding")))
      .withColumn("deq", dequantize(quantize(col("embedding"), col("scale")), col("scale")))
    val pair = deq.filter(col("vec_id") < 2).collect()
    val a = pair(0).getSeq[Float](pair(0).fieldIndex("embedding")).map(_.toDouble)
    val b = pair(1).getSeq[Float](pair(1).fieldIndex("embedding")).map(_.toDouble)
    val aq = pair(0).getSeq[Double](pair(0).fieldIndex("deq"))
    val bq = pair(1).getSeq[Double](pair(1).fieldIndex("deq"))
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    assert(math.abs(cos(a, b) - cos(aq, bq)) < 0.03)
  }
}

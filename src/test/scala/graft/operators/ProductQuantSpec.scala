package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

class ProductQuantSpec extends SparkSpec {

  private val M = 8
  private val Ksub = 16

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private lazy val books =
    ProductQuant.trainCodebooks(emb, "vec_id", "embedding", M, Ksub, iters = 2)

  test("codebooks have the declared shape and finite centroids") {
    assert(books.length === M)
    books.foreach { b =>
      assert(b.map(_._1) === (0 until Ksub))
      b.foreach { case (_, c) =>
        assert(c.length === 64 / M)
        assert(c.forall(x => !x.isNaN && !x.isInfinite))
      }
    }
  }

  test("codes are in range and deterministic under repartitioning") {
    val codes = emb.select(col("vec_id"),
      ProductQuant.pqCodes(col("embedding"), books).as("c"))
    val a = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = emb.repartition(13)
      .select(col("vec_id"), ProductQuant.pqCodes(col("embedding"), books).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a === b)
    a.values.foreach(c => assert(c.length === M && c.forall(x => x >= 0 && x < Ksub)))
  }

  test("with zero iterations, each seed vector codes to its own cell") {
    val seedBooks =
      ProductQuant.trainCodebooks(emb, "vec_id", "embedding", M, Ksub, iters = 0)
    val n = emb.count()
    val every = math.max(n / Ksub, 1L)
    val seeds = emb.filter(pmod(col("vec_id"), lit(every)) === 0)
      .orderBy(col("vec_id")).limit(Ksub)
    val got = seeds
      .select(ProductQuant.pqCodes(col("embedding"), seedBooks).as("c"))
      .collect().map(_.getSeq[Int](0))
    got.zipWithIndex.foreach { case (c, cell) =>
      assert(c === Seq.fill(M)(cell), s"seed $cell")
    }
  }

  test("packed code is a bijection of the code array") {
    val codes = emb.select(
      ProductQuant.pqCodes(col("embedding"), books).as("c"))
      .withColumn("p", ProductQuant.packedCode(col("c"), M, Ksub))
    val rows = codes.collect().map(r => (r.getSeq[Int](0), r.getLong(1)))
    rows.foreach { case (c, p) =>
      assert(p === c.zipWithIndex.map { case (x, i) =>
        x.toLong * math.pow(Ksub, i).toLong }.sum)
    }
    assert(rows.map(_._1).distinct.length === rows.map(_._2).distinct.length)
  }

  test("ADC self-distance beats cross-distance (compression is faithful)") {
    // dist(v, codes(v)) averaged over the corpus must be well below
    // dist(v, codes(w)) for a fixed unrelated w — the quantizer keeps
    // vectors near their own reconstruction
    val withCodes = emb.select(col("vec_id"), col("embedding"),
      ProductQuant.pqCodes(col("embedding"), books).as("c"))
    val self = withCodes
      .select(avg(ProductQuant.adcDist(col("embedding"), col("c"), books)))
      .head().getDouble(0)
    val other = withCodes.as("a")
      .join(withCodes.as("b"), col("a.vec_id") === (col("b.vec_id") + 250) % 500)
      .select(avg(ProductQuant.adcDist(col("a.embedding"), col("b.c"), books)))
      .head().getDouble(0)
    assert(self < other * 0.8, s"self $self vs other $other")
  }

  private def exactTop10(queries: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d").asc, col("vec_id"))
    emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("d", graft.functions.VectorOps.distSq(col("embedding"), col("qv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  // NEAR-UNIFORM synthetic embeddings are PQ's worst case (no cluster
  // structure for the codebooks to exploit): measured recall@10 is
  // 0.23 for raw 32-bit ADC and 0.74 with the 8x-shortlist re-rank —
  // the floors pin those measured levels so a quantizer change cannot
  // silently degrade either path (the PQ analog of IvfRecallFloorSpec).
  test("raw ADC top-10 holds its measured recall floor") {
    val queries = emb.filter(col("vec_id") < 20)
    val adc = ProductQuant.searchAdc(
      emb, queries, "vec_id", "vec_id", "embedding", k = 10, books)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = exactTop10(queries)
    val recalls = adc.keys.toSeq.map(k => adc(k).intersect(exact(k)).size / 10.0)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.15, s"mean ADC recall@10 $mean")
  }

  test("IVF-PQ probes a cell subset and stays deterministic") {
    val queries = emb.filter(col("vec_id") < 20)
    def run(c: org.apache.spark.sql.DataFrame) = ProductQuant.searchIvfAdcRerank(
      c, queries, "vec_id", "vec_id", "embedding", k = 10, books,
      nlist = 16, nprobe = 4, shortlistFactor = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val a = run(emb)
    assert(a.nonEmpty)
    assert(a === run(emb.repartition(9)))
    // the composed path cannot beat its probe fraction, but with 4/16
    // cells probed it must still land a usable share of exact top-10
    val got = a.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val exact = exactTop10(queries)
    val recalls = got.keys.toSeq.map(k => got(k).intersect(exact(k)).size / 10.0)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.2, s"mean IVF-PQ recall@10 $mean")
  }

  test("shortlist + exact re-rank recovers most of exact top-10") {
    val queries = emb.filter(col("vec_id") < 20)
    val rr = ProductQuant.searchAdcRerank(
      emb, queries, "vec_id", "vec_id", "embedding", k = 10, books,
      shortlistFactor = 8)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = exactTop10(queries)
    val recalls = rr.keys.toSeq.map(k => rr(k).intersect(exact(k)).size / 10.0)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.6, s"mean re-rank recall@10 $mean")
  }
}

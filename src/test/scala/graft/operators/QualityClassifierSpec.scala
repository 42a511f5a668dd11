package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** QualityClassifier: learning direction on a separable corpus,
  * bit-determinism across runs, bias-only scoring for empty docs,
  * and the broadcast-model plan shape.
  */
class QualityClassifierSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // separable: positives carry quality markers, negatives spam
    // markers, both share filler so the shared buckets carry no label
    // signal on their own
    val pos = (0 until 30).map(i =>
      (i.toLong, s"filler common words excellent wonderful insightful prose number $i", 1))
    val neg = (100 until 130).map(i =>
      (i.toLong, s"filler common words spam junk garbage clickbait number $i", 0))
    (pos ++ neg).toDF("doc_id", "text", "lab")
  }

  test("separable corpus: positives outscore negatives after training") {
    val scored = QualityClassifier.trainAndScore(
      spark, corpus, "doc_id", "text", "lab", buckets = 128, iters = 3)
    val byClass = scored.join(corpus.select("doc_id", "lab"), "doc_id")
      .groupBy("lab").agg(avg(col("quality_micro")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byClass(1) > byClass(0) + 100000.0,
      s"positives ${byClass(1)} must clearly outscore negatives ${byClass(0)}")
  }

  test("training is bit-deterministic across runs") {
    val m1 = QualityClassifier.train(
      spark, corpus, "doc_id", "text", "lab", buckets = 128, iters = 2)
    val m2 = QualityClassifier.train(
      spark, corpus, "doc_id", "text", "lab", buckets = 128, iters = 2)
    assert(m1.bias == m2.bias)
    assert(m1.weights.sameElements(m2.weights))
  }

  test("a document with no tokens gets the bias-only score") {
    import spark.implicits._
    val docs = corpus.unionByName(
      Seq((999L, "", 0)).toDF("doc_id", "text", "lab"))
    val model = QualityClassifier.train(
      spark, docs, "doc_id", "text", "lab", buckets = 128, iters = 2)
    val empty = QualityClassifier.score(spark, docs, "doc_id", "text", model)
      .filter(col("doc_id") === 999L).head().getLong(1)
    val expected = math.floor(
      1e6 / (1.0 + math.exp(-(model.bias.toDouble / 1e6)))).toLong
    assert(empty == expected)
  }

  test("scoring broadcasts the model — no shuffle of the weight side") {
    val model = QualityClassifier.train(
      spark, corpus, "doc_id", "text", "lab", buckets = 128, iters = 1)
    val scored = QualityClassifier.score(spark, corpus, "doc_id", "text", model)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight join must broadcast, got:\n$plan")
  }
}

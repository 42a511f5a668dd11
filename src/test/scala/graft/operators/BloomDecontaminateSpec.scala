package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today")
  ).toDF("doc_id", "text")

  test("no false negatives: a doc sharing an eval n-gram is always dropped") {
    val train = Seq(
      (10L, "he said the quick brown fox jumps over the lazy dog and left"),
      (11L, "completely unrelated text about distributed query engines and shuffles plus padding words here"))
      .toDF("doc_id", "text")
    val kept = BloomDecontaminate.decontaminate(train, evalDocs, "doc_id", "text", n = 8)
      .select($"doc_id").as[Long].collect().toSet
    assert(!kept.contains(10L))
  }

  test("a huge filter over a tiny eval set drops nothing unrelated") {
    val train = (0 until 50).map(i =>
      (i.toLong, s"unique document number $i talking about topic ${i * 31} with enough words to shingle"))
      .toDF("doc_id", "text")
    val kept = BloomDecontaminate.decontaminate(train, evalDocs, "doc_id", "text",
      n = 8, mBits = 1 << 22)
      .count()
    assert(kept === 50)
  }

  test("drop set is partitioning-invariant (false positives deterministic)") {
    val train = (0 until 200).map(i =>
      (i.toLong, s"doc $i with some shared phrasing the quick brown ${i % 7} and filler filler"))
      .toDF("doc_id", "text")
    def run(parts: Int) = BloomDecontaminate.decontaminate(
        train.repartition(parts), evalDocs, "doc_id", "text", n = 4, mBits = 256)
      .select($"doc_id").as[Long].collect().toSet
    assert(run(1) === run(17))
  }

  test("probe side is a pure scan predicate — no shuffle, no join") {
    val train = Seq((1L, "some text here")).toDF("doc_id", "text")
    val plan = BloomDecontaminate.decontaminate(train, evalDocs, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("empty or null text is kept, not crashed on") {
    val train = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ok words"))
      .toDF("doc_id", "text")
    val kept = BloomDecontaminate.decontaminate(train, evalDocs, "doc_id", "text", n = 8)
      .count()
    assert(kept === 3)
  }
}

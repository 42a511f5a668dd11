package graft.operators

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies all four statuses from id presence + fingerprint") {
    val before = Seq((1L, "same"), (2L, "old text"), (3L, "goes away"))
      .toDF("doc_id", "text")
    val after = Seq((1L, "same"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(before, after, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val sums = CorpusDiff.diffSummary(before, after, "doc_id", "text")
      .select($"status", $"n_docs").as[(String, Long)].collect().toMap
    assert(sums === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("identical corpora diff to all-unchanged; text never shuffles") {
    val docs = (1L to 50L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val d = CorpusDiff.diff(docs, docs, "doc_id", "text")
    assert(d.filter($"status" =!= "unchanged").count() === 0)
    // the exchange carries only id + fingerprint, not the text column
    val shuffleLines = d.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffleLines.nonEmpty && shuffleLines.forall(!_.contains("text")),
      shuffleLines.mkString("\n"))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana date"),
    (3L, "apple elderberry elderberry elderberry"),
    (4L, "")).toDF("doc_id", "text")

  test("scores match a hand-computed tf*idf and rank deterministically") {
    val out = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"rnk").collect()
    // df: apple 2, banana 2, cherry 1, date 1, elderberry 1; N = 4
    def idf(df: Long): Long =
      math.floor(1e6 * math.log(5.0 / (df + 1.0))).toLong
    // doc 1: apple tf2*idf(2), banana 1*idf(2), cherry 1*idf(1)
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getString(2), r.getLong(4))).toSeq ===
      Seq("apple" -> 2 * idf(2), "cherry" -> idf(1)))
    // doc 3: elderberry 3*idf(1) beats apple 1*idf(2)
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.head.getString(2) === "elderberry")
    assert(d3.head.getLong(4) === 3 * idf(1))
  }

  test("empty documents yield no keyword rows; k bounds per-doc rows") {
    val out = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
    assert(out.filter($"doc_id" === 4L).count() === 0)
    assert(out.groupBy($"doc_id").count().agg(max("count")).head.getLong(0) === 1L)
  }

  test("equal-score ties break on term ascending") {
    val tied = Seq((1L, "zebra yak"), (2L, "zebra yak")).toDF("doc_id", "text")
    // both terms: tf 1, df 2 -> identical scores; term order decides
    val out = TfIdf.topTerms(tied, "doc_id", "text", k = 2)
      .filter($"doc_id" === 1L).orderBy($"rnk").collect()
    assert(out.map(_.getString(2)).toSeq === Seq("yak", "zebra"))
  }

  test("hot/cold split agrees with itself (hotTerms = 0 forces cold path)") {
    val a = TfIdf.topTerms(docs, "doc_id", "text", k = 3, hotTerms = 1024)
      .orderBy($"doc_id", $"rnk").collect().toSeq
    // the two variants share persisted subtrees — drain between them
    graft.core.CacheBin.drain()
    val b = TfIdf.topTerms(docs, "doc_id", "text", k = 3, hotTerms = 0)
      .orderBy($"doc_id", $"rnk").collect().toSeq
    assert(a === b)
  }
}

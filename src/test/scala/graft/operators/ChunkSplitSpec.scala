package graft.operators

import graft.SparkSpec

class ChunkSplitSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) = Seq((1L, (1 to n).map(i => s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  private def chunks(n: Int, c: Int, o: Int): Seq[(Int, String, Long)] =
    ChunkSplit.chunkByTokens(doc(n), "doc_id", "text", c, o)
      .select($"chunk_idx", $"chunk_text", $"n_chunk_tokens")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq

  test("overlapping chunks: starts advance by step, every token covered") {
    val got = chunks(n = 10, c = 4, o = 1) // step 3: starts 0,3,6
    assert(got.map(_._1) === Seq(0, 1, 2))
    assert(got.map(_._3) === Seq(4L, 4L, 4L))
    assert(got(0)._2 === "w1 w2 w3 w4" && got(1)._2 === "w4 w5 w6 w7")
    assert(got(2)._2 === "w7 w8 w9 w10") // the tail token IS covered
    // consecutive chunks share exactly `overlap` tokens
    assert(got(0)._2.split(" ").last === got(1)._2.split(" ").head)
  }

  test("zero overlap partitions the token stream exactly") {
    val got = chunks(n = 10, c = 4, o = 0)
    assert(got.map(_._3) === Seq(4L, 4L, 2L))
    assert(got.flatMap(_._2.split(" ")) === (1 to 10).map(i => s"w$i"))
  }

  test("short and empty docs") {
    assert(chunks(n = 2, c = 8, o = 2) === Seq((0, "w1 w2", 2L)))
    assert(ChunkSplit.chunkByTokens(
      Seq((1L, "   ")).toDF("doc_id", "text"), "doc_id", "text", 8, 2).count() === 0)
  }

  test("no chunk ever adds zero new tokens") {
    // 6 tokens, chunk 4, overlap 2 -> step 2: starts 0,2 — a chunk at
    // start 4 (w5 w6) would sit entirely inside chunk 1's coverage
    val got = chunks(n = 6, c = 4, o = 2)
    assert(got.map(_._1) === Seq(0, 1))
    assert(got.map(_._2) === Seq("w1 w2 w3 w4", "w3 w4 w5 w6"))
    // a short tail that DOES carry a new token is still emitted
    assert(chunks(n = 7, c = 4, o = 2).map(_._2).last === "w5 w6 w7")
  }
}

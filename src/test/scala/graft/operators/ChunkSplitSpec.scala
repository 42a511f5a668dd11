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

  test("overlapping chunks: starts advance by step, tail may be short") {
    val got = chunks(n = 10, c = 4, o = 1) // step 3: starts 0,3,6,9
    assert(got.map(_._1) === Seq(0, 1, 2, 3))
    assert(got.map(_._3) === Seq(4L, 4L, 4L, 1L))
    assert(got(0)._2 === "w1 w2 w3 w4" && got(1)._2 === "w4 w5 w6 w7")
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

  test("no trailing empty chunk when the last start would pass the end") {
    // 6 tokens, chunk 4, overlap 2 -> step 2: starts 0,2,4 (6 excluded)
    val got = chunks(n = 6, c = 4, o = 2)
    assert(got.map(_._1) === Seq(0, 1, 2))
    assert(got.last._3 === 2L)
  }
}

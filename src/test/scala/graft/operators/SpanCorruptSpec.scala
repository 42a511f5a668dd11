package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.SpanCorruptExpr

import graft.SparkSpec
import graft.catalog.Tables

class SpanCorruptSpec extends SparkSpec {

  private val P = 1000000007L

  /** In-memory reference of the per-token skip-counter rule. */
  private def ref(text: String, docId: Long, startEvery: Int = 13,
      maxSpan: Int = 3, maxExtra: Int = 100): (List[String], List[String]) = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toList
    val inp = List.newBuilder[String]; val tgt = List.newBuilder[String]
    var skip = 0; var k = 0
    toks.zipWithIndex.foreach { case (t, i) =>
      if (skip > 0) { tgt += t; skip -= 1 }
      else {
        val m = ((docId % P) * 131 + i) % P * 2654435761L % P
        val draw = (m ^ (m >> 15)) * 2654435761L % P
        if (k < maxExtra && draw % startEvery == 0) {
          inp += s"<extra_id_$k>"; tgt += s"<extra_id_$k>"; tgt += t
          skip = (1 + ((draw / startEvery) % maxSpan).toInt) - 1
          k += 1
        } else inp += t
      }
    }
    (inp.result(), tgt.result())
  }

  private def run(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        SpanCorruptExpr.corruptCol(col("text"), col("doc_id")).as("c"))
      .select(col("doc_id"), col("c.input").as("i"), col("c.target").as("t"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1).toList, r.getSeq[String](2).toList))
      .toMap
  }

  test("matches the reference rule on the real corpus sample") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = run(docs.toSeq)
    docs.foreach { case (id, text) =>
      assert(got(id) === ref(text, id), s"doc $id")
    }
    // corruption actually happens somewhere
    assert(got.values.exists(_._2.nonEmpty))
  }

  test("sentinels pair up between input and target, in order") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(50)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = run(docs.toSeq)
    got.values.foreach { case (inp, tgt) =>
      val sIn = inp.filter(_.startsWith("<extra_id_"))
      val sTg = tgt.filter(_.startsWith("<extra_id_"))
      assert(sIn === sTg)
      assert(sIn === sIn.indices.map(i => s"<extra_id_$i>"))
    }
  }

  test("span tokens are removed from input and preserved in target") {
    val docs = Seq((7L, "alpha beta gamma delta epsilon zeta eta theta " * 8))
    val got = run(docs)
    val (inp, tgt) = got(7L)
    val orig = docs.head._2.toLowerCase.split("\\s+").filter(_.nonEmpty).toList
    val restoredLen = inp.count(!_.startsWith("<extra_id_")) +
      tgt.count(!_.startsWith("<extra_id_"))
    assert(restoredLen === orig.length)
  }

  test("extreme doc ids stay overflow-free and match the reference") {
    // |doc_id| > ~7e16 used to wrap docId*131 on the JVM (and would
    // error in DuckDB); the mod-P reduction keeps both sides exact.
    val ids = Seq(Long.MaxValue, Long.MaxValue - 1, 9000000000000000L)
    val text = "alpha beta gamma delta epsilon zeta eta theta " * 8
    val got = run(ids.map(id => (id, text)))
    ids.foreach(id => assert(got(id) === ref(text, id), s"doc $id"))
  }

  test("empty and whitespace-only text produce empty pairs") {
    val got = run(Seq((1L, ""), (2L, " \t \n ")))
    assert(got(1L) === (Nil, Nil) && got(2L) === (Nil, Nil))
  }

  test("deterministic under repartitioning") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        SpanCorruptExpr.corruptCol(col("text"), col("doc_id")).as("c"))
    val a = docs.collect().map(r => r.getLong(0) -> r.getStruct(1).toString()).toMap
    val b = docs.repartition(7).collect()
      .map(r => r.getLong(0) -> r.getStruct(1).toString()).toMap
    assert(a === b)
  }
}

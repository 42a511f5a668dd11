package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Paragraph-grain near-dup dedup: templated paragraphs differing by a
  * token drop everywhere but their first occurrence, exact twins too,
  * within-doc repeats too; unique paragraphs and blank units survive;
  * the rebuild preserves unit order; deterministic under partitioning.
  */
class NearDupParagraphSpec extends SparkSpec {

  private val sep = "\n\n"
  private val intro = "templated intro welcome to our site page number"
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, s"alpha unique opening paragraph one$sep$intro seven${sep}alpha closing thoughts"),
      (2L, s"beta body paragraph here$sep$intro nine${sep}beta conclusion paragraph"),
      (3L, s"gamma same para text repeated twice${sep}gamma same para text repeated twice"),
      (4L, s"delta first part$sep${sep}delta second part"))
      .toDF("doc_id", "text")
  }

  private lazy val out = LineCuration
    .stripNearDupParagraphs(docs, "doc_id", "text", threshold = 0.5)
    .collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("near-dup templated paragraphs drop after their first occurrence") {
    // doc 1 keeps everything (its intro is the FIRST occurrence)
    assert(out(1L)._2 == 0L, s"doc 1 must keep all units: ${out(1L)}")
    assert(out(1L)._3.contains(s"$intro seven"))
    // doc 2's intro differs by one trailing token — near-dup, dropped
    assert(out(2L) == ((3L, 1L,
      s"beta body paragraph here${sep}beta conclusion paragraph")),
      out(2L).toString)
  }

  test("within-doc exact repeat drops its later copy") {
    assert(out(3L) == ((2L, 1L, "gamma same para text repeated twice")),
      out(3L).toString)
  }

  test("blank units never participate and never drop") {
    // "a\n\n\n\nb" splits to [a, '', b]: the empty middle survives
    assert(out(4L) == ((3L, 0L,
      s"delta first part$sep${sep}delta second part")), out(4L).toString)
  }

  test("deterministic under repartitioning") {
    val again = LineCuration
      .stripNearDupParagraphs(docs.repartition(7), "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(again == out)
  }
}

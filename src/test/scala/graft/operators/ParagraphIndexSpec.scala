package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The paragraph band-key index on its own (the streaming ingest case
  * lives in IngestDedupSpec): artifact discipline, probe semantics,
  * and the batch-twin agreement at operator grain.
  */
class ParagraphIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pidx_$tag").toString

  private val template =
    "subscribe to our weekly newsletter for updates offers and community news every single week"

  test("strip removes near-dup paragraphs, keeps unique/blank/short ones") {
    val pidx = freshDir("strip") + "/idx"
    val ref = Seq(
      (1L, s"reference page alpha body content\n\n$template"),
      (2L, s"$template\n\nreference beta page story"))
      .toDF("doc_id", "text")
    val n = ParagraphIndex.writeParagraphIndex(
      ref, "doc_id", "text", pidx, threshold = 0.5)
    assert(n > 0)
    graft.core.CacheBin.drain()
    val f = ParagraphIndex.loadFilter(spark, pidx)
    val edited = template.replace("week", "month")
    val incoming = Seq(
      (10L, s"totally original gamma essay opening\n\n$edited"),
      // blank paragraph (double separator) + a too-short-to-shingle one
      (11L, s"one two\n\n\n\nanother wholly unique delta paragraph body"),
      (12L, template))
      .toDF("doc_id", "text")
    val got = incoming
      .withColumn("clean", ParagraphIndex.stripParagraphsExpr(col("text"), f))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(10L) === "totally original gamma essay opening",
      s"edited template must strip: ${got(10L)}")
    // blanks and sub-shingle paragraphs never participate, never drop
    assert(got(11L) === "one two\n\n\n\nanother wholly unique delta paragraph body")
    assert(got(12L) === "", "an exact template copy strips entirely")
  }

  test("agrees with the verified batch twin on a template corpus") {
    val pidx = freshDir("twin") + "/idx"
    val ref = Seq(
      (1L, s"first page content here\n\n$template"),
      (2L, s"second page content there\n\n$template"))
      .toDF("doc_id", "text")
    ParagraphIndex.writeParagraphIndex(ref, "doc_id", "text", pidx, 0.5)
    graft.core.CacheBin.drain()
    val f = ParagraphIndex.loadFilter(spark, pidx)
    val incoming = Seq(
      (10L, s"fresh unique travel report on coastal ferries\n\n${template.replace("offers", "deals")}"),
      (11L, "entirely unrelated essay about glacier formation and moraine deposits"))
      .toDF("doc_id", "text")
    val stream = incoming
      .withColumn("clean", ParagraphIndex.stripParagraphsExpr(col("text"), f))
      .select($"doc_id", $"clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val twin = LineCuration.stripNearDupParagraphsAgainst(
      incoming, ref, "doc_id", "text", threshold = 0.5)
      .select($"doc_id", $"clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(stream === twin, s"stream=$stream twin=$twin")
    assert(!stream(10L).contains("newsletter"))
  }

  test("loadFilter rejects a foreign artifact") {
    val dir = freshDir("meta")
    // a LineIndex artifact is NOT a paragraph index
    LineIndex.writeLineIndex(
      Seq((1L, "a\na"), (2L, "a\nb")).toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/lineidx", minDocFreq = 2)
    graft.core.CacheBin.drain()
    val e = intercept[IllegalArgumentException] {
      ParagraphIndex.loadFilter(spark, s"$dir/lineidx")
    }
    assert(e.getMessage.contains("paragraph-band-index"))
  }
}

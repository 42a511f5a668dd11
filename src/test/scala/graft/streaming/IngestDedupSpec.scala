package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.TextDedup

/** The durable ingest-dedup loop running as a REAL stream: an index
  * seeded from an empty corpus, micro-batches screened against it,
  * survivors appended to the output corpus and the index — so later
  * batches are screened against earlier admissions.
  */
final case class IngestDoc(doc_id: Long, text: String)

class IngestDedupSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_ingest_$tag").toString

  test("admitted docs suppress later copies across micro-batches; output corpus accumulates survivors") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx") + "/index"
    val out = freshDir("out") + "/corpus"
    val ckp = freshDir("ckp")
    // seed an index from an EMPTY corpus: first batch screens against nothing
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5)
    try {
      // batch 1: two distinct docs plus an in-batch exact copy of the first
      src.addData(
        IngestDoc(1L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(2L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(3L, "one two three four five six seven"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after1 === Set(1L, 3L)) // in-batch copy kept the lower id
      // batch 2: a copy of an admitted doc drops; a new doc is admitted
      src.addData(
        IngestDoc(10L, "one two three four five six seven"),
        IngestDoc(11L, "completely different content arrives here now"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after2 === Set(1L, 3L, 11L))
    } finally q.stop()
  }

  test("admitBatch returns the admitted count and appends to the index") {
    import spark.implicits._
    val idx = freshDir("idx2") + "/index"
    val out = freshDir("out2") + "/corpus"
    TextDedup.writeDedupIndex(
      Seq(IngestDoc(1L, "alpha beta gamma delta epsilon zeta")).toDF(),
      "doc_id", "text", idx)
    val n1 = IngestDedup.admitBatch(
      Seq(IngestDoc(2L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(3L, "one two three four five six seven")).toDF(),
      "doc_id", "text", idx, out, threshold = 0.5, batchId = 1L)
    assert(n1 === 1L)
    // the admitted doc 3 now lives in the index: its copy is rejected
    val n2 = IngestDedup.admitBatch(
      Seq(IngestDoc(4L, "one two three four five six seven")).toDF(),
      "doc_id", "text", idx, out, threshold = 0.5, batchId = 2L)
    assert(n2 === 0L)
    assert(spark.read.parquet(out).count() === 1L)
  }

  test("replaying a committed batch is idempotent (crash-recovery contract)") {
    import spark.implicits._
    val idx = freshDir("idx3") + "/index"
    val out = freshDir("out3") + "/corpus"
    val batch = Seq(
      IngestDoc(1L, "alpha beta gamma delta epsilon zeta"),
      IngestDoc(2L, "one two three four five six seven")).toDF()
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val n1 = IngestDedup.admitBatch(batch, "doc_id", "text", idx, out,
      threshold = 0.5, batchId = 7L)
    // simulate the checkpoint not committing: the SAME batch replays —
    // its rows are already in the index (self-excluded from screening)
    // and the per-batch output directory is overwritten, not appended
    val n2 = IngestDedup.admitBatch(batch, "doc_id", "text", idx, out,
      threshold = 0.5, batchId = 7L)
    assert(n1 === 2L && n2 === 2L)
    assert(spark.read.parquet(out).select($"doc_id").distinct().count() === 2L)
    assert(spark.read.parquet(out).count() === 2L) // no duplicate rows
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sfDir, "documents")
  private def tmpPath(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_dedup_index_$tag"

  test("screening against the index equals the in-plan incremental dedup") {
    val path = tmpPath("eq")
    val corpus = docs.filter($"doc_id" < 300)
    val incoming = docs.filter($"doc_id" >= 300)
    TextDedup.writeDedupIndex(corpus, "doc_id", "text", path)
    val viaIndex = TextDedup.dedupAgainstIndex(
      spark, path, incoming, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").orderBy($"doc_id").collect().toSeq
    graft.core.CacheBin.drain() // both paths persist the incoming shingles
    val inPlan = TextDedup.minhashDedupAgainst(
      incoming, corpus, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").orderBy($"doc_id").collect().toSeq
    assert(viaIndex === inPlan)
  }

  test("appended survivors suppress later copies; meta params are honored") {
    val path = tmpPath("append")
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    // non-default n proves screening reads its scheme from meta: a copy of
    // doc 1 only collides if the incoming side is shingled with the SAME n
    TextDedup.writeDedupIndex(corpus, "doc_id", "text", path, n = 2)
    val batch1 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // copy of doc 1
      (11L, "one two three four five six seven")).toDF("doc_id", "text")
    val s1 = TextDedup.dedupAgainstIndex(
      spark, path, batch1, "doc_id", "text", threshold = 0.5)
    assert(s1.select($"doc_id").collect().map(_.getLong(0)).toSet === Set(11L))
    graft.core.CacheBin.drain() // each screen/append persists its shingle frame
    // admit batch-1 survivors, then a copy of doc 11 must drop
    TextDedup.appendToDedupIndex(spark, path, s1, "doc_id", "text")
    graft.core.CacheBin.drain()
    val batch2 = Seq(
      (20L, "one two three four five six seven"), // copy of appended doc 11
      (21L, "completely different text here entirely")).toDF("doc_id", "text")
    val s2 = TextDedup.dedupAgainstIndex(
      spark, path, batch2, "doc_id", "text", threshold = 0.5)
    assert(s2.select($"doc_id").collect().map(_.getLong(0)).toSet === Set(21L))
  }

  test("compaction shrinks file count, preserves content, and screening is unchanged") {
    import spark.implicits._
    val path = tmpPath("compact")
    TextDedup.writeDedupIndex(docs.filter($"doc_id" < 200), "doc_id", "text", path)
    // fragment: five appended generations of small files
    (0 until 5).foreach { i =>
      TextDedup.appendToDedupIndex(spark,
        path, docs.filter($"doc_id" >= 200 + i * 20 && $"doc_id" < 220 + i * 20),
        "doc_id", "text")
    }
    def parquetFiles(dir: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    val incoming = docs.filter($"doc_id" >= 300)
    val before = TextDedup.dedupAgainstIndex(
      spark, path, incoming, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    graft.core.CacheBin.drain() // the post-compaction screen repeats this plan
    val bandRowsBefore = spark.read.parquet(s"$path/bands")
      .select($"doc_id", $"band", $"val").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val filesBefore = parquetFiles(s"$path/bands")
    TextDedup.compactDedupIndex(spark, path)
    assert(parquetFiles(s"$path/bands") < filesBefore)
    val bandRowsAfter = spark.read.parquet(s"$path/bands")
      .select($"doc_id", $"band", $"val").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(bandRowsAfter === bandRowsBefore)
    val after = TextDedup.dedupAgainstIndex(
      spark, path, incoming, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(after === before)
  }

  test("compaction folds replay-duplicate index rows") {
    val path = tmpPath("fold")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    TextDedup.writeDedupIndex(corpus, "doc_id", "text", path)
    // a crash-replayed batch re-appends the same rows verbatim
    TextDedup.appendToDedupIndex(spark, path, corpus, "doc_id", "text")
    assert(spark.read.parquet(s"$path/bands").count() === 16L) // 2 docs x 4 bands, twice
    assert(spark.read.parquet(s"$path/shingles").count() === 4L)
    TextDedup.compactDedupIndex(spark, path)
    assert(spark.read.parquet(s"$path/bands").count() === 8L)
    assert(spark.read.parquet(s"$path/shingles").count() === 2L)
    // screening still rejects copies of both docs after the fold
    val survivors = TextDedup.dedupAgainstIndex(spark, path,
      Seq((10L, "alpha beta gamma delta epsilon zeta"),
        (11L, "totally unrelated words occupy this row")).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5)
    assert(survivors.select($"doc_id").collect().map(_.getLong(0)).toSet === Set(11L))
  }

  test("band scan prunes on the partitioned band column") {
    val path = tmpPath("prune")
    TextDedup.writeDedupIndex(docs.filter($"doc_id" < 100), "doc_id", "text", path)
    // the bands table is laid out band=0..3; a single-band read scans
    // only that directory (static partition pruning)
    val one = spark.read.parquet(s"$path/bands").filter($"band" === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || one.count() > 0)
    val all = spark.read.parquet(s"$path/bands").select($"band").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(all === Set(0, 1, 2, 3))
  }
}

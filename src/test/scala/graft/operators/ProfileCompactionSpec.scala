package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.{Compaction, Tables}

/** Approx-profile accuracy bounds and compaction content preservation. */
class ProfileCompactionSpec extends SparkSpec {

  test("approxProfile estimates distinct counts within the declared rsd") {
    val docs = Tables.load(spark, sfDir, "documents")
    val exact = Profile.exactProfile(docs, Seq("lang", "source", "doc_id")).head()
    val approx = Profile.approxProfile(docs, Seq("lang", "source", "doc_id"),
      numericCols = Seq("n_chars"), rsd = 0.02).head()
    Seq("lang", "source", "doc_id").foreach { c =>
      val e = exact.getAs[Long](s"distinct_$c").toDouble
      val a = approx.getAs[Long](s"distinct_$c").toDouble
      assert(math.abs(a - e) <= math.max(3 * 0.02 * e, 2.0), s"$c: approx $a vs exact $e")
      assert(approx.getAs[Long](s"nulls_$c") == exact.getAs[Long](s"nulls_$c"))
    }
    val quartiles = approx.getSeq[Double](approx.fieldIndex("quartiles_n_chars"))
    assert(quartiles.length == 3 && quartiles == quartiles.sorted)
  }

  test("compact preserves content and hits the computed file count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    docs.repartition(24).write.mode("overwrite").parquet(s"$dir/in")
    val inFiles = new java.io.File(s"$dir/in").listFiles().count(_.getName.endsWith(".parquet"))
    assert(inFiles == 24, s"setup expected 24 input files, got $inFiles")

    val n = Compaction.compact(spark, s"$dir/in", s"$dir/out",
      targetBytesPerFile = 512L * 1024)
    val outFiles = new java.io.File(s"$dir/out").listFiles().count(_.getName.endsWith(".parquet"))
    assert(outFiles == n && n < 24, s"wrote $outFiles files, planned $n")

    val a = docs.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$dir/out")
      .select("doc_id", "lang", "n_chars").orderBy("doc_id").collect().toSeq
    assert(a == b, "compaction changed content")
  }
}

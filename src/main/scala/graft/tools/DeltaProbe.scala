package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: attribute q_corpus_delta's cost across its phases. */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("delta-probe")
    val sfDir = "/root/testdata/sf0.1"
    import graft.operators.{CorpusPipeline, LineIndex, TextDedup}
    def time[A](label: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      println(f"[deltaprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") < 400)
    val delta = docs.filter(col("doc_id") >= 400)
    val idx = "/root/repo/target/tmp/probe_delta_index"
    val lidx = "/root/repo/target/tmp/probe_delta_lineindex"
    (1 to 2).foreach { rep =>
      time(s"rep$rep writeDedupIndex(old)")(
        TextDedup.writeDedupIndex(old, "doc_id", "text", idx, n = 3, h = 16, bands = 8))
      time(s"rep$rep writeLineIndex(old)")(
        LineIndex.writeLineIndex(old, "doc_id", "text", lidx, minDocFreq = 2))
      val cfg = CorpusPipeline.Config(langs = Seq("en", "de", "fr"),
        minChars = 100, jaccardThreshold = 0.5,
        lineDedupMinDocFreq = 2, boilerMinDocFreq = 999)
      // prepareDelta phases, mirrored from the operator (attribution only)
      def stage(df: org.apache.spark.sql.DataFrame) =
        graft.core.CacheBin.trackCheckpoint(df.localCheckpoint(true))
      val langed = delta
      val inDelta = time(s"rep$rep clean-within-delta (+cp)")(
        stage(graft.operators.CorpusClean.clean(stage(langed), cfg.langs,
          cfg.minChars, cfg.jaccardThreshold)))
      val screened = time(s"rep$rep dedupAgainstIndex (+cp)")(
        stage(TextDedup.dedupAgainstIndex(spark, idx, inDelta, "doc_id", "text",
          cfg.jaccardThreshold)))
      val linded1 = time(s"rep$rep stripDuplicateLines join (+cp via next)")(
        screened.join(graft.operators.LineCuration.stripDuplicateLines(
          screened, "doc_id", "text", cfg.lineDedupMinDocFreq)
          .select(col("doc_id"), col("clean_text")), "doc_id")
          .drop("text").withColumnRenamed("clean_text", "text"))
      val f = LineIndex.loadFilter(spark, lidx)
      val linded = linded1.withColumn("text",
        LineIndex.stripLinesExpr(col("text"), f))
      val boilIn = time(s"rep$rep boilIn checkpoint")(stage(linded))
      val boiled = time(s"rep$rep boilerplate strip + q1 + cp")(
        stage(boilIn.join(graft.operators.Boilerplate.strip(boilIn, "doc_id", "text",
          cfg.boilerWindow, cfg.boilerMinDocFreq)
          .select(col("doc_id"), col("clean_text")), "doc_id")
          .drop("text").withColumnRenamed("clean_text", "text")
          .filter(graft.functions.TextAnalysis.qualityScore(col("text")) >= cfg.minQuality)))
      println(s"[deltaprobe] rep$rep rows=${boiled.count()}")
      graft.core.CacheBin.drain()
    }
    spark.stop()
  }
}

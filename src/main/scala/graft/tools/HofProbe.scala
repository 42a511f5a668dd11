package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: isolate the cost of the classifier margin expression forms
  * over the sf0.1 documents table.
  */
object HofProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("hof-probe")
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val toks = graft.functions.TextAnalysis.tokens(col("text"))
    val hashes = concat(
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 1),
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 2))
    val buckets = 512
    time("tokens size")(docs.select(size(toks)))
    time("hashes size")(docs.select(size(hashes)))
    val bArr = transform(coalesce(hashes, array().cast("array<long>")),
      h => pmod(h, lit(buckets.toLong)))
    time("transform pmod")(docs.select(size(bArr)))
    val model = graft.operators.QualityClassifier.Model(
      0L, Array.tabulate(buckets)(i => i.toLong))
    time("scoreExpr")(docs.select(
      graft.operators.QualityClassifier.scoreExpr(col("text"), model)))
    time("scoreExpr again")(docs.select(
      graft.operators.QualityClassifier.scoreExpr(col("text"), model)))
    val wLit = lit(model.weights)
    time("aggregate elem_at over bArr")(docs.select(
      aggregate(bArr, lit(0L), (acc, b) => acc + element_at(wLit, (b + 1).cast("int")))))
    time("aggregate plain sum over bArr")(docs.select(
      aggregate(bArr, lit(0L), (acc, b) => acc + b)))
    time("explode bArr count")(docs.select(explode(bArr)).groupBy("col").count())
    spark.stop()
  }
}

object HofProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("hof-probe2")
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .withColumn("__lab", (col("source") === "src0").cast("int"))
    var t0 = System.nanoTime()
    val m = graft.operators.QualityClassifier.train(
      spark, docs, "doc_id", "text", "__lab", buckets = 512, iters = 1)
    println(f"[probe2] train iters=1: ${(System.nanoTime() - t0) / 1e9}%.2f s (bias=${m.bias})")
    t0 = System.nanoTime()
    val m2 = graft.operators.QualityClassifier.train(
      spark, docs, "doc_id", "text", "__lab", buckets = 512, iters = 2)
    println(f"[probe2] train iters=2: ${(System.nanoTime() - t0) / 1e9}%.2f s (bias=${m2.bias})")
    spark.stop()
  }
}

object HofProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("hof-probe3")
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .withColumn("__lab", (col("source") === "src0").cast("int"))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe3] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val buckets = 512
    val model = graft.operators.QualityClassifier.Model(
      0L, Array.fill(buckets)(0L))
    val toks = graft.functions.TextAnalysis.tokens(col("text"))
    val hashes = concat(
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 1),
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 2))
    val bucketArr = transform(coalesce(hashes, array().cast("array<long>")),
      h => pmod(h, lit(buckets.toLong)))
    val wLit = lit(model.weights)
    val margin = aggregate(bucketArr, lit(model.bias),
      (acc, b) => acc + element_at(wLit, (b + 1).cast("int")))
    val pm = floor(lit(1e6) / (lit(1.0) + exp(-(margin.cast("double") / lit(1e6))))).cast("long")
    val r = pm - col("__lab").cast("long") * lit(1000000L)
    time("select r only, count")(
      docs.select(r.as("__r")).queryExecution.toRdd.count())
    time("select r + explode, count")(
      docs.select(r.as("__r"), explode(concat(bucketArr, array(lit(-1L)))).as("bucket"))
        .queryExecution.toRdd.count())
    time("full gradient collect")(
      docs.select(r.as("__r"), explode(concat(bucketArr, array(lit(-1L)))).as("bucket"))
        .groupBy(col("bucket"))
        .agg(sum(col("__r").cast("decimal(38,0)")).as("__g")).collect())
    spark.stop()
  }
}

object HofProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("hof-probe4")
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .withColumn("__lab", (col("source") === "src0").cast("int"))
    def time(label: String)(f: => Array[org.apache.spark.sql.Row]): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val s = rows.map(r => r.getDecimal(1).longValueExact()).sum
      println(f"[probe4] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=${rows.length} sum=$s)")
    }
    val buckets = 512
    val model = graft.operators.QualityClassifier.Model(
      0L, Array.fill(buckets)(0L))
    val toks = graft.functions.TextAnalysis.tokens(col("text"))
    val hashes = concat(
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 1),
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 2))
    val bucketArr = transform(coalesce(hashes, array().cast("array<long>")),
      h => pmod(h, lit(buckets.toLong)))
    val wLit = lit(model.weights)
    val margin = aggregate(bucketArr, lit(model.bias),
      (acc, b) => acc + element_at(wLit, (b + 1).cast("int")))
    val pm = floor(lit(1e6) / (lit(1.0) + exp(-(margin.cast("double") / lit(1e6))))).cast("long")
    val r = pm - col("__lab").cast("long") * lit(1000000L)
    val ba = concat(bucketArr, array(lit(-1L)))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("bucket"))
      .agg(sum(col("__r").cast("decimal(38,0)")).as("__g")).collect()
    time("naive (collapsed)")(agg(
      docs.select(r.as("__r"), explode(ba).as("bucket"))))
    time("repartition barrier")(agg(
      docs.select(r.as("__r"), ba.as("__ba"))
        .repartition(col("__r"))
        .select(col("__r"), explode(col("__ba")).as("bucket"))))
    val idNd = udf((x: Long) => x).asNondeterministic()
    time("nondeterministic wrap")(agg(
      docs.select(idNd(r).as("__r"), explode(ba).as("bucket"))))
    time("struct-embedded explode")(agg(
      docs.select(explode(transform(ba, b => struct(b.as("bucket")))).as("s"), r.as("__r"))
        .select(col("__r"), col("s.bucket").as("bucket"))))
    spark.stop()
  }
}

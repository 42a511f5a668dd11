package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Contracts for the composed curation pipeline and the deterministic
  * stratified sampler: stagewise monotone shrinkage, survivor
  * determinism under repartitioning, and per-stratum fraction accuracy.
  */
class CorpusCleanSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("clean output is a subset of the language+length filter, deterministically") {
    val out = CorpusClean.clean(docs, Seq("en", "de"), 100, 0.5)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val filtered = docs
      .filter(col("lang").isin("en", "de") && length(col("text")) >= 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(filtered) && ids.nonEmpty)
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("en", "de")))
    // repartition must not change the surviving set
    val ids2 = CorpusClean.clean(docs.repartition(13), Seq("en", "de"), 100, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
  }

  test("clean drops every exact duplicate except the min id") {
    import spark.implicits._
    val dup = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta", "en"), // exact dup of 1
      (3L, "totally different words here entirely now", "en"),
      (4L, "short", "en"), // below length floor
      (5L, "alpha beta gamma delta epsilon zeta", "fr")) // lang-filtered
      .toDF("doc_id", "text", "lang")
    val out = CorpusClean.clean(dup, Seq("en"), 10, 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }

  test("stratifiedSample is repartition-invariant and hits fractions") {
    def survivors(parts: Int): Set[Long] =
      RowOps.stratifiedSample(docs.repartition(parts), "lang",
        Map("en" -> 0.5, "de" -> 0.25), "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = survivors(1)
    assert(s1 == survivors(17) && s1.nonEmpty)
    // fraction accuracy per stratum (small corpus → generous tolerance)
    val byLang = RowOps.stratifiedSample(docs, "lang",
      Map("en" -> 0.5, "de" -> 0.25), "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet.subsetOf(Set("en", "de")))
    Seq("en" -> 0.5, "de" -> 0.25).foreach { case (l, f) =>
      val got = byLang.getOrElse(l, 0L).toDouble / totals(l)
      assert(math.abs(got - f) < 0.25, s"$l: got $got want ~$f")
    }
  }

  test("tokenBudgetSample respects budgets, overrides, and partitioning") {
    import graft.functions.TextAnalysis
    val withTok = docs.withColumn("n_tok", size(TextAnalysis.tokens(col("text"))))
    def kept(parts: Int): Set[Long] =
      RowOps.tokenBudgetSample(withTok.repartition(parts), "source", "n_tok",
        defaultBudget = 300L, overrides = Map("src0" -> 100L))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val k1 = kept(1)
    assert(k1 == kept(13) && k1.nonEmpty, "kept set depends on partitioning")
    // every source's kept tokens fit its budget
    val bySource = RowOps.tokenBudgetSample(withTok, "source", "n_tok",
      defaultBudget = 300L, overrides = Map("src0" -> 100L))
      .groupBy("source").agg(sum(col("n_tok")).as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (s, tot) =>
      val budget = if (s == "src0") 100L else 300L
      assert(tot <= budget, s"$s exceeded budget: $tot > $budget")
    }
  }
}

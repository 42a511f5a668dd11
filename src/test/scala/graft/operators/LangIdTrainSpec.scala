package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trained char-n-gram language ID: learning actually separates
  * languages on a corpus with real signal (the synthetic documents
  * table is near-uniform across labels — the oracle there checks
  * determinism, this spec checks the learning), profiles are
  * deterministic, prediction ties are lexicographic, and the saved
  * model round-trips through the TokenizerIO artifact discipline.
  */
class LangIdTrainSpec extends SparkSpec {

  // two toy languages with genuinely disjoint trigram mass
  private lazy val labeled = {
    import spark.implicits._
    Seq(
      (1L, "xx", "xaxa xbxb xaxa xcxc xaxa"),
      (2L, "xx", "xbxb xaxa xaxa xdxd xaxa"),
      (3L, "yy", "yoyo ypyp yoyo yqyq yoyo"),
      (4L, "yy", "ypyp yoyo yoyo yryr yoyo"))
      .toDF("doc_id", "lang", "text")
  }

  test("learned profiles separate languages with real signal") {
    val model = LangIdTrain.train(labeled, "text", "lang", n = 3, topK = 5)
    val profiles = LangIdTrain.profilesOf(model)
    assert(profiles.map(_.lang) == Seq("xx", "yy"))
    assert(profiles.forall(_.grams.size == 5))
    // the xx profile carries only x-alphabet grams, yy only y-alphabet
    assert(profiles.find(_.lang == "xx").get.grams.forall(_._1.exists(_ == 'x')))
    assert(profiles.find(_.lang == "yy").get.grams.forall(_._1.exists(_ == 'y')))
    import spark.implicits._
    val unseen = Seq(
      (10L, "xaxa xcxc xbxb"), // x-language evidence only
      (11L, "yqyq yoyo ypyp"), // y-language evidence only
      (12L, "zz zz zz zz zz")) // zero evidence → lexicographic first
      .toDF("doc_id", "text")
    val pred = unseen
      .select(col("doc_id"), LangIdTrain.predictExpr(col("text"), profiles).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "xx")
    assert(pred(11L) == "yy")
    assert(pred(12L) == "xx", "zero-evidence tie breaks lexicographic")
  }

  test("training is deterministic: count DESC, gram ASC ties") {
    val a = LangIdTrain.profilesOf(
      LangIdTrain.train(labeled, "text", "lang", n = 3, topK = 5))
    val b = LangIdTrain.profilesOf(
      LangIdTrain.train(labeled.repartition(7), "text", "lang", n = 3, topK = 5))
    assert(a == b, "profiles must not depend on partitioning")
  }

  test("save/load round-trip (tokenizer artifact discipline)") {
    val dir = java.nio.file.Files.createTempDirectory("langid").toString
    val path = s"$dir/model"
    val model = LangIdTrain.train(labeled, "text", "lang", n = 3, topK = 5)
    LangIdTrain.save(model, path)
    val loaded = LangIdTrain.load(spark, path)
    assert(LangIdTrain.profilesOf(loaded) == LangIdTrain.profilesOf(model))
    // scoring through the loaded model equals scoring the trained one
    import spark.implicits._
    val docs = Seq((1L, "xaxa yoyo xaxa")).toDF("doc_id", "text")
    val p1 = docs.select(LangIdTrain.predictExpr(col("text"),
      LangIdTrain.profilesOf(model)).as("p")).head().getString(0)
    val p2 = docs.select(LangIdTrain.predictExpr(col("text"),
      LangIdTrain.profilesOf(loaded)).as("p")).head().getString(0)
    assert(p1 == p2)
    // a foreign artifact fails loudly, not with garbage predictions
    TokenizerIO.saveUnigram(spark, Seq(("ab", 3L)), s"$dir/unigram")
    val err = intercept[IllegalArgumentException] {
      LangIdTrain.load(spark, s"$dir/unigram")
    }
    assert(err.getMessage.contains("langid-chargram"))
  }
}

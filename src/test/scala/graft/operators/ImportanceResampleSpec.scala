package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** DSIR selection semantics: bounded weight table, broadcast scoring
  * join, deterministic Gumbel-top-k, and the actual selection property
  * (picked documents look like the target distribution).
  */
class ImportanceResampleSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"), col("source"))

  private def target = docs.filter(col("source") === "src0")
    .select(col("doc_id"), col("text"))
  private def raw = docs.select(col("doc_id"), col("text"))

  test("weight table is bounded by the bucket count") {
    val w = ImportanceResample.fitWeights(target, raw, "doc_id", "text",
      buckets = 64)
    assert(w.count() <= 64)
    assert(w.columns.toSeq == Seq("bucket", "w_micro"))
  }

  test("selection is invariant under repartitioning") {
    def run(parts: Int) = ImportanceResample.select(
      raw.repartition(parts), target, "doc_id", "text",
      buckets = 256, k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(7))
  }

  test("selected documents skew toward the target distribution") {
    val k = 40
    val picked = ImportanceResample.select(raw, target, "doc_id", "text",
      buckets = 512, k = k)
    val pickedSrc = docs.join(picked.select("doc_id"), "doc_id")
      .filter(col("source") === "src0").count()
    val baseRate = docs.filter(col("source") === "src0").count().toDouble /
      docs.count()
    assert(pickedSrc.toDouble / k > baseRate,
      s"selection rate ${pickedSrc.toDouble / k} should beat base rate $baseRate")
  }

  test("scoring joins the weight table map-side (broadcast)") {
    val w = ImportanceResample.fitWeights(target, raw, "doc_id", "text", 128)
    val plan = ImportanceResample.scoreDocs(raw, "doc_id", "text", w, 128)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "weight join must broadcast (B-bounded build side)")
  }

  test("empty documents score zero and never crash the featurizer") {
    import spark.implicits._
    val tiny = Seq((1L, "alpha beta"), (2L, ""), (3L, "alpha")).toDF("id", "t")
    val w = ImportanceResample.fitWeights(
      tiny.filter(col("id") === 1), tiny, "id", "t", 32)
    val s = ImportanceResample.scoreDocs(tiny, "id", "t", w, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.keySet == Set(1L, 2L, 3L))
    assert(s(2L) == 0L, "empty doc must score 0")
  }
}

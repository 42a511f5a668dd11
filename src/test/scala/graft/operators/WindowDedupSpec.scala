package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WindowDedup: the greedy first-writer-wins policy, chain behavior,
  * hot-window linearity, and the no-pair-join plan shape.
  */
class WindowDedupSpec extends SparkSpec {

  test("drops later documents sharing an exact window, keeps the first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zzz alpha beta gamma delta yyy"), // shares the 4-window with 1
      (3L, "completely different text here now")
    ).toDF("doc_id", "text")
    val kept = WindowDedup.dropWindowDuplicates(docs, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("transitive chains collapse toward the earliest id") {
    import spark.implicits._
    // 1~2 share w1; 2~3 share w2; 1 and 3 share nothing directly.
    val docs = Seq(
      (1L, "one two three four tail a"),
      (2L, "one two three four middle five six seven eight"),
      (3L, "head five six seven eight b")
    ).toDF("doc_id", "text")
    val kept = WindowDedup.dropWindowDuplicates(docs, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 drops (shares with 1); 3 drops too — its window's first holder
    // is 2, which has a lower id (first-writer-wins, not survivors-only)
    assert(kept == Set(1L))
  }

  test("a window shared by many docs keeps exactly the min id") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"common boilerplate header text unique$i")).toDF("doc_id", "text")
    val kept = WindowDedup.dropWindowDuplicates(docs, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("plan has no cartesian product and no doc-pair join") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    val plan = WindowDedup.dropWindowDuplicates(docs, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("windows longer than every document cannot collide") {
    val docs = graft.catalog.Tables.load(spark, sfDir, "documents").limit(50)
    val kept = WindowDedup.dropWindowDuplicates(docs, "doc_id", "text", n = 200)
    // no doc has 200 tokens → zero windows → nothing dropped (n = 40
    // DOES drop rows here: the synthetic corpus contains real dups)
    assert(kept.count() == 50)
  }
}

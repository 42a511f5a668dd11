package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Star-contraction connected components: min-id labels on chains,
  * cycles, and forests; determinism; cluster-survivor selection.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    ConnectedComponents.components(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and isolated pair each collapse to their minimum") {
    val l = labels(edges(
      // a 5-node chain 10-11-12-13-14
      10L -> 11L, 11L -> 12L, 12L -> 13L, 13L -> 14L,
      // a triangle 20-21-22
      20L -> 21L, 21L -> 22L, 22L -> 20L,
      // a single edge
      30L -> 31L))
    (10L to 14L).foreach(n => assert(l(n) == 10L, s"node $n -> ${l(n)}"))
    (20L to 22L).foreach(n => assert(l(n) == 20L))
    assert(l(30L) == 30L && l(31L) == 30L)
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val l = labels(edges(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 2L, 2L -> 3L))
    assert(l(1L) == 1L && l(2L) == 1L && l(3L) == 1L)
  }

  test("labels are invariant under repartitioning") {
    val e = edges(1L -> 2L, 2L -> 3L, 7L -> 8L, 4L -> 5L, 5L -> 6L, 3L -> 4L)
    def run(parts: Int) = ConnectedComponents.components(e.repartition(parts))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(5))
  }

  test("clusterLosers keeps exactly the minimum of each duplicate cluster") {
    val losers = ConnectedComponents.clusterLosers(
      edges(5L -> 9L, 9L -> 7L, 100L -> 101L).toDF("id1", "id2"),
      "id1", "id2")
      .collect().map(_.getLong(0)).toSet
    assert(losers == Set(7L, 9L, 101L), s"losers: $losers")
  }
}

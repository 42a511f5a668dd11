package graft.operators

import graft.SparkSpec

class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  // 3 segments with very different sizes: 400 / 100 / 25
  private def docs = ((1 to 400).map(i => (i.toLong, "big")) ++
    (1001 to 1100).map(i => (i.toLong, "mid")) ++
    (2001 to 2025).map(i => (i.toLong, "small")))
    .toDF("doc_id", "seg")

  private def kept(total: Long) =
    TemperatureMix.sampleSqrtTemperature(docs, "seg", "doc_id", total)
      .groupBy($"seg").count().as[(String, Long)].collect().toMap

  test("quotas hit the total exactly and flatten toward small sources") {
    val k = kept(100)
    assert(k.values.sum === 100L)
    // sqrt weights: 20 / 10 / 5 -> quotas ~ 57 / 29 / 14
    assert(k("big") < 400 * 100 / 525 + 10, "big not flattened down")
    // small segment gets MORE than its proportional share (25/525 ~ 4.8)
    assert(k("small") > 25L * 100 / 525, s"small not upweighted: $k")
    // and the ordering of contributions still follows size
    assert(k("big") > k("mid") && k("mid") > k("small"))
  }

  test("a saturated segment caps at its size and the total undershoots") {
    val k = kept(500)
    assert(k("small") === 25L) // quota would exceed the 25 available
    assert(k.values.sum <= 500L)
  }

  test("selection is deterministic under repartitioning") {
    def ids(parts: Int) = TemperatureMix.sampleSqrtTemperature(
        docs.repartition(parts), "seg", "doc_id", 100)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids(1) === ids(13))
  }
}

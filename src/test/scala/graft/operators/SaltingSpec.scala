package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.GraftConfig

/** Salting correctness (same answers as unsalted) + config grammar. */
class SaltingSpec extends SparkSpec {

  private lazy val skewed = {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val rows = (0 until 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"key_${i % 50}"
      (k, i.toDouble, i.toLong)
    }
    rows.toDF("k", "v", "row_id")
  }

  test("saltedSum equals plain aggregation on skewed keys") {
    val plain = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Salting.saltedSum(skewed, "k", "v", saltBuckets = 8,
      disambiguator = "row_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join; dim replicated per salt") {
    import spark.implicits._
    val dim = Seq(("hot", "H"), ("key_0", "A"), ("key_10", "B")).toDF("k", "label")
    val plain = skewed.join(dim, "k").count()
    val salted = Salting.saltedJoin(skewed, dim, "k", saltBuckets = 8,
      disambiguator = "row_id").count()
    assert(salted == plain)
  }

  test("config identifier grammar and benchmark resolution") {
    val c = GraftConfig(dataId = "spider:dev:has_label", schemaId = "spider:dev")
    assert(c.dataIdentifier == (("spider", "dev", "has_label")))
    assert(c.schemaIdentifier == (("spider", "dev")))
    assert(GraftConfig.resolveDbPath("testdata", "sf0.01") == Some("/root/testdata/sf0.01"))
    assert(GraftConfig.resolveDbPath("spider2-lite", "x") == Some("benchmarks/spider2"))
    val fp = GraftConfig.fromPairs(Map("generate_num" -> "7", "decay_rate" -> "0.5"))
    assert(fp.generateNum == 7 && fp.decayRate == 0.5 && fp.parallelism == 5)
  }
}

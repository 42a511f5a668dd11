package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Recall floor for the MinHash LSH banding: the bench artifact's
  * `dedup_pair_recall` (banded candidate pairs vs the exact-Jaccard
  * pair set) has measured 1.0 for rounds — but it lived only in the
  * bench JSON, so a banding change (bands/h/seed/band-value fold)
  * that silently dropped true pairs would surface as a quietly
  * smaller artifact number instead of a failing test. This pins the
  * floor the way IvfRecallFloorSpec pins ANN recall.
  *
  * Runs at sf0.1 with the bench's OWN configuration (threshold 0.5,
  * n=3 shingles, h=16, bands=4 — the q_minhash_dedup defaults) so the
  * spec and the artifact measure the same thing. Both sides verify
  * with exact Jaccard, so the only difference is the banded candidate
  * generation — recall below the floor means the banding itself lost
  * true near-dup pairs.
  */
class MinhashRecallFloorSpec extends SparkSpec {

  private val Floor = 0.95
  private lazy val dir = "/root/testdata/sf0.1"

  test("banded candidate recall vs exact pairs >= 0.95 at the bench banding") {
    val docs = Tables.load(spark, dir, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(TextDedup.jaccardPairsExact(
      docs, "doc_id", "text", threshold = 0.5, n = 3))
    graft.core.CacheBin.drain()
    assert(exact.nonEmpty, "fixture produced no exact near-dup pairs " +
      "— the recall measurement would be vacuous")
    val banded = pairs(TextDedup.minhashNearDupPairs(
      docs, "doc_id", "text", threshold = 0.5, n = 3, h = 16, bands = 4))
    graft.core.CacheBin.drain()
    val recall = (exact & banded).size.toDouble / exact.size
    assert(recall >= Floor,
      f"banded recall $recall%.4f < $Floor%.2f at bands=4/h=16 " +
        f"(${(exact -- banded).size} of ${exact.size} true pairs lost)")
    // banded verified pairs are a SUBSET of the exact set by
    // construction (same Jaccard verify) — a violation means the
    // banding produced pairs the exact path cannot explain
    assert((banded -- exact).isEmpty,
      s"banded pairs outside the exact set: ${(banded -- exact).take(5)}")
  }
}

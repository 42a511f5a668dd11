package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Physical-plan regression net: the properties that make these plans
  * scale — predicate pushdown into parquet, column pruning, broadcast
  * of small dims, rank-filter group limits, no single-partition windows
  * — asserted on the REAL executed plans so a refactor can't silently
  * lose them.
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String, execute: Boolean = false): String = {
    val q = SparkEntry.allQueries.find(_.name == name).get
    try {
      val df = q.build(spark, sfDir)
      if (execute) df.queryExecution.toRdd.count() // finalize AQE stages
      df.queryExecution.executedPlan.toString
    } finally graft.core.CacheBin.drain() // see allPlans
  }

  // built ONCE for the all-queries sweeps: several builds have eager
  // side effects (index/bucketed-table/CSV writes, candidate
  // evaluations) that two per-test loops would repeat for identical
  // plan text. Operator-persisted intermediates drain between builds —
  // within one pass several queries persist identical subtrees (the
  // bench's between-queries discipline; keeps the log free of
  // already-cached warnings that would mask a real cache regression)
  private lazy val allPlans: Seq[(String, String)] =
    SparkEntry.allQueries.map { q =>
      try q.name -> q.build(spark, sfDir).queryExecution.executedPlan.toString
      finally graft.core.CacheBin.drain()
    }

  test("q_scan_filter pushes predicates into the parquet scan") {
    val p = planOf("q_scan_filter")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(!p.contains("PushedFilters: []"), "pushed filter list is empty")
  }

  test("q_join_agg_topk broadcasts dimensions and takes ordered top-k") {
    val p = planOf("q_join_agg_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "dimension join is not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k is a full sort")
  }

  test("q_knn_exact uses WindowGroupLimit (local top-k before shuffle)") {
    val p = planOf("q_knn_exact")
    assert(p.contains("WindowGroupLimit"), "rank filter not pushed into window")
    assert(p.contains("float_dot"), "codegen'd dot product missing from plan")
  }

  test("q_text_tokens prunes to the referenced columns only") {
    val p = planOf("q_text_tokens")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("lang") && !scanLine.contains("source"),
      s"unpruned columns in scan: $scanLine")
  }

  test("no query plan contains a single-partition window") {
    // a Window node prints as `Window [exprs], [partitionSpec], [orderSpec]`;
    // an empty partition spec (`], [], [`) is the single-partition funnel
    Seq("q_slice_assign", "q_window_rank", "q_knn_exact").foreach { name =>
      val p = planOf(name, execute = true)
      p.linesIterator.filter(_.contains("Window [")).foreach { line =>
        assert(!line.contains("], [], ["),
          s"$name: window without partition columns: $line")
      }
    }
  }

  test("q_ivf_ann equi-joins probes on cell (hash join, not nested loop)") {
    val p = planOf("q_ivf_ann")
    assert(p.contains("BroadcastHashJoin"), "probe join is not a broadcast hash join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "probe join degraded to a nested loop (array_contains membership join)")
    assert(p.contains("WindowGroupLimit"), "per-query top-k not group-limited")
  }

  test("q_fewshot_context keeps the codegen'd dot product and group limit") {
    val p = planOf("q_fewshot_context")
    assert(p.contains("WindowGroupLimit"), "rank filter not pushed into window")
    assert(p.contains("float_dot"), "codegen'd dot product missing from plan")
  }

  test("q_ivf_indexed probes via partition pruning on the cell directories") {
    val p = planOf("q_ivf_indexed")
    val scanLine = p.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell"))
    assert(scanLine.isDefined, "no partition filter on the cell column in the index scan")
    assert(scanLine.get.matches(".*PartitionFilters: \\[.*cell.*"),
      s"empty partition filter: ${scanLine.get.take(200)}")
    assert(p.contains("BroadcastHashJoin"), "probe join is not a broadcast hash join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "probe join degraded to a nested loop (array_contains membership join)")
  }

  test("q_corpus_clean never forms a cross product") {
    val p = planOf("q_corpus_clean", execute = true)
    assert(!p.contains("CartesianProduct"), "corpus clean plan has a cross join")
  }

  test("q_corpus_clean has no self-join keyed on raw shingle hash") {
    // the exact-Jaccard path explodes shingle hashes into a `__h` column
    // and self-joins on it — a full shuffle on a power-law key that goes
    // quadratic inside any hot hash group at corpus scale. The flagship
    // must stay on the banded MinHash path: no `__h` column anywhere.
    val p = planOf("q_corpus_clean")
    assert(!p.contains("__h#"),
      "flagship plan contains the exploded raw-shingle-hash column __h " +
        "(exact-Jaccard self-join path)")
    assert(p.contains("minhash_signature"),
      "flagship plan lost the MinHash signature expression")
  }

  test("q_c4_line_filter is scan-shaped: no joins, no aggregates") {
    val p = planOf("q_c4_line_filter")
    assert(!p.contains("Join"), "line filtering must not join")
    assert(!p.contains("HashAggregate"), "line filtering must not aggregate")
  }

  test("q_line_dedup flags lines via hash equi-joins, never a pairwise stage") {
    val p = planOf("q_line_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "pairwise stage in line dedup")
    // both joins (flag membership, coverage rebuild) are hash equi-joins
    assert(!p.contains("SortMergeJoin"), "a line-dedup join fell to sort-merge")
    assert(p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      "no hash join in line dedup plan")
    // the flag key is the 8-byte polynomial line hash, not line text
    assert(p.contains("__h#"), "line-hash flag key missing from plan")
  }

  test("q_nfc_normalize keeps the normalize expression inside codegen") {
    val p = planOf("q_nfc_normalize")
    assert(p.contains("normalize_nfc"), "normalize expression missing")
    assert(!p.contains("BatchEvalPython") && !p.contains("udf"),
      "normalization fell out of codegen")
  }

  test("q_asof_join is joinless: one key shuffle, a sorted window, no pair blowup") {
    val p = planOf("q_asof_join")
    assert(!p.contains("Join"), "as-of join materialized a join node")
    assert(p.contains("Window ["), "missing the ordered-carry window")
  }

  test("range joins plan as hash equi-joins on the bucket, never nested loops") {
    Seq("q_range_join", "q_interval_overlap").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name: inequality join fell off the bucket equi-join path")
    }
  }

  test("q_bloom_decontaminate probe side has no exchange and no join") {
    val p = planOf("q_bloom_decontaminate")
    assert(!p.contains("Join"), "bloom probe joined instead of scanning")
  }

  test("q_semantic_decontaminate is one broadcast anti-join: corpus never shuffles") {
    val p = planOf("q_semantic_decontaminate", execute = true)
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("LeftAnti"),
      "semantic decon must probe a broadcast eval set with an anti join")
    // the only exchanges are the eval-side broadcast and the output
    // ORDER BY's range exchange — a hash exchange would mean the
    // corpus itself shuffled for the probe
    assert(!p.contains("Exchange hashpartitioning"),
      s"corpus shuffled in semantic decon:\n$p")
  }

  test("q_lang_id_trained never joins: model rides as collected literals") {
    // training is a hash-agg + bounded per-language window; scoring is
    // a per-row expression over the collected profiles — if a join
    // appears, someone re-joined the model table to the corpus
    val p = planOf("q_lang_id_trained")
    assert(!p.contains("Join"), "trained lang-ID must not join model to corpus")
  }

  test("NO query plan contains a cartesian product (documented O(n^2) baselines excepted)") {
    // exact all-pairs baselines are deliberately quadratic (SCALE.md):
    // they broadcast one side (BroadcastNestedLoopJoin), never a
    // CartesianProduct, and exist as correctness oracles for LSH paths
    allPlans.foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"),
        s"$name: plan degraded to a cartesian product")
    }
  }

  test("NO query plan funnels data through an unpartitioned window") {
    // partitionBy(lit(0)) over a bounded top-k set is allowed (it
    // prints a constant partition spec, not an empty one); a truly
    // empty partition spec (`], [], [`) is the scale-killer
    allPlans.foreach { case (name, p) =>
      p.linesIterator.filter(_.contains("Window [")).foreach { line =>
        assert(!line.contains("], [], ["),
          s"$name: window without partition columns: ${line.take(160)}")
      }
    }
  }

  test("q_token_budget_mix has no Window node (two-pass cumsum, not a per-source funnel)") {
    // a mixture names a handful of sources: Window.partitionBy(source)
    // would serialize each source's whole corpus through one reducer.
    // The two-pass range-partition cumsum must keep every Window out of
    // the plan entirely.
    val p = planOf("q_token_budget_mix")
    assert(!p.contains("Window ["),
      "token-budget mix plan contains a Window node — per-source funnel is back")
  }

  test("df-cap guard paths never window-partition on the shingle hash") {
    // document frequency must come from a partial-aggregating
    // groupBy(__h).count(), NOT count().over(Window.partitionBy(__h)):
    // the hash key is zipf-skewed (that is WHY the cap exists), and a
    // window on it funnels every row of the hottest hash onto one
    // reducer with no map-side combine — the exact straggler the cap
    // guards against, one stage earlier.
    Seq("q_jaccard_dfcap", "q_containment_dfcap").foreach { name =>
      val p = planOf(name)
      p.linesIterator.filter(_.contains("Window [")).foreach { line =>
        assert(!line.matches(".*Window \\[.*\\], \\[__h#.*"),
          s"$name: window partitioned on the skewed shingle hash: ${line.take(160)}")
      }
      // the over-cap hash list is tiny by construction: it must reach
      // the anti-join as a broadcast, not a shuffle
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$name: over-cap hash list is not broadcast into the anti-join")
    }
  }

  test("jaccard/simhash self-joins share their expensive subtree via exchange reuse") {
    // these frames are deliberately NOT persisted: the self-join's two
    // consumers read one shuffle exchange (ReusedExchange) instead of
    // racing to populate a cache — same single evaluation, zero
    // BlockManager traffic. A refactor that drops the reuse silently
    // doubles the scan+tokenize+hash work.
    // clean cache first: a shingle-hash frame left persisted by an
    // earlier build (minhash paths trackEager it) gets substituted into
    // this subtree by the CacheManager, and AQE then broadcasts the
    // (now tiny) build side without the inner exchange — legitimate
    // there, but it would mask a lost reuse in the drained-cache state
    // the bench and verify runners actually execute in.
    graft.core.CacheBin.drain()
    spark.catalog.clearCache()
    Seq("q_jaccard_neardup", "q_jaccard_dfcap", "q_simhash_neardup",
      "q_containment_dedup", "q_containment_dfcap").foreach { name =>
      val p = planOf(name, execute = true)
      assert(p.contains("ReusedExchange"),
        s"$name: self-join no longer reuses the exchange — subtree computed twice")
    }
  }

  test("whole-stage codegen covers the dedup hash pipeline") {
    val p = planOf("q_minhash_dedup", execute = true)
    // codegen'd operators print with the `*(n)` stage marker
    assert(p.contains("*("), "no whole-stage-codegen spans in dedup plan")
    assert(p.contains("shingle_hashes") && p.contains("minhash_signature"),
      "custom hash expressions missing from plan")
  }

  test("q_word_freq_score tokenizes the corpus once (cached) and splits the zipf head to a broadcast") {
    graft.core.CacheBin.drain()
    val q = SparkEntry.allQueries.find(_.name == "q_word_freq_score").get
    val df = q.build(spark, sfDir)
    // the tokenized corpus (2 consumers) and the frequency table
    // (2 consumers) are persisted: the optimized plan reads
    // InMemoryRelation leaves, not fresh scan+tokenize subtrees
    val opt = df.queryExecution.optimizedPlan
    val cachedLeaves = opt.collect {
      case c: org.apache.spark.sql.execution.columnar.InMemoryRelation => c
    }
    assert(cachedLeaves.size >= 3,
      s"expected words/freq cache reuse, found ${cachedLeaves.size} cached leaves")
    val p = df.queryExecution.executedPlan.toString
    // the hot-token head joins map-side
    assert(p.contains("BroadcastHashJoin"), "hot-token join is not broadcast")
    // the only raw parquet scan left in the final plan is the doc-id
    // spine, pruned to the id column — `text` is read once, inside the
    // cached `words` build
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      "doc-id spine scan is not pruned to the id column")
    graft.core.CacheBin.drain()
    assert(graft.core.CacheBin.pending == 0)
  }
}

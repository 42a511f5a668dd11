package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the survivor
  * resolver for near-duplicate clusters (reference semantics: a
  * duplicate *group* keeps one representative; pairwise drop-the-larger
  * under-merges transitive clusters, e.g. edges (B,C),(A,C) keep both A
  * and B even though B ~ A via C).
  *
  * Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard shuffle-friendly CC at corpus scale:
  *
  *   large-star: every node u connects its strictly-larger neighbors
  *     to m = min(N(u) ∪ {u});
  *   small-star: every node u connects its smaller-or-equal neighbors
  *     (and itself) to m.
  *
  * Each step is one groupBy(u) + one re-emit — pure hash shuffles on
  * node id, no all-pairs anywhere — and the edge set converges to a
  * union of stars whose centers are the component minima in
  * O(log^2 n) rounds (2–4 in practice for dedup clusters, whose
  * diameter is tiny). Per-iteration `localCheckpoint` truncates the
  * lineage so the plan does not grow with rounds; a fault-tolerant
  * cluster run can switch to reliable `checkpoint` by setting a
  * checkpoint dir (same call shape).
  *
  * Output: one row per node appearing in `edges` — (id, component)
  * with component = min node id of the connected component. Output is
  * deterministic (a pure function of the edge set), so it is
  * oracle-checkable against a recursive-CTE min-reachability query.
  */
object ConnectedComponents {

  /** Large-star round (two-phase star contraction): for every node u
    * of the SYMMETRIZED relation, m(u) = min(N(u) ∪ {u}); every larger
    * neighbor links to m. Each input edge survives through its smaller
    * endpoint's grouping, so connectivity is preserved. Output is
    * directed larger→smaller `(src, dst)` links.
    */
  private def largeStar(sym: DataFrame): DataFrame = {
    val withMin = sym
      .groupBy(col("u"))
      .agg(min(col("v")).as("__nmin"), collect_set(col("v")).as("__nbrs"))
      .withColumn("m", least(col("u"), col("__nmin")))
    // no trailing distinct: the only consumer is smallStar's
    // groupBy(min, collect_set), which is duplicate-tolerant — the
    // distinct here was a full extra (src, dst) exchange per round
    withMin
      .select(col("u"), col("m"),
        explode(filter(col("__nbrs"), v => v > col("u"))).as("v"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** Small-star round: consumes the large round's DIRECTED
    * larger→smaller links, groups each node u with its smaller
    * neighbors N⁻(u), and links every member of N⁻(u) ∪ {u} to
    * m = min(N⁻(u)) — contracting each local star onto its minimum.
    * No trailing distinct (the caller's [[symmetrize]] canonicalizes):
    * both star rounds are functions of the edge SET and their
    * duplicate-tolerant groupBys compute set semantics over multiset
    * input, so the two per-round distinct exchanges the star rounds
    * used to pay bought nothing.
    */
  private def smallStar(directed: DataFrame): DataFrame = {
    val withMin = directed
      .select(col("src").as("u"), col("dst").as("v"))
      .groupBy(col("u"))
      .agg(min(col("v")).as("m"), collect_set(col("v")).as("__nbrs"))
    withMin
      .select(col("m"),
        explode(concat(col("__nbrs"), array(col("u")))).as("v"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()


  /** Connected components of an undirected graph given as an edge list
    * with columns (`srcCol`, `dstCol`). Self-loops and duplicate /
    * reversed edges are tolerated. Returns (`id`, `component`).
    *
    * `maxIterations` is a safety bound (the algorithm provably
    * converges in O(log^2 n) star rounds; 50 covers any practical
    * graph); hitting it throws rather than returning a partial
    * clustering.
    */
  def components(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // ONE evaluation of the caller's edge subtree (often an expensive
    // near-dup pair join): the raw edge list is checkpointed first and
    // BOTH consumers — the node inventory and the round-0 symmetrized
    // seed — derive from the checkpoint. Previously allNodes and the
    // seed each re-evaluated `edges` in full (the pair join ran twice
    // per components() call); the persist on allNodes couldn't help
    // because the two consumers were separate subtrees. The raw
    // checkpoint outlives this call (the returned plan's allNodes side
    // reads it) — tracked for the caller's drain.
    val raw = graft.core.CacheBin.trackCheckpoint(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true))
    val allNodes = raw
      .select(col("src").as("id"))
      .union(raw.select(col("dst").as("id")))
      .distinct()

    // DataFrame.unpersist is a NO-OP for localCheckpoint blocks (see
    // CacheBin's class doc): the superseded round's backing RDDs must
    // be unpersisted directly, or every star round leaks a full edge
    // set into BlockManager storage for the session's lifetime.
    def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    // Convergence = the symmetrized set is a union of MIN-CENTERED
    // STARS, detected directly on each round's output instead of
    // running one more full round to observe "nothing changed" (the
    // previous criterion: equal counts + empty except — a whole
    // largeStar+smallStar+symmetrize+checkpoint+except round whose only
    // product was the detection). Exactness: star-shapedness of the
    // symmetrized set is EQUIVALENT to being a fixpoint of the round —
    //  (⇐) on a min-centered star {c; l1..lk}: largeStar at c emits
    //      (li, c), at li emits nothing (c < li); smallStar at li
    //      re-emits (li, c); symmetrize restores the star — unchanged;
    //  (⇒) the fixpoints of alternating star rounds are exactly the
    //      min-centered star unions (Kiveris et al., SoCC'14 — the same
    //      invariant the label extraction below has always relied on).
    // Per-node test on the symmetrized multigraph-free set: u is a
    // center (every neighbor larger: min(v) > u) or a leaf (exactly one
    // neighbor, smaller: cnt == 1 ∧ v < u). Each round is one groupBy
    // job over the freshly checkpointed set — it REPLACES the old
    // per-round count job, and connectivity is preserved by every
    // round, so stars == components and the center IS the component
    // minimum.
    def starShaped(df: DataFrame): Boolean = {
      val chk = df.groupBy(col("u"))
        .agg(min(col("v")).as("__mn"), max(col("v")).as("__mx"),
          count(lit(1)).as("__cnt"))
        .agg(min(when(col("__mn") > col("u") ||
          (col("__cnt") === 1 && col("__mx") < col("u")), 1)
          .otherwise(0)).as("__star"))
        .head()
      chk.isNullAt(0) || chk.getInt(0) == 1 // empty set: trivially stars
    }
    var cur = symmetrize(raw).localCheckpoint(true)
    var converged = starShaped(cur)
    var it = 0
    while (!converged && it < maxIterations) {
      val next =
        symmetrize(smallStar(largeStar(cur)))
          .localCheckpoint(true)
      converged = starShaped(next)
      checkpointRdds(cur).foreach(_.unpersist(false))
      cur = next
      it += 1
    }
    if (!converged && it >= maxIterations)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIterations star rounds")

    // the final round's checkpoint outlives this call (the returned
    // plan reads it): register for the caller's drain like any other
    // operator-persisted frame
    graft.core.CacheBin.trackCheckpoint(cur)

    // At the fixpoint the graph is a union of stars centered on the
    // component minima: each non-center node's min neighbor IS the
    // center; centers (and isolated pair-less nodes) label themselves.
    val labels = cur.groupBy(col("u").as("id"))
      .agg(min(col("v")).as("__m"))
      .withColumn("component", least(col("id"), col("__m")))
      .select(col("id"), col("component"))
    val out = allNodes
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    out
  }

  /** Near-dup cluster survivors: given pair edges (id1, id2), returns
    * the ids to KEEP — exactly one representative (the minimum id) per
    * connected duplicate cluster. Nodes not in any pair are unaffected
    * (they are not in the edge list and thus trivially kept by the
    * caller's anti-join on the DROP set).
    */
  def clusterLosers(pairs: DataFrame, id1: String = "id1",
      id2: String = "id2"): DataFrame =
    components(pairs, id1, id2)
      .filter(col("id") =!= col("component"))
      .select(col("id"))
}

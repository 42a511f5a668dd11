package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.functions.VectorOps
import graft.operators.ProductQuant

/** Product-quantization operators over the embeddings table,
  * oracle-checked end to end: the DuckDB mirror replays seed selection,
  * both Lloyd iterations over every subspace (the subspace index is a
  * plain column, so ONE generic CTE chain trains all m codebooks), code
  * assignment, and the ADC distance fold — bit-for-bit, including the
  * left-association of the per-subspace distance sum.
  */
object PqQueries extends QueryPack {

  private val M = 8      // subspaces over the 64-dim embeddings
  private val Dsub = 8
  private val Ksub = 16
  private val Iters = 2

  private def oDist(a: String, b: String) = VectorOps.oDistSq(a, b)

  /** One Lloyd iteration over the generic (m, cell) codebook relation. */
  private def pqIterCtes(prev: String, next: String): String =
    s"""asg_$next AS (
       |  SELECT s.vec_id, s.m, s.sv, c.cell,
       |         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |           ORDER BY ${oDist("s.sv", "c.cv")} ASC, c.cell ASC) AS rn
       |  FROM sub s JOIN $prev c ON c.m = s.m),
       |x_$next AS (
       |  SELECT m, cell, unnest(sv) AS v,
       |         unnest(generate_series(1, len(sv))) AS pos
       |  FROM asg_$next WHERE rn = 1),
       |sum_$next AS (
       |  SELECT m, cell, pos,
       |         SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e10 + 0.5) AS DECIMAL(38,0))) AS s,
       |         COUNT(*) AS n
       |  FROM x_$next GROUP BY m, cell, pos),
       |lst_$next AS (
       |  SELECT m, cell, list(CAST(s AS DOUBLE) / 1e10 / n ORDER BY pos) AS cv2
       |  FROM sum_$next GROUP BY m, cell),
       |$next AS (
       |  SELECT c.m, c.cell, COALESCE(l.cv2, c.cv) AS cv
       |  FROM $prev c LEFT JOIN lst_$next l ON l.m = c.m AND l.cell = c.cell)""".stripMargin

  /** Seeds → cb0 → cb1 → cb2 → `fin` (every (vector, subspace)'s final
    * cell at rn = 1). Seed rule shared with the IVF quantizer's oracle.
    */
  private val PqCtes: String =
    s"""mm AS (SELECT unnest(range(0, $M)) AS m),
       |seeds AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
       |         embedding AS v
       |  FROM embeddings
       |  WHERE vec_id % GREATEST((SELECT COUNT(*) // $Ksub FROM embeddings), 1) = 0
       |  ORDER BY vec_id LIMIT $Ksub),
       |cb0 AS (
       |  SELECT mm.m, s.cell, s.v[mm.m*$Dsub+1 : mm.m*$Dsub+$Dsub] AS cv
       |  FROM seeds s CROSS JOIN mm),
       |sub AS (
       |  SELECT e.vec_id, mm.m,
       |         e.embedding[mm.m*$Dsub+1 : mm.m*$Dsub+$Dsub] AS sv
       |  FROM embeddings e CROSS JOIN mm),
       |${pqIterCtes("cb0", "cb1")},
       |${pqIterCtes("cb1", "cb2")},
       |fin AS (
       |  SELECT s.vec_id, s.m, c.cell,
       |         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |           ORDER BY ${oDist("s.sv", "c.cv")} ASC, c.cell ASC) AS rn
       |  FROM sub s JOIN cb2 c ON c.m = s.m)""".stripMargin

  /** Query set shared by every search oracle. */
  private val oQs: String =
    """qs AS (SELECT vec_id AS qid, embedding AS qv
      |       FROM embeddings WHERE vec_id < 8)""".stripMargin

  /** ADC scoring chain over `fin` + `cb2`: per-(query, candidate,
    * subspace) distances, the 8-column pivot, the left-associated sum,
    * and the ascending-distance rank. `candJoins` restricts WHICH
    * (query, candidate) pairs form — a CROSS JOIN for brute-force ADC,
    * the coarse-cell probe joins for IVF-PQ. ONE definition so the
    * fold association and tie rule cannot drift between the three
    * search oracles.
    */
  private def oAdcChain(candJoins: String): String = {
    val piv = (0 until M).map(i =>
      s"         MAX(CASE WHEN m=$i THEN d END) AS d$i").mkString(",\n|")
    val sum = (1 until M).foldLeft("d0")((acc, i) => s"($acc + d$i)")
    s"""dpm AS (
       |  SELECT q.qid, f.vec_id AS nid, f.m,
       |         ${oDist(s"q.qv[f.m*$Dsub+1 : f.m*$Dsub+$Dsub]", "c.cv")} AS d
       |  FROM fin f
       |  JOIN cb2 c ON c.m = f.m AND c.cell = f.cell
       |  $candJoins
       |  WHERE f.rn = 1 AND f.vec_id <> q.qid),
       |piv AS (
       |  SELECT qid, nid,
       |$piv
       |  FROM dpm GROUP BY qid, nid),
       |adc AS (SELECT qid, nid, $sum AS adc_dist FROM piv),
       |rr AS (
       |  SELECT qid, nid, adc_dist,
       |         ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY adc_dist ASC, nid) AS rk
       |  FROM adc)""".stripMargin
  }

  /** Shortlist + exact re-rank tail shared by the two rerank oracles;
    * `shortN` = k · shortlistFactor of the Spark side.
    */
  private def oRerankTail(shortN: Int): String =
    s"""short AS (SELECT qid, nid FROM rr WHERE rk <= $shortN),
       |ex AS (
       |  SELECT s2.qid, s2.nid, ${oDist("e.embedding", "q.qv")} AS dist
       |  FROM short s2
       |  JOIN embeddings e ON e.vec_id = s2.nid
       |  JOIN qs q ON q.qid = s2.qid),
       |r2 AS (
       |  SELECT qid, nid, dist,
       |         ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY dist ASC, nid) AS rk
       |  FROM ex)""".stripMargin

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_pq_codes",
      "Product quantization: 64-dim float vectors → 8 radix-16 codes " +
        "(one 4-bit codebook per 8-dim subspace, 2 Lloyd iterations), " +
        "packed into one BIGINT — 64x compression of the vector table. " +
        "Training shuffles only (m, cell) partial aggregates; encoding " +
        "is join-free scan-time codegen.",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val books = ProductQuant.trainCodebooks(
          emb, "vec_id", "embedding", M, Ksub, Iters)
        emb.select(col("vec_id"),
          ProductQuant.packedCode(
            ProductQuant.pqCodes(col("embedding"), books), M, Ksub)
            .as("pq_code"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH $PqCtes
              |SELECT vec_id,
              |       CAST(SUM(cell * (1::BIGINT << (4*m))) AS BIGINT) AS pq_code
              |FROM fin WHERE rn = 1
              |GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    GQuery(
      "q_pq_adc",
      "Asymmetric-distance (ADC) top-5 search over the PQ codes: the " +
        "query keeps its full vector, each corpus row costs 8 lookups " +
        "into per-subspace distance tables riding as plan literals — " +
        "the compressed-domain ANN baseline. Oracle replays the exact " +
        "left-associated distance fold.",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val books = ProductQuant.trainCodebooks(
          emb, "vec_id", "embedding", M, Ksub, Iters)
        ProductQuant.searchAdc(
          emb, emb.filter(col("vec_id") < 8), "vec_id", "vec_id",
          "embedding", k = 5, books)
          .select(col("query_id"), col("rank").as("rnk"),
            col("neighbor_id"), col("adc_dist"))
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH $PqCtes,
              |$oQs,
              |${oAdcChain("CROSS JOIN qs q")}
              |SELECT qid AS query_id, rk AS rnk, nid AS neighbor_id, adc_dist
              |FROM rr WHERE rk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    GQuery(
      "q_pq_rerank",
      "PQ deployment shape: ADC proposes a 32x shortlist from the " +
        "compressed codes, exact L2 re-ranks only those rows' original " +
        "vectors (hash equi-join on id — queries x shortlist fetches, " +
        "never a corpus rescan); 32x holds recall@5 0.92 on the " +
        "near-uniform synthetic embeddings where 8x measured 0.48 " +
        "(IvfRecallFloorSpec pins the 0.75 floor). Oracle replays " +
        "shortlist AND re-rank.",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val books = ProductQuant.trainCodebooks(
          emb, "vec_id", "embedding", M, Ksub, Iters)
        ProductQuant.searchAdcRerank(
          emb, emb.filter(col("vec_id") < 8), "vec_id", "vec_id",
          "embedding", k = 5, books, shortlistFactor = 32)
          .select(col("query_id"), col("rank").as("rnk"),
            col("neighbor_id"), col("dist"))
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH $PqCtes,
              |$oQs,
              |${oAdcChain("CROSS JOIN qs q")},
              |${oRerankTail(5 * 32)}
              |SELECT qid AS query_id, rk AS rnk, nid AS neighbor_id, dist
              |FROM r2 WHERE rk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    GQuery(
      "q_ivf_pq",
      "IVF-PQ — the full 100 TB ANN shape: 16 coarse cells bound WHICH " +
        "rows each query touches (5 probed — at 4 recall plateaus at " +
        "0.76 because missing neighbors sit in unprobed cells), PQ " +
        "codes bound WHAT a touched row costs (8 table lookups); " +
        "vectors are fetched only for the 48x-shortlist exact re-rank " +
        "(recall@5 0.84, floor 0.75 pinned by IvfRecallFloorSpec). " +
        "Oracle replays coarse quantizer, codebooks, ADC, and re-rank " +
        "end to end.",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val books = ProductQuant.trainCodebooks(
          emb, "vec_id", "embedding", M, Ksub, Iters)
        ProductQuant.searchIvfAdcRerank(
          emb, emb.filter(col("vec_id") < 8), "vec_id", "vec_id",
          "embedding", k = 5, books, nlist = 16, nprobe = 5,
          shortlistFactor = 48)
          .select(col("query_id"), col("rank").as("rnk"),
            col("neighbor_id"), col("dist"))
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH $PqCtes,
              |ccent AS (
              |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
              |         embedding AS cv
              |  FROM embeddings
              |  WHERE vec_id % GREATEST((SELECT COUNT(*) // 16 FROM embeddings), 1) = 0
              |  ORDER BY vec_id LIMIT 16),
              |casg AS (
              |  SELECT e.vec_id, c.cell,
              |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
              |           ORDER BY ${VectorOps.oDot("e.embedding", "c.cv")} DESC, c.cell DESC) AS arn
              |  FROM embeddings e CROSS JOIN ccent c),
              |$oQs,
              |cpr AS (
              |  SELECT q.qid, c.cell,
              |         ROW_NUMBER() OVER (PARTITION BY q.qid
              |           ORDER BY ${VectorOps.oDot("q.qv", "c.cv")} DESC, c.cell DESC) AS prn
              |  FROM qs q CROSS JOIN ccent c),
              |cprobed AS (SELECT qid, cell FROM cpr WHERE prn <= 5),
              |${oAdcChain("""JOIN casg ca ON ca.vec_id = f.vec_id AND ca.arn = 1
              |  JOIN cprobed p ON p.cell = ca.cell
              |  JOIN qs q ON q.qid = p.qid""")},
              |${oRerankTail(5 * 48)}
              |SELECT qid AS query_id, rk AS rnk, nid AS neighbor_id, dist
              |FROM r2 WHERE rk <= 5 ORDER BY query_id, rnk""".stripMargin))
  )
}

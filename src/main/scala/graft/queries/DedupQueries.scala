package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.operators.TextDedup

/** Near-duplicate dedup operators over the documents table,
  * oracle-checked. The oracles reproduce the full hash arithmetic
  * (polynomial shingle hash, affine MinHash permutations, 31-chain band
  * folds, ±1 SimHash votes) so candidate *mechanics* — not just final
  * pair sets — are cross-engine verified.
  */
object DedupQueries extends QueryPack {

  private val P = TextDedup.P

  // Shared oracle CTE fragments (tokens → shingles → hashes → Jaccard)
  // live in DedupOracles so composed pipelines can reuse them over
  // other source relations.
  private val oBase = DedupOracles.base("documents")
  private val oInterJac = DedupOracles.interJac

  /** One-sided incremental dedup mirror (incoming doc_id >= 400 vs
    * corpus doc_id < 400): shared by the in-plan variant and the
    * materialized-index variant — identical output contract.
    */
  private lazy val IncrementalOracle: String = {
    val bandCond = (0 until 4).map(j => s"i.band$j = c.band$j").mkString(" OR ")
    s"""WITH $oBase,
       |${DedupOracles.minhashBandCtes()},
       |pr AS (
       |  SELECT DISTINCT i.doc_id AS inc, c.doc_id AS co
       |  FROM bnd i JOIN bnd c
       |    ON i.doc_id >= 400 AND c.doc_id < 400 AND ($bandCond)),
       |ver AS (
       |  SELECT p.inc
       |  FROM pr p
       |  JOIN s a ON a.doc_id = p.inc
       |  JOIN s b ON b.doc_id = p.co AND b.h = a.h
       |  JOIN sizes na ON na.doc_id = p.inc
       |  JOIN sizes nb ON nb.doc_id = p.co
       |  GROUP BY p.inc, p.co, na.n, nb.n
       |  HAVING CAST(count(*) AS DOUBLE) /
       |         CAST(na.n + nb.n - count(*) AS DOUBLE) >= 0.5)
       |SELECT d.doc_id FROM documents d
       |WHERE d.doc_id >= 400 AND d.doc_id NOT IN (SELECT inc FROM ver)
       |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_minhash_dedup",
      "MinHash (16 hashes, 4 bands) + LSH near-dup dedup: banded " +
        "candidates (shuffle on band value, no all-pairs) verified by " +
        "exact shingle Jaccard >= 0.5. Oracle reproduces every signature.",
      (s, dir) =>
        TextDedup.minhashNearDupPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5, n = 3, h = 16, bands = 4)
          .orderBy(col("id1"), col("id2")),
      Some {
        val bandCond = (0 until 4).map(j => s"x.band$j = y.band$j").mkString(" OR ")
        s"""WITH $oBase,
           |${DedupOracles.minhashBandCtes()},
           |$oInterJac
           |SELECT j.id1, j.id2, j.jaccard
           |FROM j
           |JOIN bnd x ON x.doc_id = j.id1
           |JOIN bnd y ON y.doc_id = j.id2
           |WHERE j.jaccard >= 0.5 AND ($bandCond)
           |ORDER BY id1, id2""".stripMargin
      }),

    GQuery(
      "q_incremental_dedup",
      "Continuous-ingestion dedup: incoming documents (doc_id >= 400) " +
        "are dropped when they near-dup an EXISTING corpus document " +
        "(doc_id < 400) — one-sided banded MinHash join + exact Jaccard " +
        ">= 0.5 verify; survivors returned. The batch shape of the " +
        "streaming suppressor.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextDedup.minhashDedupAgainst(
          docs.filter(col("doc_id") >= 400), docs.filter(col("doc_id") < 400),
          "doc_id", "text", threshold = 0.5, n = 3, h = 16, bands = 4)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(IncrementalOracle)),

    GQuery(
      "q_dedup_indexed",
      "The materialized dedup index (screen-once/ingest-many): corpus " +
        "band rows + shingle arrays written to parquet (bands " +
        "partitionBy(band), hash params in a meta table), incoming " +
        "batch screened against the FILES — no corpus re-hash. Same " +
        "output contract — and oracle — as the in-plan variant.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val path = "/root/repo/target/tmp/dedup_index"
        TextDedup.writeDedupIndex(
          docs.filter(col("doc_id") < 400), "doc_id", "text", path,
          n = 3, h = 16, bands = 4)
        TextDedup.dedupAgainstIndex(
          s, path, docs.filter(col("doc_id") >= 400), "doc_id", "text",
          threshold = 0.5)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(IncrementalOracle)),

    GQuery(
      "q_jaccard_neardup",
      "Exact n-gram Jaccard near-dup baseline: relational explode + " +
        "equi-join on shingle (pairs only materialize when they share a " +
        "shingle — never a cross product).",
      (s, dir) =>
        TextDedup.jaccardPairsExact(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5, n = 3)
          .orderBy(col("id1"), col("id2")),
      Some(
        s"""WITH $oBase,
           |$oInterJac
           |SELECT id1, id2, jaccard FROM j
           |WHERE jaccard >= 0.5 ORDER BY id1, id2""".stripMargin)),

    GQuery(
      "q_jaccard_dfcap",
      "Exact Jaccard with the corpus-scale hot-key guard: shingles in " +
        "more than 3 documents (stop-shingles) are dropped BEFORE the " +
        "self-join, bounding every hash group; Jaccard is exact over " +
        "the remaining discriminative shingle space on both engines.",
      (s, dir) =>
        TextDedup.jaccardPairsExact(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5, n = 3, maxDocFreq = Some(3L))
          .orderBy(col("id1"), col("id2")),
      Some(
        s"""WITH $oBase,
           |keep AS (SELECT h FROM s GROUP BY h HAVING count(*) <= 3),
           |sfil AS (SELECT s.doc_id, s.h FROM s JOIN keep USING (h)),
           |sizesf AS (SELECT doc_id, count(*) AS n FROM sfil GROUP BY doc_id),
           |interf AS (
           |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
           |  FROM sfil a JOIN sfil b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |jf AS (
           |  SELECT id1, id2,
           |         CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
           |  FROM interf
           |  JOIN sizesf sa ON sa.doc_id = id1
           |  JOIN sizesf sb ON sb.doc_id = id2)
           |SELECT id1, id2, jaccard FROM jf
           |WHERE jaccard >= 0.5 ORDER BY id1, id2""".stripMargin)),

    GQuery(
      "q_simhash_neardup",
      "SimHash near-dup with EXACT recall: 30-bit ±1-vote fingerprints " +
        "over distinct shingles, pigeonhole banding (4 bands for " +
        "Hamming<=3 — a qualifying pair always shares a band), true " +
        "Hamming verification.",
      (s, dir) =>
        TextDedup.simhashNearDupPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
          .withColumn("hamming", col("hamming").cast("long"))
          .orderBy(col("id1"), col("id2")),
      Some {
        val votes = (0 until TextDedup.SimhashBits).map { j =>
          s"sum(CASE WHEN (hv >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j"
        }.mkString(",\n    ")
        val assemble = (0 until TextDedup.SimhashBits).map { j =>
          s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH $oBase,
           |h AS (SELECT doc_id, h AS hv FROM s),
           |b AS (
           |  SELECT doc_id,
           |    $votes
           |  FROM h GROUP BY doc_id),
           |sg AS (SELECT doc_id, $assemble AS simhash FROM b)
           |SELECT a.doc_id AS id1, c.doc_id AS id2,
           |       CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
           |FROM sg a JOIN sg c ON a.doc_id < c.doc_id
           |WHERE bit_count(xor(a.simhash, c.simhash)) <= 3
           |ORDER BY id1, id2""".stripMargin
      }),

    GQuery(
      "q_leak_safe_split",
      "Leakage-safe train/valid/test split: near-duplicate clusters " +
        "(banded MinHash pairs -> connected components, min-id label) " +
        "share one split key, so no near-copy straddles train and eval. " +
        "Oracle mirrors pairs, a recursive-CTE transitive closure, and " +
        "the multiplicative-hash draw.",
      (s, dir) =>
        graft.operators.LeakSafeSplit.split(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
          threshold = 0.5, n = 3, h = 16, bands = 4)
          .orderBy(col("doc_id")),
      Some {
        val bandCond = (0 until 4).map(j => s"x.band$j = y.band$j").mkString(" OR ")
        s"""WITH RECURSIVE $oBase,
           |${DedupOracles.minhashBandCtes()},
           |$oInterJac,
           |pairs AS (
           |  SELECT j.id1, j.id2 FROM j
           |  JOIN bnd x ON x.doc_id = j.id1
           |  JOIN bnd y ON y.doc_id = j.id2
           |  WHERE j.jaccard >= 0.5 AND ($bandCond)),
           |edges AS (
           |  SELECT id1 AS a, id2 AS b FROM pairs
           |  UNION
           |  SELECT id2, id1 FROM pairs),
           |reach(a, b) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a),
           |comp AS (
           |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
           |  FROM reach GROUP BY a),
           |keyed AS (
           |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS split_key
           |  FROM documents d LEFT JOIN comp c USING (doc_id)),
           |draw AS (
           |  SELECT doc_id, split_key,
           |         ((split_key % 1000003) * 2654435761) % 1000000 AS dr
           |  FROM keyed)
           |SELECT doc_id, split_key,
           |       CASE WHEN dr < 800000 THEN 'train'
           |            WHEN dr < 900000 THEN 'valid'
           |            ELSE 'test' END AS split
           |FROM draw ORDER BY doc_id""".stripMargin
      }),

    GQuery(
      "q_containment_dedup",
      "Containment dedup (the sub-document case symmetric Jaccard " +
        "misses) at the PRODUCTION default: the hot-shingle df cap " +
        s"(${TextDedup.DefaultContainmentDocFreqCap}) is on — the " +
        "oracle mirrors it even though it does not bind at test SF, " +
        "so the row stays correct at any scale. A doc whose " +
        "distinct-shingle set is >= 0.9 contained in another's drops; " +
        "the larger side survives (size tie -> smaller id).",
      (s, dir) =>
        TextDedup.containmentDropContained(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.9, n = 3)
          .select(col("doc_id"))
          .orderBy(col("doc_id")),
      Some(
        s"""WITH $oBase,
           |keepd AS (SELECT h FROM s GROUP BY h
           |          HAVING count(*) <= ${TextDedup.DefaultContainmentDocFreqCap}),
           |sd AS (SELECT s.doc_id, s.h FROM s JOIN keepd USING (h)),
           |sizesd AS (SELECT doc_id, count(*) AS n FROM sd GROUP BY doc_id),
           |inter2 AS (
           |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
           |  FROM sd a JOIN sd b ON a.h = b.h AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2),
           |drops AS (
           |  SELECT DISTINCT i1.id1 AS doc_id
           |  FROM inter2 i1
           |  JOIN sizesd na ON na.doc_id = i1.id1
           |  JOIN sizesd nb ON nb.doc_id = i1.id2
           |  WHERE CAST(i1.i AS DOUBLE) / CAST(na.n AS DOUBLE) >= 0.9
           |    AND (nb.n > na.n OR (nb.n = na.n AND i1.id2 < i1.id1)))
           |SELECT d.doc_id FROM documents d
           |WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
           |ORDER BY d.doc_id""".stripMargin)),

    GQuery(
      "q_containment_uncapped",
      "Containment dedup with the df cap explicitly OPTED OUT " +
        "(maxDocFreq = None) — the exact small-corpus form, kept " +
        "verified alongside the capped default. The uncapped pair " +
        "space grows with co-shingled mass (the sweep's worst " +
        "second-decade exponent), so this is the baseline, not the " +
        "production posture.",
      (s, dir) =>
        TextDedup.containmentDropContained(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.9, n = 3, maxDocFreq = None)
          .select(col("doc_id"))
          .orderBy(col("doc_id")),
      Some(
        s"""WITH $oBase,
           |inter2 AS (
           |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
           |  FROM s a JOIN s b ON a.h = b.h AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2),
           |drops AS (
           |  SELECT DISTINCT i1.id1 AS doc_id
           |  FROM inter2 i1
           |  JOIN sizes na ON na.doc_id = i1.id1
           |  JOIN sizes nb ON nb.doc_id = i1.id2
           |  WHERE CAST(i1.i AS DOUBLE) / CAST(na.n AS DOUBLE) >= 0.9
           |    AND (nb.n > na.n OR (nb.n = na.n AND i1.id2 < i1.id1)))
           |SELECT d.doc_id FROM documents d
           |WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
           |ORDER BY d.doc_id""".stripMargin)),

    GQuery(
      "q_containment_dfcap",
      "Containment dedup with the hot-shingle guard: shingles in more " +
        "than 3 documents are dropped before the directed pair join " +
        "(boilerplate says nothing about containment) and per-doc " +
        "sizes recount over the surviving shingle space — the bounded " +
        "form that holds at corpus scale.",
      (s, dir) =>
        TextDedup.containmentDropContained(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.9, n = 3, maxDocFreq = Some(3L))
          .select(col("doc_id"))
          .orderBy(col("doc_id")),
      Some(
        s"""WITH $oBase,
           |keep AS (SELECT h FROM s GROUP BY h HAVING count(*) <= 3),
           |sfil AS (SELECT s.doc_id, s.h FROM s JOIN keep USING (h)),
           |sizesf AS (SELECT doc_id, count(*) AS n FROM sfil GROUP BY doc_id),
           |interc AS (
           |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
           |  FROM sfil a JOIN sfil b ON a.h = b.h AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2),
           |drops AS (
           |  SELECT DISTINCT i1.id1 AS doc_id
           |  FROM interc i1
           |  JOIN sizesf na ON na.doc_id = i1.id1
           |  JOIN sizesf nb ON nb.doc_id = i1.id2
           |  WHERE CAST(i1.i AS DOUBLE) / CAST(na.n AS DOUBLE) >= 0.9
           |    AND (nb.n > na.n OR (nb.n = na.n AND i1.id2 < i1.id1)))
           |SELECT d.doc_id FROM documents d
           |WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
           |ORDER BY d.doc_id""".stripMargin)),

    GQuery(
      "q_keepbest_dedup",
      "Best-in-cluster near-dup dedup: MinHash pairs -> connected " +
        "components -> per-cluster argmax on a quality score (here " +
        "n_chars: keep the longest member, ties to the smaller id); " +
        "the k-1 worse near-copies drop. The keep policy curation " +
        "pipelines actually want, vs keep-lowest-id.",
      (s, dir) =>
        graft.operators.BestDedup.dedupKeepBest(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          scoreCol = "n_chars", threshold = 0.5, n = 3, h = 16, bands = 4)
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some {
        val bandCond = (0 until 4).map(j => s"x.band$j = y.band$j").mkString(" OR ")
        s"""WITH RECURSIVE $oBase,
           |${DedupOracles.minhashBandCtes()},
           |$oInterJac,
           |pairs AS (
           |  SELECT j.id1, j.id2 FROM j
           |  JOIN bnd x ON x.doc_id = j.id1
           |  JOIN bnd y ON y.doc_id = j.id2
           |  WHERE j.jaccard >= 0.5 AND ($bandCond)),
           |edges AS (
           |  SELECT id1 AS a, id2 AS b FROM pairs
           |  UNION
           |  SELECT id2, id1 FROM pairs),
           |reach(a, b) AS (
           |  SELECT a, b FROM edges
           |  UNION
           |  SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a),
           |comp AS (
           |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
           |  FROM reach GROUP BY a),
           |members AS (
           |  SELECT d.doc_id, c.component, d.n_chars
           |  FROM documents d JOIN comp c USING (doc_id)),
           |winners AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id, ROW_NUMBER() OVER (
           |      PARTITION BY component
           |      ORDER BY n_chars DESC, doc_id ASC) AS rn
           |    FROM members) WHERE rn = 1),
           |drops AS (
           |  SELECT doc_id FROM members
           |  WHERE doc_id NOT IN (SELECT doc_id FROM winners))
           |SELECT d.doc_id, d.n_chars FROM documents d
           |WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
           |ORDER BY d.doc_id""".stripMargin
      }),

    GQuery(
      "q_boilerplate_strip",
      "Cross-document repeated-substring removal (exact-substring-dedup " +
        "family): 5-token windows appearing in >= 3 distinct documents " +
        "are boilerplate; every covered token position is stripped and " +
        "the cleaned text reassembled. O(total tokens) — hash groupBy + " +
        "equi-join, no pairwise stage.",
      (s, dir) =>
        graft.operators.Boilerplate.strip(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          windowTokens = 5, minDocFreq = 3)
          .orderBy(col("doc_id")),
      Some {
        val win = (0 until 5).map(j => s"tk[i+$j]").mkString(", ")
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
           |                             t -> length(t) > 0) AS tk
           |  FROM documents),
           |wu AS (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, greatest(len(tk) - 4, 0)),
           |           i -> struct_pack(pos := i - 1,
           |                            g := concat_ws(' ', $win)))) AS u
           |  FROM toks),
           |w AS (SELECT doc_id, u.pos AS pos, ${DedupOracles.polyHash("u.g")} AS h FROM wu),
           |flagged AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 3),
           |cov AS (
           |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS p
           |  FROM w JOIN flagged USING (h)),
           |nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id),
           |tpu AS (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, len(tk)),
           |           i -> struct_pack(p := i - 1, tok := tk[i]))) AS u
           |  FROM toks),
           |tp AS (SELECT doc_id, u.p AS p, u.tok AS tok FROM tpu),
           |keep AS (
           |  SELECT tp.doc_id, tp.p, tp.tok
           |  FROM tp LEFT JOIN cov c ON tp.doc_id = c.doc_id AND tp.p = c.p
           |  WHERE c.p IS NULL),
           |ct AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
           |       FROM keep GROUP BY doc_id)
           |SELECT d.doc_id,
           |       CAST(len(t.tk) AS BIGINT) AS n_tokens,
           |       CAST(COALESCE(n.n_removed, 0) AS BIGINT) AS n_removed,
           |       COALESCE(ct.clean_text, '') AS clean_text
           |FROM documents d
           |JOIN toks t USING (doc_id)
           |LEFT JOIN nrem n USING (doc_id)
           |LEFT JOIN ct USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      }),

    GQuery(
      "q_keepfirst_dedup",
      "Keep-first exact-span dedup (the other half of Lee et al. 2022): " +
        "a 5-token window seen >= 2 times corpus-wide (including " +
        "within-document repeats) keeps its globally first occurrence " +
        "in (doc, pos) order; all later occurrences are stripped and " +
        "the text reassembled. Same O(total tokens) shape as the " +
        "boilerplate strip — min(ord) rides the same map-side count.",
      (s, dir) =>
        graft.operators.Boilerplate.dedupSpans(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          windowTokens = 5, minCount = 2)
          .orderBy(col("doc_id")),
      Some {
        val win = (0 until 5).map(j => s"tk[i+$j]").mkString(", ")
        val ord = s"doc_id * ${graft.operators.Boilerplate.OrdBase} + pos"
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
           |                             t -> length(t) > 0) AS tk
           |  FROM documents),
           |wu AS (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, greatest(len(tk) - 4, 0)),
           |           i -> struct_pack(pos := i - 1,
           |                            g := concat_ws(' ', $win)))) AS u
           |  FROM toks),
           |w AS (SELECT doc_id, u.pos AS pos, ${DedupOracles.polyHash("u.g")} AS h FROM wu),
           |g AS (SELECT h, COUNT(*) AS cnt, MIN($ord) AS keep_ord
           |      FROM w GROUP BY h HAVING COUNT(*) >= 2),
           |cov AS (
           |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS p
           |  FROM w JOIN g USING (h)
           |  WHERE $ord <> g.keep_ord),
           |nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id),
           |tpu AS (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, len(tk)),
           |           i -> struct_pack(p := i - 1, tok := tk[i]))) AS u
           |  FROM toks),
           |tp AS (SELECT doc_id, u.p AS p, u.tok AS tok FROM tpu),
           |keep AS (
           |  SELECT tp.doc_id, tp.p, tp.tok
           |  FROM tp LEFT JOIN cov c ON tp.doc_id = c.doc_id AND tp.p = c.p
           |  WHERE c.p IS NULL),
           |ct AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
           |       FROM keep GROUP BY doc_id)
           |SELECT d.doc_id,
           |       CAST(len(t.tk) AS BIGINT) AS n_tokens,
           |       CAST(COALESCE(n.n_removed, 0) AS BIGINT) AS n_removed,
           |       COALESCE(ct.clean_text, '') AS clean_text
           |FROM documents d
           |JOIN toks t USING (doc_id)
           |LEFT JOIN nrem n USING (doc_id)
           |LEFT JOIN ct USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      }),

    GQuery(
      "q_span_dedup",
      "Exact-substring span dedup with suffix-window EXTENSION (the " +
        "strongest Lee et al. 2022 variant): duplicated 5-token " +
        "windows (keep-first) merge into maximal covered islands per " +
        "document — gaps-and-islands on pos - row_number over the " +
        "doc-partitioned window — and only islands of >= 8 tokens are " +
        "stripped; shorter incidental repeats survive. O(total " +
        "tokens), no pairwise stage.",
      (s, dir) =>
        graft.operators.SpanDedup.removeLongDupSpans(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          windowTokens = 5, minCount = 2, minSpanTokens = 8)
          .orderBy(col("doc_id")),
      Some {
        val win = (0 until 5).map(j => s"tk[i+$j]").mkString(", ")
        val ord = s"doc_id * ${graft.operators.Boilerplate.OrdBase} + pos"
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
           |                             t -> length(t) > 0) AS tk
           |  FROM documents),
           |wu AS (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, greatest(len(tk) - 4, 0)),
           |           i -> struct_pack(pos := i - 1,
           |                            g := concat_ws(' ', $win)))) AS u
           |  FROM toks),
           |w AS (SELECT doc_id, u.pos AS pos, ${DedupOracles.polyHash("u.g")} AS h FROM wu),
           |g AS (SELECT h, MIN($ord) AS keep_ord
           |      FROM w GROUP BY h HAVING COUNT(*) >= 2),
           |cov AS (
           |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS p
           |  FROM w JOIN g USING (h)
           |  WHERE $ord <> g.keep_ord),
           |isl AS (
           |  SELECT doc_id, p,
           |         p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
           |  FROM cov),
           |spans AS (
           |  SELECT doc_id, grp, MIN(p) AS sp_start, COUNT(*) AS sp_len
           |  FROM isl GROUP BY 1, 2 HAVING COUNT(*) >= 8),
           |rm AS (
           |  SELECT DISTINCT doc_id, unnest(range(sp_start, sp_start + sp_len)) AS p
           |  FROM spans),
           |nsp AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id),
           |nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM rm GROUP BY doc_id),
           |tpu AS (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, len(tk)),
           |           i -> struct_pack(p := i - 1, tok := tk[i]))) AS u
           |  FROM toks),
           |tp AS (SELECT doc_id, u.p AS p, u.tok AS tok FROM tpu),
           |keep AS (
           |  SELECT tp.doc_id, tp.p, tp.tok
           |  FROM tp LEFT JOIN rm ON tp.doc_id = rm.doc_id AND tp.p = rm.p
           |  WHERE rm.p IS NULL),
           |ct AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
           |       FROM keep GROUP BY doc_id)
           |SELECT d.doc_id,
           |       CAST(len(t.tk) AS BIGINT) AS n_tokens,
           |       CAST(COALESCE(nr.n_removed, 0) AS BIGINT) AS n_removed,
           |       CAST(COALESCE(ns.n_spans, 0) AS BIGINT) AS n_spans,
           |       COALESCE(ct.clean_text, '') AS clean_text
           |FROM documents d
           |JOIN toks t USING (doc_id)
           |LEFT JOIN nrem nr USING (doc_id)
           |LEFT JOIN nsp ns USING (doc_id)
           |LEFT JOIN ct USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      }),

    GQuery(
      "q_window_dedup",
      "Exact n-token-window dedup (Lee et al. 2022 at document " +
        "granularity): drop every document sharing an exact 8-token " +
        "window with a lower-id document — per-window min id, then an " +
        "anti-join; no document pair is ever joined.",
      (s, dir) =>
        graft.operators.WindowDedup.dropWindowDuplicates(
          Tables.load(s, dir, "documents"), "doc_id", "text", n = 8)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      Some(s"""WITH ${DedupOracles.baseN("documents", 8, "")},
              |mn AS (SELECT h, MIN(doc_id) AS first_id FROM s GROUP BY h),
              |dup AS (
              |  SELECT DISTINCT s.doc_id
              |  FROM s JOIN mn ON s.h = mn.h
              |  WHERE mn.first_id < s.doc_id)
              |SELECT d.doc_id, d.source
              |FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
              |WHERE dup.doc_id IS NULL
              |ORDER BY d.doc_id""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.operators.WordPieceLearn

/** WordPiece (BERT-family) tokenizer training over the documents
  * corpus, oracle-checked: the DuckDB mirror replays the learner —
  * the `##`-marked alphabet, per-round pair counts JOINED with token
  * counts, the likelihood argmax `pc / (lc · rc)` (two IEEE double
  * ops over exact integers, engine-portable), and merge application
  * via the shared wrapped-token `replace()` with the merged token
  * shedding its right half's continuation marker. Argmax rows feed
  * the next round DYNAMICALLY, as in the BPE oracles.
  */
object WordPieceQueries extends QueryPack {

  private val Rounds = 3

  private val oToks =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0)"""

  /** WordPiece wrap: " a  ##b  ##c ". */
  private def oWrapWp(w: String): String =
    s"' ' || substr($w, 1, 1) || ' ' || " +
      s"regexp_replace(substr($w, 2), '(.)', ' ##\\1 ', 'g')"

  /** The merged token for an argmax row aliased `m`. */
  private def oMerged(m: String): String =
    s"$m.l || CASE WHEN $m.r LIKE '##%' THEN substr($m.r, 3) ELSE $m.r END"

  /** w0 + `Rounds` unrolled (token-count, pair-count, argmax, apply)
    * round CTEs with the WordPiece score; LEFT JOIN + COALESCE makes
    * exhausted rounds no-ops (the BPE early-stop pattern).
    */
  private val oLearnCtes: String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT ${oWrapWp("w")} AS toks, count(*) AS freq
         |  FROM (SELECT unnest($oToks) AS w FROM documents) u
         |  GROUP BY 1)""".stripMargin
    val rounds = (0 until Rounds).map { i =>
      s"""tc$i AS MATERIALIZED (
         |  SELECT token, SUM(freq) AS c
         |  FROM (SELECT unnest(string_split(trim(toks), '  ')) AS token, freq
         |        FROM w$i) u
         |  GROUP BY 1),
         |p$i AS MATERIALIZED (
         |  SELECT t[i] AS l, t[i+1] AS r, SUM(freq) AS pc
         |  FROM (SELECT string_split(trim(toks), '  ') AS t, freq FROM w$i) x,
         |       UNNEST(range(1, len(t))) AS ix(i)
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (
         |  SELECT p.l, p.r, p.pc
         |  FROM p$i p
         |  JOIN tc$i tl ON tl.token = p.l
         |  JOIN tc$i tr ON tr.token = p.r
         |  ORDER BY CAST(p.pc AS DOUBLE) / (CAST(tl.c AS DOUBLE) * CAST(tr.c AS DOUBLE)) DESC,
         |           p.l, p.r
         |  LIMIT 1),
         |w${i + 1} AS MATERIALIZED (
         |  SELECT COALESCE(
         |           replace(toks, ' '||m.l||'  '||m.r||' ', ' '||${oMerged("m")}||' '),
         |           toks) AS toks, freq
         |  FROM w$i LEFT JOIN m$i m ON TRUE)""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }

  /** Encode-side replace chain over a wrapped word expression. */
  private def oEncodeChain(wrapped: String): String =
    (0 until Rounds).foldLeft(wrapped) { (acc, i) =>
      s"COALESCE(replace($acc, ' '||m$i.l||'  '||m$i.r||' ', ' '||${oMerged(s"m$i")}||' '), $acc)"
    }

  private val oMergeJoins: String =
    (0 until Rounds).map(i => s"LEFT JOIN m$i ON TRUE").mkString(" ")

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_wordpiece_learn",
      "WordPiece (BERT-family) tokenizer training: BPE's corpus-once / " +
        "iterate-on-the-compact-table machinery with the LIKELIHOOD " +
        "merge objective pc/(lc*rc) and the ## continuation alphabet. " +
        "Oracle replays all rounds with dynamic argmax feed-through.",
      (s, dir) => {
        val res = WordPieceLearn.learn(
          Tables.load(s, dir, "documents"), "text", Rounds)
        WordPieceLearn.mergesDf(s, res.merges).orderBy(col("rank"))
      },
      Some(s"""WITH $oLearnCtes
              |SELECT 0 AS rank, l AS "left", r AS "right",
              |       ${oMerged("m0")} AS merged, CAST(pc AS BIGINT) AS pair_count
              |FROM m0 m0
              |UNION ALL SELECT 1, l, r, ${oMerged("m1")}, CAST(pc AS BIGINT) FROM m1 m1
              |UNION ALL SELECT 2, l, r, ${oMerged("m2")}, CAST(pc AS BIGINT) FROM m2 m2
              |ORDER BY rank""".stripMargin)),

    GQuery(
      "q_wordpiece_vocab",
      "Post-merge WordPiece subword vocabulary with corpus " +
        "frequencies, read off the learner's final state — initial " +
        "and ##-continuation units are distinct entries, the BERT " +
        "vocab shape.",
      (s, dir) => {
        val res = WordPieceLearn.learn(
          Tables.load(s, dir, "documents"), "text", Rounds)
        WordPieceLearn.vocabulary(res.wordFreq).orderBy(col("token"))
      },
      Some(s"""WITH $oLearnCtes
              |SELECT token, CAST(SUM(freq) AS BIGINT) AS token_count
              |FROM (SELECT unnest(string_split(trim(toks), '  ')) AS token, freq
              |      FROM w$Rounds) u
              |GROUP BY token ORDER BY token""".stripMargin)),

    GQuery(
      "q_wordpiece_maxmatch",
      "Corpus encoded by BERT's greedy longest-match (MaxMatch) " +
        "inference against the learned WordPiece vocabulary — ONE " +
        "scan-time codegen'd expression (vocab as a reference object); " +
        "unmatchable words map whole to [UNK]. Verified by token " +
        "count + rolling-hash fingerprint per document; the oracle " +
        "replays MaxMatch as a recursive CTE over pre-joined " +
        "(position, length, piece) edges.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = WordPieceLearn.learn(docs, "text", Rounds)
        val vocab = WordPieceLearn.vocabulary(res.wordFreq)
          .select("token").collect().map(_.getString(0)).toSeq
        docs
          .select(col("doc_id"),
            WordPieceLearn.maxMatchExpr(col("text"), vocab).as("__t"))
          .select(col("doc_id"),
            size(col("__t")).cast("long").as("n_tokens"),
            graft.functions.TextAnalysis.fingerprint(
              concat_ws(" ", col("__t"))).as("tok_fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE
              |$oLearnCtes,
              |vb AS MATERIALIZED (
              |  SELECT DISTINCT unnest(string_split(trim(toks), '  ')) AS token
              |  FROM w$Rounds),
              |wl AS MATERIALIZED (
              |  SELECT DISTINCT unnest($oToks) AS word FROM documents),
              |egm AS MATERIALIZED (
              |  SELECT w.word, list(struct_pack(i := e.st - 1, negl := -e.k,
              |                                  tok := e.tok)) AS eg
              |  FROM wl w
              |  JOIN (
              |    SELECT word, st, k,
              |           CASE WHEN st = 1 THEN substr(word, st, k)
              |                ELSE '##' || substr(word, st, k) END AS tok
              |    FROM wl,
              |         UNNEST(range(1, length(word) + 1)) AS s(st),
              |         UNNEST(range(1, 8 + 1)) AS kk(k)
              |    WHERE st + k - 1 <= length(word)
              |  ) e ON e.word = w.word AND e.tok IN (SELECT token FROM vb)
              |  GROUP BY w.word),
              |allw AS (
              |  SELECT w.word, length(w.word) AS len,
              |         COALESCE(g.eg, []) AS eg
              |  FROM wl w LEFT JOIN egm g USING (word)),
              |mm AS (
              |  SELECT word, len, eg, 0 AS pos,
              |         CAST([] AS VARCHAR[]) AS pieces, FALSE AS unk
              |  FROM allw
              |  UNION ALL
              |  SELECT word, len, eg,
              |         CASE WHEN pick IS NULL THEN len
              |              ELSE pos - pick['negl'] END AS pos,
              |         list_append(pieces,
              |           CASE WHEN pick IS NULL THEN '[UNK]'
              |                ELSE pick['tok'] END),
              |         pick IS NULL AS unk
              |  FROM (
              |    SELECT *, list_sort(list_filter(eg, e -> e.i = pos))[1] AS pick
              |    FROM mm WHERE pos < len AND NOT unk) x),
              |segW AS MATERIALIZED (
              |  SELECT word, CASE WHEN unk THEN ['[UNK]'] ELSE pieces END AS pieces
              |  FROM mm WHERE (unk OR pos = len) AND pos >= len),
              |dw AS MATERIALIZED (
              |  SELECT doc_id, i AS pos, tk[i] AS w
              |  FROM (SELECT doc_id, $oToks AS tk FROM documents) d,
              |       UNNEST(range(1, len(tk) + 1)) AS r(i)),
              |enc AS MATERIALIZED (
              |  SELECT dw.doc_id, flatten(list(s.pieces ORDER BY dw.pos)) AS tks
              |  FROM dw JOIN segW s ON s.word = dw.w
              |  GROUP BY dw.doc_id)
              |SELECT d.doc_id,
              |       CAST(COALESCE(len(e.tks), 0) AS BIGINT) AS n_tokens,
              |       ${DedupOracles.polyHash(
                        "array_to_string(COALESCE(e.tks, CAST([] AS VARCHAR[])), ' ')")} AS tok_fp
              |FROM documents d LEFT JOIN enc e USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_wordpiece_fertility",
      "Fertility report under the WordPiece tokenizer — comparable to " +
        "q_bpe_fertility and q_unigram_fertility (same denominator).",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = WordPieceLearn.learn(docs, "text", Rounds)
        docs
          .select(col("lang"),
            size(graft.functions.TextAnalysis.tokens(col("text")))
              .cast("long").as("__w"),
            size(WordPieceLearn.encodeExpr(col("text"), res.merges))
              .cast("long").as("__t"))
          .groupBy(col("lang"))
          .agg(sum(col("__w")).as("n_words"), sum(col("__t")).as("n_tokens"))
          .withColumn("fertility_micro",
            floor(lit(1e6) * col("n_tokens").cast("double")
              / col("n_words").cast("double")).cast("long"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $oLearnCtes,
              |enc AS (
              |  SELECT d.lang,
              |    CAST(len($oToks) AS BIGINT) AS w,
              |    CAST(len(flatten(list_transform($oToks,
              |      w2 -> string_split(trim(
              |        ${oEncodeChain(oWrapWp("w2"))}), '  '))))
              |      AS BIGINT) AS t
              |  FROM documents d $oMergeJoins)
              |SELECT lang, CAST(SUM(w) AS BIGINT) AS n_words,
              |       CAST(SUM(t) AS BIGINT) AS n_tokens,
              |       CAST(FLOOR(1e6 * CAST(SUM(t) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)) AS BIGINT)
              |         AS fertility_micro
              |FROM enc GROUP BY lang ORDER BY lang""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.functions.TextAnalysis
import graft.operators.UnigramLearn

/** Unigram-LM (SentencePiece-class) tokenizer training over the
  * documents corpus, oracle-checked end to end: the DuckDB mirror
  * replays the full learner — substring seed, per-round Viterbi
  * E-step as a recursive-CTE dynamic program carrying the best-score
  * and backpointer arrays as lists, usage-count M-step with add-one
  * char smoothing, and the final count prune — on the same integer
  * counts and the same IEEE double products (one division per piece
  * probability, one multiplication per DP candidate, negation for the
  * sort key: all exact, so scores compare bit-identically across
  * engines; ties break to the longest final piece on both sides).
  */
object UnigramQueries extends QueryPack {

  private val MaxLen = 4
  private val MinCount = 2L
  private val SeedCap = 60
  private val Iters = 2
  private val KeepMulti = 24

  private val oToks =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0)"""

  /** Shared front: word-frequency table, the (word, st, k, piece)
    * substring grid, occurrence-weighted counts, and the seed
    * vocabulary v0 (all single chars + top multi-char candidates).
    */
  private val oSeed: String =
    s"""wtab AS MATERIALIZED (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($oToks) AS w FROM documents) u
       |  GROUP BY 1),
       |grid AS MATERIALIZED (
       |  SELECT word, st, k, substr(word, st, k) AS piece
       |  FROM wtab,
       |       UNNEST(range(1, length(word) + 1)) AS s(st),
       |       UNNEST(range(1, $MaxLen + 1)) AS kk(k)
       |  WHERE st + k - 1 <= length(word)),
       |cnt0 AS MATERIALIZED (
       |  SELECT g.piece, CAST(SUM(w.freq) AS BIGINT) AS cnt
       |  FROM grid g JOIN wtab w USING (word)
       |  GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM cnt0 WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM cnt0
       |    WHERE length(piece) > 1 AND cnt >= $MinCount
       |    ORDER BY cnt DESC, piece LIMIT $SeedCap) tmu)""".stripMargin

  /** Viterbi E-step under vocabulary CTE `vin`, producing `seg$i`
    * (word -> piece list). The DP is a recursive CTE advancing one
    * code-point position per iteration across ALL words at once,
    * carrying best/backpointer ARRAYS; the per-position argmax is a
    * pure-expression list_sort over ≤ maxLen candidate structs
    * (negated score, split point) — no aggregate in the recursive
    * term. Backtrack is a second recursion walking the pointers.
    */
  private def oViterbi(i: String, vin: String): String =
    s"""tot$i AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM $vin),
       |eg$i AS MATERIALIZED (
       |  SELECT g.word,
       |         list(struct_pack(i := g.st - 1, j := g.st + g.k - 1,
       |           p := CAST(v.cnt AS DOUBLE) / CAST(tot$i.t AS DOUBLE))) AS eg
       |  FROM grid g JOIN $vin v ON v.piece = g.piece, tot$i
       |  GROUP BY g.word),
       |dp$i AS (
       |  SELECT word, eg, length(word) AS len, 1 AS nj,
       |         [CAST(1.0 AS DOUBLE)] AS best, [0] AS back
       |  FROM eg$i
       |  UNION ALL
       |  SELECT word, eg, len, nj + 1,
       |         list_append(best, pick['negs'] * -1.0),
       |         list_append(back, pick['i'])
       |  FROM (
       |    SELECT *, list_sort(list_transform(
       |        list_filter(eg, e -> e.j = nj),
       |        e -> struct_pack(negs := -(best[e.i + 1] * e.p), i := e.i)))[1] AS pick
       |    FROM dp$i WHERE nj <= len) x),
       |bt$i AS (
       |  SELECT word, back, len AS j, CAST([] AS VARCHAR[]) AS pieces
       |  FROM dp$i WHERE nj = len + 1
       |  UNION ALL
       |  SELECT word, back, back[j + 1],
       |         list_prepend(substr(word, back[j + 1] + 1, j - back[j + 1]), pieces)
       |  FROM bt$i WHERE j > 0),
       |seg$i AS MATERIALIZED (SELECT word, pieces FROM bt$i WHERE j = 0)""".stripMargin

  /** M-step: `vout` = usage counts from `seg$i` (unused multi-char
    * pieces drop out) + add-one smoothing for every single char of
    * `vin` (singles never drop).
    */
  private def oMStep(i: String, vin: String, vout: String): String =
    s"""segcnt$i AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT w.freq, unnest(s.pieces) AS piece
       |        FROM wtab w JOIN seg$i s USING (word)) u
       |  GROUP BY 1),
       |$vout AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
       |    SELECT piece, cnt FROM segcnt$i
       |    UNION ALL
       |    SELECT piece, CAST(1 AS BIGINT) AS cnt FROM $vin WHERE length(piece) = 1
       |  ) u GROUP BY 1)""".stripMargin

  /** Count prune: all single chars + top KeepMulti multi-char pieces. */
  private def oPrune(vin: String, vout: String): String =
    s"""$vout AS MATERIALIZED (
       |  SELECT piece, cnt FROM $vin WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM $vin WHERE length(piece) > 1
       |    ORDER BY cnt DESC, piece LIMIT $KeepMulti) tmu)""".stripMargin

  /** The full learn chain: seed -> Iters EM rounds -> pruned `vf`. */
  private val oLearn: String = {
    val em = (0 until Iters).map(i =>
      oViterbi(i.toString, s"v$i") + ",\n" +
        oMStep(i.toString, s"v$i", s"v${i + 1}"))
    (oSeed +: em :+ oPrune(s"v$Iters", "vf")).mkString(",\n")
  }

  /** Per-word segmentation under the FINAL vocabulary + the per-doc
    * word list with positions (for encode/fertility oracles).
    */
  private val oEncodeBase: String =
    s"""$oLearn,
       |${oViterbi("F", "vf")},
       |dw AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, tk[i] AS w
       |  FROM (SELECT doc_id, $oToks AS tk FROM documents) d,
       |       UNNEST(range(1, len(tk) + 1)) AS r(i))""".stripMargin

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_unigram_learn",
      "Unigram-LM (SentencePiece-class) tokenizer training: substring " +
        "seed, hard-EM rounds (Viterbi E-step on the compact " +
        "word-frequency table via one codegen'd kernel, usage-count " +
        "M-step with char smoothing), count prune. Corpus scanned " +
        "once; the oracle replays the whole learner including the DP " +
        "as recursive CTEs.",
      (s, dir) => {
        val res = UnigramLearn.learn(Tables.load(s, dir, "documents"),
          "text", MaxLen, MinCount, SeedCap, Iters, KeepMulti)
        UnigramLearn.vocabDf(s, res.vocab).orderBy(col("piece"))
      },
      Some(s"""WITH RECURSIVE
              |$oLearn
              |SELECT piece, cnt FROM vf ORDER BY piece""".stripMargin)),

    GQuery(
      "q_unigram_encode",
      "Corpus encoded with the learned unigram table: per-word Viterbi " +
        "segmentation as ONE scan-time codegen'd expression (the piece " +
        "table is a reference object — no join, no shuffle). Verified " +
        "by token count + rolling-hash fingerprint per document.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = UnigramLearn.learn(docs, "text", MaxLen, MinCount,
          SeedCap, Iters, KeepMulti)
        docs
          .select(col("doc_id"),
            UnigramLearn.encodeExpr(col("text"), res.vocab).as("__t"))
          .select(col("doc_id"),
            size(col("__t")).cast("long").as("n_tokens"),
            TextAnalysis.fingerprint(concat_ws(" ", col("__t"))).as("tok_fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE
              |$oEncodeBase,
              |enc AS MATERIALIZED (
              |  SELECT dw.doc_id, flatten(list(s.pieces ORDER BY dw.pos)) AS tks
              |  FROM dw JOIN segF s ON s.word = dw.w
              |  GROUP BY dw.doc_id)
              |SELECT d.doc_id,
              |       CAST(COALESCE(len(e.tks), 0) AS BIGINT) AS n_tokens,
              |       ${DedupOracles.polyHash(
                        "array_to_string(COALESCE(e.tks, CAST([] AS VARCHAR[])), ' ')")} AS tok_fp
              |FROM documents d LEFT JOIN enc e USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_unigram_fertility",
      "Fertility report under the unigram tokenizer — directly " +
        "comparable to q_bpe_fertility (same denominator: whitespace " +
        "words; numerator counts Viterbi pieces).",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = UnigramLearn.learn(docs, "text", MaxLen, MinCount,
          SeedCap, Iters, KeepMulti)
        docs
          .select(col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("__w"),
            size(UnigramLearn.encodeExpr(col("text"), res.vocab))
              .cast("long").as("__t"))
          .groupBy(col("lang"))
          .agg(sum(col("__w")).as("n_words"), sum(col("__t")).as("n_tokens"))
          .withColumn("fertility_micro",
            floor(lit(1e6) * col("n_tokens").cast("double")
              / col("n_words").cast("double")).cast("long"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH RECURSIVE
              |$oEncodeBase,
              |dtok AS MATERIALIZED (
              |  SELECT dw.doc_id, CAST(SUM(len(s.pieces)) AS BIGINT) AS t
              |  FROM dw JOIN segF s ON s.word = dw.w
              |  GROUP BY 1),
              |fert AS (
              |  SELECT d.lang, CAST(len($oToks) AS BIGINT) AS w,
              |         CAST(COALESCE(dt.t, 0) AS BIGINT) AS t
              |  FROM documents d LEFT JOIN dtok dt USING (doc_id))
              |SELECT lang, CAST(SUM(w) AS BIGINT) AS n_words,
              |       CAST(SUM(t) AS BIGINT) AS n_tokens,
              |       CAST(FLOOR(1e6 * CAST(SUM(t) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)) AS BIGINT)
              |         AS fertility_micro
              |FROM fert GROUP BY lang ORDER BY lang""".stripMargin)),

    GQuery(
      "q_pack_tokenized",
      "Sequence packing under MODEL-accurate token counts: the corpus " +
        "is encoded with the learned unigram tokenizer (scan-time " +
        "Viterbi kernel) and packed into 2048-token bins on those " +
        "counts — the CorpusPipeline.tokenizerPath semantics, so pack " +
        "budgets mean real model tokens, not whitespace words. Oracle " +
        "replays the learner + encode and mirrors the running-total " +
        "bin arithmetic.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = UnigramLearn.learn(docs, "text", MaxLen, MinCount,
          SeedCap, Iters, KeepMulti)
        val counted = docs.select(col("doc_id"),
          size(UnigramLearn.encodeExpr(col("text"), res.vocab))
            .cast("long").as("n_tokens"))
        graft.operators.SeqPack.packByBudget(counted, "doc_id", "n_tokens",
          budget = 2048L)
          .select(col("doc_id"), col("n_tokens"), col("bin_id"),
            col("bin_offset"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE
              |$oEncodeBase,
              |dtok AS MATERIALIZED (
              |  SELECT dw.doc_id, CAST(SUM(len(s.pieces)) AS BIGINT) AS t
              |  FROM dw JOIN segF s ON s.word = dw.w
              |  GROUP BY 1),
              |tok AS (
              |  SELECT d.doc_id, CAST(COALESCE(dt.t, 0) AS BIGINT) AS n_tokens
              |  FROM documents d LEFT JOIN dtok dt USING (doc_id)),
              |cum AS (
              |  SELECT doc_id, n_tokens,
              |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |           AS BIGINT) AS tokens_before
              |  FROM tok)
              |SELECT doc_id, n_tokens,
              |       CAST(FLOOR(CAST(tokens_before AS DOUBLE) / 2048.0) AS BIGINT) AS bin_id,
              |       tokens_before -
              |         CAST(FLOOR(CAST(tokens_before AS DOUBLE) / 2048.0) AS BIGINT) * 2048 AS bin_offset
              |FROM cum ORDER BY doc_id""".stripMargin))
  )
}

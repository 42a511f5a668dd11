package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.functions.TextAnalysis
import graft.operators.BpeLearn

/** BPE tokenizer training over the documents corpus, oracle-checked:
  * the DuckDB mirror replays the full learner — word-frequency table,
  * per-round pair counts, argmax merge selection, and merge application
  * via the shared wrapped-token `replace()` semantics — with three
  * unrolled MATERIALIZED rounds (plain CTEs re-expand exponentially down
  * the chain, the same lesson as the full-pipeline oracle). The merge
  * choices feed the oracle DYNAMICALLY (each round's argmax row is
  * cross-joined into the next round's replace), so nothing about the
  * learned tokenizer is hard-coded on either side.
  */
object BpeQueries extends QueryPack {

  private val Rounds = 3

  private val oToks =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0)"""

  /** Char-mode wrap of a word expression: "ab" -> " a  b ". */
  private def oWrapChars(w: String): String =
    s"regexp_replace($w, '(.)', ' \\1 ', 'g')"

  /** Byte-mode wrap: UTF-8 bytes as 2-hex-digit tokens + the "_"
    * end-of-word marker — "ab" -> " 61  62  _ ". Mirrors
    * BpeLearn.wrapBytes (both engines emit uppercase hex).
    */
  private def oWrapBytes(w: String): String =
    s"regexp_replace(hex(encode($w)), '(..)', ' \\1 ', 'g') || ' _ '"

  /** w0 (word-frequency) + `Rounds` unrolled (pair-count, argmax, apply)
    * round CTEs: w0 → p0 → m0 → w1 → … → w`Rounds`; `oWrap` picks the
    * alphabet (char vs byte mode).
    */
  private def oLearnCtes(oWrap: String => String = oWrapChars): String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT ${oWrap("w")} AS toks, count(*) AS freq
         |  FROM (SELECT unnest($oToks) AS w FROM documents) u
         |  GROUP BY 1)""".stripMargin
    // merge application LEFT JOINs the (single-row) argmax so an
    // EXHAUSTED round (no adjacent pair left — the learner's early-stop
    // case) is a no-op pass instead of emptying every downstream CTE:
    // replace() with a NULL needle is NULL, COALESCE falls back to the
    // unmerged state, and the learn oracle's UNION arms contribute zero
    // rows for empty rounds, exactly like the early-stopped learner
    val rounds = (0 until Rounds).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT t[i] AS l, t[i+1] AS r, SUM(freq) AS pc
         |  FROM (SELECT string_split(trim(toks), '  ') AS t, freq FROM w$i) x,
         |       UNNEST(range(1, len(t))) AS ix(i)
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT l, r, pc FROM p$i ORDER BY pc DESC, l, r LIMIT 1),
         |w${i + 1} AS MATERIALIZED (
         |  SELECT COALESCE(
         |           replace(toks, ' '||m.l||'  '||m.r||' ', ' '||m.l||m.r||' '),
         |           toks) AS toks, freq
         |  FROM w$i LEFT JOIN m$i m ON TRUE)""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }

  /** Encode-side replace chain over a wrapped word expression, each
    * round early-stop-safe via the same COALESCE no-op as the learn
    * CTEs (the chain nests `expr` twice per round — fine at oracle
    * Rounds; the engine's large-m path is the BpeEncode kernel).
    */
  private def oEncodeChain(wrapped: String): String =
    (0 until Rounds).foldLeft(wrapped) { (acc, i) =>
      s"COALESCE(replace($acc, ' '||m$i.l||'  '||m$i.r||' ', ' '||m$i.l||m$i.r||' '), $acc)"
    }

  /** LEFT JOIN every argmax row so empty (exhausted) rounds no-op. */
  private val oMergeJoins: String =
    (0 until Rounds).map(i => s"LEFT JOIN m$i ON TRUE").mkString(" ")

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_bpe_learn",
      "Distributed BPE tokenizer training (Sennrich et al. 2016): one " +
        "corpus scan builds the compact word-frequency table, then each " +
        "merge round is a pair-count groupBy + TakeOrdered argmax on it " +
        "— corpus-size-independent iteration. Oracle replays all rounds.",
      (s, dir) => {
        val res = BpeLearn.learn(Tables.load(s, dir, "documents"), "text", Rounds)
        BpeLearn.mergesDf(s, res.merges).orderBy(col("rank"))
      },
      Some(s"""WITH ${oLearnCtes()}
              |SELECT 0 AS rank, l AS "left", r AS "right", CAST(pc AS BIGINT) AS pair_count FROM m0
              |UNION ALL SELECT 1, l, r, CAST(pc AS BIGINT) FROM m1
              |UNION ALL SELECT 2, l, r, CAST(pc AS BIGINT) FROM m2
              |ORDER BY rank""".stripMargin)),

    GQuery(
      "q_bpe_vocab",
      "Post-merge subword vocabulary with corpus frequencies, read off " +
        "the learner's final word-frequency state — the corpus is never " +
        "rescanned after the single word-count pass.",
      (s, dir) => {
        val res = BpeLearn.learn(Tables.load(s, dir, "documents"), "text", Rounds)
        BpeLearn.vocabulary(res.wordFreq).orderBy(col("token"))
      },
      Some(s"""WITH ${oLearnCtes()}
              |SELECT token, CAST(SUM(freq) AS BIGINT) AS token_count
              |FROM (SELECT unnest(string_split(trim(toks), '  ')) AS token, freq
              |      FROM w$Rounds) u
              |GROUP BY token ORDER BY token""".stripMargin)),

    GQuery(
      "q_bpe_encode",
      "Corpus encoded with the learned merges: per-word wrapped-token " +
        "replace chain, pure scan-time codegen (the merge table rides as " +
        "literals — no join). Verified by token count + a rolling-hash " +
        "fingerprint of the full token stream per document.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = BpeLearn.learn(docs, "text", Rounds)
        docs
          .select(col("doc_id"),
            BpeLearn.encodeExpr(col("text"), res.merges).as("__t"))
          .select(col("doc_id"),
            size(col("__t")).cast("long").as("n_tokens"),
            TextAnalysis.fingerprint(concat_ws(" ", col("__t"))).as("tok_fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${oLearnCtes()},
              |enc AS (
              |  SELECT d.doc_id,
              |    flatten(list_transform($oToks,
              |      w -> string_split(trim(
              |        ${oEncodeChain("regexp_replace(w, '(.)', ' \\1 ', 'g')")}), '  '))) AS tks
              |  FROM documents d $oMergeJoins)
              |SELECT doc_id, CAST(len(tks) AS BIGINT) AS n_tokens,
              |  ${DedupOracles.polyHash("array_to_string(tks, ' ')")} AS tok_fp
              |FROM enc ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_bpe_fertility",
      "Tokenizer fertility report per language — subword tokens per " +
        "word under the learned merges, the standard tokenizer-quality " +
        "metric (high fertility = the vocabulary serves that language " +
        "badly). Fixed-point micro ratio keeps the report " +
        "engine-portable.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = BpeLearn.learn(docs, "text", Rounds)
        docs
          .select(col("lang"),
            size(graft.functions.TextAnalysis.tokens(col("text")))
              .cast("long").as("__w"),
            size(BpeLearn.encodeExpr(col("text"), res.merges))
              .cast("long").as("__t"))
          .groupBy(col("lang"))
          .agg(sum(col("__w")).as("n_words"), sum(col("__t")).as("n_tokens"))
          .withColumn("fertility_micro",
            floor(lit(1e6) * col("n_tokens").cast("double")
              / col("n_words").cast("double")).cast("long"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH ${oLearnCtes()},
              |enc AS (
              |  SELECT d.lang,
              |    CAST(len($oToks) AS BIGINT) AS w,
              |    CAST(len(flatten(list_transform($oToks,
              |      w2 -> string_split(trim(
              |        ${oEncodeChain("regexp_replace(w2, '(.)', ' \\1 ', 'g')")}), '  '))))
              |      AS BIGINT) AS t
              |  FROM documents d $oMergeJoins)
              |SELECT lang, CAST(SUM(w) AS BIGINT) AS n_words,
              |       CAST(SUM(t) AS BIGINT) AS n_tokens,
              |       CAST(FLOOR(1e6 * CAST(SUM(t) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)) AS BIGINT)
              |         AS fertility_micro
              |FROM enc GROUP BY lang ORDER BY lang""".stripMargin)),

    GQuery(
      "q_bpe_learn_bytes",
      "Byte-level BPE training (the GPT-2/tiktoken-class alphabet): " +
        "tokens are UTF-8 byte values (2-hex-digit) with a terminal " +
        "end-of-word marker, so merges can learn multi-byte characters " +
        "and word-final units — different learned merges than char " +
        "mode on any non-ASCII corpus. Same corpus-once/vocab-iterate " +
        "plan; oracle replays the byte alphabet end to end.",
      (s, dir) => {
        val res = BpeLearn.learn(Tables.load(s, dir, "documents"), "text",
          Rounds, byteLevel = true)
        BpeLearn.mergesDf(s, res.merges).orderBy(col("rank"))
      },
      Some(s"""WITH ${oLearnCtes(oWrapBytes)}
              |SELECT 0 AS rank, l AS "left", r AS "right", CAST(pc AS BIGINT) AS pair_count FROM m0
              |UNION ALL SELECT 1, l, r, CAST(pc AS BIGINT) FROM m1
              |UNION ALL SELECT 2, l, r, CAST(pc AS BIGINT) FROM m2
              |ORDER BY rank""".stripMargin)),

    GQuery(
      "q_bpe_fertility_bytes",
      "Fertility report under the byte-level tokenizer — directly " +
        "comparable to q_bpe_fertility's char-mode numbers (same " +
        "denominator: whitespace words; numerator counts byte-alphabet " +
        "subword tokens incl. the end-of-word marker).",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val res = BpeLearn.learn(docs, "text", Rounds, byteLevel = true)
        docs
          .select(col("lang"),
            size(graft.functions.TextAnalysis.tokens(col("text")))
              .cast("long").as("__w"),
            size(BpeLearn.encodeExpr(col("text"), res.merges,
              byteLevel = true)).cast("long").as("__t"))
          .groupBy(col("lang"))
          .agg(sum(col("__w")).as("n_words"), sum(col("__t")).as("n_tokens"))
          .withColumn("fertility_micro",
            floor(lit(1e6) * col("n_tokens").cast("double")
              / col("n_words").cast("double")).cast("long"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH ${oLearnCtes(oWrapBytes)},
              |enc AS (
              |  SELECT d.lang,
              |    CAST(len($oToks) AS BIGINT) AS w,
              |    CAST(len(flatten(list_transform($oToks,
              |      w2 -> string_split(trim(
              |        ${oEncodeChain(oWrapBytes("w2"))}), '  '))))
              |      AS BIGINT) AS t
              |  FROM documents d $oMergeJoins)
              |SELECT lang, CAST(SUM(w) AS BIGINT) AS n_words,
              |       CAST(SUM(t) AS BIGINT) AS n_tokens,
              |       CAST(FLOOR(1e6 * CAST(SUM(t) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)) AS BIGINT)
              |         AS fertility_micro
              |FROM enc GROUP BY lang ORDER BY lang""".stripMargin))
  )
}

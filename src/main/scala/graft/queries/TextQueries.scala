package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.functions.TextAnalysis._

/** Text-analysis operators over the documents table, oracle-checked.
  * The DuckDB oracles are mechanical translations of the same scalar
  * pipelines (list_filter/list_reduce instead of filter/aggregate).
  */
object TextQueries extends QueryPack {

  // DuckDB fragments mirroring TextAnalysis
  private val oToks =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0)"""
  private val oStop = "['the','a','an','and','or','of','to','in','is','it']"

  /** CTE chain `tk → … → sc` replaying TextScore.bigramLogProb: per-doc
    * bigram count + exact integer micro-log-prob sum under the corpus
    * add-one-smoothed bigram model. Shared by the raw score query and
    * the CCNet perplexity-bucket query so the two oracles can never
    * drift apart.
    */
  private val bigramChain: String =
    s"""tk AS (
       |  SELECT doc_id, $oToks AS t FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i ->
       |    struct_pack(b := ${DedupOracles.polyHash("t[i] || ' ' || t[i+1]")},
       |                c := ${DedupOracles.polyHash("t[i]")}))) AS u
       |  FROM tk),
       |r AS (SELECT doc_id, u.b AS b, u.c AS c FROM bg),
       |cb AS (SELECT b, c, COUNT(*) AS cbn FROM r GROUP BY b, c),
       |cu AS (SELECT c, COUNT(*) AS cun FROM r GROUP BY c),
       |vv AS (SELECT COUNT(*) AS v FROM cu),
       |w AS (
       |  SELECT b,
       |         CAST(floor(1000000.0 * ln(
       |           CAST(cbn + 1 AS DOUBLE) / CAST(cun + v AS DOUBLE))) AS BIGINT) AS wm
       |  FROM cb JOIN cu USING (c) CROSS JOIN vv),
       |sc AS (
       |  SELECT r.doc_id, COUNT(*) AS n_bigrams, SUM(wm) AS s
       |  FROM r JOIN w USING (b) GROUP BY r.doc_id)""".stripMargin

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_text_tokens",
      "Token counting: whitespace tokens + BPE-ish subword count, pure " +
        "codegen'd expressions (no UDF).",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).cast("long").as("n_tokens"),
            bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CAST(len($oToks) AS BIGINT) AS n_tokens,
              |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_text_quality",
      "Quality scoring: punctuation ratio, stopword ratio, mean token " +
        "length, composite score — per-document scalar pipeline.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            round(punctRatio(col("text")), 6).as("punct_ratio"),
            round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
            round(meanTokenLen(col("text")), 6).as("mean_token_len"),
            qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
              |  SELECT doc_id, text, $oToks AS toks,
              |    CAST(length(text) AS DOUBLE) AS n_chars
              |  FROM documents),
              |m AS (
              |  SELECT doc_id,
              |    (n_chars - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g'))) / greatest(n_chars, 1.0) AS pr,
              |    CAST(len(list_filter(toks, t2 -> list_contains($oStop, t2))) AS DOUBLE)
              |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS sr,
              |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
              |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS mtl,
              |    n_chars
              |  FROM t)
              |SELECT doc_id,
              |  round(pr, 6) AS punct_ratio,
              |  round(sr, 6) AS stopword_ratio,
              |  round(mtl, 6) AS mean_token_len,
              |  round(least(n_chars / 400.0, 1.0) * 0.4
              |      + least(sr * 5.0, 1.0) * 0.4
              |      + (1.0 - least(pr * 4.0, 1.0)) * 0.2, 6) AS quality
              |FROM m ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_lang_id",
      "Stopword-vote language ID with deterministic tie precedence, " +
        "plus agreement against the labeled lang column.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            langId(col("text")).as("lang_pred"))
          .withColumn("agree", (col("lang") === col("lang_pred")).cast("int"))
          .orderBy(col("doc_id")),
      Some {
        val votes = LangMarkers.map { case (lang, markers) =>
          val arr = markers.map(m => s"'$m'").mkString("[", ",", "]")
          s"CAST(len(list_filter(toks, t2 -> list_contains($arr, t2))) AS INT) AS v_$lang"
        }.mkString(",\n    ")
        val best = LangMarkers.map { case (l, _) => s"v_$l" }.mkString("greatest(", ", ", ")")
        val cases = LangMarkers.map { case (l, _) =>
          s"WHEN v_$l = best AND best > 0 THEN '$l'"
        }.mkString("\n    ")
        s"""WITH t AS (
           |  SELECT doc_id, lang, $oToks AS toks FROM documents),
           |v AS (
           |  SELECT doc_id, lang,
           |    $votes
           |  FROM t),
           |b AS (SELECT *, $best AS best FROM v)
           |SELECT doc_id, lang,
           |  CASE
           |    $cases
           |    ELSE 'unknown' END AS lang_pred,
           |  CAST(lang = (CASE
           |    $cases
           |    ELSE 'unknown' END) AS INT) AS agree
           |FROM b ORDER BY doc_id""".stripMargin
      }),

    GQuery(
      "q_lang_id_ngram",
      "Char-n-gram language ID: per-language character-gram profiles, " +
        "vote = characters matched (length shrinkage under gram " +
        "removal — exact string arithmetic on both engines), argmax " +
        "with declaration precedence.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            langIdNgram(col("text")).as("lang_pred"))
          .withColumn("agree", (col("lang") === col("lang_pred")).cast("int"))
          .orderBy(col("doc_id")),
      Some {
        val votes = CharGramMarkers.map { case (lang, grams) =>
          val terms = grams.map(g =>
            s"(length(lower(text)) - length(replace(lower(text), '$g', '')))")
          s"CAST(${terms.mkString(" + ")} AS INT) AS v_$lang"
        }.mkString(",\n    ")
        val best = CharGramMarkers.map { case (l, _) => s"v_$l" }.mkString("greatest(", ", ", ")")
        val cases = CharGramMarkers.map { case (l, _) =>
          s"WHEN v_$l = best AND best > 0 THEN '$l'"
        }.mkString("\n    ")
        s"""WITH v AS (
           |  SELECT doc_id, lang,
           |    $votes
           |  FROM documents),
           |b AS (SELECT *, $best AS best FROM v)
           |SELECT doc_id, lang,
           |  CASE
           |    $cases
           |    ELSE 'unknown' END AS lang_pred,
           |  CAST(lang = (CASE
           |    $cases
           |    ELSE 'unknown' END) AS INT) AS agree
           |FROM b ORDER BY doc_id""".stripMargin
      }),

    GQuery(
      "q_repetition",
      "Within-document repetition ratio (1 - distinct/total 3-gram " +
        "shingles): the boilerplate/loop-generated-text quality signal " +
        "corpus filters threshold on. Hash-space distinctness, scan-time " +
        "expressions only.",
      (s, dir) => {
        val sh = org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(
          tokens(col("text")), 3)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), size(sh).as("total"),
            size(array_distinct(sh)).as("dst"))
          .filter(col("total") > 0)
          .select(col("doc_id"),
            (lit(1.0) - col("dst").cast("double") / col("total").cast("double"))
              .as("rep_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
             |                             t -> length(t) > 0) AS tk
             |  FROM documents),
             |shl AS (
             |  SELECT doc_id,
             |         unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
             |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
             |  FROM toks),
             |h AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(sh, ''), c -> CAST(ascii(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 1000000007) AS hv
             |  FROM shl),
             |rep AS (
             |  SELECT doc_id, COUNT(*) AS total, COUNT(DISTINCT hv) AS dst
             |  FROM h GROUP BY doc_id)
             |SELECT doc_id,
             |       1.0 - CAST(dst AS DOUBLE) / CAST(total AS DOUBLE) AS rep_ratio
             |FROM rep WHERE total > 0 ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_redact",
      "PII-style redaction: emails and 6+-digit runs replaced by typed " +
        "tags (replace-all on both engines; synthesized suffix " +
        "guarantees every doc has matches). Per-row scalar regex — " +
        "zero shuffles, cost = the scan.",
      (s, dir) => {
        val synth = concat(col("text"), lit(" user"), col("doc_id").cast("string"),
          lit("@example.com id "), (col("doc_id") * 1000000L).cast("string"))
        Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"),
            length(synth).cast("long").as("n_before"),
            length(redact(synth)).cast("long").as("n_after"),
            (synth =!= redact(synth)).as("changed"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |         text || ' user' || CAST(doc_id AS VARCHAR) ||
              |         '@example.com id ' || CAST(doc_id * 1000000 AS VARCHAR) AS t
              |  FROM documents WHERE doc_id < 100),
              |r AS (
              |  SELECT doc_id, t,
              |         regexp_replace(
              |           regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
              |           '$LongNumRe', '<NUM>', 'g') AS rt
              |  FROM s)
              |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_before,
              |       CAST(length(rt) AS BIGINT) AS n_after,
              |       t <> rt AS changed
              |FROM r ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_pii_redact",
      "Full PII scrub (BigCode/StarCoder-class): email, 40+-char " +
        "secret, SSN, IPv4, phone, residual digit run — six ordered " +
        "replace-alls to typed tags, order load-bearing (keys before " +
        "phones so a phone pattern cannot shred a token's digit runs; " +
        "SSN/IP before the phone-shaped catch-all). The synthesized " +
        "suffix carries one of EACH PII type; the oracle replays the " +
        "identical chain, so the full redacted text hash-matches.",
      (s, dir) => {
        val synth = concat(col("text"),
          lit(" mail user"), col("doc_id").cast("string"),
          lit("@example.com ssn 123-45-6789 host 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 call +1 (415) 555-0199 key "),
          lit("AbCdEf0123456789AbCdEf0123456789AbCdEf01"),
          lit(" pin 123456 done."))
        val red = redactPii(synth)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            length(synth).cast("long").as("n_before"),
            length(red).cast("long").as("n_after"),
            red.as("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |         text || ' mail user' || CAST(doc_id AS VARCHAR) ||
              |         '@example.com ssn 123-45-6789 host 10.0.' ||
              |         CAST(doc_id % 256 AS VARCHAR) ||
              |         '.7 call +1 (415) 555-0199 key ' ||
              |         'AbCdEf0123456789AbCdEf0123456789AbCdEf01' ||
              |         ' pin 123456 done.' AS t
              |  FROM documents),
              |r AS (
              |  SELECT doc_id, t,
              |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              |      regexp_replace(regexp_replace(t,
              |        '$EmailRe', '<EMAIL>', 'g'),
              |        '$SecretRe', '<KEY>', 'g'),
              |        '$SsnRe', '<SSN>', 'g'),
              |        '$Ipv4Re', '<IP>', 'g'),
              |        '$PhoneRe', '<PHONE>', 'g'),
              |        '$LongNumRe', '<NUM>', 'g') AS rt
              |  FROM s)
              |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_before,
              |       CAST(length(rt) AS BIGINT) AS n_after,
              |       rt AS clean_text
              |FROM r ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_pii_stats",
      "Per-source PII incidence report (the datasheet metric a " +
        "curation run publishes): tag counts per type over the " +
        "scrubbed text — exact integer length arithmetic, consistent " +
        "with the redaction by construction. Every doc carries an " +
        "email; SSN/IP/phone/key/num appear on doc_id residues, so " +
        "per-source counts differ and actually exercise the " +
        "aggregation.",
      (s, dir) => {
        val synth = concat(col("text"),
          lit(" mail user"), col("doc_id").cast("string"),
          lit("@example.com"),
          when(col("doc_id") % 2 === 0, lit(" ssn 123-45-6789"))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0, concat(lit(" host 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit(" call +1 (415) 555-0199"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" key AbCdEf0123456789AbCdEf0123456789AbCdEf01"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" pin 654321"))
            .otherwise(lit("")),
          lit(" done."))
        val red = redactPii(synth)
        Tables.load(s, dir, "documents")
          .select(col("source"), red.as("__r"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(tagCount(col("__r"), "<EMAIL>")).as("n_email"),
            sum(tagCount(col("__r"), "<SSN>")).as("n_ssn"),
            sum(tagCount(col("__r"), "<IP>")).as("n_ip"),
            sum(tagCount(col("__r"), "<PHONE>")).as("n_phone"),
            sum(tagCount(col("__r"), "<KEY>")).as("n_key"),
            sum(tagCount(col("__r"), "<NUM>")).as("n_num"))
          .orderBy(col("source"))
      },
      Some {
        def cnt(tag: String, w: Int, as: String) =
          s"CAST(SUM(CAST((length(rt) - length(replace(rt, '$tag', ''))) / $w AS BIGINT)) AS BIGINT) AS $as"
        s"""WITH s AS (
           |  SELECT source,
           |         text || ' mail user' || CAST(doc_id AS VARCHAR) ||
           |         '@example.com' ||
           |         (CASE WHEN doc_id % 2 = 0 THEN ' ssn 123-45-6789' ELSE '' END) ||
           |         (CASE WHEN doc_id % 3 = 0
           |               THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
           |               ELSE '' END) ||
           |         (CASE WHEN doc_id % 5 = 0 THEN ' call +1 (415) 555-0199' ELSE '' END) ||
           |         (CASE WHEN doc_id % 7 = 0
           |               THEN ' key AbCdEf0123456789AbCdEf0123456789AbCdEf01'
           |               ELSE '' END) ||
           |         (CASE WHEN doc_id % 11 = 0 THEN ' pin 654321' ELSE '' END) ||
           |         ' done.' AS t
           |  FROM documents),
           |r AS (
           |  SELECT source,
           |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           |      regexp_replace(regexp_replace(t,
           |        '$EmailRe', '<EMAIL>', 'g'),
           |        '$SecretRe', '<KEY>', 'g'),
           |        '$SsnRe', '<SSN>', 'g'),
           |        '$Ipv4Re', '<IP>', 'g'),
           |        '$PhoneRe', '<PHONE>', 'g'),
           |        '$LongNumRe', '<NUM>', 'g') AS rt
           |  FROM s)
           |SELECT source, COUNT(*) AS n_docs,
           |  ${cnt("<EMAIL>", 7, "n_email")},
           |  ${cnt("<SSN>", 5, "n_ssn")},
           |  ${cnt("<IP>", 4, "n_ip")},
           |  ${cnt("<PHONE>", 7, "n_phone")},
           |  ${cnt("<KEY>", 5, "n_key")},
           |  ${cnt("<NUM>", 5, "n_num")}
           |FROM r GROUP BY source ORDER BY source""".stripMargin
      }),

    GQuery(
      "q_corpus_report",
      "Corpus composition report (datasheets-for-datasets): per " +
        "(source, lang) segment — doc count, exact-unique text count " +
        "(distinct fingerprints: the exact-dup rate per segment), " +
        "token and char totals, length extrema. ONE scan, every " +
        "aggregate map-side-combinable, all-integer output (no float " +
        "drift across engines).",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(col("source"), col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(fingerprint(col("text"))).as("n_unique_texts"),
            sum(tokenCount(col("text")).cast("long")).as("n_tokens"),
            sum(col("n_chars")).as("total_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("source"), col("lang")),
      Some(s"""WITH t AS (
              |  SELECT source, lang, n_chars,
              |    list_reduce(
              |      list_prepend(CAST(0 AS BIGINT),
              |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
              |      (a, c) -> (a * 31 + c) % 1000000007) AS fp,
              |    CAST(len($oToks) AS BIGINT) AS ntok
              |  FROM documents)
              |SELECT source, lang,
              |  COUNT(*) AS n_docs,
              |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_texts,
              |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
              |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              |  MIN(n_chars) AS min_chars,
              |  MAX(n_chars) AS max_chars
              |FROM t GROUP BY source, lang
              |ORDER BY source, lang""".stripMargin)),

    GQuery(
      "q_fingerprint",
      "Document fingerprinting: polynomial rolling hash over characters " +
        "(mod 1e9+7), grouped to expose exact-duplicate clusters.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("first_doc")),
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 1000000007) AS fp
             |  FROM documents)
             |SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
             |FROM f GROUP BY fp ORDER BY first_doc""".stripMargin)),

    GQuery(
      "q_word_freq_score",
      "Corpus-statistics quality score (CCNet-family signal): per doc, " +
        "the mean corpus frequency of its words — integer sums over a " +
        "data-derived frequency table, one final double division for " +
        "bit-exactness. One persisted tokenize pass; the zipf head " +
        "(top-K hot tokens) joins from a broadcast map-side, only the " +
        "de-skewed cold tail shuffle-joins.",
      (s, dir) =>
        graft.operators.TextScore.wordFreqScore(
          Tables.load(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(s"""WITH w AS (
              |  SELECT doc_id, unnest($oToks) AS w FROM documents),
              |f AS (SELECT w, COUNT(*) AS wc FROM w GROUP BY w),
              |tot AS (SELECT CAST(SUM(wc) AS BIGINT) AS total FROM f),
              |s AS (
              |  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(wc) AS BIGINT) AS sum_wc
              |  FROM w JOIN f USING (w) GROUP BY doc_id)
              |SELECT d.doc_id,
              |       CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
              |       COALESCE(CAST(s.sum_wc AS DOUBLE) /
              |                (CAST(s.n_tokens AS DOUBLE) * CAST(t.total AS DOUBLE)),
              |                0.0) AS freq_score
              |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id CROSS JOIN tot t
              |ORDER BY d.doc_id""".stripMargin)),

    GQuery(
      "q_bigram_logprob",
      "Bigram language-model score (the CCNet perplexity-filter " +
        "analog): per doc, the add-one-smoothed conditional " +
        "log-probability of its bigrams under the corpus bigram model, " +
        "in exact integer micro-log-prob units plus one final double " +
        "average. Zipf head broadcast, cold tail shuffle-joined.",
      (s, dir) =>
        graft.operators.TextScore.bigramLogProb(
          Tables.load(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(s"""WITH $bigramChain
              |SELECT d.doc_id,
              |       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
              |       CAST(COALESCE(s, 0) AS BIGINT) AS logprob_micro,
              |       COALESCE(CAST(s AS DOUBLE) /
              |                (CAST(n_bigrams AS DOUBLE) * 1000000.0), 0.0) AS avg_logprob
              |FROM documents d LEFT JOIN sc USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    GQuery(
      "q_perplexity_buckets",
      "CCNet perplexity partitioning: within each language, rank docs " +
        "by the corpus bigram-LM average and split into head (best 25% " +
        "of the token mass), middle (next 50%), tail — the " +
        "quality-by-volume cut a curation pipeline keeps or drops. " +
        "Per-language cumulative totals via the two-pass " +
        "range-partitioned prefix sum (no single-partition window); " +
        "unscoreable docs go straight to the tail.",
      (s, dir) =>
        graft.operators.PerplexityBuckets.bucketize(
          Tables.load(s, dir, "documents"), "doc_id", "text", "lang",
          headFrac = 0.25, midFrac = 0.5)
          .orderBy(col("doc_id")),
      Some(s"""WITH $bigramChain,
              |scored AS (
              |  SELECT d.doc_id, d.lang,
              |         CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
              |         COALESCE(CAST(s AS DOUBLE) /
              |                  (CAST(n_bigrams AS DOUBLE) * 1000000.0), 0.0)
              |           AS avg_logprob
              |  FROM documents d LEFT JOIN sc USING (doc_id)),
              |cum AS (
              |  SELECT doc_id, lang, n_bigrams, avg_logprob,
              |    SUM(n_bigrams) OVER (PARTITION BY lang
              |      ORDER BY avg_logprob DESC, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
              |    SUM(n_bigrams) OVER (PARTITION BY lang) AS tot
              |  FROM scored WHERE n_bigrams > 0)
              |SELECT doc_id, lang, n_bigrams, avg_logprob,
              |  CASE WHEN CAST(c AS DOUBLE) <= CAST(tot AS DOUBLE) * CAST(0.25 AS DOUBLE)
              |         THEN 'head'
              |       WHEN CAST(c AS DOUBLE) <= CAST(tot AS DOUBLE) * CAST(0.75 AS DOUBLE)
              |         THEN 'middle'
              |       ELSE 'tail' END AS bucket
              |FROM cum
              |UNION ALL
              |SELECT doc_id, lang, n_bigrams, avg_logprob, 'tail' AS bucket
              |FROM scored WHERE n_bigrams = 0
              |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_dsir_select",
      "DSIR-style data selection (importance resampling): hashed " +
        "unigram+bigram features (512 buckets), add-one-smoothed " +
        "target-vs-raw log-likelihood-ratio weights floored to integer " +
        "micro-LLR units, per-doc integer score sums, deterministic " +
        "Gumbel-top-50 selection keyed on the corpus-standard id hash. " +
        "The full recipe — features, fit, score, resample — is " +
        "mirrored in the DuckDB oracle.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.ImportanceResample.select(
          docs.select(col("doc_id"), col("text")),
          docs.filter(col("source") === "src0")
            .select(col("doc_id"), col("text")),
          "doc_id", "text", buckets = 512, k = 50)
          .orderBy(col("doc_id"))
      },
      // Oracle note: target (src0) is a subset of raw (all documents),
      // so every target bucket also appears in the raw bucket counts —
      // a LEFT JOIN from rc is exactly the FULL JOIN here, using only
      // constructs every other green oracle already exercises (the
      // UNION ALL n-gram stack likewise replaces list_concat).
      Some(s"""WITH tk AS (
              |  SELECT doc_id, source, $oToks AS t FROM documents),
              |ng AS (
              |  SELECT doc_id, source, unnest(t) AS g FROM tk
              |  UNION ALL
              |  SELECT doc_id, source,
              |         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
              |  FROM tk),
              |f AS (SELECT doc_id, source, ${DedupOracles.polyHash("g")} % 512 AS bucket FROM ng),
              |tc AS (SELECT bucket, COUNT(*) AS tn FROM f WHERE source = 'src0' GROUP BY bucket),
              |rc AS (SELECT bucket, COUNT(*) AS rn FROM f GROUP BY bucket),
              |tt AS (SELECT CAST(COALESCE(SUM(tn), 0) AS BIGINT) AS t_total FROM tc),
              |rt AS (SELECT CAST(COALESCE(SUM(rn), 0) AS BIGINT) AS r_total FROM rc),
              |w AS (
              |  SELECT rc.bucket,
              |         CAST(floor(1000000.0 * ln(
              |           (CAST(COALESCE(tn, 0) + 1 AS DOUBLE) * CAST(r_total + 512 AS DOUBLE)) /
              |           (CAST(COALESCE(rn, 0) + 1 AS DOUBLE) * CAST(t_total + 512 AS DOUBLE))
              |         )) AS BIGINT) AS wm
              |  FROM rc LEFT JOIN tc ON rc.bucket = tc.bucket
              |  CROSS JOIN tt CROSS JOIN rt),
              |sc AS (SELECT f.doc_id, CAST(SUM(wm) AS BIGINT) AS s
              |       FROM f JOIN w ON f.bucket = w.bucket GROUP BY f.doc_id),
              |keyed AS (
              |  SELECT d.doc_id, COALESCE(sc.s, 0) AS s,
              |         CAST(COALESCE(sc.s, 0) AS DOUBLE) / 1000000.0
              |           - ln(-ln(CAST(((d.doc_id % 1000000007) * 2654435761) % 1000000007 + 1 AS DOUBLE)
              |                    / 1000000008.0)) AS k
              |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
              |sel AS (SELECT doc_id, s FROM keyed ORDER BY k DESC, doc_id LIMIT 50)
              |SELECT doc_id, CAST(s AS BIGINT) AS dsir_score_micro
              |FROM sel ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_quality_classifier",
      "Trainable quality classifier (CCNet/fastText-family): logistic " +
        "regression over hashed unigram+bigram counts, trained by TWO " +
        "full-batch GD steps as Spark aggregations (integer fixed-point " +
        "— exact at any partitioning), label = source=='src0', then " +
        "every document scored via a broadcast of the 513-int model. " +
        "The oracle replays both GD steps and the final forward pass " +
        "in SQL.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("__lab", (col("source") === "src0").cast("int"))
        graft.operators.QualityClassifier.trainAndScore(
          s, docs, "doc_id", "text", "__lab", buckets = 512, iters = 2)
          .orderBy(col("doc_id"))
      },
      // fld(a,b) inlined as (a - (((a % b) + b) % b)) / b — floor
      // division, portable for negative gradients (matching the
      // operator's BigInt fld). Step 1 starts from zero weights, so
      // p0 = 500000 exactly on both engines.
      Some(s"""WITH tk AS (
              |  SELECT doc_id, $oToks AS t FROM documents),
              |ng AS (
              |  SELECT doc_id, unnest(t) AS g FROM tk
              |  UNION ALL
              |  SELECT doc_id,
              |         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
              |  FROM tk),
              |fx AS (
              |  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
              |    SELECT doc_id, ${DedupOracles.polyHash("g")} % 512 AS bucket FROM ng)
              |  GROUP BY doc_id, bucket
              |  UNION ALL
              |  SELECT doc_id, CAST(-1 AS BIGINT) AS bucket, CAST(1 AS BIGINT) AS cnt
              |  FROM documents),
              |lab AS (
              |  SELECT doc_id,
              |         CASE WHEN source = 'src0' THEN CAST(1000000 AS BIGINT)
              |              ELSE CAST(0 AS BIGINT) END AS ymicro
              |  FROM documents),
              |nn AS (SELECT CAST(10 * COUNT(*) AS BIGINT) AS d FROM documents),
              |r0 AS (SELECT doc_id, 500000 - ymicro AS r FROM lab),
              |g0 AS (
              |  SELECT bucket, SUM(r * cnt) AS g
              |  FROM fx JOIN r0 USING (doc_id) GROUP BY bucket),
              |w1 AS (
              |  SELECT bucket,
              |         CAST(0 - (g - (((g % d) + d) % d)) / d AS BIGINT) AS w
              |  FROM g0 CROSS JOIN nn),
              |m1 AS (
              |  SELECT fx.doc_id, CAST(SUM(fx.cnt * w1.w) AS BIGINT) AS m
              |  FROM fx JOIN w1 USING (bucket) GROUP BY fx.doc_id),
              |r1 AS (
              |  SELECT lab.doc_id,
              |         CAST(floor(1000000.0 / (1.0 + exp(-(CAST(m AS DOUBLE) / 1000000.0)))) AS BIGINT)
              |           - ymicro AS r
              |  FROM lab JOIN m1 USING (doc_id)),
              |g1 AS (
              |  SELECT bucket, SUM(r * cnt) AS g
              |  FROM fx JOIN r1 USING (doc_id) GROUP BY bucket),
              |w2 AS (
              |  SELECT w1.bucket,
              |         CAST(w1.w - (g - (((g % d) + d) % d)) / d AS BIGINT) AS w
              |  FROM w1 JOIN g1 USING (bucket) CROSS JOIN nn),
              |m2 AS (
              |  SELECT fx.doc_id, CAST(SUM(fx.cnt * w2.w) AS BIGINT) AS m
              |  FROM fx JOIN w2 USING (bucket) GROUP BY fx.doc_id)
              |SELECT doc_id,
              |       CAST(floor(1000000.0 / (1.0 + exp(-(CAST(m AS DOUBLE) / 1000000.0)))) AS BIGINT)
              |         AS quality_micro
              |FROM m2 ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_lang_id_trained",
      "TRAINED char-trigram language ID (the learned seam behind the " +
        "fixed-marker langId/langIdNgram fixtures): per-language " +
        "top-20 trigram profiles learned from the labeled documents " +
        "table (count DESC, gram ASC ties), scoring via the zero-join " +
        "length-shrinkage codegen path, argmax with lexicographic " +
        "tie order, evaluated as per-language accuracy. The DuckDB " +
        "oracle replays training AND scoring end-to-end.",
      (s, dir) => {
        import graft.operators.LangIdTrain
        val docs = Tables.load(s, dir, "documents")
        val model = LangIdTrain.train(docs, "text", "lang", n = 3, topK = 20)
        val profiles = LangIdTrain.profilesOf(model)
        docs.select(col("lang"),
            LangIdTrain.predictExpr(col("text"), profiles).as("predicted"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("predicted") === col("lang"), 1L).otherwise(0L))
              .as("n_correct"))
          .orderBy(col("lang"))
      },
      Some("""WITH pos AS (
             |  SELECT lang, lower(text) AS lt,
             |         unnest(range(1, length(lower(text)) - 1)) AS i
             |  FROM documents WHERE length(lower(text)) >= 3),
             |g AS (SELECT lang, substr(lt, CAST(i AS INT), 3) AS gram FROM pos),
             |counts AS (SELECT lang, gram, COUNT(*) AS c FROM g GROUP BY lang, gram),
             |model AS (
             |  SELECT lang, gram, c FROM (
             |    SELECT lang, gram, c,
             |           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS rk
             |    FROM counts) WHERE rk <= 20),
             |scores AS (
             |  SELECT d.doc_id, d.lang AS actual, m.lang AS cand,
             |         SUM(CAST((length(lower(d.text)) -
             |                   length(replace(lower(d.text), m.gram, ''))) // 3
             |             AS BIGINT) * m.c) AS score
             |  FROM documents d CROSS JOIN model m
             |  GROUP BY d.doc_id, d.lang, m.lang),
             |pred AS (
             |  SELECT doc_id, actual, cand AS predicted FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY score DESC, cand) AS rk FROM scores) WHERE rk = 1)
             |SELECT actual AS lang, COUNT(*) AS n_docs,
             |       CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_correct
             |FROM pred GROUP BY actual ORDER BY actual""".stripMargin)),

    GQuery(
      "q_tfidf_keywords",
      "TF-IDF keyword extraction: top-5 terms per document by " +
        "tf*floor(1e6*ln((N+1)/(df+1))), corpus df computed " +
        "distributed with the zipf head broadcast (hot/cold split), " +
        "deterministic (score desc, term) ranking.",
      (s, dir) =>
        graft.operators.TfIdf.topTerms(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 5)
          .orderBy(col("doc_id"), col("rnk")),
      Some(s"""WITH tk AS (
              |  SELECT doc_id, $oToks AS t FROM documents),
              |tok AS (SELECT doc_id, unnest(t) AS term FROM tk),
              |tf AS (
              |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              |  FROM tok GROUP BY doc_id, term),
              |dfreq AS (
              |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              |  FROM tf GROUP BY term),
              |nn AS (SELECT COUNT(*) AS n FROM documents),
              |w AS (
              |  SELECT term,
              |         CAST(floor(1000000.0 * ln(
              |           (CAST(n AS DOUBLE) + 1.0) / CAST(df + 1 AS DOUBLE)
              |         )) AS BIGINT) AS idf
              |  FROM dfreq CROSS JOIN nn),
              |sc AS (
              |  SELECT tf.doc_id, tf.term, tf.tf, tf.tf * w.idf AS score_micro
              |  FROM tf JOIN w USING (term)),
              |rk AS (
              |  SELECT doc_id, term, tf, score_micro,
              |         ROW_NUMBER() OVER (PARTITION BY doc_id
              |           ORDER BY score_micro DESC, term) AS rnk
              |  FROM sc)
              |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, score_micro
              |FROM rk WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin)),

    GQuery(
      "q_gopher_rules",
      "Gopher quality-rule report (Rae et al. 2021 appendix A): word/" +
        "line/symbol counts and per-rule pass flags, all integer " +
        "cross-multiplication (no double ratio crosses the engine " +
        "boundary); symbol ratios per symbol, pass-at-threshold " +
        "boundaries. Pure scan-time scalars, zero shuffles.",
      (s, dir) => {
        import graft.functions.GopherRules
        val cols = GopherRules.report(col("text"))
          .map { case (n, c) => c.as(n) }
        Tables.load(s, dir, "documents")
          .select(col("doc_id") +: cols: _*)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, text, $oToks AS toks,
              |         string_split(text, chr(10)) AS ls
              |  FROM documents),
              |c AS (
              |  SELECT doc_id,
              |    CAST(len(toks) AS BIGINT) AS n_words,
              |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_nonspace_chars,
              |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash_symbols,
              |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ellipsis_symbols,
              |    CAST(len(ls) AS BIGINT) AS n_lines,
              |    CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*\u2022]'))) AS BIGINT) AS n_bullet_lines,
              |    CAST(len(list_filter(ls, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|\u2026)$$'))) AS BIGINT) AS n_ellipsis_lines,
              |    CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[a-z]'))) AS BIGINT) AS n_alpha_words,
              |    CAST(CAST(list_contains(toks, 'the') AS BIGINT) + CAST(list_contains(toks, 'be') AS BIGINT) + CAST(list_contains(toks, 'to') AS BIGINT) + CAST(list_contains(toks, 'of') AS BIGINT) + CAST(list_contains(toks, 'and') AS BIGINT) + CAST(list_contains(toks, 'that') AS BIGINT) + CAST(list_contains(toks, 'have') AS BIGINT) + CAST(list_contains(toks, 'with') AS BIGINT) AS BIGINT) AS n_stopword_hits
              |  FROM t),
              |f AS (
              |  SELECT *,
              |    (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
              |    (n_nonspace_chars >= 3 * n_words AND n_nonspace_chars <= 10 * n_words) AS ok_mean_word_len,
              |    (n_hash_symbols * 10 <= n_words AND n_ellipsis_symbols * 10 <= n_words) AS ok_symbol_ratio,
              |    (n_bullet_lines * 10 <= n_lines * 9) AS ok_bullet_lines,
              |    (n_ellipsis_lines * 10 <= n_lines * 3) AS ok_ellipsis_lines,
              |    (n_alpha_words * 5 >= n_words * 4) AS ok_alpha_words,
              |    (n_stopword_hits >= 2) AS ok_stopwords
              |  FROM c)
              |SELECT doc_id, n_words, n_nonspace_chars, n_hash_symbols,
              |       n_ellipsis_symbols, n_lines, n_bullet_lines,
              |       n_ellipsis_lines, n_alpha_words, n_stopword_hits,
              |       ok_word_count, ok_mean_word_len, ok_symbol_ratio,
              |       ok_bullet_lines, ok_ellipsis_lines, ok_alpha_words,
              |       ok_stopwords,
              |       (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
              |        AND ok_bullet_lines AND ok_ellipsis_lines
              |        AND ok_alpha_words AND ok_stopwords) AS gopher_pass
              |FROM f ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_repetition_rules",
      "Gopher WITHIN-document repetition filters (Rae et al. 2021, the " +
        "companion family to the quality rules): duplicate-line " +
        "fraction and char fraction, top {2,3,4}-gram char coverage, " +
        "duplicated {5,10}-gram char coverage — all exact integer micro " +
        "fractions, deterministic tie-breaks. One tokenize pass feeds " +
        "every unit kind; both shuffles carry the doc id in the key.",
      (s, dir) =>
        graft.operators.RepetitionRules.report(
          Tables.load(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some {
        // the CTE chain is the ONE shared mirror (RepetitionOracles)
        // also consumed mid-chain by the composed pipeline oracle
        val cols = RepetitionOracles.Checks.map(_._1)
        s"""WITH ${RepetitionOracles.ctes("documents", "rp")}
           |SELECT d.doc_id,
           |       CAST(len(rptk.t) AS BIGINT) AS n_words,
           |${cols.map(n => s"       CAST(COALESCE(f.$n, 0) AS BIGINT) AS $n").mkString(",\n|")},
           |       ${RepetitionOracles.passCond("f", "rptk")} AS repetition_pass
           |FROM documents d
           |JOIN rptk ON rptk.doc_id = d.doc_id
           |LEFT JOIN rpf f ON f.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }),

    GQuery(
      "q_chunk_split",
      "Fixed-token chunking with overlap (32-token windows advancing " +
        "by 24): the retrieval/embedding-corpus preprocessing step " +
        "before packing — one scan, pure array expressions, chunk " +
        "fan-out bounded per doc; chunk text fingerprinted so the " +
        "oracle verifies content, not just counts.",
      (s, dir) => {
        import graft.functions.TextAnalysis
        graft.operators.ChunkSplit.chunkByTokens(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            chunkTokens = 32, overlap = 8)
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            col("n_chunk_tokens"),
            TextAnalysis.fingerprint(col("chunk_text")).as("chunk_fp"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
              |                             t -> length(t) > 0) AS tk
              |  FROM documents),
              |nz AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
              |ix AS (SELECT doc_id, tk, n,
              |              unnest(generate_series(0,
              |                GREATEST(CAST(ceil((n - 8) / 24.0) AS INT), 1) - 1))
              |                AS chunk_idx
              |       FROM nz),
              |ch AS (SELECT doc_id, chunk_idx,
              |              list_slice(tk, chunk_idx * 24 + 1,
              |                         chunk_idx * 24 + 32) AS c
              |       FROM ix WHERE chunk_idx * 24 < n)
              |SELECT doc_id, chunk_idx,
              |       CAST(len(c) AS BIGINT) AS n_chunk_tokens,
              |       ${DedupOracles.polyHash("array_to_string(c, ' ')")} AS chunk_fp
              |FROM ch
              |ORDER BY doc_id, chunk_idx""".stripMargin)),

    GQuery(
      "q_char_entropy",
      "Character-entropy quality gate (catches aaaa.../base64/template " +
        "spam that length and stopword ratios miss): per-row scan " +
        "expression with ZERO shuffles, weighted log-sum as an exact " +
        "integer fold in 1e-6 fixed point so only ln on small integers " +
        "must agree across engines. Gate at 2.8 nats decided fully in " +
        "integers.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            charEntropySum(col("text")).as("ent_sum"),
            charEntropyGate(col("text"), milliNats = 2800).as("ok_entropy"))
          .orderBy(col("doc_id")),
      Some("""WITH srt AS (
             |  SELECT doc_id, CAST(length(text) AS BIGINT) AS L,
             |         list_sort(string_split(text, '')) AS s
             |  FROM documents),
             |runs AS (
             |  SELECT doc_id, L,
             |         list_filter(generate_series(1, CAST(L AS INTEGER)),
             |           i -> i = L OR s[i] <> s[i+1]) AS ends
             |  FROM srt),
             |e AS (
             |  SELECT doc_id, L,
             |    CASE WHEN L = 0 THEN 0 ELSE
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(generate_series(1, len(ends)),
             |          j -> CAST(ends[j] - COALESCE(ends[j-1], 0) AS BIGINT)
             |             * CAST(FLOOR(1e6 * ln(CAST(ends[j] - COALESCE(ends[j-1], 0) AS DOUBLE))) AS BIGINT))),
             |        (acc, x) -> acc + x)
             |    END AS ent_sum
             |  FROM runs)
             |SELECT doc_id, ent_sum,
             |       CASE WHEN L = 0 THEN FALSE ELSE
             |         L * (CAST(FLOOR(1e6 * ln(CAST(L AS DOUBLE))) AS BIGINT) - 2800000)
             |           >= ent_sum
             |       END AS ok_entropy
             |FROM e ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_span_corrupt",
      "T5-style span corruption for denoising-objective dataset prep " +
        "(Raffel et al. 2020): hash-selected token spans become " +
        "<extra_id_k> sentinels in the input and follow their sentinel " +
        "in the target — no RNG, so corruption is identical on every " +
        "engine, partitioning, and retry. One codegen'd kernel per row; " +
        "oracle replays the skip-counter fold token by token.",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            org.apache.spark.sql.graftvec.SpanCorruptExpr
              .corruptCol(col("text"), col("doc_id")).as("__c"))
          .select(col("doc_id"),
            size(col("__c.input")).cast("long").as("n_input"),
            size(col("__c.target")).cast("long").as("n_target"),
            fingerprint(concat_ws(" ", col("__c.input"))).as("input_fp"),
            fingerprint(concat_ws(" ", col("__c.target"))).as("target_fp"))
          .orderBy(col("doc_id")),
      Some {
        // doc_id reduced mod P before the *131 — mirrors the kernel's
        // overflow-free hash (a raw doc_id*131 errors in DuckDB and
        // wraps on the JVM for |doc_id| > ~7e16).
        val drawM = "((((doc_id % 1000000007) * 131 + i) % 1000000007) * 2654435761 % 1000000007)"
        val draw = s"(xor($drawM, $drawM >> 15) * 2654435761 % 1000000007)"
        // The mirror replays the skip-counter walk as a RECURSIVE CTE
        // (all documents advance one token per iteration, joined on
        // (doc_id, i)). A list_reduce fold was the natural shape but
        // DuckDB v1.0.0 mis-executes it here two distinct ways, both
        // deterministic-but-wrong and batch-context-dependent:
        // list-valued struct fields do not thread through the
        // accumulator, and even a scalar-struct fold over
        // correctly-built elements returned another row's fold for
        // some documents. The recursive form is engine-solid; the
        // per-token draws are computed relationally and joined in.
        def app(f: String, tok: String) =
          s"CASE WHEN $f = '' THEN $tok ELSE $f || ' ' || $tok END"
        s"""WITH RECURSIVE
           |tk2 AS (
           |  SELECT doc_id, $oToks AS tk FROM documents),
           |ex AS (
           |  SELECT doc_id, unnest(list_transform(tk, (x, j) ->
           |    {'t': x, 'i': CAST(j-1 AS BIGINT)})) AS u
           |  FROM tk2),
           |dr AS (
           |  SELECT doc_id, u.t AS t, u.i AS i,
           |         $draw % 13 = 0 AS st,
           |         ($draw // 13) % 3 AS ln
           |  FROM ex),
           |rec AS (
           |  SELECT doc_id, 0::BIGINT AS i, 0::BIGINT AS skip,
           |         0::BIGINT AS k, '' AS inp, '' AS tgt
           |  FROM tk2
           |  UNION ALL
           |  SELECT r.doc_id, r.i + 1,
           |    CASE WHEN r.skip > 0 THEN r.skip - 1
           |         WHEN r.k < 100 AND d.st THEN d.ln ELSE 0::BIGINT END,
           |    CASE WHEN r.skip > 0 THEN r.k
           |         WHEN r.k < 100 AND d.st THEN r.k + 1 ELSE r.k END,
           |    CASE WHEN r.skip > 0 THEN r.inp
           |         WHEN r.k < 100 AND d.st THEN ${app("r.inp", "'<extra_id_' || r.k || '>'")}
           |         ELSE ${app("r.inp", "d.t")} END,
           |    CASE WHEN r.skip > 0 THEN ${app("r.tgt", "d.t")}
           |         WHEN r.k < 100 AND d.st THEN ${app("r.tgt", "'<extra_id_' || r.k || '>' || ' ' || d.t")}
           |         ELSE r.tgt END
           |  FROM rec r JOIN dr d ON d.doc_id = r.doc_id AND d.i = r.i),
           |fin2 AS (
           |  SELECT doc_id, inp, tgt,
           |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i DESC) AS rn
           |  FROM rec)
           |SELECT d.doc_id,
           |       CAST(CASE WHEN COALESCE(f.inp, '') = '' THEN 0
           |            ELSE len(string_split(f.inp, ' ')) END AS BIGINT) AS n_input,
           |       CAST(CASE WHEN COALESCE(f.tgt, '') = '' THEN 0
           |            ELSE len(string_split(f.tgt, ' ')) END AS BIGINT) AS n_target,
           |       ${DedupOracles.polyHash("COALESCE(f.inp, '')")} AS input_fp,
           |       ${DedupOracles.polyHash("COALESCE(f.tgt, '')")} AS target_fp
           |FROM documents d LEFT JOIN fin2 f ON f.doc_id = d.doc_id AND f.rn = 1
           |ORDER BY d.doc_id""".stripMargin
      })
  )
}

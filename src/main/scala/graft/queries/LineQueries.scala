package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.NormalizeExpr

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.functions.TextAnalysis
import graft.operators.LineCuration

/** Line-granular curation + text-fixing, oracle-checked. The synthetic
  * documents are single-line, so each query derives the SAME multi-line
  * (or denormalized) text deterministically on both engines — chunk
  * boundaries from word replacements, shared boilerplate lines keyed on
  * doc_id — and the DuckDB oracle mirrors every rule, including the
  * polynomial line hash, so both engines make identical decisions.
  */
object LineQueries extends QueryPack {

  /** Spark-side multi-line synth: ' table ' ends a line with '.', ' join '
    * breaks a line without punctuation.
    */
  private def chunked(text: Column): Column =
    regexp_replace(regexp_replace(text, " table ", ".\n"), " join ", "\n")

  /** Oracle-side mirror of [[chunked]]. */
  private val ChunkedSql =
    "regexp_replace(regexp_replace(text, ' table ', '.' || chr(10), 'g'), " +
      "' join ', chr(10), 'g')"

  /** Oracle-side polynomial hash of a string expression — the exact
    * [[TextAnalysis.polyHash]] mirror the dedup family pins.
    */
  private def polyHashSql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, c) -> (a * 31 + c) % 1000000007)""".stripMargin

  /** Oracle-side mirror of [[LineCuration.lineOk]] at the published C4
    * defaults — built FROM the shared default lists, so widening the
    * phrase set or moving the word floor re-derives the oracle.
    */
  private def lineOkSql(v: String): String = {
    val blocked = LineCuration.DefaultBlockPhrases
      .map(p => s"contains(lower(trim($v)), '$p')").mkString(" OR ")
    s"""regexp_matches(trim($v), '[.!?"]$$')
       |       AND len(list_filter(string_split_regex(trim($v), '\\s+'),
       |                           w -> length(w) > 0)) >= ${LineCuration.DefaultMinWords}
       |       AND NOT ($blocked)""".stripMargin
  }

  def queries: Seq[GQuery] = Seq(

    GQuery(
      "q_c4_line_filter",
      "C4 line filtering (Raffel et al. 2020 §2.2): keep lines ending " +
        "in terminal punctuation, with >= 5 words, and none of the " +
        "published javascript/cookie/policy block phrases; rebuild " +
        "the document from survivors. Pure per-row HOF pipeline — " +
        "zero shuffle, cost = the scan.",
      (s, dir) => {
        val synth = concat(chunked(col("text")),
          when(col("doc_id") % 2 === 0,
            lit("\nenable javascript now please today.")).otherwise(lit("")),
          when(col("doc_id") % 3 === 1,
            lit("\nthis site uses cookies to improve your experience."))
            .otherwise(lit("")),
          lit("\nok go."),
          lit("\nthe quick brown fox jumps over the dog."))
        LineCuration.filterLines(
          Tables.load(s, dir, "documents").withColumn("synth", synth),
          "doc_id", "synth")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |    $ChunkedSql ||
              |    (CASE WHEN doc_id % 2 = 0
              |          THEN chr(10) || 'enable javascript now please today.'
              |          ELSE '' END) ||
              |    (CASE WHEN doc_id % 3 = 1
              |          THEN chr(10) ||
              |            'this site uses cookies to improve your experience.'
              |          ELSE '' END) ||
              |    chr(10) || 'ok go.' ||
              |    chr(10) || 'the quick brown fox jumps over the dog.' AS t
              |  FROM documents),
              |f AS (
              |  SELECT doc_id, string_split(t, chr(10)) AS ls,
              |    list_filter(string_split(t, chr(10)),
              |      x -> ${lineOkSql("x")}) AS kept
              |  FROM s)
              |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
              |       CAST(len(kept) AS BIGINT) AS n_kept,
              |       array_to_string(kept, chr(10)) AS clean_text
              |FROM f ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_c4_doc_gate",
      "C4 document gate: line-filter, then DROP documents with < 3 " +
        "surviving lines or a doc-level block phrase ('lorem ipsum', " +
        "'{') in the original text. Scan-only filter — the cheapest " +
        "whole-document cut after URL curation.",
      (s, dir) => {
        val synth = concat(chunked(col("text")),
          when(col("doc_id") % 17 === 3, lit(" lorem ipsum dolor."))
            .otherwise(lit("")),
          when(col("doc_id") % 23 === 5, lit(" x { y }")).otherwise(lit("")),
          lit("\nthe quick brown fox jumps over the dog."))
        LineCuration.c4Clean(
          Tables.load(s, dir, "documents").withColumn("synth", synth),
          "doc_id", "synth")
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            length(col("clean_text")).cast("long").as("n_clean_chars"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |    $ChunkedSql ||
              |    (CASE WHEN doc_id % 17 = 3 THEN ' lorem ipsum dolor.' ELSE '' END) ||
              |    (CASE WHEN doc_id % 23 = 5 THEN ' x { y }' ELSE '' END) ||
              |    chr(10) || 'the quick brown fox jumps over the dog.' AS t
              |  FROM documents),
              |f AS (
              |  SELECT doc_id, t, string_split(t, chr(10)) AS ls,
              |    list_filter(string_split(t, chr(10)),
              |      x -> ${lineOkSql("x")}) AS kept
              |  FROM s)
              |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
              |       CAST(len(kept) AS BIGINT) AS n_kept,
              |       CAST(length(array_to_string(kept, chr(10))) AS BIGINT)
              |         AS n_clean_chars
              |FROM f
              |WHERE len(kept) >= ${LineCuration.DefaultMinKeptLines}
              |  AND NOT contains(lower(t), 'lorem ipsum')
              |  AND NOT contains(lower(t), '{')
              |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_line_dedup",
      "Corpus-level exact line dedup (RefinedWeb/Dolma): a non-blank " +
        "line in >= 2 DISTINCT documents is removed from every " +
        "document. GroupBy on the 8-byte line hash + one equi-join " +
        "back — O(total lines), no pairwise stage; oracle mirrors the " +
        "hash so decisions (collisions included) are identical.",
      (s, dir) => {
        val synth = concat(
          regexp_replace(col("text"), " merge ", "\n"),
          when(col("doc_id") % 2 === 0, lit("\nsubscribe to our newsletter"))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("\nall rights reserved"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 1, lit("\nfollow us on social media"))
            .otherwise(lit("")))
        LineCuration.stripDuplicateLines(
          Tables.load(s, dir, "documents").withColumn("synth", synth),
          "doc_id", "synth", minDocFreq = 2)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |    regexp_replace(text, ' merge ', chr(10), 'g') ||
              |    (CASE WHEN doc_id % 2 = 0
              |          THEN chr(10) || 'subscribe to our newsletter' ELSE '' END) ||
              |    (CASE WHEN doc_id % 3 = 0
              |          THEN chr(10) || 'all rights reserved' ELSE '' END) ||
              |    (CASE WHEN doc_id % 5 = 1
              |          THEN chr(10) || 'follow us on social media' ELSE '' END) AS t
              |  FROM documents),
              |ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM s),
              |w AS (
              |  SELECT doc_id, unnest(l) AS line,
              |         unnest(generate_series(1, len(l))) AS pos
              |  FROM ls),
              |k AS (
              |  SELECT doc_id, pos, ${polyHashSql("trim(line)")} AS hv
              |  FROM w WHERE length(trim(line)) > 0),
              |fl AS (SELECT hv FROM k GROUP BY hv
              |       HAVING COUNT(DISTINCT doc_id) >= 2),
              |cov AS (SELECT doc_id, pos FROM k JOIN fl USING (hv)),
              |keep AS (SELECT w.doc_id, w.pos, w.line
              |         FROM w ANTI JOIN cov USING (doc_id, pos)),
              |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
              |          AS clean_text
              |        FROM keep GROUP BY doc_id),
              |rem AS (SELECT doc_id, COUNT(*) AS n_rm FROM cov GROUP BY doc_id)
              |SELECT ls.doc_id, CAST(len(ls.l) AS BIGINT) AS n_lines,
              |       CAST(COALESCE(rem.n_rm, 0) AS BIGINT) AS n_removed,
              |       COALESCE(agg.clean_text, '') AS clean_text
              |FROM ls
              |LEFT JOIN agg ON ls.doc_id = agg.doc_id
              |LEFT JOIN rem ON ls.doc_id = rem.doc_id
              |ORDER BY ls.doc_id""".stripMargin)),

    GQuery(
      "q_paragraph_neardup",
      "Paragraph-grain NEAR-dup dedup (the fuzzy counterpart of " +
        "q_paragraph_dedup): templated paragraphs differing by a " +
        "fill-in token (two variants injected into every 37th doc) " +
        "are MinHash-LSH candidates verified by exact shingle " +
        "Jaccard >= 0.5; every unit near-dupping an earlier unit " +
        "drops and documents rebuild from survivors. The oracle " +
        "replays signatures, bands, verification, and the rebuild.",
      (s, dir) => {
        val synth = concat(
          regexp_replace(col("text"), " stream ", "\n\n"),
          when(col("doc_id") % 37 === 1, concat(
            lit("\n\nthis templated welcome passage appears on page variant "),
            (col("doc_id") % 2).cast("string"))).otherwise(lit("")),
          lit("\n\nunique closing paragraph "), col("doc_id").cast("string"))
        LineCuration.stripNearDupParagraphs(
          Tables.load(s, dir, "documents").withColumn("synth", synth),
          "doc_id", "synth", threshold = 0.5, bands = 4)
          .orderBy(col("doc_id"))
      },
      Some {
        val bandCond = (0 until 4).map(j => s"x.band$j = y.band$j").mkString(" OR ")
        s"""WITH s0 AS (
           |  SELECT doc_id AS odoc,
           |    regexp_replace(text, ' stream ', chr(10) || chr(10), 'g') ||
           |    (CASE WHEN doc_id % 37 = 1
           |          THEN chr(10) || chr(10) ||
           |            'this templated welcome passage appears on page variant ' ||
           |            CAST(doc_id % 2 AS VARCHAR)
           |          ELSE '' END) ||
           |    chr(10) || chr(10) || 'unique closing paragraph ' ||
           |    CAST(doc_id AS VARCHAR) AS t
           |  FROM documents),
           |pu AS (
           |  SELECT odoc,
           |         unnest(string_split(t, chr(10) || chr(10))) AS para,
           |         unnest(range(len(string_split(t, chr(10) || chr(10))))) AS pos
           |  FROM s0),
           |units AS (
           |  SELECT odoc * 1048576 + pos AS doc_id, para AS text
           |  FROM pu WHERE length(trim(para)) > 0),
           |${DedupOracles.base("units")},
           |${DedupOracles.minhashBandCtes()},
           |${DedupOracles.interJac},
           |losers AS (
           |  SELECT DISTINCT j.id2 AS uid
           |  FROM j
           |  JOIN bnd x ON x.doc_id = j.id1
           |  JOIN bnd y ON y.doc_id = j.id2
           |  WHERE j.jaccard >= 0.5 AND ($bandCond)),
           |kept AS (
           |  SELECT p.odoc, p.pos, p.para FROM pu p
           |  WHERE NOT EXISTS (SELECT 1 FROM losers l
           |                    WHERE l.uid = p.odoc * 1048576 + p.pos)),
           |tot AS (
           |  SELECT odoc, CAST(count(*) AS BIGINT) AS n_units
           |  FROM pu GROUP BY odoc),
           |reb AS (
           |  SELECT odoc, CAST(count(*) AS BIGINT) AS kept_n,
           |         string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean_text
           |  FROM kept GROUP BY odoc)
           |SELECT t.odoc AS doc_id, t.n_units,
           |       t.n_units - COALESCE(r.kept_n, 0) AS n_removed,
           |       COALESCE(r.clean_text, '') AS clean_text
           |FROM tot t LEFT JOIN reb r ON r.odoc = t.odoc
           |ORDER BY doc_id""".stripMargin
      }),

    GQuery(
      "q_paragraph_neardup_against",
      "Paragraph near-dup screen AGAINST a reference corpus — the " +
        "batch ground-truth twin of the streaming ParagraphIndex " +
        "probe: incoming docs (doc_id >= 400) lose every paragraph " +
        "that is a verified near-dup (one-sided banded MinHash + " +
        "exact Jaccard >= 0.5) of ANY reference paragraph " +
        "(doc_id < 400), and rebuild from survivors. The oracle " +
        "replays both corpora's signatures and the one-sided join.",
      (s, dir) => {
        val synth = concat(
          regexp_replace(col("text"), " stream ", "\n\n"),
          when(col("doc_id") % 37 === 1, concat(
            lit("\n\nthis templated welcome passage appears on page variant "),
            (col("doc_id") % 2).cast("string"))).otherwise(lit("")),
          lit("\n\nunique closing paragraph "), col("doc_id").cast("string"))
        val synthDocs = Tables.load(s, dir, "documents")
          .withColumn("synth", synth)
        LineCuration.stripNearDupParagraphsAgainst(
          synthDocs.filter(col("doc_id") >= 400),
          synthDocs.filter(col("doc_id") < 400),
          "doc_id", "synth", threshold = 0.5, bands = 4)
          .orderBy(col("doc_id"))
      },
      Some {
        val bandCond = (0 until 4).map(j => s"i.band$j = c.band$j").mkString(" OR ")
        s"""WITH s0 AS (
           |  SELECT doc_id AS odoc,
           |    regexp_replace(text, ' stream ', chr(10) || chr(10), 'g') ||
           |    (CASE WHEN doc_id % 37 = 1
           |          THEN chr(10) || chr(10) ||
           |            'this templated welcome passage appears on page variant ' ||
           |            CAST(doc_id % 2 AS VARCHAR)
           |          ELSE '' END) ||
           |    chr(10) || chr(10) || 'unique closing paragraph ' ||
           |    CAST(doc_id AS VARCHAR) AS t
           |  FROM documents),
           |pin AS (
           |  SELECT odoc,
           |         unnest(string_split(t, chr(10) || chr(10))) AS para,
           |         unnest(range(len(string_split(t, chr(10) || chr(10))))) AS pos
           |  FROM s0 WHERE odoc >= 400),
           |pref AS (
           |  SELECT odoc,
           |         unnest(string_split(t, chr(10) || chr(10))) AS para,
           |         unnest(range(len(string_split(t, chr(10) || chr(10))))) AS pos
           |  FROM s0 WHERE odoc < 400),
           |unitsin AS (
           |  SELECT odoc * 1048576 + pos AS doc_id, para AS text
           |  FROM pin WHERE length(trim(para)) > 0),
           |unitsref AS (
           |  SELECT odoc * 1048576 + pos AS doc_id, para AS text
           |  FROM pref WHERE length(trim(para)) > 0),
           |${DedupOracles.baseSfx("unitsin", "i")},
           |${DedupOracles.minhashBandCtesSfx(16, 4, 42L, "i")},
           |${DedupOracles.baseSfx("unitsref", "r")},
           |${DedupOracles.minhashBandCtesSfx(16, 4, 42L, "r")},
           |pr AS (
           |  SELECT DISTINCT i.doc_id AS inc, c.doc_id AS co
           |  FROM bndi i JOIN bndr c ON ($bandCond)),
           |ver AS (
           |  SELECT p.inc
           |  FROM pr p
           |  JOIN si a ON a.doc_id = p.inc
           |  JOIN sr b ON b.doc_id = p.co AND b.h = a.h
           |  JOIN sizesi na ON na.doc_id = p.inc
           |  JOIN sizesr nb ON nb.doc_id = p.co
           |  GROUP BY p.inc, p.co, na.n, nb.n
           |  HAVING CAST(count(*) AS DOUBLE) /
           |         CAST(na.n + nb.n - count(*) AS DOUBLE) >= 0.5),
           |kept AS (
           |  SELECT p.odoc, p.pos, p.para FROM pin p
           |  WHERE NOT EXISTS (SELECT 1 FROM ver v
           |                    WHERE v.inc = p.odoc * 1048576 + p.pos)),
           |tot AS (
           |  SELECT odoc, CAST(count(*) AS BIGINT) AS n_units
           |  FROM pin GROUP BY odoc),
           |reb AS (
           |  SELECT odoc, CAST(count(*) AS BIGINT) AS kept_n,
           |         string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean_text
           |  FROM kept GROUP BY odoc)
           |SELECT t.odoc AS doc_id, t.n_units,
           |       t.n_units - COALESCE(r.kept_n, 0) AS n_removed,
           |       COALESCE(r.clean_text, '') AS clean_text
           |FROM tot t LEFT JOIN reb r ON r.odoc = t.odoc
           |ORDER BY doc_id""".stripMargin
      }),

    GQuery(
      "q_paragraph_dedup",
      "Corpus-level exact PARAGRAPH dedup (RefinedWeb's other exact " +
        "grain): units split on blank lines; a paragraph in >= 2 " +
        "DISTINCT documents is removed from every document while its " +
        "unique surroundings survive. Same 8-byte-hash groupBy + " +
        "equi-join plan as line dedup, sep = blank line.",
      (s, dir) => {
        val synth = concat(
          regexp_replace(col("text"), " stream ", "\n\n"),
          when(col("doc_id") % 3 === 1,
            lit("\n\nthis quoted passage appears in many documents verbatim"))
            .otherwise(lit("")),
          lit("\n\nunique closing paragraph "), col("doc_id").cast("string"))
        LineCuration.stripDuplicateParagraphs(
          Tables.load(s, dir, "documents").withColumn("synth", synth),
          "doc_id", "synth", minDocFreq = 2)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |    regexp_replace(text, ' stream ', chr(10) || chr(10), 'g') ||
              |    (CASE WHEN doc_id % 3 = 1
              |          THEN chr(10) || chr(10) ||
              |            'this quoted passage appears in many documents verbatim'
              |          ELSE '' END) ||
              |    chr(10) || chr(10) || 'unique closing paragraph ' ||
              |    CAST(doc_id AS VARCHAR) AS t
              |  FROM documents),
              |ls AS (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS l FROM s),
              |w AS (
              |  SELECT doc_id, unnest(l) AS line,
              |         unnest(generate_series(1, len(l))) AS pos
              |  FROM ls),
              |k AS (
              |  SELECT doc_id, pos, ${polyHashSql("trim(line)")} AS hv
              |  FROM w WHERE length(trim(line)) > 0),
              |fl AS (SELECT hv FROM k GROUP BY hv
              |       HAVING COUNT(DISTINCT doc_id) >= 2),
              |cov AS (SELECT doc_id, pos FROM k JOIN fl USING (hv)),
              |keep AS (SELECT w.doc_id, w.pos, w.line
              |         FROM w ANTI JOIN cov USING (doc_id, pos)),
              |agg AS (SELECT doc_id,
              |          string_agg(line, chr(10) || chr(10) ORDER BY pos)
              |          AS clean_text
              |        FROM keep GROUP BY doc_id),
              |rem AS (SELECT doc_id, COUNT(*) AS n_rm FROM cov GROUP BY doc_id)
              |SELECT ls.doc_id, CAST(len(ls.l) AS BIGINT) AS n_lines,
              |       CAST(COALESCE(rem.n_rm, 0) AS BIGINT) AS n_removed,
              |       COALESCE(agg.clean_text, '') AS clean_text
              |FROM ls
              |LEFT JOIN agg ON ls.doc_id = agg.doc_id
              |LEFT JOIN rem ON ls.doc_id = rem.doc_id
              |ORDER BY ls.doc_id""".stripMargin)),

    GQuery(
      "q_line_pipeline",
      "The round-13 curation stages COMPOSED end to end: byte repair " +
        "(NFC + control strip + space collapse) -> C4 line filter + " +
        "document gate -> exact dedup on the cleaned text (~10% of " +
        "docs share one fixed body and collapse to a single survivor) " +
        "-> corpus-level line dedup (the chrome line every survivor " +
        "still carries is removed from all of them). One DuckDB replay " +
        "of all four stages, fingerprints mirrored.",
      (s, dir) => {
        val base = chunked(col("text"))
        // ~10% of docs swap in one FIXED two-line body (exact-dup bait);
        // the rest carry a unique tail with a control char + a
        // DECOMPOSED e-acute (byte-repair bait) and ~3% a doc-level
        // block phrase; EVERY doc gets the chrome line (line-dedup bait)
        val synth = concat(
          when(col("doc_id") % 10 === 7,
            lit("duplicate page body stands here.\nsecond shared sentence line here."))
            .otherwise(concat(base,
              when(col("doc_id") % 31 === 3, lit(" lorem ipsum dolor."))
                .otherwise(lit("")),
              lit("\nunique tail "), col("doc_id").cast("string"),
              lit(" carries cafe\u0301\u0007 and more words."))),
          lit("\nsubscribe to our newsletter today."))
        val docs0 = Tables.load(s, dir, "documents").withColumn("synth", synth)
        val fixed = docs0.withColumn("synth",
          TextAnalysis.fixText(col("synth")))
        val c4 = LineCuration.c4Clean(fixed, "doc_id", "synth")
        val deduped = graft.operators.RowOps.dedupBy(
          c4.withColumn("__fp", TextAnalysis.fingerprint(col("clean_text"))),
          Seq("__fp"), "doc_id").drop("__fp", "n_lines", "n_kept")
        LineCuration.stripDuplicateLines(
          deduped.withColumnRenamed("clean_text", "synth"),
          "doc_id", "synth", minDocFreq = 2)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |    (CASE WHEN doc_id % 10 = 7
              |          THEN 'duplicate page body stands here.' || chr(10) ||
              |               'second shared sentence line here.'
              |          ELSE $ChunkedSql ||
              |            (CASE WHEN doc_id % 31 = 3
              |                  THEN ' lorem ipsum dolor.' ELSE '' END) ||
              |            chr(10) || 'unique tail ' || CAST(doc_id AS VARCHAR) ||
              |            ' carries cafe' || chr(769) || chr(7) || ' and more words.'
              |     END) || chr(10) || 'subscribe to our newsletter today.' AS t0
              |  FROM documents),
              |fx AS (
              |  SELECT doc_id,
              |    regexp_replace(
              |      regexp_replace(nfc_normalize(t0),
              |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
              |      '[ \\t]+', ' ', 'g') AS t
              |  FROM s),
              |c4 AS (
              |  SELECT doc_id, t,
              |    list_filter(string_split(t, chr(10)),
              |      x -> ${lineOkSql("x")}) AS kept
              |  FROM fx),
              |ct AS (
              |  SELECT doc_id, array_to_string(kept, chr(10)) AS t
              |  FROM c4
              |  WHERE len(kept) >= ${LineCuration.DefaultMinKeptLines}
              |    AND NOT contains(lower(t), 'lorem ipsum')
              |    AND NOT contains(lower(t), '{')),
              |fp AS (SELECT doc_id, t, ${polyHashSql("t")} AS fpv FROM ct),
              |keepers AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fpv),
              |dd AS (SELECT fp.doc_id, fp.t FROM fp JOIN keepers USING (doc_id)),
              |ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM dd),
              |w AS (
              |  SELECT doc_id, unnest(l) AS line,
              |         unnest(generate_series(1, len(l))) AS pos
              |  FROM ls),
              |k AS (
              |  SELECT doc_id, pos, ${polyHashSql("trim(line)")} AS hv
              |  FROM w WHERE length(trim(line)) > 0),
              |fl AS (SELECT hv FROM k GROUP BY hv
              |       HAVING COUNT(DISTINCT doc_id) >= 2),
              |cov AS (SELECT doc_id, pos FROM k JOIN fl USING (hv)),
              |keep AS (SELECT w.doc_id, w.pos, w.line
              |         FROM w ANTI JOIN cov USING (doc_id, pos)),
              |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
              |          AS clean_text
              |        FROM keep GROUP BY doc_id),
              |rem AS (SELECT doc_id, COUNT(*) AS n_rm FROM cov GROUP BY doc_id)
              |SELECT ls.doc_id, CAST(len(ls.l) AS BIGINT) AS n_lines,
              |       CAST(COALESCE(rem.n_rm, 0) AS BIGINT) AS n_removed,
              |       COALESCE(agg.clean_text, '') AS clean_text
              |FROM ls
              |LEFT JOIN agg ON ls.doc_id = agg.doc_id
              |LEFT JOIN rem ON ls.doc_id = rem.doc_id
              |ORDER BY ls.doc_id""".stripMargin)),

    GQuery(
      "q_nfc_normalize",
      "Unicode NFC normalization via the codegen'd NormalizeString " +
        "expression (DuckDB oracle: nfc_normalize). The synthesized " +
        "suffix carries a decomposed combining sequence, so every row " +
        "actually normalizes; byte-stable keys are what make " +
        "hash-keyed dedup sound on web text.",
      (s, dir) => {
        val synth = concat(col("text"), lit(" cafe"), lit("\u0301"))
        val norm = NormalizeExpr.nfc(synth)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            length(synth).cast("long").as("n_before"),
            length(norm).cast("long").as("n_after"),
            (synth =!= norm).as("changed"),
            substring(norm, -1, 1).as("last_char"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id, text || ' cafe' || chr(769) AS t FROM documents),
             |n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM s)
             |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_before,
             |       CAST(length(nt) AS BIGINT) AS n_after,
             |       t <> nt AS changed,
             |       substring(nt, -1, 1) AS last_char
             |FROM n ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_fix_text",
      "Composed fix-the-bytes pass: NFC + control-char strip + " +
        "space/tab-run collapse — the mandatory pre-dedup text repair. " +
        "Per-row scalar regex chain, zero shuffle.",
      (s, dir) => {
        val synth = concat(col("text"),
          lit("\u0007beep\t\t double  spaced caf"), lit("e"), lit("\u0301"))
        val fixed = TextAnalysis.fixText(synth)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            length(synth).cast("long").as("n_before"),
            length(fixed).cast("long").as("n_after"),
            substring(fixed, -24, 24).as("tail"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    text || chr(7) || 'beep' || chr(9) || chr(9) ||
             |    ' double  spaced caf' || 'e' || chr(769) AS t
             |  FROM documents),
             |n AS (
             |  SELECT doc_id, t,
             |    regexp_replace(
             |      regexp_replace(nfc_normalize(t),
             |        '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             |      '[ \t]+', ' ', 'g') AS ft
             |  FROM s)
             |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_before,
             |       CAST(length(ft) AS BIGINT) AS n_after,
             |       substring(ft, -24, 24) AS tail
             |FROM n ORDER BY doc_id""".stripMargin)))
}

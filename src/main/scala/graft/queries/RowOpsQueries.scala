package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.QueryPack._
import graft.catalog.Tables
import graft.operators.RowOps

/** Oracle-checked demonstrations of the §2.2 row operators, each running
  * the real `graft.operators.RowOps` implementation over the driver
  * test tables.
  */
object RowOpsQueries extends QueryPack {

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_filter_lang",
      "filter_dataset mini-language compiled to pushed-down Column " +
        "predicates: documents with n_chars>=200, lang='en', non-empty text.",
      (s, dir) =>
        RowOps.filterDataset(
          Tables.load(s, dir, "documents"), "n_chars-me-200.lang-en.text")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE n_chars >= 200 AND lang = 'en'
             |  AND text IS NOT NULL AND text <> ''
             |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_filter_lang_length",
      "filter_dataset length-compare conditions (ques_length analog): " +
        "short texts from one source.",
      (s, dir) =>
        RowOps.filterDataset(
          Tables.load(s, dir, "documents"), "text_length-l-300.source-src1")
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source, n_chars FROM documents
             |WHERE LENGTH(text) < 300 AND source = 'src1'
             |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_update_merge",
      "update_dataset: keyed full-outer merge where the other side's " +
        "columns overwrite — run over two derived per-language views.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // self: stats for all langs; other: overriding stats for 'en'+'fr'
        val self = docs.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"), lit("base").as("origin"))
        val other = docs.filter(col("lang").isin("en", "fr"))
          .groupBy(col("lang")).agg(
            sum(col("n_chars")).as("total_chars"), lit("override").as("origin"))
        RowOps.updateDataset(self, other, "lang").orderBy(col("lang"))
      },
      Some("""WITH self AS (
             |  SELECT lang, COUNT(*) AS n_docs, 'base' AS origin
             |  FROM documents GROUP BY lang),
             |other AS (
             |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |         'override' AS origin
             |  FROM documents WHERE lang IN ('en','fr') GROUP BY lang)
             |SELECT COALESCE(self.lang, other.lang) AS lang,
             |       n_docs,
             |       COALESCE(other.origin, self.origin) AS origin,
             |       total_chars
             |FROM self FULL OUTER JOIN other ON self.lang = other.lang
             |ORDER BY lang""".stripMargin)),

    GQuery(
      "q_systematic_sample",
      "Deterministic key-mod sampling (engine-portable analog of " +
        "random_size subsampling).",
      (s, dir) =>
        RowOps.systematicSample(Tables.load(s, dir, "documents"), "doc_id", 20, 7)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE doc_id % 20 = 7 ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_slice_assign",
      "parallel_slice_parse slicing: deterministic ≤200-row slices, " +
        "then per-slice counts.",
      (s, dir) =>
        RowOps.withSliceId(Tables.load(s, dir, "documents"), "doc_id", 200)
          .groupBy(col("slice_id"))
          .agg(count(lit(1)).as("rows_in_slice"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("slice_id")),
      Some("""WITH sliced AS (
             |  SELECT doc_id,
             |         CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / 200) AS BIGINT) AS slice_id
             |  FROM documents)
             |SELECT slice_id, COUNT(*) AS rows_in_slice,
             |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
             |FROM sliced GROUP BY slice_id ORDER BY slice_id""".stripMargin)),

    GQuery(
      "q_dedup_by_cols",
      "Deterministic dedup on a column subset (smallest doc_id survives) " +
        "— the engine's drop_duplicates with a defined survivor.",
      (s, dir) =>
        RowOps.dedupBy(Tables.load(s, dir, "documents"),
          Seq("lang", "source"), "doc_id")
          .select(col("lang"), col("source"), col("doc_id"))
          .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, MIN(doc_id) AS doc_id FROM documents
             |GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    GQuery(
      "q_anti_filter",
      "Anti-filter against a flagged set (schema-link removal analog): " +
        "drop all (lang, source) pairs that contain short docs.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val flagged = docs.filter(col("n_chars") < 60)
          .select(col("lang"), col("source")).distinct()
        RowOps.antiFilter(docs, flagged, Seq("lang", "source"))
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source FROM documents d
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM documents f
             |  WHERE f.n_chars < 60 AND f.lang = d.lang AND f.source = d.source)
             |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_majority_vote",
      "Weighted majority vote (multi-DB disambiguation analog): source " +
        "with the highest total character weight.",
      (s, dir) =>
        RowOps.majorityVote(
          Tables.load(s, dir, "documents"), "source", "n_chars"),
      Some("""SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_weight FROM documents
             |GROUP BY source ORDER BY total_weight DESC, source LIMIT 1""".stripMargin)),

    GQuery(
      "q_profile_scan",
      "Single-pass per-column profile (OpenSearch DB_AGENT analog): " +
        "null/distinct/row counts for customer in ONE aggregation, not " +
        "the reference's full-scan-per-column loop.",
      (s, dir) =>
        Tables.load(s, dir, "customer").agg(
          count(lit(1)).as("n_rows"),
          sum(col("c_name").isNull.cast("long")).as("nulls_c_name"),
          countDistinct(col("c_name")).as("distinct_c_name"),
          sum(col("c_nationkey").isNull.cast("long")).as("nulls_c_nationkey"),
          countDistinct(col("c_nationkey")).as("distinct_c_nationkey"),
          sum(col("c_acctbal").isNull.cast("long")).as("nulls_c_acctbal"),
          countDistinct(col("c_acctbal")).as("distinct_c_acctbal")),
      Some("""SELECT COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_name,
             |  COUNT(DISTINCT c_name) AS distinct_c_name,
             |  CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_nationkey,
             |  COUNT(DISTINCT c_nationkey) AS distinct_c_nationkey,
             |  CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_acctbal,
             |  COUNT(DISTINCT c_acctbal) AS distinct_c_acctbal
             |FROM customer""".stripMargin)),

    GQuery(
      "q_temperature_mix",
      "Temperature-flattened source mixture (sample ~ n^0.5, the " +
        "standard pretraining rebalance): per-(source,lang)-segment " +
        "quotas by largest-remainder rounding over integer weights " +
        "floor(1e6*sqrt(n)) — sqrt is IEEE-correctly-rounded on every " +
        "engine, so quotas and the kept rows replay exactly; selection " +
        "is each segment's smallest hash-draws.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("seg", concat_ws("/", col("source"), col("lang")))
        graft.operators.TemperatureMix.sampleSqrtTemperature(
            docs, "seg", "doc_id", totalDocs = 200L)
          .select(col("seg"), col("doc_id"))
          .orderBy(col("seg"), col("doc_id"))
      },
      Some("""WITH c AS (SELECT source || '/' || lang AS seg,
             |                  CAST(COUNT(*) AS BIGINT) AS n
             |           FROM documents GROUP BY 1),
             |w AS (SELECT seg, n,
             |             CAST(floor(1000000 * sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt
             |      FROM c),
             |t AS (SELECT SUM(wt) AS tw FROM w),
             |q AS (SELECT seg, n, (200 * wt) // t.tw AS q0,
             |             (200 * wt) % t.tw AS rem
             |      FROM w, t),
             |l AS (SELECT seg, n, q0, rem,
             |             ROW_NUMBER() OVER (ORDER BY rem DESC, seg) AS rr
             |      FROM q),
             |lo AS (SELECT 200 - SUM(q0) AS leftover FROM q),
             |quota AS (SELECT seg,
             |                 LEAST(q0 + CASE WHEN rr <= lo.leftover
             |                            THEN 1 ELSE 0 END, n) AS quota
             |          FROM l, lo),
             |r AS (SELECT source || '/' || lang AS seg, doc_id,
             |             ROW_NUMBER() OVER (
             |               PARTITION BY source || '/' || lang
             |               ORDER BY ((doc_id % 1000000007) * 2654435761)
             |                        % 1000000007, doc_id) AS rk
             |      FROM documents)
             |SELECT r.seg, r.doc_id
             |FROM r JOIN quota USING (seg)
             |WHERE r.rk <= quota.quota
             |ORDER BY seg, doc_id""".stripMargin)),

    GQuery(
      "q_corpus_diff",
      "Corpus snapshot diff: added/removed/changed/unchanged by id " +
        "presence + content fingerprint — a full-outer equi-join " +
        "moving only 8-byte hashes, never text; the audit between two " +
        "pipeline generations.",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        val after = docs.filter(col("doc_id") % 10 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev")))
              .otherwise(col("text")))
          .unionByName(docs.filter(col("doc_id") < 5)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        graft.operators.CorpusDiff.diffSummary(docs, after, "doc_id", "text")
          .orderBy(col("status"))
      },
      Some(s"""WITH b AS (SELECT doc_id, text FROM documents),
             |a AS (SELECT doc_id,
             |             CASE WHEN doc_id % 7 = 0 THEN text || ' rev'
             |                  ELSE text END AS text
             |      FROM documents WHERE doc_id % 10 <> 0
             |      UNION ALL
             |      SELECT doc_id + 100000, text FROM documents WHERE doc_id < 5),
             |fb AS (SELECT doc_id, ${DedupOracles.polyHash("text")} AS f FROM b),
             |fa AS (SELECT doc_id, ${DedupOracles.polyHash("text")} AS f FROM a),
             |j AS (SELECT COALESCE(fb.doc_id, fa.doc_id) AS doc_id,
             |             CASE WHEN fb.f IS NULL THEN 'added'
             |                  WHEN fa.f IS NULL THEN 'removed'
             |                  WHEN fb.f = fa.f THEN 'unchanged'
             |                  ELSE 'changed' END AS status
             |      FROM fb FULL OUTER JOIN fa ON fb.doc_id = fa.doc_id)
             |SELECT status, COUNT(*) AS n_docs,
             |       MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
             |FROM j GROUP BY status ORDER BY status""".stripMargin))
  )
}

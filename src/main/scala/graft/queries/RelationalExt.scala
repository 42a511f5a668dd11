package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.QueryPack._
import graft.catalog.Tables

/** Relational-surface extensions beyond the round-1 envelope:
  * multi-dimensional aggregation (ROLLUP/CUBE with grouping ids),
  * PIVOT-style cross tabulation, and correlated EXISTS.
  */
object RelationalExt extends QueryPack {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  /** Shared ANSI text — the same string is the Spark query AND the
    * DuckDB oracle (both parse it natively). Defined BEFORE `queries`:
    * object vals initialize in declaration order, and a forward
    * reference would be null inside the GQuery constructors.
    */
  private val GroupingSetsSql =
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |       COALESCE(o_orderpriority, '(all)') AS prio,
      |       COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, prio""".stripMargin

  private val WindowRangeSql =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |         PARTITION BY l_suppkey ORDER BY l_quantity
      |         RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_qty_sum
      |FROM lineitem
      |WHERE l_suppkey < 10
      |ORDER BY l_suppkey, l_quantity, l_orderkey, l_linenumber""".stripMargin

  private val WindowOffsetSql =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      |       LAG(c_acctbal, 1) OVER w AS prev_bal,
      |       LEAD(c_acctbal, 1, 0.0) OVER w AS next_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin

  private val LateralSql =
    """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_custkey < 50
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_lateral_topk",
      "Correlated LATERAL subquery (per-customer top-2 orders by " +
        "price): Catalyst decorrelates into a ranked join. Identical " +
        "ANSI text on both engines.",
      (s, dir) => QueryPack.withTables(s, dir)(_.sql(LateralSql)),
      Some(LateralSql)),

    GQuery(
      "q_rollup",
      "ROLLUP over (priority, status): subtotal rows at each level with " +
        "grouping_id disambiguation.",
      (s, dir) =>
        t(s, dir, "orders")
          .rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
            grouping_id().cast("long").as("gid"))
          .select(
            coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            col("gid"), col("n"), col("total"))
          .orderBy(col("gid"), col("prio"), col("status")),
      Some(s"""SELECT COALESCE(o_orderpriority, '(all)') AS prio,
              |       COALESCE(o_orderstatus, '(all)') AS status,
              |       CAST(GROUPING_ID(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
              |       COUNT(*) AS n, ${oSum("o_totalprice")} AS total
              |FROM orders
              |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
              |ORDER BY gid, prio, status""".stripMargin)),

    GQuery(
      "q_cube",
      "CUBE over (lang, source) on documents: all 4 grouping combinations.",
      (s, dir) =>
        t(s, dir, "documents")
          .cube(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
            grouping_id().cast("long").as("gid"))
          .select(
            coalesce(col("lang"), lit("(all)")).as("lang"),
            coalesce(col("source"), lit("(all)")).as("source"),
            col("gid"), col("n_docs"), col("total_chars"))
          .orderBy(col("gid"), col("lang"), col("source")),
      Some("""SELECT COALESCE(lang, '(all)') AS lang,
             |       COALESCE(source, '(all)') AS source,
             |       CAST(GROUPING_ID(lang, source) AS BIGINT) AS gid,
             |       COUNT(*) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM documents
             |GROUP BY CUBE (lang, source)
             |ORDER BY gid, lang, source""".stripMargin)),

    GQuery(
      "q_pivot",
      "PIVOT cross-tab: document counts per source pivoted over an " +
        "explicit language list (explicit values keep the schema static " +
        "— no extra pass to discover columns).",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("source"))
          .pivot("lang", Seq("en", "fr", "es", "de"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("source")),
      Some("""SELECT source,
             |  COALESCE(COUNT(*) FILTER (lang = 'en'), 0) AS en,
             |  COALESCE(COUNT(*) FILTER (lang = 'fr'), 0) AS fr,
             |  COALESCE(COUNT(*) FILTER (lang = 'es'), 0) AS es,
             |  COALESCE(COUNT(*) FILTER (lang = 'de'), 0) AS de
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    GQuery(
      "q_exists_correlated",
      "Correlated EXISTS through spark.sql: customers with at least one " +
        "urgent order, counted per market segment.",
      (s, dir) => QueryPack.withTables(s, dir) { spark =>
        spark.sql(
          """SELECT c_mktsegment, COUNT(*) AS n_customers
            |FROM customer c
            |WHERE EXISTS (
            |  SELECT 1 FROM orders o
            |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
            |GROUP BY c_mktsegment
            |ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
             |FROM customer c
             |WHERE EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    GQuery(
      "q_json_extract",
      "Semi-structured column handling: extract a typed field from the " +
        "events JSON props column (get_json_object pushdown-friendly " +
        "scalar path), bucket and aggregate.",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .withColumn("k_bucket", (col("k") / 10).cast("long"))
          .groupBy(col("event_type"), col("k_bucket"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
          .orderBy(col("event_type"), col("k_bucket")),
      Some("""SELECT event_type,
             |       CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_bucket,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY event_type, k_bucket""".stripMargin)),

    GQuery(
      "q_grouping_sets",
      "Explicit GROUPING SETS (beyond ROLLUP/CUBE): per-status, " +
        "per-priority, and grand-total groups in one aggregation pass. " +
        "Identical ANSI text runs on both engines.",
      (s, dir) =>
        QueryPack.withTables(s, dir)(_.sql(GroupingSetsSql)),
      Some(GroupingSetsSql)),

    GQuery(
      "q_window_range",
      "RANGE-framed window (value-based frame, includes peers — " +
        "deterministic under ties): running quantity sum within 5 units " +
        "below the current row's quantity, per supplier. Identical ANSI " +
        "text on both engines; decimal-exact sum inside the frame.",
      (s, dir) =>
        QueryPack.withTables(s, dir)(_.sql(WindowRangeSql)),
      Some(WindowRangeSql)),

    GQuery(
      "q_window_offset",
      "Offset window functions (NTILE quartiles, LAG, LEAD-with-default) " +
        "in one named WINDOW clause — identical ANSI text on both " +
        "engines; ties in the window order are output-identical rows.",
      (s, dir) => QueryPack.withTables(s, dir)(_.sql(WindowOffsetSql)),
      Some(WindowOffsetSql)),

    GQuery(
      "q_unpivot",
      "UNPIVOT (wide -> long): part metrics stacked into (metric, value) " +
        "rows — Spark's stack() generator, DuckDB's UNPIVOT; both are " +
        "scan-time row generation, no shuffle.",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") <= 100)
          .select(col("p_partkey"),
            expr("stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE))")
              .as(Seq("metric", "value")))
          .orderBy(col("p_partkey"), col("metric")),
      Some("""SELECT p_partkey, metric, value FROM (
             |  SELECT p_partkey, p_retailprice AS retail,
             |         CAST(p_size AS DOUBLE) AS "size"
             |  FROM part WHERE p_partkey <= 100)
             |UNPIVOT (value FOR metric IN (retail, "size"))
             |ORDER BY p_partkey, metric""".stripMargin)),

    GQuery(
      "q_nullsafe_join",
      "Null-safe equality join (<=> / IS NOT DISTINCT FROM): a " +
        "synthesized nullable key joins with NULL matching NULL — the " +
        "semantics LLM-generated SQL trips over most.",
      (s, dir) => {
        val ev = t(s, dir, "supplier")
          .select(col("s_suppkey"),
            when(col("s_nationkey") < 5, lit(null)).otherwise(col("s_nationkey"))
              .as("nk"))
        val dim = t(s, dir, "nation")
          .select(when(col("n_nationkey") < 5, lit(null)).otherwise(col("n_nationkey"))
            .as("nk2"), col("n_name"))
          .distinct()
        ev.join(dim, col("nk") <=> col("nk2"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_sup"))
          .orderBy(col("n_name"))
      },
      Some("""WITH s AS (
             |  SELECT s_suppkey,
             |         CASE WHEN s_nationkey < 5 THEN NULL ELSE s_nationkey END AS nk
             |  FROM supplier),
             |d AS (
             |  SELECT DISTINCT
             |         CASE WHEN n_nationkey < 5 THEN NULL ELSE n_nationkey END AS nk2,
             |         n_name
             |  FROM nation)
             |SELECT n_name, COUNT(*) AS n_sup
             |FROM s JOIN d ON s.nk IS NOT DISTINCT FROM d.nk2
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    GQuery(
      "q_token_freq",
      "Distributed token frequency: explode whitespace tokens (hash " +
        "shuffle on token — the classic wide explode/agg), global " +
        "top-20 by count.",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some("""WITH tk AS (
             |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |                            t -> length(t) > 0)) AS token
             |  FROM documents)
             |SELECT token, COUNT(*) AS n FROM tk
             |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.QueryPack._
import graft.catalog.Tables

/** The relational surface the engine must execute (SURVEY §2.9): the SQL
  * construct families that Squrve-generated queries use, re-expressed as
  * idiomatic DataFrame plans (Catalyst handles pushdown/pruning/join
  * selection). Each query has a DuckDB oracle with identical column names.
  *
  * Scale notes are per-query; the common rules: dims (`region`, `nation`,
  * `supplier`, `part`) broadcast; facts (`lineitem`, `orders`) shuffle on
  * their join/group keys only; every ORDER BY ... LIMIT is a
  * TakeOrderedAndProject (no global sort materialization).
  */
object Relational extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Seq[GQuery] = Seq(

    // -- scans, projections, WHERE, LIKE, BETWEEN, IN ----------------------
    GQuery(
      "q_scan_filter",
      "Scan + projection + conjunctive predicates (LIKE / BETWEEN / IN); " +
        "all predicates push down to the parquet scan.",
      (s, dir) => {
        t(s, dir, "orders")
          .filter(
            col("o_orderstatus").isin("F", "O") &&
              col("o_orderpriority").like("%URGENT%") &&
              col("o_totalprice").between(1000.0, 100000.0))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_orderstatus IN ('F','O') AND o_orderpriority LIKE '%URGENT%'
             |  AND o_totalprice BETWEEN 1000.0 AND 100000.0
             |ORDER BY o_orderkey""".stripMargin)),

    // -- multi-way FK join + agg + top-k (the flagship) --------------------
    GQuery(
      "q_join_agg_topk",
      "Revenue per region for 1995 orders: 5-way FK join, decimal-exact " +
        "aggregation, top-3. Dims broadcast; lineitem shuffles once on " +
        "l_orderkey for the orders join, then on r_name for the agg.",
      (s, dir) => {
        val region = t(s, dir, "region")
        val nation = t(s, dir, "nation")
        val customer = t(s, dir, "customer")
        val orders = t(s, dir, "orders")
        val lineitem = t(s, dir, "lineitem")
        lineitem
          .join(orders.filter(
            col("o_orderdate") >= lit("1995-01-01") &&
              col("o_orderdate") < lit("1996-01-01")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("r_name"))
          .limit(3)
      },
      Some(s"""SELECT r_name, ${oSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders   ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation   ON c_nationkey = n_nationkey
              |JOIN region   ON n_regionkey = r_regionkey
              |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
              |GROUP BY r_name ORDER BY revenue DESC, r_name LIMIT 3""".stripMargin)),

    // -- GROUP BY + full agg family + HAVING -------------------------------
    GQuery(
      "q_groupby_having",
      "TPC-H Q1-style pricing summary: hash agg with partial (map-side) " +
        "aggregation, HAVING filter after the agg.",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            davg(col("l_discount")).as("avg_disc"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            count(lit(1)).as("count_order"))
          .filter(col("count_order") > 10)
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${oSum("l_quantity")} AS sum_qty,
              |  ${oSum("l_extendedprice")} AS sum_base_price,
              |  ${oAvg("l_discount")} AS avg_disc,
              |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
              |  COUNT(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |HAVING COUNT(*) > 10
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // -- DISTINCT + COUNT(DISTINCT) ---------------------------------------
    GQuery(
      "q_count_distinct",
      "DISTINCT + COUNT(DISTINCT) per group; Spark expands distinct " +
        "aggregates map-side before the final agg.",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
             |COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // -- IN-subquery (semi join) -------------------------------------------
    GQuery(
      "q_semi_join",
      "IN (SELECT ...) as a left-semi join: customers having at least one " +
        "high-value order. Semi join avoids duplicating the probe side.",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
        customer
          .join(big, customer("c_custkey") === big("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // -- NOT IN (anti join) -------------------------------------------------
    GQuery(
      "q_anti_join",
      "NOT IN (non-null keys) as a left-anti join: customers with no orders.",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val orders = t(s, dir, "orders")
        customer
          .join(orders.filter(col("o_orderpriority") === "1-URGENT"),
            customer("c_custkey") === orders("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_custkey NOT IN (
             |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // -- scalar subquery -----------------------------------------------------
    GQuery(
      "q_scalar_subquery",
      "Predicate against a scalar subquery (global avg); the scalar is " +
        "computed once and broadcast into the filter.",
      (s, dir) => {
        val part = t(s, dir, "part")
        val avgPrice = part.agg(davg(col("p_retailprice")).as("a"))
        part
          .join(broadcast(avgPrice))
          .filter(col("p_retailprice") > col("a"))
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
          .orderBy(col("p_partkey"))
      },
      Some(s"""SELECT p_partkey, p_name, p_retailprice FROM part
              |WHERE p_retailprice > (SELECT ${oAvg("p_retailprice")} FROM part)
              |ORDER BY p_partkey""".stripMargin)),

    // -- correlated subquery -------------------------------------------------
    GQuery(
      "q_correlated_subquery",
      "Correlated subquery (order above its customer's average) " +
        "decorrelated into an aggregate + join, Catalyst-style.",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val perCust = orders.groupBy(col("o_custkey").as("k"))
          .agg(davg(col("o_totalprice")).as("cust_avg"))
        orders
          .join(perCust, col("o_custkey") === col("k"))
          .filter(col("o_totalprice") > col("cust_avg"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o1
              |WHERE o_totalprice > (SELECT ${oAvg("o_totalprice")} FROM orders o2
              |                      WHERE o2.o_custkey = o1.o_custkey)
              |ORDER BY o_orderkey""".stripMargin)),

    // -- set operations ------------------------------------------------------
    GQuery(
      "q_intersect",
      "INTERSECT of nation keys present in both customer and supplier.",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    GQuery(
      "q_except",
      "EXCEPT: customer nations minus nations of well-funded suppliers.",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .except(t(s, dir, "supplier").filter(col("s_acctbal") > 5000.0)
            .select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000.0
             |ORDER BY nationkey""".stripMargin)),

    GQuery(
      "q_union_all",
      "UNION ALL of two typed account streams with a source tag.",
      (s, dir) =>
        t(s, dir, "customer")
          .select(lit("customer").as("side"), col("c_acctbal").cast("double").as("acctbal"))
          .unionAll(
            t(s, dir, "supplier")
              .select(lit("supplier").as("side"), col("s_acctbal").cast("double").as("acctbal")))
          .groupBy(col("side"))
          .agg(dsum(col("acctbal")).as("total_bal"), count(lit(1)).as("n"))
          .orderBy(col("side")),
      Some(s"""SELECT side, ${oSum("acctbal")} AS total_bal, COUNT(*) AS n FROM (
              |  SELECT 'customer' AS side, c_acctbal AS acctbal FROM customer
              |  UNION ALL
              |  SELECT 'supplier' AS side, s_acctbal AS acctbal FROM supplier
              |) GROUP BY side ORDER BY side""".stripMargin)),

    // -- CTE (executed through spark.sql — the engine's SQL front door) -----
    GQuery(
      "q_cte",
      "WITH-clause query executed via spark.sql over registered views: " +
        "the path Squrve-generated SQL takes through this engine.",
      (s, dir) => withTables(s, dir) { sp =>
        sp.sql(
          """WITH cust_orders AS (
            |  SELECT o_custkey, COUNT(*) AS n_orders,
            |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
            |  FROM orders GROUP BY o_custkey
            |)
            |SELECT c_mktsegment, COUNT(*) AS n_cust,
            |       CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS seg_spend
            |FROM customer JOIN cust_orders ON c_custkey = o_custkey
            |WHERE n_orders >= 2
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""WITH cust_orders AS (
             |  SELECT o_custkey, COUNT(*) AS n_orders,
             |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |  FROM orders GROUP BY o_custkey
             |)
             |SELECT c_mktsegment, COUNT(*) AS n_cust,
             |       CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS seg_spend
             |FROM customer JOIN cust_orders ON c_custkey = o_custkey
             |WHERE n_orders >= 2
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // -- window functions ----------------------------------------------------
    GQuery(
      "q_window_rank",
      "row_number over (customer, price desc) — one shuffle on the " +
        "partition key, sort within partitions only.",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin)),

    GQuery(
      "q_window_running",
      "Running sum (rows unbounded preceding → current) per supplier by " +
        "ship date; decimal-exact so the prefix sums match the oracle. " +
        "l_quantity closes the ordering: the synthetic data duplicates " +
        "(orderkey, linenumber), and a ROWS frame over an ambiguous " +
        "order is engine-dependent — with quantity in the key, any " +
        "remaining ties are interchangeable for the sum.",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .withColumn("running_qty",
            sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double"))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             |    PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
             |FROM lineitem
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // -- ILIKE ----------------------------------------------------------------
    GQuery(
      "q_ilike",
      "Case-insensitive LIKE (Spark `ilike`, Snowflake-ism in the " +
        "reference's dialect envelope).",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_type").ilike("%economy%") || col("p_name").ilike("%RED%"))
          .select(col("p_partkey"), col("p_name"), col("p_type"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_type ILIKE '%economy%' OR p_name ILIKE '%RED%'
             |ORDER BY p_partkey""".stripMargin)),

    // -- ARRAY_AGG -------------------------------------------------------------
    GQuery(
      "q_array_agg",
      "ARRAY_AGG with canonical (sorted) ordering — collect_list order is " +
        "nondeterministic under parallel agg, so both sides sort. The array " +
        "is serialized to a joined string for the compare harness (the " +
        "driver's pandas-side sort cannot order ndarray cells).",
      (s, dir) =>
        t(s, dir, "nation")
          .groupBy(col("n_regionkey"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy(col("n_regionkey")),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // -- NULLS LAST ordering -----------------------------------------------------
    GQuery(
      "q_nulls_last",
      "Explicit NULL ordering (NULLS LAST) with a synthesized nullable key.",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("v", when(col("value") < 50.0, lit(null)).otherwise(col("value")))
          .select(col("event_id"), col("v"))
          .orderBy(col("v").asc_nulls_last, col("event_id"))
          .limit(100),
      Some("""SELECT event_id, CASE WHEN value < 50.0 THEN NULL ELSE value END AS v
             |FROM events ORDER BY v ASC NULLS LAST, event_id LIMIT 100""".stripMargin)),

    // -- CASE WHEN + scalar string/math functions ---------------------------------
    GQuery(
      "q_scalar_funcs",
      "CASE WHEN + string (upper/substr/concat/length) and math " +
        "(abs/round/floor) scalar functions, all codegen'd built-ins.",
      (s, dir) =>
        t(s, dir, "customer")
          .select(
            col("c_custkey"),
            upper(substring(col("c_name"), 1, 4)).as("name_prefix"),
            concat(col("c_mktsegment"), lit("#"), col("c_nationkey").cast("string")).as("seg_tag"),
            length(col("c_name")).as("name_len"),
            abs(col("c_acctbal")).as("abs_bal"),
            floor(col("c_acctbal")).cast("long").as("floor_bal"),
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 5000, "mid")
              .otherwise("high").as("bal_band"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |  UPPER(SUBSTR(c_name, 1, 4)) AS name_prefix,
             |  c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_tag,
             |  LENGTH(c_name) AS name_len,
             |  ABS(c_acctbal) AS abs_bal,
             |  CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
             |  CASE WHEN c_acctbal < 0 THEN 'neg'
             |       WHEN c_acctbal < 5000 THEN 'mid'
             |       ELSE 'high' END AS bal_band
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // -- date/time functions --------------------------------------------------------
    GQuery(
      "q_date_funcs",
      "EXTRACT year/month/quarter + month truncation over order dates.",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            year(col("o_orderdate")).cast("long").as("o_year"),
            month(col("o_orderdate")).cast("long").as("o_month"),
            quarter(col("o_orderdate")).cast("long").as("o_quarter"),
            col("o_totalprice"))
          .groupBy(col("o_year"), col("o_month"), col("o_quarter"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("month_total"))
          .orderBy(col("o_year"), col("o_month")),
      Some(s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
              |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
              |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS o_quarter,
              |  COUNT(*) AS n, ${oSum("o_totalprice")} AS month_total
              |FROM orders GROUP BY 1, 2, 3 ORDER BY o_year, o_month""".stripMargin)),

    // -- self join ---------------------------------------------------------------------
    GQuery(
      "q_self_join",
      "Self-join with aliases: pairs of nations in the same region.",
      (s, dir) => {
        val n1 = t(s, dir, "nation").select(
          col("n_regionkey").as("rk"), col("n_nationkey").as("k1"), col("n_name").as("nation_a"))
        val n2 = t(s, dir, "nation").select(
          col("n_regionkey").as("rk2"), col("n_nationkey").as("k2"), col("n_name").as("nation_b"))
        n1.join(n2, col("rk") === col("rk2") && col("k1") < col("k2"))
          .select(col("rk").as("regionkey"), col("nation_a"), col("nation_b"))
          .orderBy(col("regionkey"), col("nation_a"), col("nation_b"))
      },
      Some("""SELECT n1.n_regionkey AS regionkey, n1.n_name AS nation_a, n2.n_name AS nation_b
             |FROM nation n1 JOIN nation n2
             |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
             |ORDER BY regionkey, nation_a, nation_b""".stripMargin)),

    // -- outer join with COALESCE -----------------------------------------------------
    GQuery(
      "q_left_outer_join",
      "LEFT OUTER join + COALESCE of the null side (customers with order " +
        "counts, zero-filled).",
      (s, dir) => {
        val perCust = t(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
        t(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COALESCE(cnt, 0) AS n_orders
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
             |) ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin))
  )
}

package graft.queries

import graft.{GQuery, QueryPack}
import graft.dialect.Transpiler

/** Round-15 dialect long-tail, end-to-end through `spark.sql` with
  * DuckDB oracles: BigQuery FROM-clause UNNEST (incl. WITH OFFSET and
  * IN UNNEST), Snowflake LATERAL FLATTEN, LISTAGG ... WITHIN GROUP,
  * NVL/NVL2/DECODE/SPLIT_PART (native Spark 4 pass-throughs, verified
  * against DuckDB equivalents), extended REGEXP_SUBSTR/REGEXP_EXTRACT
  * argument forms, BigQuery's Sunday-start WEEK alignment, and the
  * time-of-day-preserving TIMESTAMP_ADD/DATETIME_ADD mapping — the
  * arrays/structs and date idioms the reference's Spider2 repair
  * prompts enumerate (core/actor/generator/sql_debug.py:120-250).
  *
  * The genuinely nested inputs come from an in-session array fixture
  * (`nation_arrays`: one sorted VARCHAR array per region) built with
  * array_sort(collect_list(...)) on the Spark side and
  * list(... ORDER BY ...) on the DuckDB side, so both engines explode
  * identical arrays and WITH OFFSET positions are deterministic.
  */
object DialectQueries extends QueryPack {

  /** Registers all parquet tables plus the nested fixtures: an array
    * column (`nation_arrays`) and a Spider2-style VARIANT-shaped
    * array-of-struct column (`nation_structs`).
    */
  private def withNested(s: org.apache.spark.sql.SparkSession, dir: String)(
      body: org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame) =
    QueryPack.withTables(s, dir) { spark =>
      spark.sql(
        """SELECT n_regionkey, array_sort(collect_list(n_name)) AS names
          |FROM nation GROUP BY n_regionkey""".stripMargin)
        .createOrReplaceTempView("nation_arrays")
      spark.sql(
        """SELECT n_regionkey,
          |       array_sort(collect_list(named_struct(
          |         'name', n_name, 'nkey', n_nationkey))) AS nats
          |FROM nation GROUP BY n_regionkey""".stripMargin)
        .createOrReplaceTempView("nation_structs")
      body(spark)
    }

  /** JSON-TEXT fixture (the Spider2-snow export shape: VARIANT columns
    * arrive as JSON strings): one JSON document per nation, built with
    * identical string concatenation on both engines.
    */
  private def withJson(s: org.apache.spark.sql.SparkSession, dir: String)(
      body: org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame) =
    QueryPack.withTables(s, dir) { spark =>
      spark.sql(
        """SELECT n_nationkey, n_name,
          |       concat('{"name":"', n_name, '","region":', n_regionkey,
          |              ',"tags":["t', n_nationkey % 3, '","x"]}') AS j
          |FROM nation""".stripMargin)
        .createOrReplaceTempView("nation_json")
      body(spark)
    }

  private val oracleJson =
    """nation_json AS (
      |  SELECT n_nationkey, n_name,
      |         '{"name":"' || n_name || '","region":' || n_regionkey ||
      |         ',"tags":["t' || (n_nationkey % 3) || '","x"]}' AS j
      |  FROM nation)""".stripMargin

  /** The same fixture as a DuckDB CTE (sorted lists, zip-unnest). */
  private val oracleNested =
    """nation_arrays AS (
      |  SELECT n_regionkey, list(n_name ORDER BY n_name) AS names
      |  FROM nation GROUP BY n_regionkey),
      |exploded AS (
      |  SELECT n_regionkey, unnest(names) AS nm,
      |         unnest(range(len(names))) AS pos
      |  FROM nation_arrays)""".stripMargin

  override def queries: Seq[GQuery] = Seq(

    GQuery(
      "q_transpile_bq_unnest",
      "BigQuery FROM-clause UNNEST over a genuinely nested array " +
        "column: `, UNNEST(names) AS nm WITH OFFSET AS pos` becomes " +
        "LATERAL VIEW POSEXPLODE, ENDS_WITH/IN UNNEST rewrite to " +
        "Spark equivalents, and the 0-based offsets match DuckDB's " +
        "range() zip-unnest (sql_debug.py:184 names these idioms).",
      (s, dir) =>
        withNested(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT n_regionkey, CAST(pos AS INT64) AS pos, nm
              |FROM nation_arrays, UNNEST(names) AS nm WITH OFFSET AS pos
              |WHERE ENDS_WITH(nm, '0') OR pos = 0
              |ORDER BY n_regionkey, pos""".stripMargin))
        },
      Some(s"""WITH $oracleNested
              |SELECT n_regionkey, CAST(pos AS BIGINT) AS pos, nm
              |FROM exploded
              |WHERE nm LIKE '%0' OR pos = 0
              |ORDER BY n_regionkey, pos""".stripMargin)),

    GQuery(
      "q_transpile_snow_flatten",
      "Snowflake LATERAL FLATTEN(input => arr) with f.index/f.value " +
        "projections and :: casts, rewritten to LATERAL VIEW " +
        "POSEXPLODE (sql_debug.py:145 names LATERAL FLATTEN for " +
        "Spider2-snow).",
      (s, dir) =>
        withNested(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT a.n_regionkey, f.index::INT AS idx,
              |       f.value::VARCHAR AS nation_name
              |FROM nation_arrays a, LATERAL FLATTEN(input => a.names) f
              |WHERE f.index < 3
              |ORDER BY a.n_regionkey, idx""".stripMargin))
        },
      Some(s"""WITH $oracleNested
              |SELECT n_regionkey, CAST(pos AS BIGINT) AS idx,
              |       nm AS nation_name
              |FROM exploded WHERE pos < 3
              |ORDER BY n_regionkey, idx""".stripMargin)),

    GQuery(
      "q_transpile_bq_unnest_struct",
      "BigQuery UNNEST over an array-of-STRUCT column (the Spider2 " +
        "arrays/structs shape): `, UNNEST(nats) AS x` + `x.field` " +
        "projections run end-to-end over genuinely nested data.",
      (s, dir) =>
        withNested(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT n_regionkey, x.name AS nat_name,
              |       CAST(x.nkey AS INT64) AS nat_key
              |FROM nation_structs, UNNEST(nats) AS x
              |WHERE ENDS_WITH(x.name, '1') OR x.nkey = 0
              |ORDER BY n_regionkey, nat_name""".stripMargin))
        },
      Some("""WITH nation_structs AS (
             |  SELECT n_regionkey,
             |         list(struct_pack(name := n_name, nkey := n_nationkey)
             |              ORDER BY n_name) AS nats
             |  FROM nation GROUP BY n_regionkey),
             |ex AS (SELECT n_regionkey, unnest(nats) AS x FROM nation_structs)
             |SELECT n_regionkey, x.name AS nat_name,
             |       CAST(x.nkey AS BIGINT) AS nat_key
             |FROM ex WHERE x.name LIKE '%1' OR x.nkey = 0
             |ORDER BY n_regionkey, nat_name""".stripMargin)),

    GQuery(
      "q_transpile_snow_flatten_path",
      "Snowflake LATERAL FLATTEN over VARIANT-shaped structs with " +
        "single-colon path access (`f.value:name::VARCHAR`) — the " +
        "Spider2-snow idiom — rewritten to posexplode + dot field " +
        "access + mapped casts.",
      (s, dir) =>
        withNested(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT a.n_regionkey, f.index::INT AS idx,
              |       f.value:name::VARCHAR AS nat_name,
              |       f.value:nkey::INT AS nat_key
              |FROM nation_structs a, LATERAL FLATTEN(input => a.nats) f
              |WHERE f.index < 2
              |ORDER BY a.n_regionkey, idx""".stripMargin))
        },
      Some("""WITH nation_structs AS (
             |  SELECT n_regionkey,
             |         list(struct_pack(name := n_name, nkey := n_nationkey)
             |              ORDER BY n_name) AS nats
             |  FROM nation GROUP BY n_regionkey),
             |ex AS (SELECT n_regionkey,
             |              unnest(nats) AS x,
             |              unnest(range(len(nats))) AS pos
             |       FROM nation_structs)
             |SELECT n_regionkey, CAST(pos AS BIGINT) AS idx,
             |       x.name AS nat_name, CAST(x.nkey AS BIGINT) AS nat_key
             |FROM ex WHERE pos < 2
             |ORDER BY n_regionkey, idx""".stripMargin)),

    GQuery(
      "q_transpile_listagg",
      "Snowflake LISTAGG ... WITHIN GROUP, NVL, NULL-matching DECODE " +
        "and SPLIT_PART — all native Spark 4 functions that the " +
        "Snowflake arm deliberately passes through, verified against " +
        "DuckDB string_agg/COALESCE/CASE/split_part equivalents.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT n_regionkey,
              |       LISTAGG(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
              |       NVL(MIN(NULLIF(n_name, n_name)), 'none') AS nvl_probe,
              |       DECODE(n_regionkey, 0, 'zero', 1, 'one', 'many') AS bucket,
              |       SPLIT_PART(MIN(n_name), '_', 2) AS first_num
              |FROM nation
              |GROUP BY n_regionkey
              |ORDER BY n_regionkey""".stripMargin))
        },
      Some("""SELECT n_regionkey,
             |       string_agg(n_name, '|' ORDER BY n_name) AS nations,
             |       COALESCE(MIN(NULLIF(n_name, n_name)), 'none') AS nvl_probe,
             |       CASE WHEN n_regionkey = 0 THEN 'zero'
             |            WHEN n_regionkey = 1 THEN 'one'
             |            ELSE 'many' END AS bucket,
             |       split_part(MIN(n_name), '_', 2) AS first_num
             |FROM nation
             |GROUP BY n_regionkey
             |ORDER BY n_regionkey""".stripMargin)),

    GQuery(
      "q_transpile_snow_regexp",
      "Snowflake REGEXP_SUBSTR extended argument forms (position, " +
        "occurrence, 'e' group extraction) and NVL2, composed from " +
        "substr + regexp_extract_all + try_element_at.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT p_partkey,
              |       REGEXP_SUBSTR(p_name, '[a-z]+') AS w1,
              |       REGEXP_SUBSTR(p_name, '[a-z]+', 1, 2) AS w2,
              |       REGEXP_SUBSTR(p_name, '([a-z]+) ([a-z]+)', 1, 1, 'e', 2) AS g2,
              |       NVL2(p_name, 'named', 'anon') AS probe
              |FROM part
              |WHERE p_partkey < 200
              |ORDER BY p_partkey""".stripMargin))
        },
      Some("""SELECT p_partkey,
             |       regexp_extract(p_name, '[a-z]+') AS w1,
             |       regexp_extract_all(p_name, '[a-z]+')[2] AS w2,
             |       regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS g2,
             |       CASE WHEN p_name IS NOT NULL THEN 'named' ELSE 'anon' END AS probe
             |FROM part
             |WHERE p_partkey < 200
             |ORDER BY p_partkey""".stripMargin)),

    GQuery(
      "q_transpile_bq_extract",
      "BigQuery REGEXP_EXTRACT (group-aware), REGEXP_EXTRACT_ALL " +
        "under ARRAY_LENGTH, position/occurrence forms, and " +
        "STRING_AGG with in-call ORDER BY → WITHIN GROUP.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT p_partkey,
              |       REGEXP_EXTRACT(p_name, '([a-z]+) ') AS first_word,
              |       REGEXP_EXTRACT(p_name, '[a-z]+', 1, 2) AS second_word,
              |       CAST(ARRAY_LENGTH(REGEXP_EXTRACT_ALL(p_name, '[a-z]+')) AS INT64) AS n_words,
              |       STRING_AGG(p_name, ';' ORDER BY p_name) AS all_names
              |FROM part
              |WHERE p_partkey < 50
              |GROUP BY p_partkey, p_name
              |ORDER BY p_partkey""".stripMargin))
        },
      Some("""SELECT p_partkey,
             |       regexp_extract(p_name, '([a-z]+) ', 1) AS first_word,
             |       regexp_extract_all(p_name, '[a-z]+')[2] AS second_word,
             |       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
             |       string_agg(p_name, ';' ORDER BY p_name) AS all_names
             |FROM part
             |WHERE p_partkey < 50
             |GROUP BY p_partkey, p_name
             |ORDER BY p_partkey""".stripMargin)),

    GQuery(
      "q_transpile_bq_week",
      "BigQuery's bare WEEK date part is SUNDAY-start (Spark's WEEK " +
        "is Monday-start): DATE_TRUNC(d, WEEK) and DATE_DIFF(.., WEEK) " +
        "emit explicitly Sunday-aligned arithmetic, verified against a " +
        "DuckDB oracle that Sunday-aligns its Monday-start date_trunc " +
        "the same way (r14 advisor finding).",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT CAST(DATE_TRUNC(o_orderdate, WEEK) AS STRING) AS wk,
              |       COUNT(*) AS n,
              |       CAST(MAX(DATE_DIFF(o_orderdate, DATE '1995-01-01', WEEK)) AS INT64) AS max_wk
              |FROM orders
              |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              |  AND o_orderdate < TIMESTAMP '1995-04-01'
              |GROUP BY wk
              |ORDER BY wk""".stripMargin))
        },
      Some("""SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE) + 1) - 1 AS VARCHAR) AS wk,
             |       COUNT(*) AS n,
             |       CAST(MAX(date_diff('day',
             |           date_trunc('week', DATE '1995-01-01' + 1) - 1,
             |           date_trunc('week', CAST(o_orderdate AS DATE) + 1) - 1) // 7) AS BIGINT) AS max_wk
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             |  AND o_orderdate < TIMESTAMP '1995-04-01'
             |GROUP BY wk
             |ORDER BY wk""".stripMargin)),

    GQuery(
      "q_transpile_ts_add",
      "TIMESTAMP_ADD/DATETIME_ADD preserve the time-of-day: minute " +
        "adds via timestampadd and month adds via + make_ym_interval " +
        "(with end-of-month clamping) render identical clocks to " +
        "DuckDB's interval arithmetic — the old date_add mapping " +
        "would truncate every one of these to midnight (r14 advisor " +
        "finding).",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT event_id,
              |       FORMAT_TIMESTAMP('%Y-%m-%d %H:%M:%S', TIMESTAMP_ADD(ts, INTERVAL 90 MINUTE)) AS t90m,
              |       FORMAT_TIMESTAMP('%Y-%m-%d %H:%M:%S', DATETIME_ADD(ts, INTERVAL 1 MONTH)) AS t1mo
              |FROM events
              |WHERE event_id < 500
              |ORDER BY event_id""".stripMargin))
        },
      Some("""SELECT event_id,
             |       strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS t90m,
             |       strftime(ts + INTERVAL 1 MONTH, '%Y-%m-%d %H:%M:%S') AS t1mo
             |FROM events
             |WHERE event_id < 500
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "q_transpile_snow_json",
      "Snowflake JSON-text VARIANT access (the Spider2-snow export " +
        "shape — VARIANT columns arrive as JSON strings): " +
        "PARSE_JSON(col):path::TYPE → variant_get with the cast " +
        "folded into the type argument, GET_PATH with array index, " +
        "::VARCHAR scalar extraction from a variant, and " +
        "JSON_EXTRACT_PATH_TEXT → get_json_object, all verified " +
        "against DuckDB's json_extract mirrors.",
      (s, dir) =>
        withJson(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT n_nationkey,
              |       PARSE_JSON(j):name::VARCHAR AS nm,
              |       PARSE_JSON(j):region::INT AS reg,
              |       GET_PATH(PARSE_JSON(j), 'tags[0]')::VARCHAR AS tag0,
              |       JSON_EXTRACT_PATH_TEXT(j, 'name') AS nm2
              |FROM nation_json
              |ORDER BY n_nationkey""".stripMargin))
        },
      Some(s"""WITH $oracleJson
              |SELECT n_nationkey,
              |       json_extract_string(j, '$$.name') AS nm,
              |       CAST(json_extract_string(j, '$$.region') AS BIGINT) AS reg,
              |       json_extract_string(j, '$$.tags[0]') AS tag0,
              |       json_extract_string(j, '$$.name') AS nm2
              |FROM nation_json
              |ORDER BY n_nationkey""".stripMargin)),

    GQuery(
      "q_transpile_bq_json",
      "BigQuery JSON functions over JSON-text columns: JSON_VALUE/" +
        "JSON_EXTRACT_SCALAR → get_json_object (unquoted scalars), " +
        "JSON_EXTRACT/JSON_QUERY → to_json(variant_get(try_parse_json)) " +
        "(JSON text, quotes included), TO_JSON_STRING over a STRUCT — " +
        "mirrored by DuckDB json_extract/json_extract_string/to_json.",
      (s, dir) =>
        withJson(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT n_nationkey,
              |       JSON_VALUE(j, '$.name') AS nm,
              |       CAST(JSON_EXTRACT_SCALAR(j, '$.region') AS INT64) AS reg,
              |       JSON_QUERY(j, '$.tags') AS tags_json,
              |       JSON_EXTRACT(j, '$.name') AS nm_json,
              |       TO_JSON_STRING(STRUCT(n_nationkey AS k, n_name AS v)) AS sj
              |FROM nation_json
              |ORDER BY n_nationkey""".stripMargin))
        },
      Some(s"""WITH $oracleJson
              |SELECT n_nationkey,
              |       json_extract_string(j, '$$.name') AS nm,
              |       CAST(json_extract_string(j, '$$.region') AS BIGINT) AS reg,
              |       CAST(json_extract(j, '$$.tags') AS VARCHAR) AS tags_json,
              |       CAST(json_extract(j, '$$.name') AS VARCHAR) AS nm_json,
              |       CAST(to_json(struct_pack(k := n_nationkey, v := n_name)) AS VARCHAR) AS sj
              |FROM nation_json
              |ORDER BY n_nationkey""".stripMargin)),

    GQuery(
      "q_transpile_object_agg",
      "Snowflake OBJECT_AGG under TO_JSON: the aggregate becomes a " +
        "deterministic sorted map (Snowflake serializes OBJECT keys " +
        "lexicographically) and TO_JSON renders it — mirrored by a " +
        "DuckDB ordered string_agg building the same JSON text.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT n_regionkey, TO_JSON(OBJECT_AGG(n_name, n_nationkey)) AS obj
              |FROM nation
              |GROUP BY n_regionkey
              |ORDER BY n_regionkey""".stripMargin))
        },
      Some("""SELECT n_regionkey,
             |       '{' || string_agg('"' || n_name || '":' || n_nationkey,
             |                         ',' ORDER BY n_name) || '}' AS obj
             |FROM nation
             |GROUP BY n_regionkey
             |ORDER BY n_regionkey""".stripMargin)),

    GQuery(
      "q_transpile_batch3",
      "Dialect batch 3: Snowflake SAMPLE (n ROWS) fixed-size sampling " +
        "→ TABLESAMPLE (n ROWS) (verified via its exact count), " +
        "LAG/NTH_VALUE ... IGNORE NULLS (Snowflake's outer spelling is " +
        "native Spark — verified against DuckDB's in-call spelling), " +
        "and SELECT * EXCEPT(cols) (native in both Spark and BigQuery, " +
        "passes through the arm untouched).",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """WITH samp AS (
              |  SELECT COUNT(*) AS n_samp
              |  FROM (SELECT * FROM nation SAMPLE (7 ROWS))),
              |base AS (
              |  SELECT * EXCEPT (o_totalprice, o_orderpriority)
              |  FROM orders WHERE o_orderkey < 400)
              |SELECT b.*,
              |       LAG(NULLIF(b.o_orderkey % 3, 0)) IGNORE NULLS
              |         OVER (ORDER BY b.o_orderkey) AS prev_nz,
              |       NTH_VALUE(NULLIF(b.o_custkey % 5, 0), 2) IGNORE NULLS
              |         OVER (ORDER BY b.o_orderkey
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |         AS second_nz,
              |       s.n_samp
              |FROM base b CROSS JOIN samp s
              |ORDER BY b.o_orderkey""".stripMargin))
        },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate
             |  FROM orders WHERE o_orderkey < 400)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
             |       lag(nullif(o_orderkey % 3, 0) ignore nulls)
             |         OVER (ORDER BY o_orderkey) AS prev_nz,
             |       nth_value(nullif(o_custkey % 5, 0), 2 ignore nulls)
             |         OVER (ORDER BY o_orderkey
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |         AS second_nz,
             |       CAST(7 AS BIGINT) AS n_samp
             |FROM base
             |ORDER BY o_orderkey""".stripMargin)),

    GQuery(
      "q_transpile_batch4",
      "Dialect batch 4 (BigQuery): the SAFE. function prefix " +
        "(NULL-on-error) normalizes to the SAFE_/try_* maps, " +
        "printf-style FORMAT becomes format_string, and " +
        "GENERATE_DATE_ARRAY (default and INTERVAL-stepped) becomes " +
        "date sequence() — verified against DuckDB printf and " +
        "generate_series.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT o_orderkey,
              |       SAFE.DIVIDE(CAST(o_orderkey AS FLOAT64), 0) AS div0,
              |       SAFE.DIVIDE(CAST(o_orderkey AS FLOAT64), 2.0) AS halfk,
              |       FORMAT('%d-%s', o_orderkey, o_orderstatus) AS tag,
              |       CAST(ARRAY_LENGTH(GENERATE_DATE_ARRAY(
              |         DATE '2024-01-01', DATE '2024-01-10')) AS INT64) AS ndays,
              |       CAST(ARRAY_LENGTH(GENERATE_DATE_ARRAY(
              |         DATE '2024-01-01', DATE '2024-03-01', INTERVAL 1 WEEK)) AS INT64) AS nweeks
              |FROM orders
              |WHERE o_orderkey < 200
              |ORDER BY o_orderkey""".stripMargin))
        },
      Some("""SELECT o_orderkey,
             |       CAST(NULL AS DOUBLE) AS div0,
             |       CAST(o_orderkey AS DOUBLE) / 2.0 AS halfk,
             |       printf('%d-%s', o_orderkey, o_orderstatus) AS tag,
             |       CAST(len(generate_series(DATE '2024-01-01',
             |         DATE '2024-01-10', INTERVAL 1 DAY)) AS BIGINT) AS ndays,
             |       CAST(len(generate_series(DATE '2024-01-01',
             |         DATE '2024-03-01', INTERVAL 7 DAY)) AS BIGINT) AS nweeks
             |FROM orders
             |WHERE o_orderkey < 200
             |ORDER BY o_orderkey""".stripMargin)),

    GQuery(
      "q_transpile_batch5",
      "Dialect batch 5 (BigQuery): LOG's value-first argument order " +
        "maps to an ln-division (Spark's log is base-first — a " +
        "pass-through computes the wrong logarithm), array access via " +
        "OFFSET (0-based) / ORDINAL (1-based) / SAFE_OFFSET past the " +
        "end, and case-insensitive CONTAINS_SUBSTR — all over the " +
        "genuinely nested nation_arrays fixture.",
      (s, dir) =>
        withNested(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT n_regionkey,
              |       names[OFFSET(0)] AS first_name,
              |       names[ORDINAL(2)] AS second_name,
              |       names[SAFE_OFFSET(999)] AS beyond,
              |       LOG(CAST(ARRAY_LENGTH(names) AS FLOAT64), 2) AS log2_n,
              |       CONTAINS_SUBSTR(names[OFFSET(0)], 'NATION_') AS has_tag
              |FROM nation_arrays
              |ORDER BY n_regionkey""".stripMargin))
        },
      Some("""WITH nation_arrays AS (
             |  SELECT n_regionkey, list(n_name ORDER BY n_name) AS names
             |  FROM nation GROUP BY n_regionkey)
             |SELECT n_regionkey,
             |       names[1] AS first_name,
             |       names[2] AS second_name,
             |       names[1000] AS beyond,
             |       ln(CAST(len(names) AS DOUBLE)) / ln(2) AS log2_n,
             |       (instr(lower(names[1]), lower('NATION_')) > 0) AS has_tag
             |FROM nation_arrays
             |ORDER BY n_regionkey""".stripMargin)),

    GQuery(
      "q_transpile_pivot",
      "Snowflake-style PIVOT is native Spark syntax (same aggregate-" +
        "FOR-IN shape, aliases pinning the output column names) — a " +
        "deliberate passthrough, executed end-to-end and mirrored by " +
        "DuckDB conditional aggregation.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT * FROM (SELECT n_regionkey AS rk, n_nationkey FROM nation)
              |PIVOT (COUNT(n_nationkey)
              |       FOR rk IN (0 AS r0, 1 AS r1, 2 AS r2, 3 AS r3, 4 AS r4))""".stripMargin))
        },
      Some("""SELECT COUNT(CASE WHEN n_regionkey = 0 THEN 1 END) AS r0,
             |       COUNT(CASE WHEN n_regionkey = 1 THEN 1 END) AS r1,
             |       COUNT(CASE WHEN n_regionkey = 2 THEN 1 END) AS r2,
             |       COUNT(CASE WHEN n_regionkey = 3 THEN 1 END) AS r3,
             |       COUNT(CASE WHEN n_regionkey = 4 THEN 1 END) AS r4
             |FROM nation""".stripMargin)),

    GQuery(
      "q_transpile_unpivot",
      "Snowflake-style UNPIVOT is native Spark 4 syntax (val FOR key " +
        "IN (cols)) — a deliberate passthrough, executed over an " +
        "aggregate-derived wide row and mirrored by a DuckDB UNION.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT key, val FROM (
              |  SELECT CAST(MIN(n_nationkey) AS BIGINT) AS c_min,
              |         CAST(MAX(n_nationkey) AS BIGINT) AS c_max
              |  FROM nation)
              |UNPIVOT (val FOR key IN (c_min, c_max))
              |ORDER BY key""".stripMargin))
        },
      Some("""SELECT 'c_min' AS key, CAST(MIN(n_nationkey) AS BIGINT) AS val
             |FROM nation
             |UNION ALL
             |SELECT 'c_max', CAST(MAX(n_nationkey) AS BIGINT) FROM nation
             |ORDER BY key""".stripMargin)),

    GQuery(
      "q_transpile_batch6",
      "Dialect batch 6 (Snowflake): SPLIT_TO_TABLE rides the FLATTEN " +
        "machinery into LATERAL VIEW POSEXPLODE(SPLIT(...)) — here " +
        "with a regex-metachar '.' delimiter exercising the literal-" +
        "escape pass — and REGEXP_SUBSTR_ALL becomes " +
        "regexp_extract_all group 0; DuckDB mirrors with " +
        "unnest(string_split) and regexp_extract_all.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT n.n_nationkey AS k, s.value AS part,
              |       ARRAY_TO_STRING(REGEXP_SUBSTR_ALL(n.n_name, '[AEIOU]'), '') AS vowels
              |FROM nation n, LATERAL SPLIT_TO_TABLE(n.n_name || '.' || TO_VARCHAR(n.n_regionkey), '.') s
              |ORDER BY k, part""".stripMargin))
        },
      Some("""SELECT n_nationkey AS k,
             |       unnest(string_split(n_name || '.' || CAST(n_regionkey AS VARCHAR), '.')) AS part,
             |       array_to_string(regexp_extract_all(n_name, '[AEIOU]'), '') AS vowels
             |FROM nation
             |ORDER BY k, part""".stripMargin)),

    GQuery(
      "q_transpile_json_array",
      "Dialect batch 6 (BigQuery): JSON_EXTRACT_ARRAY / " +
        "JSON_QUERY_ARRAY over a JSON-text column — elements come " +
        "back as JSON text (strings keep their quotes), a non-array " +
        "path nulls out like BigQuery — consumed through the batch-5 " +
        "OFFSET access and ARRAY_LENGTH; DuckDB mirrors with " +
        "json_array_length / json_extract.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(
            """SELECT n_nationkey AS k,
              |       to_json(named_struct(
              |         'tags', array(n_name, CAST(n_regionkey AS STRING)),
              |         'n', n_nationkey)) AS j
              |FROM nation""".stripMargin)
            .createOrReplaceTempView("jdocs")
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT k,
              |       CAST(ARRAY_LENGTH(JSON_EXTRACT_ARRAY(j, '$.tags')) AS INT64) AS ntags,
              |       JSON_QUERY_ARRAY(j, '$.tags')[OFFSET(0)] AS first_tag,
              |       JSON_EXTRACT_ARRAY(j, '$.n') IS NULL AS scalar_nulls
              |FROM jdocs
              |ORDER BY k""".stripMargin))
        },
      Some("""WITH jdocs AS (
             |  SELECT n_nationkey AS k,
             |         to_json(struct_pack(
             |           tags := [n_name, CAST(n_regionkey AS VARCHAR)],
             |           n := n_nationkey)) AS j
             |  FROM nation)
             |SELECT k,
             |       CAST(json_array_length(j, '$.tags') AS BIGINT) AS ntags,
             |       CAST(json_extract(j, '$.tags[0]') AS VARCHAR) AS first_tag,
             |       json_extract(j, '$.n[0]') IS NULL AS scalar_nulls
             |FROM jdocs
             |ORDER BY k""".stripMargin)),

    GQuery(
      "q_transpile_batch7",
      "Dialect batch 7 (Snowflake): TO_TIMESTAMP_NTZ/LTZ/TZ collapse " +
        "onto TO_TIMESTAMP (UTC session — the flavors coincide), " +
        "TRY_ forms null bad inputs, and STRTOK tokenizes on every " +
        "delimiter CHARACTER skipping empty tokens (non-delimiter-run " +
        "extraction, NULL past the last token) — mirrored by DuckDB " +
        "CAST/TRY_CAST/strptime and regexp_extract_all indexing.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT o_orderkey AS k,
              |       TO_TIMESTAMP_NTZ(TO_VARCHAR(o_orderdate, 'YYYY-MM-DD') || ' 07:30:00') AS ts1,
              |       TRY_TO_TIMESTAMP_NTZ('2024-13-99 00:00:00') AS bad_ts,
              |       TO_TIMESTAMP_LTZ('15/03/2024 07:30:00', 'DD/MM/YYYY HH24:MI:SS') AS ts2,
              |       STRTOK(o_orderpriority, '-') AS tok1,
              |       STRTOK(o_orderpriority, '-', 2) AS tok2,
              |       STRTOK('a,,b;;c', ',;', 2) AS tok3,
              |       STRTOK(o_orderpriority, '-', 9) AS tok_oob
              |FROM orders
              |WHERE o_orderkey < 100
              |ORDER BY k""".stripMargin))
        },
      Some("""SELECT o_orderkey AS k,
             |       CAST(strftime(o_orderdate, '%Y-%m-%d') || ' 07:30:00' AS TIMESTAMP) AS ts1,
             |       TRY_CAST('2024-13-99 00:00:00' AS TIMESTAMP) AS bad_ts,
             |       strptime('15/03/2024 07:30:00', '%d/%m/%Y %H:%M:%S') AS ts2,
             |       regexp_extract_all(o_orderpriority, '[^-]+')[1] AS tok1,
             |       regexp_extract_all(o_orderpriority, '[^-]+')[2] AS tok2,
             |       regexp_extract_all('a,,b;;c', '[^,;]+')[2] AS tok3,
             |       regexp_extract_all(o_orderpriority, '[^-]+')[9] AS tok_oob
             |FROM orders
             |WHERE o_orderkey < 100
             |ORDER BY k""".stripMargin)),

    GQuery(
      "q_transpile_batch8",
      "Dialect batch 8 (Snowflake scalars): bit functions, " +
        "EDITDISTANCE (with the 3-arg CLAMP, not Spark's -1), SQUARE, " +
        "the ISO day/week/year family, 2-arg LAST_DAY parts, " +
        "positional REGEXP_COUNT, INSERT→overlay and RATIO_TO_REPORT " +
        "(integer numerator so the double division is bit-identical " +
        "across engines) — DuckDB mirrors with operators, " +
        "isodow/isoyear and interval arithmetic.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT o_orderkey AS k,
              |       BITAND(o_orderkey, 255) AS band,
              |       BITXOR(o_orderkey, 255) AS bxor,
              |       BITSHIFTLEFT(o_orderkey, 2) AS bshl,
              |       BITSHIFTRIGHT(o_orderkey, 1) AS bshr,
              |       EDITDISTANCE(o_orderpriority, '1-URGENT') AS ed,
              |       EDITDISTANCE(o_orderpriority, '1-URGENT', 3) AS ed3,
              |       SQUARE(o_custkey % 7 + 2) AS sq,
              |       DAYOFWEEKISO(o_orderdate) AS dwi,
              |       WEEKISO(o_orderdate) AS wi,
              |       YEAROFWEEKISO(o_orderdate) AS ywi,
              |       LAST_DAY(o_orderdate, 'year') AS ldy,
              |       LAST_DAY(o_orderdate, 'quarter') AS ldq,
              |       LAST_DAY(o_orderdate, 'week') AS ldw,
              |       REGEXP_COUNT(o_orderpriority, '[AEIOU]', 3) AS rc,
              |       INSERT(o_orderpriority, 3, 2, 'xx') AS ins,
              |       RATIO_TO_REPORT(o_orderkey % 100) OVER (PARTITION BY o_orderpriority) AS rtr
              |FROM orders
              |WHERE o_orderkey < 400
              |ORDER BY k""".stripMargin))
        },
      Some("""SELECT o_orderkey AS k,
             |       o_orderkey & 255 AS band,
             |       xor(o_orderkey, 255) AS bxor,
             |       o_orderkey << 2 AS bshl,
             |       o_orderkey >> 1 AS bshr,
             |       CAST(levenshtein(o_orderpriority, '1-URGENT') AS INT) AS ed,
             |       CAST(least(levenshtein(o_orderpriority, '1-URGENT'), 3) AS INT) AS ed3,
             |       power(o_custkey % 7 + 2, 2) AS sq,
             |       CAST(isodow(o_orderdate) AS INT) AS dwi,
             |       CAST(weekofyear(o_orderdate) AS INT) AS wi,
             |       CAST(isoyear(o_orderdate) AS INT) AS ywi,
             |       make_date(CAST(year(o_orderdate) AS INT), 12, 31) AS ldy,
             |       CAST(date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS ldq,
             |       CAST(o_orderdate + to_days(CAST(7 - isodow(o_orderdate) AS INT)) AS DATE) AS ldw,
             |       CAST(len(regexp_extract_all(substr(o_orderpriority, 3), '[AEIOU]')) AS INT) AS rc,
             |       substr(o_orderpriority, 1, 2) || 'xx' || substr(o_orderpriority, 5) AS ins,
             |       CAST(o_orderkey % 100 AS DOUBLE) / sum(o_orderkey % 100) OVER (PARTITION BY o_orderpriority) AS rtr
             |FROM orders
             |WHERE o_orderkey < 400
             |ORDER BY k""".stripMargin)),

    GQuery(
      "q_transpile_batch8_arr",
      "Dialect batch 8 (Snowflake arrays): element-first 0-based " +
        "NULL-on-absent ARRAY_POSITION (emitted as a <=> fold, so NULL " +
        "elements are findable and the output never re-matches the " +
        "arm) and SPLIT_TO_TABLE with a CONSUMED alias-qualified INDEX " +
        "— 1-based via the batch-8 shift. DuckDB mirrors with " +
        "nullif(list_position)-1 and a zip-unnest.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(
            """SELECT n_nationkey AS k,
              |       array(CAST(n_regionkey * 3 AS INT), 7, CAST(NULL AS INT)) AS arr,
              |       n_name AS nm
              |FROM nation""".stripMargin)
            .createOrReplaceTempView("adocs")
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT d.k AS k,
              |       ARRAY_POSITION(7, d.arr) AS p7,
              |       ARRAY_POSITION(CAST(d.k % 15 AS INT), d.arr) AS pk,
              |       s.index AS idx,
              |       s.value AS part
              |FROM adocs d, LATERAL SPLIT_TO_TABLE(d.nm, 'A') s
              |ORDER BY k, idx""".stripMargin))
        },
      Some("""WITH adocs AS (
             |  SELECT n_nationkey AS k,
             |         [CAST(n_regionkey * 3 AS INT), 7, CAST(NULL AS INT)] AS arr,
             |         n_name AS nm
             |  FROM nation),
             |ex AS (
             |  SELECT k, arr,
             |         unnest(string_split(nm, 'A')) AS part,
             |         unnest(range(1, len(string_split(nm, 'A')) + 1)) AS idx
             |  FROM adocs)
             |SELECT k,
             |       CAST(nullif(list_position(arr, 7), 0) - 1 AS INT) AS p7,
             |       CAST(nullif(list_position(arr, CAST(k % 15 AS INT)), 0) - 1 AS INT) AS pk,
             |       CAST(idx AS INT) AS idx,
             |       part
             |FROM ex
             |ORDER BY k, idx""".stripMargin)),

    GQuery(
      "q_transpile_batch8_bq",
      "Dialect batch 8 (BigQuery): STRPOS, TO_HEX over MD5/SHA256 " +
        "(BYTES digests collapse onto Spark's hex strings), " +
        "NULL-propagating LEAST/GREATEST (BigQuery nulls the result " +
        "when ANY argument is NULL — Spark's natives skip NULLs), " +
        "JSON_EXTRACT_STRING_ARRAY consumed through ARRAY_TO_STRING, " +
        "the civil DATE/DATETIME constructors, and the native " +
        "TIMESTAMP_MICROS/UNIX_MICROS pass-throughs.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(
            """SELECT n_nationkey AS k, n_name AS nm,
              |       to_json(named_struct(
              |         'tags', array(n_name, CAST(n_regionkey AS STRING)),
              |         'n', n_nationkey)) AS j,
              |       IF(n_nationkey % 2 = 0, CAST(NULL AS INT),
              |          CAST(n_regionkey AS INT)) AS maybe
              |FROM nation""".stripMargin)
            .createOrReplaceTempView("jdocs3")
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT k,
              |       STRPOS(nm, 'AR') AS sp,
              |       TO_HEX(MD5(nm)) AS h1,
              |       TO_HEX(SHA256(nm)) AS h2,
              |       LEAST(CAST(k AS INT64), maybe) AS l1,
              |       GREATEST(CAST(k AS INT64), maybe, 3) AS g1,
              |       ARRAY_TO_STRING(JSON_EXTRACT_STRING_ARRAY(j, '$.tags'), '|') AS tags,
              |       DATE(2024, 2, 29) AS cd,
              |       DATETIME(2024, 2, 29, 7, 30, 5) AS cdt,
              |       TIMESTAMP_MICROS(k * 1000000) AS tm,
              |       UNIX_MICROS(TIMESTAMP '2024-01-01 00:00:00') AS um
              |FROM jdocs3
              |ORDER BY k""".stripMargin))
        },
      Some("""WITH jdocs3 AS (
             |  SELECT n_nationkey AS k, n_name AS nm,
             |         to_json(struct_pack(
             |           tags := [n_name, CAST(n_regionkey AS VARCHAR)],
             |           n := n_nationkey)) AS j,
             |         CASE WHEN n_nationkey % 2 = 0 THEN NULL
             |              ELSE CAST(n_regionkey AS INT) END AS maybe
             |  FROM nation)
             |SELECT k,
             |       CAST(strpos(nm, 'AR') AS INT) AS sp,
             |       md5(nm) AS h1,
             |       sha256(nm) AS h2,
             |       CASE WHEN maybe IS NULL THEN NULL
             |            ELSE least(CAST(k AS BIGINT), maybe) END AS l1,
             |       CASE WHEN maybe IS NULL THEN NULL
             |            ELSE greatest(CAST(k AS BIGINT), maybe, 3) END AS g1,
             |       concat_ws('|', json_extract_string(j, '$.tags[0]'),
             |                 json_extract_string(j, '$.tags[1]')) AS tags,
             |       make_date(2024, 2, 29) AS cd,
             |       make_timestamp(2024, 2, 29, 7, 30, 5) AS cdt,
             |       make_timestamp(CAST(k AS BIGINT) * 1000000) AS tm,
             |       epoch_us(TIMESTAMP '2024-01-01 00:00:00') AS um
             |FROM jdocs3
             |ORDER BY k""".stripMargin)),

    GQuery(
      "q_transpile_batch9",
      "Dialect batch 9 (Snowflake): expr-first TRUNC date parts " +
        "(quoted and full-word bare units; abbreviations stay — they " +
        "could be numeric-scale columns) plus the natives-proven trio " +
        "MEDIAN / PERCENTILE_CONT WITHIN GROUP / POSITION — type-7 " +
        "continuous quantiles over integer inputs are binary-exact in " +
        "both engines, so the pass-through is verified, not assumed.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT o_orderpriority AS g,
              |       TRUNC(MIN(o_orderdate), 'month') AS tm,
              |       TRUNC(MIN(o_orderdate), year) AS ty,
              |       MEDIAN(o_orderkey % 1000) AS med,
              |       PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY o_orderkey % 1000) AS p25,
              |       POSITION('-', MIN(o_orderpriority)) AS pos
              |FROM orders
              |GROUP BY o_orderpriority
              |ORDER BY g""".stripMargin))
        },
      Some("""SELECT o_orderpriority AS g,
             |       CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS tm,
             |       CAST(date_trunc('year', MIN(o_orderdate)) AS TIMESTAMP) AS ty,
             |       median(o_orderkey % 1000) AS med,
             |       percentile_cont(0.25) WITHIN GROUP (ORDER BY o_orderkey % 1000) AS p25,
             |       CAST(position('-' IN MIN(o_orderpriority)) AS INT) AS pos
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY g""".stripMargin)),

    GQuery(
      "q_transpile_batch9_bq",
      "Dialect batch 9 (BigQuery): IEEE_DIVIDE — Infinity (positive " +
        "and negative numerators over a zero divisor) and NULL " +
        "propagation where Spark's `/` would yield NULL throughout; " +
        "the fixture avoids 0/0 so no NaN rides the oracle compare " +
        "(the NaN arm is pinned in TranspileBatch8ExecSpec).",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT n_nationkey AS k,
              |       IEEE_DIVIDE(n_nationkey + 1, MOD(n_nationkey, 3)) AS idiv,
              |       IEEE_DIVIDE(0 - (n_nationkey + 1), MOD(n_nationkey, 3)) AS ndiv,
              |       IEEE_DIVIDE(n_nationkey,
              |         IF(MOD(n_nationkey, 2) = 0, NULL, n_regionkey)) AS mdiv
              |FROM nation
              |ORDER BY k""".stripMargin))
        },
      Some("""SELECT n_nationkey AS k,
             |       CASE WHEN CAST(n_nationkey % 3 AS DOUBLE) = 0.0 THEN 'infinity'::DOUBLE
             |            ELSE CAST(n_nationkey + 1 AS DOUBLE) / CAST(n_nationkey % 3 AS DOUBLE) END AS idiv,
             |       CASE WHEN CAST(n_nationkey % 3 AS DOUBLE) = 0.0 THEN '-infinity'::DOUBLE
             |            ELSE CAST(0 - (n_nationkey + 1) AS DOUBLE) / CAST(n_nationkey % 3 AS DOUBLE) END AS ndiv,
             |       CASE WHEN n_nationkey % 2 = 0 THEN NULL
             |            WHEN CAST(n_regionkey AS DOUBLE) = 0.0 THEN
             |              CASE WHEN n_nationkey > 0 THEN 'infinity'::DOUBLE ELSE 'nan'::DOUBLE END
             |            ELSE CAST(n_nationkey AS DOUBLE) / CAST(n_regionkey AS DOUBLE) END AS mdiv
             |FROM nation
             |ORDER BY k""".stripMargin)),

    GQuery(
      "q_transpile_batch10",
      "Dialect batch 10 (Snowflake): ARRAY_INTERSECTION (left-operand " +
        "order; DuckDB mirrors with an order-preserving list_filter " +
        "rather than list_intersect, whose order is unspecified), " +
        "ARRAY_FLATTEN, and the REGEXP_REPLACE default-'' and " +
        "params/occurrence-0 forms (DuckDB needs explicit 'g' — its " +
        "default replaces only the FIRST match).",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(
            """SELECT n_nationkey AS k, n_name AS nm,
              |       array(n_name, 'X') AS a1,
              |       array('Y', n_name, 'X') AS a2,
              |       array(array(n_name), array('Z')) AS aa
              |FROM nation""".stripMargin)
            .createOrReplaceTempView("avals")
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT k,
              |       ARRAY_TO_STRING(ARRAY_INTERSECTION(a1, a2), '|') AS inter,
              |       ARRAY_TO_STRING(ARRAY_FLATTEN(aa), '|') AS flat,
              |       REGEXP_REPLACE(nm, '[AEIOU]') AS rr2,
              |       REGEXP_REPLACE(nm, '[aeiou]', '_', 1, 0, 'i') AS rr6
              |FROM avals
              |ORDER BY k""".stripMargin))
        },
      Some("""WITH avals AS (
             |  SELECT n_nationkey AS k, n_name AS nm,
             |         [n_name, 'X'] AS a1,
             |         ['Y', n_name, 'X'] AS a2,
             |         [[n_name], ['Z']] AS aa
             |  FROM nation)
             |SELECT k,
             |       array_to_string(list_filter(a1, x -> list_contains(a2, x)), '|') AS inter,
             |       array_to_string(flatten(aa), '|') AS flat,
             |       regexp_replace(nm, '[AEIOU]', '', 'g') AS rr2,
             |       regexp_replace(nm, '[aeiou]', '_', 'gi') AS rr6
             |FROM avals
             |ORDER BY k""".stripMargin)),

    GQuery(
      "q_transpile_batch10_bq",
      "Dialect batch 10 (BigQuery): JSON scalar accessors " +
        "INT64/FLOAT64 (strict) and the LAX_ family (numeric-string " +
        "coercion, NULL on mismatch) over JSON_QUERY output, plus " +
        "GENERATE_TIMESTAMP_ARRAY consumed through ARRAY_LENGTH — " +
        "DuckDB mirrors with json_extract casts and generate_series.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(
            """SELECT n_nationkey AS k,
              |       to_json(named_struct(
              |         'n', n_nationkey,
              |         's', CAST(n_regionkey AS STRING),
              |         'w', n_name)) AS j
              |FROM nation""".stripMargin)
            .createOrReplaceTempView("jvals")
          spark.sql(Transpiler.transpileBigQuery(
            """SELECT k,
              |       INT64(JSON_QUERY(j, '$.n')) AS n64,
              |       FLOAT64(JSON_QUERY(j, '$.n')) AS f64,
              |       LAX_INT64(JSON_QUERY(j, '$.s')) AS coerced,
              |       LAX_INT64(JSON_QUERY(j, '$.w')) AS misses,
              |       LAX_STRING(JSON_QUERY(j, '$.w')) AS w,
              |       CAST(ARRAY_LENGTH(GENERATE_TIMESTAMP_ARRAY(
              |         TIMESTAMP '2024-01-01 00:00:00',
              |         TIMESTAMP '2024-01-02 00:00:00',
              |         INTERVAL 6 HOUR)) AS INT64) AS nts
              |FROM jvals
              |ORDER BY k""".stripMargin))
        },
      Some("""WITH jvals AS (
             |  SELECT n_nationkey AS k,
             |         to_json(struct_pack(
             |           n := n_nationkey,
             |           s := CAST(n_regionkey AS VARCHAR),
             |           w := n_name)) AS j
             |  FROM nation)
             |SELECT k,
             |       CAST(json_extract(j, '$.n') AS BIGINT) AS n64,
             |       CAST(json_extract(j, '$.n') AS DOUBLE) AS f64,
             |       TRY_CAST(json_extract_string(j, '$.s') AS BIGINT) AS coerced,
             |       TRY_CAST(json_extract_string(j, '$.w') AS BIGINT) AS misses,
             |       json_extract_string(j, '$.w') AS w,
             |       CAST(len(generate_series(TIMESTAMP '2024-01-01 00:00:00',
             |         TIMESTAMP '2024-01-02 00:00:00',
             |         INTERVAL 6 HOUR)) AS BIGINT) AS nts
             |FROM jvals
             |ORDER BY k""".stripMargin)),

    GQuery(
      "q_transpile_batch11",
      "Dialect batch 11 (Snowflake/BigQuery shared): REGEXP_INSTR " +
        "composed as the newline-safe lazy-prefix length (literal " +
        "patterns; position form counts in the original subject), " +
        "REGEXP_LIKE with Snowflake's ENTIRE-subject anchoring (a " +
        "contains pass-through silently diverges on every " +
        "non-anchored pattern), and the native WIDTH_BUCKET " +
        "pass-through — DuckDB mirrors with regexp_matches/" +
        "regexp_full_match/regexp_extract and integer bucket " +
        "arithmetic.",
      (s, dir) =>
        QueryPack.withTables(s, dir) { spark =>
          spark.sql(Transpiler.transpileSnowflake(
            """SELECT o_orderkey AS k,
              |       REGEXP_INSTR(o_orderpriority, 'URGENT') AS ri,
              |       REGEXP_INSTR(o_orderpriority, '[AEIOU]', 3) AS ri3,
              |       REGEXP_LIKE(o_orderpriority, '.*urgent', 'i') AS rl,
              |       WIDTH_BUCKET(o_orderkey % 100, 0, 100, 10) AS wb
              |FROM orders
              |WHERE o_orderkey < 400
              |ORDER BY k""".stripMargin))
        },
      Some("""SELECT o_orderkey AS k,
             |       CAST(CASE WHEN regexp_matches(o_orderpriority, 'URGENT')
             |            THEN length(regexp_extract(o_orderpriority,
             |                 '^([\s\S]*?)(?:URGENT)', 1)) + 1
             |            ELSE 0 END AS INT) AS ri,
             |       CAST(CASE WHEN regexp_matches(substr(o_orderpriority, 3), '[AEIOU]')
             |            THEN 2 + length(regexp_extract(substr(o_orderpriority, 3),
             |                 '^([\s\S]*?)(?:[AEIOU])', 1)) + 1
             |            ELSE 0 END AS INT) AS ri3,
             |       regexp_full_match(o_orderpriority, '(?i).*urgent') AS rl,
             |       CAST(1 + ((o_orderkey % 100) * 10) // 100 AS BIGINT) AS wb
             |FROM orders
             |WHERE o_orderkey < 400
             |ORDER BY k""".stripMargin)))
}

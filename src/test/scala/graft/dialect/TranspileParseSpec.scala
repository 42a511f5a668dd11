package graft.dialect

import graft.SparkSpec

/** Every rewrite family's output must at least PARSE in Spark — the
  * executed oracle queries cover a dozen end-to-end shapes, but an
  * emitted-syntax slip in a less-traveled arm (a misplaced paren, a
  * keyword Spark's grammar rejects) would otherwise surface only in a
  * user's repair loop. Parsing is analysis-free, so unresolved columns
  * and tables are fine; a syntax error is not.
  */
class TranspileParseSpec extends SparkSpec {

  private def parses(sql: String): Unit = {
    val parsed = try {
      spark.sessionState.sqlParser.parsePlan(sql); true
    } catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        fail(s"emitted SQL does not parse: $sql\n${e.getMessage.take(300)}")
    }
    assert(parsed)
  }

  private val snowflake = Seq(
    "SELECT DATEADD(day, 3, d), DATEADD('month', -2, DATEADD(yy, 1, d)) FROM t",
    "SELECT DATEDIFF(week, a, b), DATEDIFF(hour, a, b) FROM t",
    "SELECT TIMESTAMPDIFF(month, a, b), TIMESTAMPADD(day, 1, d) FROM t",
    "SELECT TO_CHAR(d, 'YYYY-MM-DD HH24:MI:SS'), TO_DATE(s, 'DD/MM/YYYY') FROM t",
    "SELECT TO_NUMBER(s, 10, 2), TRY_TO_NUMBER(s), ZEROIFNULL(x), NULLIFZERO(y) FROM t",
    "SELECT x::NUMBER(10,2), y::VARIANT, z::TIMESTAMP_NTZ FROM t WHERE c ILIKE ANY ('%a%', '%b%')",
    "SELECT f.value:name::VARCHAR, f.index FROM t, LATERAL FLATTEN(input => t.arr) f",
    "SELECT value FROM t, TABLE(FLATTEN(input => arr)) WHERE value IS NOT NULL",
    "SELECT LISTAGG(x, ', ') WITHIN GROUP (ORDER BY x), NVL(a, b), NVL2(a, b, c) FROM t GROUP BY g",
    "SELECT DECODE(a, 1, 'x', 2, 'y', 'z'), SPLIT_PART(s, '-', 2) FROM t",
    "SELECT REGEXP_SUBSTR(s, '(a)(b)', 1, 1, 'ie', 2), REGEXP_SUBSTR(s, 'p', 2) FROM t",
    "SELECT ARRAY_AGG(v) WITHIN GROUP (ORDER BY k DESC) FROM t GROUP BY g",
    "SELECT DATE_PART(epoch_second, d) FROM t", // unknown unit: passes through, parses as call
    "SELECT MONTHNAME(d), DAYNAME(d), ARRAY_CONTAINS(x, arr) FROM t",
    "SELECT SPLIT(s, '.')[0], SPLIT(s, ',') FROM t",
    "SELECT CHARINDEX(LOWER(a), CONCAT(b, c), 3) FROM t",
    "SELECT o_custkey FROM orders QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) <= 2 ORDER BY o_custkey LIMIT 5",
    "SELECT PARSE_JSON(j):a.b::INT, TRY_PARSE_JSON(j):tags[0]::VARCHAR FROM t",
    "SELECT GET_PATH(PARSE_JSON(j), 'a.b[1]'), JSON_EXTRACT_PATH_TEXT(j, 'name') FROM t",
    "SELECT TO_JSON(OBJECT_AGG(k, v)) FROM t GROUP BY g",
    "SELECT PARSE_JSON(j):x:y, v:a.b FROM t",
    "SELECT * FROM t SAMPLE (7 ROWS)",
    "SELECT * EXCLUDE (a, b) FROM t",
    "SELECT LAG(x) IGNORE NULLS OVER (ORDER BY k), NTH_VALUE(x, 2) IGNORE NULLS OVER (ORDER BY k) FROM t",
    "SELECT * FROM (SELECT k, v FROM t) PIVOT (SUM(v) FOR k IN ('a' AS a, 'b' AS b))",
    "SELECT * FROM t UNPIVOT (val FOR key IN (c1, c2))")

  private val bigquery = Seq(
    "SELECT DATE_DIFF(b, a, WEEK), DATE_TRUNC(d, WEEK), TIMESTAMP_TRUNC(ts, WEEK) FROM t",
    "SELECT TIMESTAMP_ADD(ts, INTERVAL 90 MINUTE), DATETIME_SUB(dt, INTERVAL 2 QUARTER) FROM t",
    "SELECT FORMAT_TIMESTAMP('%Y-%m-%d %H:%M:%S', ts), PARSE_TIMESTAMP('%Y%m%d', s) FROM t",
    "SELECT SAFE_DIVIDE(a, b), SAFE_CAST(x AS BIGNUMERIC), COUNTIF(x > 0) FROM t",
    "SELECT x, o FROM t, UNNEST(arr) AS x WITH OFFSET AS o WHERE x IN UNNEST(other)",
    "SELECT x FROM t LEFT JOIN UNNEST(t.arr) AS x ON TRUE",
    "SELECT REGEXP_EXTRACT(s, '([a-z]+)@'), REGEXP_EXTRACT_ALL(s, '[0-9]+') FROM t",
    "SELECT STRING_AGG(x, ';' ORDER BY k), ARRAY_AGG(v ORDER BY k) FROM t GROUP BY g",
    "SELECT UNIX_DATE(d), DATE_FROM_UNIX_DATE(n), DIV(a, b), SPLIT(s, '|') FROM `p.d.t`",
    "SELECT ARRAY_LENGTH(REGEXP_EXTRACT_ALL(s, 'x+')) FROM t WHERE REGEXP_CONTAINS(s, 'a|b')",
    "SELECT JSON_VALUE(j, '$.name'), JSON_EXTRACT_SCALAR(j, '$.a') FROM t",
    "SELECT JSON_EXTRACT(j, '$.a'), JSON_QUERY(j, '$.t') FROM t",
    "SELECT TO_JSON_STRING(STRUCT(a AS k, b AS v)) FROM t",
    "SELECT SAFE.DIVIDE(a, b), FORMAT('%d', a) FROM t",
    "SELECT GENERATE_DATE_ARRAY(DATE '2024-01-01', d, INTERVAL 2 MONTH) FROM t",
    "SELECT LOG(x, 2), arr[OFFSET(0)], arr[ORDINAL(2)], arr[SAFE_OFFSET(9)] FROM t",
    "SELECT CONTAINS_SUBSTR(name, 'abc') FROM t")

  private val shared = Seq(
    "SELECT strftime('%Y-%m', d), IIF(a > 1, 'x', 'y'), LEN(s) FROM t",
    "SELECT GROUP_CONCAT(name, ';'), CAST(x AS TEXT), CAST(y AS NUMERIC) FROM t GROUP BY g",
    "SELECT DATE('now', '-7 day'), julianday(a) - julianday(b) FROM t",
    "SELECT CHARINDEX('x', s), ISNULL(a, b) FROM t")

  test("snowflake arm output parses") {
    snowflake.foreach(q => parses(Transpiler.transpileSnowflake(q)))
  }
  test("bigquery arm output parses") {
    bigquery.foreach(q => parses(Transpiler.transpileBigQuery(q)))
  }
  test("shared arm output parses") {
    shared.foreach(q => parses(Transpiler.transpile(q)))
  }
  test("sqlite arm output parses") {
    Seq(
      """SELECT "name", COUNT(*) FROM "orders" WHERE city = "NY" GROUP BY "name"""",
      "SELECT a FROM t WHERE name LIKE '%x%' AND LENGTH(name) > 3")
      .foreach(q => parses(Transpiler.transpileSqlite(q)))
  }
}

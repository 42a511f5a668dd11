package graft.dialect

import org.scalatest.funsuite.AnyFunSuite

class TranspilerSpec extends AnyFunSuite {
  import Transpiler.transpile

  test("GETDATE → current_timestamp") {
    assert(transpile("SELECT GETDATE()") == "SELECT current_timestamp()")
  }

  test("IIF → IF, word-bounded, literal-safe") {
    assert(transpile("SELECT IIF(a>1, 'x', 'y') FROM t") == "SELECT IF(a>1, 'x', 'y') FROM t")
    assert(transpile("SELECT 'IIF(a)' FROM t") == "SELECT 'IIF(a)' FROM t")
    assert(transpile("SELECT miif_col FROM t") == "SELECT miif_col FROM t")
  }

  test("strftime → date_format") {
    assert(transpile("SELECT strftime('%Y', o_orderdate) FROM orders") ==
      "SELECT date_format(o_orderdate, 'yyyy') FROM orders")
    assert(transpile("SELECT STRFTIME('%Y-%m', d) FROM t") ==
      "SELECT date_format(d, 'yyyy-MM') FROM t")
  }

  test("GROUP_CONCAT → array_join(collect_list)") {
    assert(transpile("SELECT GROUP_CONCAT(name) FROM t GROUP BY k") ==
      "SELECT array_join(collect_list(name), ',') FROM t GROUP BY k")
    assert(transpile("SELECT group_concat(name, ';') FROM t") ==
      "SELECT array_join(collect_list(name), ';') FROM t")
  }

  test("QUALIFY → subquery filter") {
    val in = "SELECT o_custkey, o_totalprice FROM orders " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) <= 2 " +
      "ORDER BY o_custkey LIMIT 10"
    val out = transpile(in)
    assert(out.contains("AS __qualify__"))
    assert(out.contains("WHERE __qualify__"))
    assert(out.startsWith("SELECT * EXCEPT (__qualify__) FROM (SELECT o_custkey, o_totalprice,"))
    assert(out.endsWith("ORDER BY o_custkey LIMIT 10"))
  }

  test("type names: TEXT/REAL/INTEGER") {
    assert(transpile("SELECT CAST(x AS TEXT), CAST(y AS REAL), CAST(z AS INTEGER) FROM t") ==
      "SELECT CAST(x AS STRING), CAST(y AS DOUBLE), CAST(z AS INT) FROM t")
  }

  test("passthrough + idempotence") {
    val q = "SELECT a, b FROM t WHERE c LIKE '%x%' GROUP BY a, b HAVING COUNT(*) > 1"
    assert(transpile(q) == q)
    val weird = "SELECT IIF(a, 'GETDATE()', b) FROM t -- IIF comment"
    assert(transpile(transpile(weird)) == transpile(weird))
  }

  test("keywords inside strings and comments untouched") {
    assert(transpile("SELECT 'QUALIFY x' FROM t") == "SELECT 'QUALIFY x' FROM t")
    val c = "SELECT a FROM t -- QUALIFY nothing"
    assert(transpile(c) == c)
  }

  test("sqlite date idioms: DATE('now') family and julianday") {
    assert(transpile("SELECT DATE('now')") == "SELECT current_date()")
    assert(transpile("SELECT DATETIME('now')") == "SELECT current_timestamp()")
    assert(transpile("SELECT DATE('now', '-1 year')") == "SELECT add_months(current_date(), -12)")
    assert(transpile("SELECT DATE('now', '+3 months')") == "SELECT add_months(current_date(), 3)")
    assert(transpile("SELECT DATE('now', '-7 day')") == "SELECT date_add(current_date(), -7)")
    val jd = transpile("SELECT julianday(o_orderdate) - julianday(l_shipdate) FROM t")
    assert(jd.contains("datediff(o_orderdate, DATE'1970-01-01'"))
    assert(jd.contains("+ 2440587.5"))
  }

  test("NUMERIC cast and INSTR argument order pass through correctly") {
    assert(transpile("SELECT CAST(x AS NUMERIC) FROM t") == "SELECT CAST(x AS DOUBLE) FROM t")
    // sqlite INSTR(haystack, needle) matches Spark instr(str, substr) - no rewrite
    assert(transpile("SELECT INSTR(name, 'a') FROM t") == "SELECT INSTR(name, 'a') FROM t")
    // T-SQL CHARINDEX(needle, haystack) must SWAP arguments for Spark instr
    assert(transpile("SELECT CHARINDEX('a', name) FROM t") == "SELECT INSTR(name, 'a') FROM t")
  }

  test("sqlite bare non-grouped SELECT columns wrap in any_value") {
    import Transpiler.transpileSqlite
    // the two DIN-SQL medium prompt statements that were parse-only
    // (core/actor/generator/DINSQLGenerate.py:329,357): SQLite's bare
    // column under GROUP BY — arbitrary-row pick, here functionally
    // determined by the group key
    assert(transpileSqlite(
      "SELECT T1.title FROM course AS T1 JOIN prereq AS T2 ON " +
        "T1.course_id  =  T2.course_id GROUP BY T2.course_id HAVING count(*)  =  2") ==
      "SELECT any_value(T1.title) AS title FROM course AS T1 JOIN prereq AS T2 ON " +
        "T1.course_id  =  T2.course_id GROUP BY T2.course_id HAVING count(*)  =  2")
    assert(transpileSqlite(
      "SELECT T1.title ,  T1.credits , T1.dept_name FROM course AS T1 JOIN " +
        "prereq AS T2 ON T1.course_id = T2.course_id GROUP BY T2.course_id HAVING count(*) > 1") ==
      "SELECT any_value(T1.title) AS title ,  any_value(T1.credits) AS credits , " +
        "any_value(T1.dept_name) AS dept_name FROM course AS T1 JOIN " +
        "prereq AS T2 ON T1.course_id = T2.course_id GROUP BY T2.course_id HAVING count(*) > 1")
    // grouped columns (full text or last-segment match) stay bare
    assert(transpileSqlite(
      "SELECT dept_name FROM course GROUP BY dept_name ORDER BY count(*) DESC") ==
      "SELECT dept_name FROM course GROUP BY dept_name ORDER BY count(*) DESC")
    assert(transpileSqlite(
      "SELECT T3.dept_name FROM instructor AS T3 GROUP BY T3.dept_name") ==
      "SELECT T3.dept_name FROM instructor AS T3 GROUP BY T3.dept_name")
    // unqualified select vs qualified group key resolves by last segment
    assert(transpileSqlite(
      "SELECT dept_name, count(*) FROM instructor AS T3 GROUP BY T3.dept_name") ==
      "SELECT dept_name, count(*) FROM instructor AS T3 GROUP BY T3.dept_name")
    // backticked segments (MACSQLGenerate.py:378 shape)
    assert(transpileSqlite(
      "SELECT T1.`Name`, COUNT(*) FROM stadium AS T1 JOIN concert AS T2 ON " +
        "T1.`Stadium_ID` = T2.`Stadium_ID` GROUP BY T1.`Stadium_ID`") ==
      "SELECT any_value(T1.`Name`) AS `Name`, COUNT(*) FROM stadium AS T1 JOIN concert AS T2 ON " +
        "T1.`Stadium_ID` = T2.`Stadium_ID` GROUP BY T1.`Stadium_ID`")
    // ordinal group keys mark that select position as grouped
    assert(transpileSqlite("SELECT name, count(*) FROM t GROUP BY 1") ==
      "SELECT name, count(*) FROM t GROUP BY 1")
    // expressions / subqueries / * are never wrapped; a statement
    // without GROUP BY is untouched; inner blocks rewrite independently
    assert(transpileSqlite("SELECT a + b, k FROM t GROUP BY k") ==
      "SELECT a + b, k FROM t GROUP BY k")
    assert(transpileSqlite("SELECT name FROM student") == "SELECT name FROM student")
    assert(transpileSqlite(
      "SELECT x FROM (SELECT T1.name AS x FROM a T1 JOIN b T2 ON T1.id = T2.id GROUP BY T2.k) q") ==
      "SELECT x FROM (SELECT any_value(T1.name) AS x FROM a T1 JOIN b T2 ON T1.id = T2.id GROUP BY T2.k) q")
    // GROUP BY <alias> (valid SQLite AND Spark groupByAliases): the
    // aliased item is grouped, never wrapped
    assert(transpileSqlite(
      "SELECT dept_name AS d, count(*) FROM instructor GROUP BY d") ==
      "SELECT dept_name AS d, count(*) FROM instructor GROUP BY d")
    // a FROM-less set-op arm must not adopt the NEXT arm's FROM/GROUP
    // BY (was: double-wrapped spans -> StringIndexOutOfBounds); the
    // second arm's bare `b` wraps once, the first arm stays literal
    assert(transpileSqlite("SELECT 5 UNION SELECT b, k FROM t GROUP BY k") ==
      "SELECT 5 UNION SELECT any_value(b) AS b, k FROM t GROUP BY k")
    assert(transpileSqlite(
      "SELECT 5 UNION SELECT T1.b, k FROM t T1 JOIN u T2 ON T1.x = T2.x GROUP BY T2.k") ==
      "SELECT 5 UNION SELECT any_value(T1.b) AS b, k FROM t T1 JOIN u T2 ON T1.x = T2.x GROUP BY T2.k")
    // ORDER BY on a bare non-grouped column (SQLite sorts by an
    // arbitrary row of the group — the OpenSearch style-aligner prompt
    // shape, OpenSearchSQLGenerate.py:130) wraps too; suffixes survive
    assert(transpileSqlite(
      "SELECT Name FROM Author WHERE Affiliation = 'University of Oxford' " +
        "Group By Name ORDER BY spent ASC") ==
      "SELECT Name FROM Author WHERE Affiliation = 'University of Oxford' " +
        "Group By Name ORDER BY any_value(spent) ASC")
    // ...but group keys, select OUTPUT names, ordinals and expressions
    // in ORDER BY stay bare
    assert(transpileSqlite(
      "SELECT dept_name AS d FROM instructor GROUP BY dept_name ORDER BY d DESC") ==
      "SELECT dept_name AS d FROM instructor GROUP BY dept_name ORDER BY d DESC")
    assert(transpileSqlite(
      "SELECT name, count(*) FROM t GROUP BY name ORDER BY 2 DESC, name") ==
      "SELECT name, count(*) FROM t GROUP BY name ORDER BY 2 DESC, name")
    // idempotent: the wrapped form contains '(' and never re-matches
    val once = transpileSqlite(
      "SELECT T1.title FROM course AS T1 JOIN prereq AS T2 ON " +
        "T1.course_id = T2.course_id GROUP BY T2.course_id")
    assert(transpileSqlite(once) == once)
  }

  test("sqlite-strict mode maps case-insensitive LIKE to ILIKE") {
    import Transpiler.transpileSqlite
    assert(transpileSqlite("SELECT a FROM t WHERE name LIKE '%x%'") ==
      "SELECT a FROM t WHERE name ILIKE '%x%'")
    assert(transpileSqlite("SELECT a FROM t WHERE name NOT LIKE 'y%'") ==
      "SELECT a FROM t WHERE name NOT ILIKE 'y%'")
    // an already-ILIKE token and string literals stay untouched
    assert(transpileSqlite("SELECT a FROM t WHERE name ILIKE 'z'") ==
      "SELECT a FROM t WHERE name ILIKE 'z'")
    assert(transpileSqlite("SELECT 'LIKE' FROM t") == "SELECT 'LIKE' FROM t")
    // and the sqlite semantics actually differ: ILIKE matches across case
    val spark = graft.core.GraftSession.build("graft-test", cores = 4)
    graft.catalog.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val ci = spark.sql(transpileSqlite(
      "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%RED%'")).head().getLong(0)
    val cs = spark.sql(
      "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%RED%'").head().getLong(0)
    assert(ci >= cs, "ILIKE must match at least the case-sensitive rows")
  }

  test("double-quoted fallback: known identifiers stay, unknowns become literals") {
    import Transpiler.transpileSqlite
    // exact sqlite rule with a catalog: resolve → identifier, else literal
    assert(transpileSqlite("""SELECT "name" FROM t WHERE city = "New York"""",
      identifiers = Set("name", "t", "city")) ==
      "SELECT `name` FROM t WHERE city = 'New York'")
    // embedded single quote escapes as ''
    assert(transpileSqlite("""SELECT a FROM t WHERE x = "O'Brien"""",
      identifiers = Set("t", "a", "x")) ==
      "SELECT a FROM t WHERE x = 'O''Brien'")
    // no catalog: dot-qualified and FROM/JOIN/AS positions are structural
    // identifiers, value positions fall back to literals
    assert(transpileSqlite("""SELECT o."col a" FROM "orders" o WHERE o.x = "F"""") ==
      "SELECT o.`col a` FROM `orders` o WHERE o.x = 'F'")
    // the literal-ized token is then opaque to later keyword rewrites
    assert(transpileSqlite("""SELECT a FROM t WHERE x = "LIKE"""", Set("t", "a", "x")) ==
      "SELECT a FROM t WHERE x = 'LIKE'")
  }

  test("transpileSnowflake: DATEADD/DATEDIFF unit-first forms, nested calls") {
    import Transpiler.transpileSnowflake
    // day-grain uses timestampadd — Snowflake DATEADD preserves a
    // timestamp input's time-of-day, which date_add would truncate
    assert(transpileSnowflake("SELECT DATEADD(day, 3, o_orderdate) FROM orders") ==
      "SELECT timestampadd(DAY, (3), o_orderdate) FROM orders")
    // month-grain uses + make_ym_interval: fully type-preserving (DATE
    // stays DATE, TIMESTAMP keeps its clock), clamps like add_months;
    // nested same-name calls resolve depth-first; quoted + abbreviated units
    assert(transpileSnowflake("SELECT DATEADD('month', -2, DATEADD(yy, 1, d)) FROM t") ==
      "SELECT ((d + make_ym_interval(CAST((1) AS INT), 0)) + make_ym_interval(0, CAST((-2) AS INT))) FROM t")
    // Snowflake's (start, end) order maps to Spark's datediff(end, start)
    assert(transpileSnowflake("SELECT DATEDIFF(dd, a, b) FROM t") ==
      "SELECT datediff(b, a) FROM t")
    // month diff counts BOUNDARIES, not elapsed whole months
    assert(transpileSnowflake("SELECT DATEDIFF(month, a, b) FROM t") ==
      "SELECT ((year(b) - year(a)) * 12 + (month(b) - month(a))) FROM t")
    // sub-day units keep boundary semantics via date_trunc
    assert(transpileSnowflake("SELECT DATEDIFF(hour, a, b) FROM t") ==
      "SELECT timestampdiff(HOUR, date_trunc('HOUR', a), date_trunc('HOUR', b)) FROM t")
    // an unknown unit passes through untouched for the repair loop
    assert(transpileSnowflake("SELECT DATEDIFF(parsec, a, b) FROM t") ==
      "SELECT DATEDIFF(parsec, a, b) FROM t")
  }

  test("transpileSnowflake: TO_CHAR/TO_DATE formats, :: casts, IFF, ILIKE ANY") {
    import Transpiler.transpileSnowflake
    assert(transpileSnowflake("SELECT TO_CHAR(o_orderdate, 'YYYY-MM') FROM orders") ==
      "SELECT date_format(o_orderdate, 'yyyy-MM') FROM orders")
    assert(transpileSnowflake("SELECT TO_CHAR(n) FROM t") ==
      "SELECT CAST(n AS STRING) FROM t")
    assert(transpileSnowflake("SELECT TO_DATE(s, 'DD/MM/YYYY') FROM t") ==
      "SELECT to_date(s, 'dd/MM/yyyy') FROM t")
    assert(transpileSnowflake("SELECT x::NUMBER, y::NUMBER(10,2), z::VARCHAR FROM t") ==
      "SELECT x::DECIMAL(38,0), y::DECIMAL(10,2), z::STRING FROM t")
    assert(transpileSnowflake("SELECT IFF(a > 1, 'x', 'y') FROM t") ==
      "SELECT IF(a > 1, 'x', 'y') FROM t")
    assert(transpileSnowflake("SELECT * FROM t WHERE c ILIKE ANY ('%a%', '%b%')") ==
      "SELECT * FROM t WHERE (c ILIKE '%a%' OR c ILIKE '%b%')")
    assert(transpileSnowflake("SELECT * FROM t WHERE c NOT ILIKE ANY ('%a%')") ==
      "SELECT * FROM t WHERE NOT (c ILIKE '%a%')")
  }

  test("transpileBigQuery: DATE_DIFF/DATE_ADD arg order, SAFE_*, formats, types") {
    import Transpiler.transpileBigQuery
    // BigQuery's (end, start, unit) — unit LAST
    assert(transpileBigQuery("SELECT DATE_DIFF(b, a, DAY) FROM t") ==
      "SELECT datediff(b, a) FROM t")
    assert(transpileBigQuery("SELECT DATE_DIFF(b, a, MONTH) FROM t") ==
      "SELECT ((year(b) - year(a)) * 12 + (month(b) - month(a))) FROM t")
    assert(transpileBigQuery("SELECT DATE_ADD(d, INTERVAL 3 DAY) FROM t") ==
      "SELECT date_add(d, ((3))) FROM t")
    assert(transpileBigQuery("SELECT DATE_SUB(d, INTERVAL 1 MONTH) FROM t") ==
      "SELECT add_months(d, (-(1))) FROM t")
    // TIMESTAMP_/DATETIME_ arms preserve the time-of-day (BigQuery's
    // inputs are timestamps by definition; date_add would truncate)
    assert(transpileBigQuery("SELECT TIMESTAMP_ADD(ts, INTERVAL 90 MINUTE) FROM t") ==
      "SELECT timestampadd(MINUTE, ((90)), ts) FROM t")
    assert(transpileBigQuery("SELECT DATETIME_ADD(dt, INTERVAL 1 MONTH) FROM t") ==
      "SELECT (dt + make_ym_interval(0, CAST(((1)) AS INT))) FROM t")
    assert(transpileBigQuery("SELECT TIMESTAMP_SUB(ts, INTERVAL 2 DAY) FROM t") ==
      "SELECT timestampadd(DAY, (-(2)), ts) FROM t")
    // Spark's own 2-arg date_add(date, days) passes through untouched
    assert(transpileBigQuery("SELECT DATE_ADD(d, 3) FROM t") ==
      "SELECT DATE_ADD(d, 3) FROM t")
    assert(transpileBigQuery("SELECT SAFE_DIVIDE(a, b) FROM t") ==
      "SELECT TRY_DIVIDE(a, b) FROM t")
    assert(transpileBigQuery("SELECT SAFE_ADD(a, b), SAFE_MULTIPLY(a, b) FROM t") ==
      "SELECT TRY_ADD(a, b), TRY_MULTIPLY(a, b) FROM t")
    assert(transpileBigQuery("SELECT SAFE_CAST(a AS INT64) FROM t") ==
      "SELECT TRY_CAST(a AS BIGINT) FROM t")
    assert(transpileBigQuery("SELECT FORMAT_DATE('%Y-%m', d) FROM t") ==
      "SELECT date_format(d, 'yyyy-MM') FROM t")
    assert(transpileBigQuery("SELECT PARSE_DATE('%Y%m%d', s) FROM t") ==
      "SELECT to_date(s, 'yyyyMMdd') FROM t")
    assert(transpileBigQuery(
      "SELECT CAST(a AS FLOAT64), CAST(b AS NUMERIC), COUNTIF(x > 0) FROM t") ==
      "SELECT CAST(a AS DOUBLE), CAST(b AS DECIMAL(38,9)), COUNT_IF(x > 0) FROM t")
    assert(transpileBigQuery("SELECT * FROM t WHERE REGEXP_CONTAINS(s, 'a+')") ==
      "SELECT * FROM t WHERE REGEXP_LIKE(s, 'a+')")
    // one backtick pair around a dotted path → per-segment quoting
    assert(transpileBigQuery("SELECT * FROM `proj.ds.tbl`") ==
      "SELECT * FROM `proj`.`ds`.`tbl`")
  }

  test("transpileSnowflake: TO_NUMBER family, ZEROIFNULL/NULLIFZERO") {
    import Transpiler.transpileSnowflake
    assert(transpileSnowflake("SELECT TO_NUMBER(s), TO_NUMBER(s, 10, 2) FROM t") ==
      "SELECT CAST(s AS DECIMAL(38,0)), CAST(s AS DECIMAL(10,2)) FROM t")
    assert(transpileSnowflake("SELECT TRY_TO_NUMBER(s) FROM t") ==
      "SELECT TRY_CAST(s AS DECIMAL(38,0)) FROM t")
    // the conversion long-tail: DECIMAL/NUMERIC alias NUMBER's forms;
    // DOUBLE/BOOLEAN go through (TRY_)CAST; format-bearing
    // TRY_TO_DATE/TRY_TO_TIMESTAMP map format elements (1-arg forms
    // are native Spark and pass through)
    assert(transpileSnowflake("SELECT TO_DECIMAL(s, 10, 2), TRY_TO_NUMERIC(s) FROM t") ==
      "SELECT CAST(s AS DECIMAL(10,2)), TRY_CAST(s AS DECIMAL(38,0)) FROM t")
    assert(transpileSnowflake("SELECT TO_DOUBLE(s), TRY_TO_DOUBLE(s) FROM t") ==
      "SELECT CAST(s AS DOUBLE), TRY_CAST(s AS DOUBLE) FROM t")
    assert(transpileSnowflake("SELECT TO_BOOLEAN(s), TRY_TO_BOOLEAN(s) FROM t") ==
      "SELECT CAST(s AS BOOLEAN), TRY_CAST(s AS BOOLEAN) FROM t")
    assert(transpileSnowflake("SELECT TRY_TO_DATE(s, 'DD/MM/YYYY') FROM t") ==
      "SELECT try_to_date(s, 'dd/MM/yyyy') FROM t")
    assert(transpileSnowflake("SELECT TRY_TO_TIMESTAMP(s, 'YYYY-MM-DD HH24:MI:SS') FROM t") ==
      "SELECT try_to_timestamp(s, 'yyyy-MM-dd HH:mm:ss') FROM t")
    assert(transpileSnowflake("SELECT TRY_TO_DATE(s) FROM t") ==
      "SELECT TRY_TO_DATE(s) FROM t")
    assert(transpileSnowflake("SELECT ZEROIFNULL(x), NULLIFZERO(y) FROM t") ==
      "SELECT COALESCE(x, 0), NULLIF(y, 0) FROM t")
    // Snowflake DATE_TRUNC is part-first like Spark: untouched
    assert(transpileSnowflake("SELECT DATE_TRUNC('month', d) FROM t") ==
      "SELECT DATE_TRUNC('month', d) FROM t")
    // TO_VARCHAR is TO_CHAR's alias — same forms
    assert(transpileSnowflake("SELECT TO_VARCHAR(d, 'YYYY-MM') FROM t") ==
      "SELECT date_format(d, 'yyyy-MM') FROM t")
  }

  test("transpileBigQuery: expr-first trunc family flips to Spark order") {
    import Transpiler.transpileBigQuery
    assert(transpileBigQuery("SELECT DATE_TRUNC(d, MONTH) FROM t") ==
      "SELECT trunc(d, 'MONTH') FROM t")
    assert(transpileBigQuery("SELECT TIMESTAMP_TRUNC(ts, DAY) FROM t") ==
      "SELECT date_trunc('DAY', ts) FROM t")
    // Spark's own part-first date_trunc passes through untouched
    assert(transpileBigQuery("SELECT DATE_TRUNC('MONTH', d) FROM t") ==
      "SELECT DATE_TRUNC('MONTH', d) FROM t")
  }

  test("dialect arms are idempotent and literal-safe") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    val snow = Seq(
      "SELECT DATEADD(day, 3, d), DATEDIFF(month, a, b), TO_CHAR(d, 'YYYY') FROM t",
      "SELECT x::NUMBER(10,2) FROM t WHERE c ILIKE ANY ('%a%', '%b%')",
      "SELECT 'DATEADD(day, 1, x)' AS lit FROM t")
    snow.foreach { q =>
      val once = transpileSnowflake(q)
      assert(transpileSnowflake(once) == once, s"not idempotent: $q -> $once")
    }
    // literals are never rewritten
    assert(transpileSnowflake("SELECT 'DATEADD(day, 1, x)' FROM t") ==
      "SELECT 'DATEADD(day, 1, x)' FROM t")
    val bq = Seq(
      "SELECT DATE_DIFF(b, a, DAY), DATE_ADD(d, INTERVAL 3 DAY) FROM `p.d.t`",
      "SELECT SAFE_DIVIDE(a, b), FORMAT_DATE('%Y', d) FROM t",
      "SELECT CAST(a AS NUMERIC) FROM t")
    bq.foreach { q =>
      val once = transpileBigQuery(q)
      assert(transpileBigQuery(once) == once, s"not idempotent: $q -> $once")
    }
    assert(transpileBigQuery("SELECT 'SAFE_DIVIDE(a, b)' FROM t") ==
      "SELECT 'SAFE_DIVIDE(a, b)' FROM t")
  }

  test("transpileBigQuery: bare WEEK is Sunday-start — explicit alignment") {
    import Transpiler.transpileBigQuery
    assert(transpileBigQuery("SELECT DATE_TRUNC(d, WEEK) FROM t") ==
      "SELECT date_sub(trunc(date_add(d, 1), 'WEEK'), 1) FROM t")
    assert(transpileBigQuery("SELECT TIMESTAMP_TRUNC(ts, WEEK) FROM t") ==
      "SELECT timestampadd(DAY, -1, date_trunc('WEEK', timestampadd(DAY, 1, ts))) FROM t")
    assert(transpileBigQuery("SELECT DATE_DIFF(b, a, WEEK) FROM t") ==
      "SELECT (datediff(date_sub(trunc(date_add(b, 1), 'WEEK'), 1), " +
        "date_sub(trunc(date_add(a, 1), 'WEEK'), 1)) DIV 7) FROM t")
    // pure 7-day arithmetic keeps WEEK (no week-start convention)
    assert(transpileBigQuery("SELECT DATE_ADD(d, INTERVAL 2 WEEK) FROM t") ==
      "SELECT date_add(d, (((2)) * 7)) FROM t")
    // Sunday-start semantics pinned on a Sunday-spanning pair:
    // 2026-08-13 is a Thursday, 2026-08-16 a Sunday — one Sunday
    // boundary crossed, though the Monday-start convention sees none
    val spark = graft.core.GraftSession.build("graft-test", cores = 4)
    val r = spark.sql(transpileBigQuery(
      "SELECT DATE_DIFF(DATE '2026-08-16', DATE '2026-08-13', WEEK) AS w, " +
        "CAST(DATE_TRUNC(DATE '2026-08-16', WEEK) AS STRING) AS t1, " +
        "CAST(DATE_TRUNC(DATE '2026-08-13', WEEK) AS STRING) AS t2")).head()
    assert(r.getAs[Number](0).longValue == 1L)
    assert(r.getString(1) == "2026-08-16") // a Sunday truncates to itself
    assert(r.getString(2) == "2026-08-09") // back to the previous Sunday
  }

  test("transpileBigQuery: FROM-clause UNNEST → LATERAL VIEW") {
    import Transpiler.transpileBigQuery
    assert(transpileBigQuery("SELECT x FROM t, UNNEST(t.arr) AS x") ==
      "SELECT x FROM t, LATERAL EXPLODE(t.arr) AS (x)")
    assert(transpileBigQuery("SELECT x FROM t CROSS JOIN UNNEST(arr) x") ==
      "SELECT x FROM t, LATERAL EXPLODE(arr) AS (x)")
    assert(transpileBigQuery(
      "SELECT x, o FROM t, UNNEST(arr) AS x WITH OFFSET AS o WHERE o < 2") ==
      "SELECT x, o FROM t, LATERAL POSEXPLODE(arr) AS (o, x) WHERE o < 2")
    assert(transpileBigQuery(
      "SELECT x FROM t LEFT JOIN UNNEST(t.arr) AS x ON TRUE") ==
      "SELECT x FROM t, LATERAL EXPLODE_OUTER(t.arr) AS (x)")
    // IN UNNEST is a membership test, not an expansion
    assert(transpileBigQuery("SELECT * FROM t WHERE k IN UNNEST(arr)") ==
      "SELECT * FROM t WHERE array_contains(arr, k)")
    assert(transpileBigQuery("SELECT * FROM t WHERE k NOT IN UNNEST(arr)") ==
      "SELECT * FROM t WHERE NOT array_contains(arr, k)")
    // a bare FROM UNNEST (no connector) passes through for the repair loop
    assert(transpileBigQuery("SELECT x FROM UNNEST(arr) AS x") ==
      "SELECT x FROM UNNEST(arr) AS x")
    // literals containing UNNEST stay untouched
    assert(transpileBigQuery("SELECT 'a, UNNEST(arr) AS x' FROM t") ==
      "SELECT 'a, UNNEST(arr) AS x' FROM t")
  }

  test("transpileSnowflake: LATERAL FLATTEN → LATERAL VIEW POSEXPLODE") {
    import Transpiler.transpileSnowflake
    assert(transpileSnowflake(
      "SELECT t.id, f.value FROM t, LATERAL FLATTEN(input => t.arr) f") ==
      "SELECT t.id, f.value FROM t, LATERAL POSEXPLODE(t.arr) AS f(index, value)")
    assert(transpileSnowflake(
      "SELECT f.value FROM t, TABLE(FLATTEN(input => arr)) f") ==
      "SELECT f.value FROM t, LATERAL POSEXPLODE(arr) AS f(index, value)")
    assert(transpileSnowflake(
      "SELECT f.value FROM t, LATERAL FLATTEN(input => arr, outer => TRUE) f") ==
      "SELECT f.value FROM t, LATERAL POSEXPLODE_OUTER(arr) AS f(index, value)")
    // positional input; no alias
    assert(transpileSnowflake("SELECT value FROM t, LATERAL FLATTEN(arr)") ==
      "SELECT value FROM t, LATERAL POSEXPLODE(arr) AS (index, value)")
    // unsupported args (PATH/RECURSIVE) pass through for the repair loop
    assert(transpileSnowflake(
      "SELECT 1 FROM t, LATERAL FLATTEN(input => v, path => 'a') f") ==
      "SELECT 1 FROM t, LATERAL FLATTEN(input => v, path => 'a') f")
  }

  test("transpileSnowflake: single-colon VARIANT paths → dot access") {
    import Transpiler.transpileSnowflake
    assert(transpileSnowflake("SELECT f.value:name FROM t") ==
      "SELECT f.value.name FROM t")
    assert(transpileSnowflake("SELECT v:a:b FROM t") ==
      "SELECT v.a.b FROM t")
    // composes with :: casts — the cast's colons are never paths
    assert(transpileSnowflake("SELECT f.value:nkey::INT FROM t") ==
      "SELECT f.value.nkey::BIGINT FROM t")
    assert(transpileSnowflake("SELECT x::NUMBER FROM t") ==
      "SELECT x::DECIMAL(38,0) FROM t")
    // literals with colons stay untouched
    assert(transpileSnowflake("SELECT 'a:b', c FROM t") ==
      "SELECT 'a:b', c FROM t")
  }

  test("extended REGEXP_SUBSTR / REGEXP_EXTRACT argument forms") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    // Snowflake: 2-arg is native; position/occurrence/params/group compose
    assert(transpileSnowflake("SELECT REGEXP_SUBSTR(s, 'p+') FROM t") ==
      "SELECT REGEXP_SUBSTR(s, 'p+') FROM t")
    assert(transpileSnowflake("SELECT REGEXP_SUBSTR(s, 'p+', 3) FROM t") ==
      "SELECT regexp_substr(substr(s, 3), 'p+') FROM t")
    assert(transpileSnowflake("SELECT REGEXP_SUBSTR(s, 'p+', 1, 2) FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, 'p+', 0), CAST(2 AS INT)) FROM t")
    assert(transpileSnowflake(
      "SELECT REGEXP_SUBSTR(s, '(a) (b)', 1, 1, 'e', 2) FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, '(a) (b)', CAST(2 AS INT)), CAST(1 AS INT)) FROM t")
    assert(transpileSnowflake(
      "SELECT REGEXP_SUBSTR(s, 'p', 1, 1, 'ie') FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, '(?i)p', 1), CAST(1 AS INT)) FROM t")
    // BigQuery REGEXP_EXTRACT: single capture group → that group,
    // no group → full match, >1 group → repair loop
    assert(transpileBigQuery("SELECT REGEXP_EXTRACT(s, 'a+') FROM t") ==
      "SELECT regexp_substr(s, 'a+') FROM t")
    // no nullif: a legitimately empty capture returns '' in BigQuery,
    // and the 3-/4-arg forms never wrapped — arity-uniform now
    assert(transpileBigQuery("SELECT REGEXP_EXTRACT(s, '([a-z]+)@') FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, '([a-z]+)@', 1), 1) FROM t")
    assert(transpileBigQuery("SELECT REGEXP_EXTRACT(s, '(a)(b)') FROM t") ==
      "SELECT REGEXP_EXTRACT(s, '(a)(b)') FROM t")
    assert(transpileBigQuery("SELECT REGEXP_EXTRACT(s, 'a+', 2, 3) FROM t") ==
      "SELECT try_element_at(regexp_extract_all(substr(s, 2), 'a+', 0), CAST(3 AS INT)) FROM t")
    assert(transpileBigQuery("SELECT ARRAY_LENGTH(REGEXP_EXTRACT_ALL(s, 'a+')) FROM t") ==
      "SELECT ARRAY_SIZE(regexp_extract_all(s, 'a+', 0)) FROM t")
  }

  test("BigQuery STRING_AGG with in-call ORDER BY → WITHIN GROUP") {
    import Transpiler.transpileBigQuery
    assert(transpileBigQuery("SELECT STRING_AGG(x, ', ' ORDER BY k) FROM t GROUP BY g") ==
      "SELECT string_agg(x, ', ') WITHIN GROUP (ORDER BY k) FROM t GROUP BY g")
    assert(transpileBigQuery("SELECT STRING_AGG(x ORDER BY x DESC) FROM t") ==
      "SELECT string_agg(x) WITHIN GROUP (ORDER BY x DESC) FROM t")
    // no ORDER BY → native Spark string_agg, untouched
    assert(transpileBigQuery("SELECT STRING_AGG(x, ',') FROM t") ==
      "SELECT STRING_AGG(x, ',') FROM t")
    // LIMIT inside the aggregate is unsupported → repair loop
    assert(transpileBigQuery("SELECT STRING_AGG(x ORDER BY x LIMIT 2) FROM t") ==
      "SELECT STRING_AGG(x ORDER BY x LIMIT 2) FROM t")
  }

  test("shared-arm regex passes are literal-guarded (r14 hole closed)") {
    val hostile = Seq(
      "SELECT 'CAST(a AS TEXT)' FROM t",
      "SELECT 'strftime(''%Y'', x)' FROM t",
      "SELECT 'GROUP_CONCAT(a)' FROM t",
      "SELECT 'CHARINDEX(a, b)' FROM t",
      "SELECT 'DATE(''now'', ''-1 year'')' FROM t",
      "SELECT 'julianday(x)' FROM t",
      "SELECT /* GROUP_CONCAT(a) AS REAL */ a FROM t")
    hostile.foreach { q =>
      assert(transpile(q) == q, s"shared arm rewrote inside a literal: $q -> ${transpile(q)}")
      assert(Transpiler.transpileSnowflake(q) == q.trim.stripSuffix(";").trim ||
        Transpiler.transpileSnowflake(q) == q,
        s"snowflake arm rewrote inside a literal: $q")
    }
    // a single-line `--` comment is NOT rewritten in place — the
    // flattened-comment heal DROPS it whole (trailing comment, no code
    // fingerprint), leaving the statement semantically identical
    val commented = "SELECT a FROM t -- CAST(a AS TEXT) strftime('%Y', x)"
    assert(transpile(commented) == commented, // generic arm: untouched
      s"shared arm rewrote a comment: ${transpile(commented)}")
    assert(Transpiler.transpileSnowflake(commented) == "SELECT a FROM t")
    // and a comma inside a literal no longer splits call arguments
    assert(Transpiler.transpileSnowflake("SELECT DATEADD(day, 3, COALESCE(s, 'a,b')) FROM t") ==
      "SELECT timestampadd(DAY, (3), COALESCE(s, 'a,b')) FROM t")
    // BigQuery type casts are guarded too (the r15 advice remnant):
    // a literal containing 'CAST(x AS INT64)' / 'AS NUMERIC' survives
    val bqHostile = Seq(
      "SELECT 'CAST(x AS INT64)' FROM t",
      "SELECT 'a AS NUMERIC' FROM t",
      "SELECT 'CAST(y AS FLOAT64) AS BOOL' FROM t")
    bqHostile.foreach { q =>
      assert(Transpiler.transpileBigQuery(q) == q,
        s"bigquery arm rewrote inside a literal: $q -> ${Transpiler.transpileBigQuery(q)}")
    }
    // comment content is never rewritten IN PLACE; the flattened-
    // comment heal drops the trailing comment whole (same as snow arm)
    assert(Transpiler.transpileBigQuery(
      "SELECT a FROM t -- CAST(x AS INT64)") == "SELECT a FROM t")
    // outside quotes the same text still rewrites
    assert(Transpiler.transpileBigQuery("SELECT CAST(x AS INT64) FROM t") ==
      "SELECT CAST(x AS BIGINT) FROM t")
  }

  test("JSON-text VARIANT family: PARSE_JSON paths, GET_PATH, JSON_EXTRACT_*") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    // Snowflake: PARSE_JSON(col):path::TYPE → variant_get with the
    // cast folded into the type argument
    assert(transpileSnowflake("SELECT PARSE_JSON(j):a.b::INT AS x FROM t") ==
      "SELECT variant_get(parse_json(j), '$.a.b', 'bigint') AS x FROM t")
    assert(transpileSnowflake("SELECT TRY_PARSE_JSON(j):tags[0]::VARCHAR FROM t") ==
      "SELECT variant_get(try_parse_json(j), '$.tags[0]', 'string') FROM t")
    assert(transpileSnowflake("SELECT PARSE_JSON(j):a:b FROM t") ==
      "SELECT variant_get(parse_json(j), '$.a.b') FROM t")
    assert(transpileSnowflake("SELECT PARSE_JSON(j):n::NUMBER(10,2) FROM t") ==
      "SELECT variant_get(parse_json(j), '$.n', 'decimal(10,2)') FROM t")
    // bare PARSE_JSON / TRY_PARSE_JSON are native Spark 4 — untouched
    assert(transpileSnowflake("SELECT PARSE_JSON(j) FROM t") ==
      "SELECT PARSE_JSON(j) FROM t")
    // GET_PATH: JSON-text arg wraps in parse_json; an already-variant
    // arg passes straight in
    assert(transpileSnowflake("SELECT GET_PATH(v, 'a.b') FROM t") ==
      "SELECT variant_get(parse_json(v), '$.a.b') FROM t")
    assert(transpileSnowflake("SELECT GET_PATH(PARSE_JSON(j), 'tags[1]') FROM t") ==
      "SELECT variant_get(PARSE_JSON(j), '$.tags[1]') FROM t")
    // already-variant detection requires a CALL, not a name prefix: a
    // COLUMN named parse_json_raw is JSON text and must be wrapped
    assert(transpileSnowflake("SELECT GET_PATH(parse_json_raw, 'a') FROM t") ==
      "SELECT variant_get(parse_json(parse_json_raw), '$.a') FROM t")
    assert(transpileSnowflake("SELECT JSON_EXTRACT_PATH_TEXT(j, 'name') FROM t") ==
      "SELECT get_json_object(j, '$.name') FROM t")
    // OBJECT_AGG → deterministic sorted map; TO_JSON over it is native.
    // NULL-key/value pairs are filtered (Snowflake omits them; Spark's
    // map_from_entries throws on a NULL key)
    assert(transpileSnowflake("SELECT TO_JSON(OBJECT_AGG(k, v)) FROM t GROUP BY g") ==
      "SELECT TO_JSON(map_from_entries(filter(array_sort(collect_list(" +
        "named_struct('k', k, 'v', v))), " +
        "e -> e.k IS NOT NULL AND e.v IS NOT NULL))) FROM t GROUP BY g")
    // literal-guarded: path syntax inside a string survives
    assert(transpileSnowflake("SELECT 'PARSE_JSON(j):a' FROM t") ==
      "SELECT 'PARSE_JSON(j):a' FROM t")
    // idempotent under re-transpile
    val once = transpileSnowflake("SELECT PARSE_JSON(j):a.b::INT FROM t")
    assert(transpileSnowflake(once) == once)
    // BigQuery: scalar vs JSON-returning forms
    assert(transpileBigQuery("SELECT JSON_VALUE(j, '$.name') FROM t") ==
      "SELECT get_json_object(j, '$.name') FROM t")
    assert(transpileBigQuery("SELECT JSON_EXTRACT_SCALAR(j, '$.a') FROM t") ==
      "SELECT get_json_object(j, '$.a') FROM t")
    assert(transpileBigQuery("SELECT JSON_EXTRACT(j, '$.a') FROM t") ==
      "SELECT to_json(variant_get(try_parse_json(j), '$.a')) FROM t")
    assert(transpileBigQuery("SELECT JSON_QUERY(j, '$.t') FROM t") ==
      "SELECT to_json(variant_get(try_parse_json(j), '$.t')) FROM t")
    assert(transpileBigQuery("SELECT TO_JSON_STRING(STRUCT(a AS k)) FROM t") ==
      "SELECT to_json(STRUCT(a AS k)) FROM t")
    // non-literal path → repair loop
    assert(transpileBigQuery("SELECT JSON_EXTRACT(j, p) FROM t") ==
      "SELECT JSON_EXTRACT(j, p) FROM t")
  }

  test("dialect batch 3: SAMPLE (n ROWS), IGNORE NULLS, SELECT * EXCEPT") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    // fixed-size row sampling (the r15 digit-only percent rule passed
    // this to the repair loop)
    assert(transpileSnowflake("SELECT * FROM t SAMPLE (7 ROWS)") ==
      "SELECT * FROM t TABLESAMPLE (7 ROWS)")
    assert(transpileSnowflake("SELECT * FROM t SAMPLE ROW (25 ROWS)") ==
      "SELECT * FROM t TABLESAMPLE (25 ROWS)")
    // percent form still maps
    assert(transpileSnowflake("SELECT * FROM t SAMPLE (10)") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    // Snowflake's outer IGNORE NULLS spelling is native Spark syntax —
    // deliberate passthrough (executed semantics pinned by
    // q_transpile_batch3 against DuckDB's in-call spelling)
    val ig = "SELECT LAG(x) IGNORE NULLS OVER (ORDER BY k) FROM t"
    assert(transpileSnowflake(ig) == ig)
    // SELECT * EXCEPT is native in both Spark and BigQuery — untouched
    val ex = "SELECT * EXCEPT (a, b) FROM t"
    assert(transpileBigQuery(ex) == ex)
    assert(transpileSnowflake("SELECT * EXCLUDE (a, b) FROM t") ==
      "SELECT * EXCEPT (a, b) FROM t")
    assert(transpileSnowflake("SELECT * EXCLUDE a FROM t") ==
      "SELECT * EXCEPT (a) FROM t")
    // a MULTIPLICATION by a column literally named exclude is not a
    // star-minus: the captured "identifier" is the FROM keyword, which
    // is reserved — the query passes through unchanged
    val mult = "SELECT price * exclude FROM t"
    assert(transpileSnowflake(mult) == mult)
    // BigQuery * REPLACE needs schema knowledge a string rewriter
    // lacks → repair loop
    val rep = "SELECT * REPLACE (a + 1 AS a) FROM t"
    assert(transpileBigQuery(rep) == rep)
  }

  test("dialect batch 4: SAFE. prefix, FORMAT, GENERATE_DATE_ARRAY") {
    import Transpiler.transpileBigQuery
    assert(transpileBigQuery("SELECT SAFE.DIVIDE(a, b) FROM t") ==
      "SELECT TRY_DIVIDE(a, b) FROM t")
    assert(transpileBigQuery("SELECT SAFE.CAST(x AS INT64) FROM t") ==
      "SELECT TRY_CAST(x AS BIGINT) FROM t")
    // unknown SAFE.fn keeps NULL-on-error semantics visible for the
    // repair loop instead of silently dropping the prefix
    assert(transpileBigQuery("SELECT SAFE.PARSE_DATE('%Y', s) FROM t") ==
      "SELECT SAFE_PARSE_DATE('%Y', s) FROM t")
    // a literal containing SAFE. survives
    assert(transpileBigQuery("SELECT 'SAFE.DIVIDE(a, b)' FROM t") ==
      "SELECT 'SAFE.DIVIDE(a, b)' FROM t")
    assert(transpileBigQuery("SELECT FORMAT('%d-%s', k, s) FROM t") ==
      "SELECT format_string('%d-%s', k, s) FROM t")
    // FORMAT without a %-literal first arg → repair loop
    assert(transpileBigQuery("SELECT FORMAT(f, k) FROM t") ==
      "SELECT FORMAT(f, k) FROM t")
    assert(transpileBigQuery(
      "SELECT GENERATE_DATE_ARRAY(DATE '2024-01-01', DATE '2024-01-10') FROM t") ==
      "SELECT sequence(CAST(DATE '2024-01-01' AS DATE), CAST(DATE '2024-01-10' AS DATE)) FROM t")
    assert(transpileBigQuery(
      "SELECT GENERATE_DATE_ARRAY(a, b, INTERVAL 1 WEEK) FROM t") ==
      "SELECT sequence(CAST(a AS DATE), CAST(b AS DATE), INTERVAL 1 WEEK) FROM t")
  }

  test("dialect batch 5: LOG argument order, OFFSET/ORDINAL, CONTAINS_SUBSTR") {
    import Transpiler.transpileBigQuery
    // BigQuery LOG is value-first; Spark is base-first — ln-division
    // output cannot re-swap on re-transpile
    assert(transpileBigQuery("SELECT LOG(x, 2) FROM t") ==
      "SELECT (ln(x) / ln(2)) FROM t")
    val once = transpileBigQuery("SELECT LOG(x, 2) FROM t")
    assert(transpileBigQuery(once) == once)
    // 1-arg natural log passes through
    assert(transpileBigQuery("SELECT LOG(x) FROM t") == "SELECT LOG(x) FROM t")
    // array access: OFFSET 0-based (Spark-native), ORDINAL 1-based,
    // SAFE_ forms -> try_element_at
    assert(transpileBigQuery("SELECT arr[OFFSET(2)] FROM t") ==
      "SELECT arr[(2)] FROM t")
    assert(transpileBigQuery("SELECT arr[ORDINAL(i + 1)] FROM t") ==
      "SELECT arr[(i + 1) - 1] FROM t")
    assert(transpileBigQuery("SELECT t.arr[SAFE_OFFSET(5)] FROM t") ==
      "SELECT get(t.arr, (5)) FROM t")
    assert(transpileBigQuery("SELECT arr[SAFE_ORDINAL(n)] FROM t") ==
      "SELECT get(arr, (n) - 1) FROM t")
    assert(transpileBigQuery("SELECT CONTAINS_SUBSTR(name, 'ABC') FROM t") ==
      "SELECT (instr(lower(name), lower('ABC')) > 0) FROM t")
    // literal safety
    assert(transpileBigQuery("SELECT 'LOG(x, 2) arr[OFFSET(1)]' FROM t") ==
      "SELECT 'LOG(x, 2) arr[OFFSET(1)]' FROM t")
  }

  test("dialect batch 6: SPLIT_TO_TABLE, REGEXP_SUBSTR_ALL, JSON_*_ARRAY") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    // SPLIT_TO_TABLE rides the FLATTEN machinery (comma-lateral,
    // TABLE(...) wrapper, aliases); VALUE matches exactly, INDEX is
    // 0-based vs Snowflake's 1-based (documented divergence)
    assert(transpileSnowflake(
      "SELECT s.value FROM t, LATERAL SPLIT_TO_TABLE(t.tags, ',') s") ==
      "SELECT s.value FROM t, LATERAL POSEXPLODE(SPLIT(t.tags, ',')) AS s(index, value)")
    // metachar delimiter flows through the literal-escape SPLIT pass
    assert(transpileSnowflake(
      "SELECT s.value FROM t, TABLE(SPLIT_TO_TABLE(x, '.')) s") ==
      "SELECT s.value FROM t, LATERAL POSEXPLODE(split(x, '\\\\.')) AS s(index, value)")
    assert(transpileSnowflake("SELECT REGEXP_SUBSTR_ALL(n, '[0-9]+') FROM t") ==
      "SELECT regexp_extract_all(n, '[0-9]+', 0) FROM t")
    assert(transpileSnowflake("SELECT REGEXP_SUBSTR_ALL(n, '[0-9]+', 3) FROM t") ==
      "SELECT regexp_extract_all(substr(n, 3), '[0-9]+', 0) FROM t")
    // BigQuery ARRAY<JSON> forms: elements come back as JSON text
    // (strings keep quotes); try_cast nulls the non-array case
    assert(transpileBigQuery("SELECT JSON_EXTRACT_ARRAY(j, '$.tags') FROM t") ==
      "SELECT transform(try_cast(variant_get(try_parse_json(j), '$.tags') " +
        "AS array<variant>), x -> to_json(x)) FROM t")
    assert(transpileBigQuery("SELECT JSON_QUERY_ARRAY(j) FROM t") ==
      "SELECT transform(try_cast(variant_get(try_parse_json(j), '$') " +
        "AS array<variant>), x -> to_json(x)) FROM t")
    // non-literal path → repair loop; idempotence under re-transpile
    assert(transpileBigQuery("SELECT JSON_EXTRACT_ARRAY(j, p) FROM t") ==
      "SELECT JSON_EXTRACT_ARRAY(j, p) FROM t")
    Seq(
      transpileSnowflake("SELECT s.value FROM t, LATERAL SPLIT_TO_TABLE(x, '.') s"),
      transpileSnowflake("SELECT REGEXP_SUBSTR_ALL(n, '[0-9]+') FROM t"),
      transpileBigQuery("SELECT JSON_EXTRACT_ARRAY(j, '$.tags') FROM t")
    ).foreach { once =>
      assert(transpileSnowflake(once) == once, s"snow not idempotent: $once")
    }
    // a statement CONSUMING the lateral INDEX column gets the 1-based
    // shift when every reference is alias-qualified (batch 8 — the
    // pre-r18 behavior left it untranspiled)
    val idxSql = "SELECT s.index, s.value FROM t, LATERAL SPLIT_TO_TABLE(t.tags, ',') s"
    val idxOut = transpileSnowflake(idxSql)
    // the BARE select item keeps Snowflake's INDEX output column name
    assert(idxOut == "SELECT (s.index + 1) AS index, s.value FROM t" +
      ", LATERAL POSEXPLODE(SPLIT(t.tags, ',')) AS s(index, value)")
    // an EMBEDDED reference shifts in place without an injected alias
    assert(transpileSnowflake("SELECT s.index * 2 AS d2 " +
      "FROM t, LATERAL SPLIT_TO_TABLE(t.tags, ',') s") ==
      "SELECT (s.index + 1) * 2 AS d2 FROM t" +
        ", LATERAL POSEXPLODE(SPLIT(t.tags, ',')) AS s(index, value)")
    assert(transpileSnowflake(idxOut) == idxOut, "index shift not idempotent")
    // an UNQUALIFIED index reference stays untranspiled (cannot be told
    // apart from another relation's column at the string level), as
    // does a statement mixing SPLIT_TO_TABLE with a FLATTEN whose
    // 0-based INDEX must NOT shift
    val bareIdx = "SELECT index FROM t, LATERAL SPLIT_TO_TABLE(t.tags, ',') s"
    assert(transpileSnowflake(bareIdx) == bareIdx)
    val mixed = "SELECT s.index, f.index FROM t, " +
      "LATERAL SPLIT_TO_TABLE(t.tags, ',') s, LATERAL FLATTEN(input => t.arr) f"
    val mixedOut = transpileSnowflake(mixed)
    assert(mixedOut.toUpperCase.contains("SPLIT_TO_TABLE"), // repair loop
      s"mixed SPLIT_TO_TABLE must stay untranspiled: $mixedOut")
    assert(!mixedOut.contains("+ 1"), s"no index must shift: $mixedOut")
  }

  test("dialect batch 7: TO_TIMESTAMP_NTZ family, STRTOK") {
    import Transpiler.transpileSnowflake
    // NTZ/LTZ/TZ collapse onto TO_TIMESTAMP (UTC sessions — flavors
    // coincide); 1-arg is native Spark, format-bearing maps elements
    assert(transpileSnowflake("SELECT TO_TIMESTAMP_NTZ(ts) FROM t") ==
      "SELECT TO_TIMESTAMP(ts) FROM t")
    assert(transpileSnowflake(
      "SELECT TO_TIMESTAMP_LTZ(s, 'DD/MM/YYYY HH24:MI:SS') FROM t") ==
      "SELECT to_timestamp(s, 'dd/MM/yyyy HH:mm:ss') FROM t")
    assert(transpileSnowflake("SELECT TRY_TO_TIMESTAMP_NTZ(s) FROM t") ==
      "SELECT TRY_TO_TIMESTAMP(s) FROM t")
    // STRTOK: every delimiter CHARACTER separates, empty tokens skip,
    // out-of-range part is NULL — non-delimiter-run extraction
    assert(transpileSnowflake("SELECT STRTOK(s) FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, '[^ ]+', 0), CAST(1 AS INT)) FROM t")
    assert(transpileSnowflake("SELECT STRTOK(s, ',;', 2) FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, '[^,;]+', 0), CAST(2 AS INT)) FROM t")
    // class-metachar delimiter escapes; non-literal delim → repair loop
    assert(transpileSnowflake("SELECT STRTOK(s, '-') FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, '[^\\\\-]+', 0), CAST(1 AS INT)) FROM t")
    assert(transpileSnowflake("SELECT STRTOK(s, d, 2) FROM t") ==
      "SELECT STRTOK(s, d, 2) FROM t")
    // empty delimiter (whole-string token) would emit invalid '[^]+';
    // a backslash cannot survive the double unescape — repair loop
    assert(transpileSnowflake("SELECT STRTOK(s, '', 1) FROM t") ==
      "SELECT STRTOK(s, '', 1) FROM t")
    assert(transpileSnowflake("SELECT STRTOK(s, '\\', 1) FROM t") ==
      "SELECT STRTOK(s, '\\', 1) FROM t")
    // non-positive part: Snowflake RAISES on part < 1 where
    // try_element_at would count a negative part from the END of the
    // array — only a positive integer literal part is rewritten, the
    // rest fall through to the repair loop
    assert(transpileSnowflake("SELECT STRTOK(s, ',', -1) FROM t") ==
      "SELECT STRTOK(s, ',', -1) FROM t")
    assert(transpileSnowflake("SELECT STRTOK(s, ',', 0) FROM t") ==
      "SELECT STRTOK(s, ',', 0) FROM t")
    assert(transpileSnowflake("SELECT STRTOK(s, ',', p) FROM t") ==
      "SELECT STRTOK(s, ',', p) FROM t")
    assert(transpileSnowflake("SELECT STRTOK(s, ',', +2) FROM t") ==
      "SELECT try_element_at(regexp_extract_all(s, '[^,]+', 0), CAST(+2 AS INT)) FROM t")
    // idempotent under re-transpile
    Seq("SELECT STRTOK(s, ',;', 2) FROM t",
      "SELECT TO_TIMESTAMP_NTZ(s, 'YYYY-MM-DD') FROM t").foreach { sql =>
      val once = transpileSnowflake(sql)
      assert(transpileSnowflake(once) == once, s"not idempotent: $once")
    }
  }

  test("dialect batch 8 (Snowflake): bit funcs, ISO family, LAST_DAY parts, RATIO_TO_REPORT") {
    import Transpiler.transpileSnowflake
    assert(transpileSnowflake("SELECT BITAND(a, b), BITSHIFTLEFT(a, 2) FROM t") ==
      "SELECT ((a) & (b)), shiftleft(a, 2) FROM t")
    assert(transpileSnowflake("SELECT EDITDISTANCE(a, b) FROM t") ==
      "SELECT levenshtein(a, b) FROM t")
    assert(transpileSnowflake("SELECT EDITDISTANCE(a, b, 3) FROM t") ==
      "SELECT least(levenshtein(a, b), 3) FROM t")
    // variable / negative max → repair loop (Snowflake clamps, Spark's
    // own 3-arg levenshtein returns -1 — not the same contract)
    assert(transpileSnowflake("SELECT EDITDISTANCE(a, b, m) FROM t") ==
      "SELECT EDITDISTANCE(a, b, m) FROM t")
    assert(transpileSnowflake("SELECT DAYOFWEEKISO(d), WEEKISO(d) FROM t") ==
      "SELECT (weekday(d) + 1), weekofyear(d) FROM t")
    assert(transpileSnowflake("SELECT YEAROFWEEKISO(d) FROM t") ==
      "SELECT year(date_add(CAST(d AS DATE), 3 - weekday(d))) FROM t")
    assert(transpileSnowflake("SELECT LAST_DAY(d) FROM t") ==
      "SELECT LAST_DAY(d) FROM t") // 1-arg is native Spark
    assert(transpileSnowflake("SELECT LAST_DAY(d, 'year') FROM t") ==
      "SELECT make_date(year(d), 12, 31) FROM t")
    assert(transpileSnowflake("SELECT LAST_DAY(d, quarter) FROM t") ==
      "SELECT date_sub(add_months(CAST(date_trunc('QUARTER', d) AS DATE), 3), 1) FROM t")
    assert(transpileSnowflake("SELECT REGEXP_COUNT(s, '[0-9]') FROM t") ==
      "SELECT REGEXP_COUNT(s, '[0-9]') FROM t") // 2-arg native
    assert(transpileSnowflake("SELECT REGEXP_COUNT(s, '[0-9]', 4) FROM t") ==
      "SELECT regexp_count(substr(s, 4), '[0-9]') FROM t")
    assert(transpileSnowflake("SELECT INSERT(s, 2, 3, r) FROM t") ==
      "SELECT overlay(s, r, 2, 3) FROM t")
    assert(transpileSnowflake(
      "SELECT RATIO_TO_REPORT(x) OVER (PARTITION BY g) FROM t") ==
      "SELECT (CAST(x AS DOUBLE) / sum(x) OVER (PARTITION BY g)) FROM t")
    // no OVER clause → not valid Snowflake → repair loop
    assert(transpileSnowflake("SELECT RATIO_TO_REPORT(x) FROM t") ==
      "SELECT RATIO_TO_REPORT(x) FROM t")
    // idempotence: the emitted forms never re-match their own arms
    Seq("SELECT ARRAY_POSITION(e, arr) FROM t",
      "SELECT RATIO_TO_REPORT(x) OVER (PARTITION BY g) FROM t",
      "SELECT EDITDISTANCE(a, b, 3) FROM t").foreach { sql =>
      val once = transpileSnowflake(sql)
      assert(transpileSnowflake(once) == once, s"not idempotent: $once")
    }
  }

  test("dialect batch 8 (BigQuery): STRPOS, TO_HEX digests, LEAST/GREATEST nulls") {
    import Transpiler.transpileBigQuery
    assert(transpileBigQuery("SELECT STRPOS(a, b) FROM t") ==
      "SELECT instr(a, b) FROM t")
    assert(transpileBigQuery("SELECT TO_HEX(MD5(x)) FROM t") ==
      "SELECT md5(x) FROM t")
    assert(transpileBigQuery("SELECT TO_HEX(SHA256(x || y)) FROM t") ==
      "SELECT sha2(x || y, 256) FROM t")
    // TO_HEX over anything that is not a single whole digest call keeps
    // BYTES semantics Spark cannot honor at the string level
    assert(transpileBigQuery("SELECT TO_HEX(b) FROM t") ==
      "SELECT TO_HEX(b) FROM t")
    assert(transpileBigQuery("SELECT TO_HEX(MD5(a) || MD5(b)) FROM t") ==
      "SELECT TO_HEX(MD5(a) || MD5(b)) FROM t")
    // each argument appears exactly ONCE (a per-arg IS NULL chain
    // would double evaluation and grow 2^depth on nested clamps)
    assert(transpileBigQuery("SELECT LEAST(a, b, c) FROM t") ==
      "SELECT element_at(transform(array(array(a, b, c)), " +
        "__ga -> IF(forall(__ga, __gx -> __gx IS NOT NULL), " +
        "array_min(__ga), NULL)), 1) FROM t")
    assert(transpileBigQuery("SELECT GREATEST(a, b) FROM t") ==
      "SELECT element_at(transform(array(array(a, b)), " +
        "__ga -> IF(forall(__ga, __gx -> __gx IS NOT NULL), " +
        "array_max(__ga), NULL)), 1) FROM t")
    // 1-arg LEAST is its argument in both engines — pass through
    assert(transpileBigQuery("SELECT LEAST(a) FROM t") ==
      "SELECT LEAST(a) FROM t")
    assert(transpileBigQuery("SELECT DATE(2024, 2, 29) FROM t") ==
      "SELECT make_date(2024, 2, 29) FROM t")
    assert(transpileBigQuery("SELECT DATE(ts) FROM t") ==
      "SELECT DATE(ts) FROM t") // 1-arg date() is native Spark
    assert(transpileBigQuery("SELECT DATETIME(2024, 2, 29, 7, 30, 5) FROM t") ==
      "SELECT make_timestamp(2024, 2, 29, 7, 30, 5) FROM t")
    val jsa = transpileBigQuery(
      "SELECT JSON_EXTRACT_STRING_ARRAY(j, '$.tags') FROM t")
    assert(jsa.startsWith(
      "SELECT transform(try_cast(variant_get(try_parse_json(j), '$.tags') " +
        "AS array<variant>), __gx -> CASE WHEN schema_of_variant(__gx)"))
    assert(jsa.contains("TRY_CAST(__gx AS string)"))
    // idempotence
    Seq("SELECT LEAST(a, b) FROM t", "SELECT TO_HEX(MD5(x)) FROM t",
      "SELECT STRPOS(a, b) FROM t").foreach { sql =>
      val once = transpileBigQuery(sql)
      assert(transpileBigQuery(once) == once, s"not idempotent: $once")
    }
  }

  test("dialect batch 9: Snowflake TRUNC date parts, BigQuery IEEE_DIVIDE") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    assert(transpileSnowflake("SELECT TRUNC(d, 'month') FROM t") ==
      "SELECT date_trunc('MONTH', d) FROM t")
    assert(transpileSnowflake("SELECT TRUNC(d, year) FROM t") ==
      "SELECT date_trunc('YEAR', d) FROM t")
    // a bare ABBREVIATION could be a numeric-scale COLUMN (TRUNC is
    // also Snowflake's numeric truncation) — only quoted literals and
    // full unit words rewrite
    assert(transpileSnowflake("SELECT TRUNC(x, d) FROM t") ==
      "SELECT TRUNC(x, d) FROM t")
    assert(transpileSnowflake("SELECT TRUNC(x, 2) FROM t") ==
      "SELECT TRUNC(x, 2) FROM t")
    assert(transpileSnowflake("SELECT TRUNC(x) FROM t") ==
      "SELECT TRUNC(x) FROM t")
    val ieee = transpileBigQuery("SELECT IEEE_DIVIDE(a, b) FROM t")
    assert(ieee.contains("CAST('Infinity' AS DOUBLE)") &&
      ieee.contains("CAST('NaN' AS DOUBLE)") &&
      ieee.contains("CAST(a AS DOUBLE) / CAST(b AS DOUBLE)"))
    Seq(transpileSnowflake("SELECT TRUNC(d, 'month') FROM t")).foreach { once =>
      assert(transpileSnowflake(once) == once, s"not idempotent: $once")
    }
    assert(transpileBigQuery(ieee) == ieee, "IEEE_DIVIDE not idempotent")
  }

  test("dialect batch 10: array set ops, REGEXP_REPLACE forms, JSON scalar accessors") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    // parenthesized so `, flatten(a)` can never re-read as a lateral
    assert(transpileSnowflake("SELECT ARRAY_FLATTEN(aa) FROM t") ==
      "SELECT (flatten(aa)) FROM t")
    assert(transpileSnowflake("SELECT a, ARRAY_FLATTEN(aa) FROM t") ==
      transpileSnowflake(transpileSnowflake("SELECT a, ARRAY_FLATTEN(aa) FROM t")))
    assert(transpileSnowflake("SELECT ARRAY_INTERSECTION(a, b) FROM t") ==
      "SELECT array_intersect(a, b) FROM t")
    // Snowflake's default replacement is '' — Spark needs 3 args
    assert(transpileSnowflake("SELECT REGEXP_REPLACE(s, '[0-9]') FROM t") ==
      "SELECT regexp_replace(s, '[0-9]', '') FROM t")
    // 3/4-arg forms are Spark's own contract — pass through
    assert(transpileSnowflake("SELECT REGEXP_REPLACE(s, p, r) FROM t") ==
      "SELECT REGEXP_REPLACE(s, p, r) FROM t")
    // occurrence 0 = replace ALL (both engines' default) composes with
    // params; a SPECIFIC occurrence is not one regexp_replace → repair
    assert(transpileSnowflake(
      "SELECT REGEXP_REPLACE(s, '[ab]', '_', 1, 0, 'i') FROM t") ==
      "SELECT regexp_replace(s, '(?i)[ab]', '_', 1) FROM t")
    assert(transpileSnowflake(
      "SELECT REGEXP_REPLACE(s, '[ab]', '_', 1, 2) FROM t") ==
      "SELECT REGEXP_REPLACE(s, '[ab]', '_', 1, 2) FROM t")
    assert(transpileBigQuery(
      "SELECT GENERATE_TIMESTAMP_ARRAY(a, b, INTERVAL 6 HOUR) FROM t") ==
      "SELECT sequence(CAST(a AS TIMESTAMP), CAST(b AS TIMESTAMP), " +
        "INTERVAL 6 HOUR) FROM t")
    assert(transpileBigQuery("SELECT INT64(JSON_QUERY(j, '$.n')) FROM t") ==
      "SELECT CAST(try_parse_json(to_json(variant_get(try_parse_json(j), " +
        "'$.n'))) AS BIGINT) FROM t")
    val laxS = transpileBigQuery("SELECT LAX_STRING(j) FROM t")
    assert(laxS.startsWith("SELECT element_at(transform(array(try_parse_json(j))"))
    assert(laxS.contains("schema_of_variant(__gv) LIKE 'OBJECT%'") &&
      laxS.contains("TRY_CAST(__gv AS STRING)"))
    // LAX_INT64 rounds half-away like BigQuery (not a truncating cast)
    assert(transpileBigQuery("SELECT LAX_INT64(j) FROM t")
      .contains("TRY_CAST(round(TRY_CAST(__gv AS DOUBLE)) AS BIGINT)"))
    // STRING's strict form shares its name with the timestamp
    // formatter STRING(ts[, tz]) — indistinguishable here, untouched
    assert(transpileBigQuery("SELECT STRING(ts) FROM t") ==
      "SELECT STRING(ts) FROM t")
    // idempotence
    Seq(transpileSnowflake("SELECT REGEXP_REPLACE(s, '[0-9]') FROM t"),
      transpileSnowflake("SELECT ARRAY_INTERSECTION(a, b) FROM t")).foreach {
      once => assert(Transpiler.transpileSnowflake(once) == once,
        s"not idempotent: $once")
    }
    Seq(transpileBigQuery("SELECT INT64(j) FROM t"),
      transpileBigQuery("SELECT LAX_BOOL(j) FROM t")).foreach { once =>
      assert(Transpiler.transpileBigQuery(once) == once,
        s"not idempotent: $once")
    }
  }

  test("dialect batch 11: REGEXP_INSTR composition, REGEXP_LIKE/RLIKE params") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    assert(transpileSnowflake("SELECT REGEXP_INSTR(s, 'ab+') FROM t") ==
      "SELECT (CASE WHEN (s) IS NULL THEN CAST(NULL AS INT) " +
        "WHEN regexp_count(s, 'ab+') > 0 " +
        "THEN length(regexp_replace(s, '(?:ab+)[\\\\s\\\\S]*$', '')) + 1 " +
        "ELSE 0 END) FROM t")
    assert(transpileSnowflake("SELECT REGEXP_INSTR(s, 'ab+', 3) FROM t") ==
      "SELECT (CASE WHEN (s) IS NULL THEN CAST(NULL AS INT) " +
        "WHEN (3) <= length(s) AND regexp_count(substr(s, 3), 'ab+') > 0 " +
        "THEN (3) - 1 + length(regexp_replace(substr(s, 3), " +
        "'(?:ab+)[\\\\s\\\\S]*$', '')) + 1 ELSE 0 END) FROM t")
    // non-literal pattern, non-positive/non-literal position,
    // occurrence+ forms → repair loop (the warehouses RAISE on a bad
    // position where substr would silently count from the end)
    assert(transpileSnowflake("SELECT REGEXP_INSTR(s, p) FROM t") ==
      "SELECT REGEXP_INSTR(s, p) FROM t")
    assert(transpileSnowflake("SELECT REGEXP_INSTR(s, 'x', 0) FROM t") ==
      "SELECT REGEXP_INSTR(s, 'x', 0) FROM t")
    assert(transpileSnowflake("SELECT REGEXP_INSTR(s, 'x', p) FROM t") ==
      "SELECT REGEXP_INSTR(s, 'x', p) FROM t")
    assert(transpileSnowflake("SELECT REGEXP_INSTR(s, 'x', 1, 2) FROM t") ==
      "SELECT REGEXP_INSTR(s, 'x', 1, 2) FROM t")
    // the BigQuery arm shares the composition
    assert(transpileBigQuery("SELECT REGEXP_INSTR(s, 'ab+') FROM t")
      .contains("regexp_count(s, 'ab+') > 0"))
    // Snowflake REGEXP_LIKE/RLIKE match the ENTIRE subject (Spark's
    // regexp_like is a contains) — \A(?:...)\z anchors ('$' would
    // match before a trailing newline; 'm' would relocate '^'/'$')
    assert(transpileSnowflake("SELECT REGEXP_LIKE(s, 'ab', 'i') FROM t") ==
      "SELECT ((s) RLIKE '(?i)\\\\A(?:ab)\\\\z') FROM t")
    assert(transpileSnowflake("SELECT RLIKE(s, 'ab', 'is') FROM t") ==
      "SELECT ((s) RLIKE '(?is)\\\\A(?:ab)\\\\z') FROM t")
    assert(transpileSnowflake("SELECT REGEXP_LIKE(s, 'ab') FROM t") ==
      "SELECT ((s) RLIKE '\\\\A(?:ab)\\\\z') FROM t")
    // Snowflake params read left-to-right, later wins: 'ic' is
    // case-SENSITIVE
    assert(transpileSnowflake("SELECT REGEXP_LIKE(s, 'ab', 'ic') FROM t") ==
      "SELECT ((s) RLIKE '\\\\A(?:ab)\\\\z') FROM t")
    // a NON-literal pattern anchors through concat — Spark would have
    // EXECUTED the pass-through natively with contains semantics, so
    // the repair loop was never reached
    assert(transpileSnowflake("SELECT REGEXP_LIKE(s, p) FROM t") ==
      "SELECT ((s) RLIKE concat('\\\\A(?:', p, ')\\\\z')) FROM t")
    // the INFIX spellings carry the same anchoring
    assert(transpileSnowflake("SELECT * FROM t WHERE s RLIKE 'URGENT'") ==
      "SELECT * FROM t WHERE s RLIKE '\\\\A(?:URGENT)\\\\z'")
    assert(transpileSnowflake("SELECT * FROM t WHERE s NOT REGEXP 'a+'") ==
      "SELECT * FROM t WHERE s NOT RLIKE '\\\\A(?:a+)\\\\z'")
    // idempotence (function emissions survive the infix pass)
    Seq("SELECT REGEXP_INSTR(s, 'ab+') FROM t",
      "SELECT RLIKE(s, 'ab', 'i') FROM t",
      "SELECT REGEXP_LIKE(s, p) FROM t",
      "SELECT * FROM t WHERE s RLIKE 'URGENT'").foreach { sql =>
      val once = transpileSnowflake(sql)
      assert(transpileSnowflake(once) == once, s"not idempotent: $once")
    }
  }

  test("OBJECT_CONSTRUCT: KEEP_NULL spelling maps; literal NULL value passes through") {
    import Transpiler.transpileSnowflake
    assert(transpileSnowflake("SELECT OBJECT_CONSTRUCT_KEEP_NULL('a', x, 'b', NULL) FROM t") ==
      "SELECT named_struct('a', x, 'b', NULL) FROM t")
    // plain OBJECT_CONSTRUCT drops NULL-valued pairs in Snowflake but
    // named_struct keeps them → statically-NULL values go to the
    // repair loop instead of silently diverging
    assert(transpileSnowflake("SELECT OBJECT_CONSTRUCT('a', x, 'b', NULL) FROM t") ==
      "SELECT OBJECT_CONSTRUCT('a', x, 'b', NULL) FROM t")
    assert(transpileSnowflake("SELECT OBJECT_CONSTRUCT('a', x, 'b', y) FROM t") ==
      "SELECT named_struct('a', x, 'b', y) FROM t")
  }

  test("dialect batch 2: aliases, DATE_PART, name funcs, SPLIT, DIV, unix-date") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    // Snowflake TIMESTAMPDIFF aliases DATEDIFF's BOUNDARY counting —
    // Spark's native timestampdiff would return 0 here
    assert(transpileSnowflake("SELECT TIMESTAMPDIFF(month, a, b) FROM t") ==
      "SELECT ((year(b) - year(a)) * 12 + (month(b) - month(a))) FROM t")
    val spark = graft.core.GraftSession.build("graft-test", cores = 4)
    assert(spark.sql(transpileSnowflake(
      "SELECT TIMESTAMPDIFF(month, DATE '2020-01-31', DATE '2020-02-01') AS m"))
      .head().getInt(0) == 1)
    // TIMESTAMPADD day-grain is a fixpoint (no paren accumulation)
    assert(transpileSnowflake("SELECT TIMESTAMPADD(day, 3, d) FROM t") ==
      "SELECT timestampadd(DAY, 3, d) FROM t")
    assert(transpileSnowflake("SELECT TIMEADD(month, 2, d) FROM t") ==
      "SELECT (d + make_ym_interval(0, CAST((2) AS INT))) FROM t")
    assert(transpileSnowflake("SELECT DATE_PART(month, d) FROM t") ==
      "SELECT date_part('MONTH', d) FROM t")
    assert(transpileSnowflake("SELECT DATE_PART('yy', d) FROM t") ==
      "SELECT date_part('YEAR', d) FROM t")
    assert(transpileSnowflake("SELECT MONTHNAME(d), DAYNAME(d) FROM t") ==
      "SELECT date_format(d, 'MMM'), date_format(d, 'EEE') FROM t")
    // Snowflake ARRAY_CONTAINS is (value, array) — reversed from Spark;
    // emitted via the shared index fold (batch 8 replaced the earlier
    // array_position emission, which the new reversed-argument
    // ARRAY_POSITION arm would have re-matched and swapped back)
    val acOut = transpileSnowflake("SELECT ARRAY_CONTAINS(x, arr) FROM t")
    assert(acOut.startsWith("SELECT (CASE WHEN (arr) IS NULL OR (x) IS NULL " +
      "THEN CAST(NULL AS BOOLEAN) ELSE aggregate(arr, "))
    assert(acOut.endsWith("IS NOT NULL END) FROM t"))
    assert(transpileSnowflake(acOut) == acOut, "ARRAY_CONTAINS not idempotent")
    // semantics preserved: found / absent / NULL value / NULL elements
    val acRow = spark.sql(transpileSnowflake(
      "SELECT ARRAY_CONTAINS(2, array(1, CAST(NULL AS INT), 2)) AS a, " +
        "ARRAY_CONTAINS(9, array(1, CAST(NULL AS INT), 2)) AS b, " +
        "ARRAY_CONTAINS(CAST(NULL AS INT), array(1, 2)) AS c")).head()
    assert(acRow.getBoolean(0) && !acRow.getBoolean(1) && acRow.isNullAt(2))
    // SPLIT takes a LITERAL delimiter: metachars get regex-escaped,
    // plain delimiters pass through, backslash-bearing ones repair-loop
    assert(transpileSnowflake("SELECT SPLIT(s, '.') FROM t") ==
      "SELECT split(s, '\\\\.') FROM t")
    assert(spark.sql(transpileSnowflake("SELECT SPLIT('a.b.c', '.')[1] AS x"))
      .head().getString(0) == "b")
    assert(transpileSnowflake("SELECT SPLIT(s, ',') FROM t") ==
      "SELECT SPLIT(s, ',') FROM t")
    assert(transpileSnowflake("SELECT SPLIT(s, '\\.') FROM t") ==
      "SELECT SPLIT(s, '\\.') FROM t")
    // CHARINDEX now splits nested call args; 3-arg maps to locate
    assert(transpile("SELECT CHARINDEX(LOWER(a), CONCAT(b, c)) FROM t") ==
      "SELECT INSTR(CONCAT(b, c), LOWER(a)) FROM t")
    assert(transpile("SELECT CHARINDEX('x', s, 5) FROM t") ==
      "SELECT locate('x', s, 5) FROM t")
    // BigQuery: DIV, unix-date pair, FORMAT_DATETIME/PARSE_TIMESTAMP
    assert(transpileBigQuery("SELECT DIV(a, b) FROM t") ==
      "SELECT ((a) DIV (b)) FROM t")
    assert(transpileBigQuery("SELECT UNIX_DATE(d) FROM t") ==
      "SELECT datediff(d, DATE'1970-01-01') FROM t")
    assert(transpileBigQuery("SELECT DATE_FROM_UNIX_DATE(n) FROM t") ==
      "SELECT date_add(DATE'1970-01-01', (n)) FROM t")
    assert(transpileBigQuery("SELECT FORMAT_DATETIME('%Y-%m', dt) FROM t") ==
      "SELECT date_format(dt, 'yyyy-MM') FROM t")
    assert(transpileBigQuery("SELECT PARSE_TIMESTAMP('%Y-%m-%d', s) FROM t") ==
      "SELECT to_timestamp(s, 'yyyy-MM-dd') FROM t")
    assert(transpileBigQuery("SELECT SPLIT(s) FROM t") ==
      "SELECT split(s, ',') FROM t")
    assert(transpileBigQuery("SELECT SPLIT(s, '|') FROM t") ==
      "SELECT split(s, '\\\\|') FROM t")
  }

  test("ordered ARRAY_AGG: Snowflake WITHIN GROUP and BigQuery in-call ORDER BY") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    assert(transpileSnowflake(
      "SELECT ARRAY_AGG(x) WITHIN GROUP (ORDER BY x) FROM t") ==
      "SELECT array_sort(collect_list(x)) FROM t")
    assert(transpileSnowflake(
      "SELECT ARRAY_AGG(DISTINCT x) WITHIN GROUP (ORDER BY x DESC) FROM t") ==
      "SELECT reverse(array_sort(collect_set(x))) FROM t")
    assert(transpileSnowflake(
      "SELECT ARRAY_AGG(v) WITHIN GROUP (ORDER BY k) FROM t") ==
      "SELECT transform(array_sort(collect_list(" +
        "named_struct('s', k, 'v', v))), __s -> __s.v) FROM t")
    // plain ARRAY_AGG is native Spark — untouched
    assert(transpileSnowflake("SELECT ARRAY_AGG(x) FROM t") ==
      "SELECT ARRAY_AGG(x) FROM t")
    assert(transpileBigQuery("SELECT ARRAY_AGG(v ORDER BY k DESC) FROM t") ==
      "SELECT reverse(transform(array_sort(collect_list(" +
        "named_struct('s', k, 'v', v))), __s -> __s.v)) FROM t")
    assert(transpileBigQuery("SELECT ARRAY_AGG(x) FROM t") ==
      "SELECT ARRAY_AGG(x) FROM t")
    // executed: the collected order is the ORDER BY order
    val spark = graft.core.GraftSession.build("graft-test", cores = 4)
    val r = spark.sql(transpileSnowflake(
      "SELECT ARRAY_AGG(v) WITHIN GROUP (ORDER BY k DESC) AS a " +
        "FROM VALUES (1,'x'),(2,'y'),(3,'z') AS t(k,v)"))
      .head().getSeq[String](0)
    assert(r == Seq("z", "y", "x"))
  }

  test("semi-structured access: GET, ARRAY_SLICE, OBJECT_CONSTRUCT, array renames") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    assert(transpileSnowflake("SELECT GET(arr, 0), GET(obj, 'k') FROM t") ==
      "SELECT arr[0], obj['k'] FROM t")
    assert(transpileSnowflake("SELECT ARRAY_SLICE(arr, 1, 3) FROM t") ==
      "SELECT slice(arr, (1) + 1, (3) - (1)) FROM t")
    // negative (from-the-end) indices pass through for the repair loop
    assert(transpileSnowflake("SELECT ARRAY_SLICE(arr, -2, 3) FROM t") ==
      "SELECT ARRAY_SLICE(arr, -2, 3) FROM t")
    assert(transpileSnowflake("SELECT OBJECT_CONSTRUCT('a', x, 'b', y) FROM t") ==
      "SELECT named_struct('a', x, 'b', y) FROM t")
    // dynamic keys / odd arity / '*' pass through
    assert(transpileSnowflake("SELECT OBJECT_CONSTRUCT(k, v) FROM t") ==
      "SELECT OBJECT_CONSTRUCT(k, v) FROM t")
    assert(transpileSnowflake("SELECT ARRAY_CAT(a, b), ARRAY_TO_STRING(a, '-') FROM t") ==
      "SELECT CONCAT(a, b), ARRAY_JOIN(a, '-') FROM t")
    assert(transpileBigQuery(
      "SELECT ARRAY_CONCAT(a, b), ARRAY_REVERSE(a), GENERATE_ARRAY(1, 5, 2) FROM t") ==
      "SELECT CONCAT(a, b), REVERSE(a), SEQUENCE(1, 5, 2) FROM t")
    assert(transpileBigQuery("SELECT LOGICAL_AND(p), LOGICAL_OR(p) FROM t") ==
      "SELECT BOOL_AND(p), BOOL_OR(p) FROM t")
    // executed: the slice arithmetic is Snowflake's 0-based/exclusive
    val spark = graft.core.GraftSession.build("graft-test", cores = 4)
    val r = spark.sql(transpileSnowflake(
      "SELECT ARRAY_SLICE(ARRAY_CAT(SEQUENCE(0, 2), SEQUENCE(3, 5)), 1, 4) AS s"))
      .head().getSeq[Long](0)
    assert(r == Seq(1L, 2L, 3L))
  }

  test("row sampling: Snowflake SAMPLE (n) and BigQuery TABLESAMPLE SYSTEM") {
    import Transpiler.{transpileBigQuery, transpileSnowflake}
    assert(transpileSnowflake("SELECT * FROM t SAMPLE (10)") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    assert(transpileSnowflake("SELECT * FROM t TABLESAMPLE BERNOULLI (2.5)") ==
      "SELECT * FROM t TABLESAMPLE (2.5 PERCENT)")
    // a call named sample keeps its arguments; literals stay literal
    assert(transpileSnowflake("SELECT SAMPLE(a, b) FROM t") ==
      "SELECT SAMPLE(a, b) FROM t")
    assert(transpileSnowflake("SELECT 'SAMPLE (10)' FROM t") ==
      "SELECT 'SAMPLE (10)' FROM t")
    assert(transpileBigQuery("SELECT * FROM t TABLESAMPLE SYSTEM (10 PERCENT)") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    // executed: Spark accepts the emitted form
    val spark = graft.core.GraftSession.build("graft-test", cores = 4)
    graft.catalog.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(transpileSnowflake(
      "SELECT COUNT(*) AS n FROM orders SAMPLE (100)")).head().getLong(0)
    assert(n > 0)
  }

  test("SqliteExec.sql applies sqlite integer-division on the analyzed plan") {
    val spark = graft.core.GraftSession.build("graft-test", cores = 4)
    graft.catalog.Tables.registerAll(spark, "/root/testdata/sf0.001")
    // int/int truncates like sqlite (Spark's / would return 3.5)
    val r = SqliteExec.sql(spark, "SELECT 7 / 2 AS q").head()
    assert(r.getLong(0) == 3L)
    // mixed operands keep fractional division untouched (7/2.0 is a
    // decimal divide in Spark — the rewrite must not touch it)
    val d = SqliteExec.sql(spark, "SELECT 7 / 2.0 AS q").head()
    assert(d.getDecimal(0).doubleValue() == 3.5)
    // divide-by-zero is NULL (sqlite), not an ANSI error
    assert(SqliteExec.sql(spark, "SELECT 7 / 0 AS q").head().isNullAt(0))
    // aggregates: the analyzer's int→double casts are looked through
    val agg = SqliteExec.sql(spark,
      """SELECT SUM(o_custkey) / COUNT(*) AS avg_trunc FROM "orders"""").head()
    assert(!agg.isNullAt(0))
    val exact = spark.sql(
      "SELECT CAST(SUM(o_custkey) AS DOUBLE) / COUNT(*) FROM orders").head().getDouble(0)
    assert(agg.getLong(0) == exact.toLong, "integral divide must truncate")
    // a USER-written CAST(... AS REAL) is sqlite's idiom for forcing
    // float division — the rewrite must NOT strip it and truncate
    val real = SqliteExec.sql(spark,
      """SELECT CAST(SUM(o_custkey) AS REAL) / COUNT(*) AS avg_f FROM "orders"""").head()
    assert(real.getDouble(0) == exact, "user cast to REAL keeps float division")
    val realLit = SqliteExec.sql(spark, "SELECT CAST(7 AS REAL) / 2 AS q").head()
    assert(realLit.getDouble(0) == 3.5)
  }
}

package graft.dialect

import org.scalatest.funsuite.AnyFunSuite

/** Property guards for the transpiler's lexical surgery over 300
  * seeded-random SQL strings mixing identifiers, literals that CONTAIN
  * dialect keywords, comments, numbers, and nested dialect calls: all
  * three arms are IDEMPOTENT on their own output, never touch
  * single-quoted literals, and leave dialect-free SQL byte-identical.
  */
class TranspilerPropertySpec extends AnyFunSuite {

  private val idents = Vector("a", "b", "col1", "t.x", "order_total", "d")
  private val lits = Vector(
    "'plain'", "'DATEADD(day, 1, x)'", "'SAFE_DIVIDE(a, b)'",
    "'it''s'", "'100 %'", "'TO_CHAR(d)'",
    // the r14 verdict's hostile pool: these seed the three formerly
    // plain-regex passes (strftime / CAST-type / sqlite-date rewrites)
    // plus the new UNNEST/FLATTEN/LISTAGG structural scans
    "'CAST(a AS TEXT)'", "'strftime(''%Y'', x)'", "'GROUP_CONCAT(a)'",
    "'CHARINDEX(a, b)'", "'julianday(x)'", "'a, UNNEST(arr) AS x'",
    "', LATERAL FLATTEN(input => v) f'", "'LISTAGG(x)'",
    "'REGEXP_SUBSTR(s, p, 1, 2)'", "'CAST(b AS REAL)'",
    // r16: JSON/variant family + BigQuery type-cast literal safety
    "'PARSE_JSON(j):a.b::INT'", "'GET_PATH(v, ''a'')'",
    "'JSON_EXTRACT(j, ''$.a'')'", "'CAST(x AS INT64)'", "'AS NUMERIC'",
    "'SAFE.DIVIDE(a, b)'", "'FORMAT(''%d'', a)'",
    // batch 8 hostile literals: arm tokens inside strings stay verbatim
    "'LEAST(a, b)'", "'TO_HEX(MD5(x))'", "'s.index'",
    "'RATIO_TO_REPORT(x) OVER (PARTITION BY g)'",
    "'x RLIKE ''p'''", "'REGEXP_INSTR(s, ''a'')'")
  private val calls = Vector(
    "DATEADD(day, 3, d)", "DATEDIFF(month, a, b)", "TO_CHAR(d, 'YYYY-MM')",
    "IFF(a > 1, 'x', 'y')", "x::NUMBER(10,2)", "ZEROIFNULL(n)",
    "DATE_DIFF(b, a, DAY)", "DATE_ADD(d, INTERVAL 3 DAY)",
    "SAFE_DIVIDE(a, b)", "FORMAT_DATE('%Y', d)", "COUNTIF(x > 0)",
    "DATEADD(month, 1, DATEADD(year, -1, d))",
    "NVL(a, b)", "NVL2(a, b, col1)", "DECODE(a, 1, 'x', 'y')",
    "SPLIT_PART(t.x, ',', 2)", "REGEXP_SUBSTR(t.x, 'p+', 3)",
    "REGEXP_SUBSTR(t.x, '(a)(b)', 1, 1, 'e', 2)",
    "TIMESTAMP_ADD(d, INTERVAL 5 MINUTE)", "DATE_TRUNC(d, WEEK)",
    "DATE_DIFF(b, a, WEEK)", "DATEADD(day, 1, COALESCE(t.x, 'a,b'))",
    "TIMESTAMPDIFF(month, a, b)", "TIMESTAMPADD(day, 3, d)",
    "DATE_PART(month, d)", "MONTHNAME(d)", "SPLIT(t.x, '.')",
    "SPLIT(t.x, ',')", "ARRAY_CONTAINS(a, b)", "DIV(a, b)",
    "UNIX_DATE(d)", "CHARINDEX(a, b, 2)", "FORMAT_DATETIME('%Y', d)",
    "ARRAY_AGG(a) WITHIN GROUP (ORDER BY a)",
    "ARRAY_AGG(b ORDER BY col1 DESC)",
    "GET(a, 0)", "ARRAY_SLICE(a, 1, 3)", "OBJECT_CONSTRUCT('k', b)",
    "ARRAY_TO_STRING(a, '-')", "GENERATE_ARRAY(1, 5)",
    "TO_DOUBLE(a)", "TRY_TO_BOOLEAN(b)", "TO_DECIMAL(a, 10, 2)",
    "TRY_TO_DATE(t.x, 'YYYY-MM-DD')",
    // r16: JSON/variant family
    "PARSE_JSON(t.x):a.b::INT", "TRY_PARSE_JSON(t.x):tags[0]::VARCHAR",
    "GET_PATH(a, 'k.m')", "JSON_EXTRACT_PATH_TEXT(t.x, 'name')",
    "OBJECT_AGG(a, b)", "JSON_VALUE(t.x, '$.a')",
    "JSON_EXTRACT(t.x, '$.a')", "JSON_QUERY(t.x, '$.t')",
    "TO_JSON_STRING(a)", "OBJECT_CONSTRUCT_KEEP_NULL('k', b)",
    "SAFE.DIVIDE(a, b)", "FORMAT('%d', a)",
    "GENERATE_DATE_ARRAY(a, b, INTERVAL 1 WEEK)",
    "LOG(a, 2)", "t.x[OFFSET(0)]", "t.x[SAFE_ORDINAL(b)]",
    "CONTAINS_SUBSTR(a, 'zz')",
    // batch 8: reversed-argument pair (fold emissions), clamped
    // editdistance, ISO family, LAST_DAY parts, window ratio, digests,
    // null-propagating extremes, JSON string arrays, civil constructors
    "ARRAY_POSITION(a, b)", "ARRAY_CONTAINS(col1, b)",
    "BITAND(a, 255)", "BITSHIFTLEFT(a, 2)", "EDITDISTANCE(a, b, 3)",
    "SQUARE(a)", "DAYOFWEEKISO(d)", "YEAROFWEEKISO(d)",
    "LAST_DAY(d, 'quarter')", "REGEXP_COUNT(t.x, 'p+', 3)",
    "INSERT(t.x, 2, 3, b)", "RATIO_TO_REPORT(a) OVER (PARTITION BY b)",
    "STRPOS(a, b)", "TO_HEX(MD5(a))", "LEAST(a, b)", "GREATEST(a, b, col1)",
    "JSON_EXTRACT_STRING_ARRAY(t.x, '$.tags')", "DATE(2024, 2, 29)",
    "DATETIME(2024, 2, 29, 7, 30, 5)",
    // batch 9
    "TRUNC(d, 'month')", "TRUNC(a, 2)", "IEEE_DIVIDE(a, b)",
    "MEDIAN(a)", "PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY a)",
    // batch 10
    "ARRAY_INTERSECTION(a, b)", "ARRAY_FLATTEN(a)",
    "REGEXP_REPLACE(t.x, '[0-9]')", "REGEXP_REPLACE(t.x, 'p', 'r', 1, 0, 'i')",
    "GENERATE_TIMESTAMP_ARRAY(a, b, INTERVAL 6 HOUR)",
    "INT64(JSON_QUERY(t.x, '$.n'))", "LAX_STRING(t.x)", "LAX_BOOL(b)",
    // batch 11
    "REGEXP_INSTR(t.x, 'ab+')", "REGEXP_INSTR(t.x, 'p+', 3)",
    "REGEXP_LIKE(t.x, 'ab')", "RLIKE(t.x, 'ab', 'i')",
    "REGEXP_LIKE(t.x, b)", "t.x RLIKE 'ab'", "t.x NOT REGEXP 'a+'",
    "WIDTH_BUCKET(a, 0, 100, 10)")
  private val comments = Vector(
    "/* SAFE_DIVIDE inside */ a", "-- DATEADD(day, 1, x)\na")

  private def genSql(rng: scala.util.Random): (String, Seq[String]) = {
    val n = 1 + rng.nextInt(5)
    val usedLits = scala.collection.mutable.ListBuffer.empty[String]
    val terms = (0 until n).map { _ =>
      rng.nextInt(10) match {
        case 0 | 1 | 2 => idents(rng.nextInt(idents.size))
        case 3 | 4 | 5 =>
          val l = lits(rng.nextInt(lits.size)); usedLits += l; l
        case 6 | 7 | 8 => calls(rng.nextInt(calls.size))
        case _ => comments(rng.nextInt(comments.size))
      }
    }
    val tail = Vector("", " FROM t", " FROM t WHERE a > 0")(rng.nextInt(3))
    ("SELECT " + terms.mkString(", ") + tail, usedLits.toList)
  }

  private val arms: Seq[(String, String => String)] = Seq(
    "snowflake" -> Transpiler.transpileSnowflake,
    "bigquery" -> Transpiler.transpileBigQuery,
    "shared" -> (Transpiler.transpile(_: String)))

  test("all arms are idempotent and literal-safe on 300 seeded-random SQLs") {
    val rng = new scala.util.Random(20260815L)
    (0 until 300).foreach { i =>
      val (sql, usedLits) = genSql(rng)
      arms.foreach { case (name, f) =>
        val once = f(sql)
        assert(f(once) == once, s"[$i] $name not idempotent on: $sql\n-> $once")
        usedLits.foreach(l =>
          assert(once.contains(l), s"[$i] $name mangled literal $l in: $once"))
      }
    }
  }

  test("no arm ever throws: garbage, truncations, unbalanced structure") {
    // the repair loop feeds LLM output straight through the arms —
    // a transpiler exception would kill the loop where a pass-through
    // (Spark's parser rejects, error feeds the next repair turn) heals
    val rng = new scala.util.Random(42L)
    val seeds = Seq(
      "", " ", ";", "--", "/*", "'", "''", "((", "))", "`", "\"",
      "SELECT", "SELECT DATEADD(", "SELECT DATEADD(day, 1",
      "SELECT TO_CHAR(d, 'YYYY", "SELECT 'unterminated",
      "FROM t, UNNEST(", "LATERAL FLATTEN(input =>",
      "SELECT x FROM t, UNNEST(arr) AS", "ARRAY_AGG(x) WITHIN GROUP (",
      "SELECT a::", "a:b:", "x IN UNNEST", "STRING_AGG(x ORDER BY",
      "REGEXP_SUBSTR(s, '(', 1, 1, 'e', 2)", "SPLIT(s, '\\')",
      "PARSE_JSON(", "PARSE_JSON(x):", "PARSE_JSON(x):a[", "PARSE_JSON(x):a::",
      "GET_PATH(v,", "TRY_PARSE_JSON(x):a[zz]", "OBJECT_AGG(k")
    val alphabet = "SELECT FROM WHERE DATEADD UNNEST FLATTEN ( ) , ' ` \" -- /* */ :: : 1 a\n\t".split(' ')
    val garbage = (0 until 200).map(_ =>
      (0 until rng.nextInt(20)).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString(" "))
    (seeds ++ garbage).foreach { sql =>
      arms.foreach { case (name, f) =>
        try f(sql)
        catch { case e: Throwable =>
          fail(s"$name threw on input=[$sql] -> $e")
        }
      }
      try Transpiler.transpileSqlite(sql)
      catch { case e: Throwable => fail(s"sqlite arm threw on [$sql]: $e") }
    }
  }

  test("dialect-free SQL passes through unchanged") {
    val clean = Seq(
      "SELECT a, b FROM t WHERE a > 0 ORDER BY b",
      "SELECT count(*) AS n FROM t GROUP BY a HAVING count(*) > 1",
      "SELECT t.x, 'lit' FROM t JOIN u ON t.id = u.id",
      "WITH c AS (SELECT 1 AS x) SELECT x FROM c")
    clean.foreach { sql =>
      arms.foreach { case (name, f) =>
        assert(f(sql) == sql, s"$name rewrote dialect-free SQL: $sql -> ${f(sql)}")
      }
    }
  }
}

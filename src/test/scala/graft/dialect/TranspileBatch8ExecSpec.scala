package graft.dialect

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Dialect batch 8 EXECUTED on Spark — the string-level TranspilerSpec
  * cases pin the emitted SQL; these pin the VALUES the emitted SQL
  * computes, on the mappings whose semantics carry the risk (the
  * ARRAY_POSITION fold, the ISO day/week/year family, 2-arg LAST_DAY
  * parts, the SPLIT_TO_TABLE 1-based INDEX shift, the BigQuery
  * LEAST/GREATEST null propagation, and the variant-cast JSON string
  * array).
  */
class TranspileBatch8ExecSpec extends SparkSpec {

  private def snow1(sql: String): Row =
    spark.sql(Transpiler.transpileSnowflake(sql)).collect().head

  private def bq1(sql: String): Row =
    spark.sql(Transpiler.transpileBigQuery(sql)).collect().head

  test("snowflake ARRAY_POSITION: element-first, 0-based, NULL-aware") {
    val r = snow1(
      "SELECT ARRAY_POSITION(7, array(10, CAST(NULL AS INT), 7)) AS a, " +
        "ARRAY_POSITION(99, array(10, CAST(NULL AS INT), 7)) AS b, " +
        "ARRAY_POSITION(CAST(NULL AS INT), array(10, CAST(NULL AS INT), 7)) AS c")
    assert(r.getInt(0) == 2)       // 0-based third slot
    assert(r.isNullAt(1))          // absent -> NULL (not -1, not 0)
    assert(r.getInt(2) == 1)       // finds the NULL element (<=>)
  }

  test("snowflake ISO day/week/year family") {
    // 2024-01-01 is a Monday in ISO week 1 of 2024
    val a = snow1("SELECT DAYOFWEEKISO(DATE'2024-01-01') AS d, " +
      "WEEKISO(DATE'2024-01-01') AS w, YEAROFWEEKISO(DATE'2024-01-01') AS y")
    assert((a.getInt(0), a.getInt(1), a.getInt(2)) == ((1, 1, 2024)))
    // 2023-01-01 is a Sunday that belongs to ISO week 52 of 2022
    val b = snow1("SELECT DAYOFWEEKISO(DATE'2023-01-01') AS d, " +
      "WEEKISO(DATE'2023-01-01') AS w, YEAROFWEEKISO(DATE'2023-01-01') AS y")
    assert((b.getInt(0), b.getInt(1), b.getInt(2)) == ((7, 52, 2022)))
  }

  test("snowflake 2-arg LAST_DAY parts") {
    // 2024-05-15 is a Wednesday; its ISO week ends Sunday 2024-05-19
    val r = snow1("SELECT LAST_DAY(DATE'2024-05-15', 'year') AS y, " +
      "LAST_DAY(DATE'2024-05-15', 'quarter') AS q, " +
      "LAST_DAY(DATE'2024-05-15', 'week') AS w, " +
      "LAST_DAY(DATE'2024-05-15', 'month') AS m")
    assert(r.getDate(0).toString == "2024-12-31")
    assert(r.getDate(1).toString == "2024-06-30")
    assert(r.getDate(2).toString == "2024-05-19")
    assert(r.getDate(3).toString == "2024-05-31")
  }

  test("snowflake EDITDISTANCE, SQUARE, bit functions, INSERT") {
    val r = snow1("SELECT EDITDISTANCE('kitten', 'sitting') AS e2, " +
      "EDITDISTANCE('kitten', 'sitting', 2) AS e3, " +
      "SQUARE(12) AS sq, BITAND(12, 10) AS ba, BITOR(12, 10) AS bo, " +
      "BITXOR(12, 10) AS bx, BITNOT(0) AS bn, " +
      "BITSHIFTLEFT(3, 4) AS sl, BITSHIFTRIGHT(-16, 2) AS sr, " +
      "INSERT('abcdef', 2, 3, 'ZZ') AS ins")
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 2) // clamped to the max, not -1
    assert(r.getDouble(2) == 144.0)
    assert(r.getInt(3) == 8 && r.getInt(4) == 14 && r.getInt(5) == 6)
    assert(r.getInt(6) == -1)
    assert(r.getInt(7) == 48 && r.getInt(8) == -4) // arithmetic shift
    assert(r.getString(9) == "aZZef")
  }

  test("snowflake REGEXP_COUNT position and params forms") {
    val r = snow1("SELECT REGEXP_COUNT('aAbaA', 'a') AS c2, " +
      "REGEXP_COUNT('aAbaA', 'a', 3) AS c3, " +
      "REGEXP_COUNT('aAbaA', 'a', 1, 'i') AS ci")
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 1) // subject sliced from position 3
    assert(r.getInt(2) == 4) // case-insensitive
  }

  test("snowflake RATIO_TO_REPORT") {
    val rows = spark.sql(Transpiler.transpileSnowflake(
      "SELECT v, RATIO_TO_REPORT(v) OVER (PARTITION BY g) AS r " +
        "FROM VALUES (1, 'x'), (3, 'x'), (2, 'y') AS t(v, g) ORDER BY v"))
      .collect()
    assert(rows.map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 0.25), (2, 1.0), (3, 0.75)))
  }

  test("snowflake SPLIT_TO_TABLE: qualified INDEX is 1-based") {
    val rows = spark.sql(Transpiler.transpileSnowflake(
      "SELECT s.index AS i, s.value AS v " +
        "FROM VALUES ('a-b-c') AS t(x), LATERAL SPLIT_TO_TABLE(t.x, '-') s " +
        "ORDER BY i")).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("bigquery STRPOS, TO_HEX digests, civil constructors") {
    val r = bq1("SELECT STRPOS('banana', 'an') AS sp, " +
      "STRPOS('banana', 'zz') AS sp0, " +
      "TO_HEX(MD5('abc')) AS h1, TO_HEX(SHA256('abc')) AS h2, " +
      "DATE(2024, 2, 29) AS d, DATETIME(2024, 2, 29, 7, 30, 5) AS dt")
    assert(r.getInt(0) == 2 && r.getInt(1) == 0)
    assert(r.getString(2) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getString(3) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r.getDate(4).toString == "2024-02-29")
    assert(r.getTimestamp(5).toString.startsWith("2024-02-29 07:30:05"))
  }

  test("bigquery LEAST/GREATEST propagate NULL arguments") {
    val r = bq1("SELECT LEAST(3, CAST(NULL AS INT), 1) AS l, " +
      "GREATEST(3, CAST(NULL AS INT)) AS g, " +
      "LEAST(3, 1, 2) AS l2, GREATEST(3, 1, 2) AS g2")
    assert(r.isNullAt(0) && r.isNullAt(1)) // Spark natives would skip NULLs
    assert(r.getInt(2) == 1 && r.getInt(3) == 3)
  }

  test("bigquery JSON_EXTRACT_STRING_ARRAY unquotes scalars, nulls non-scalars") {
    val r = bq1("""SELECT JSON_EXTRACT_STRING_ARRAY('{"t": ["a", 1, {"b": 2}]}', '$.t') AS a""")
    assert(r.getSeq[String](0) == Seq("a", "1", null))
  }

  // ---- batch 9 ------------------------------------------------------

  test("snowflake TRUNC date parts") {
    val r = snow1("SELECT TRUNC(TIMESTAMP'2024-05-15 10:30:00', 'month') AS m, " +
      "TRUNC(TIMESTAMP'2024-05-15 10:30:00', year) AS y")
    assert(r.getTimestamp(0).toString.startsWith("2024-05-01 00:00:00"))
    assert(r.getTimestamp(1).toString.startsWith("2024-01-01 00:00:00"))
  }

  test("bigquery IEEE_DIVIDE: inf, -inf, NaN, NULL, finite") {
    val r = bq1("SELECT IEEE_DIVIDE(3, 0) AS pi, IEEE_DIVIDE(-3, 0) AS ni, " +
      "IEEE_DIVIDE(0, 0) AS nan, IEEE_DIVIDE(1, CAST(NULL AS INT64)) AS nl, " +
      "IEEE_DIVIDE(7, 2) AS f, " +
      // a NaN NUMERATOR over zero stays NaN — Spark orders NaN above
      // every value, so an unguarded sign test would read Infinity
      "IEEE_DIVIDE(IEEE_DIVIDE(0, 0), 0) AS nan2")
    assert(r.getDouble(0).isPosInfinity && r.getDouble(1).isNegInfinity)
    assert(r.getDouble(2).isNaN)
    assert(r.isNullAt(3))
    assert(r.getDouble(4) == 3.5)
    assert(r.getDouble(5).isNaN)
  }

  test("bigquery nested LEAST/GREATEST clamp: single-appearance emission composes") {
    val r = bq1("SELECT LEAST(GREATEST(7, 2), 5) AS c1, " +
      "LEAST(GREATEST(CAST(NULL AS INT64), 2), 5) AS c2")
    assert(r.get(0).toString == "5")
    assert(r.isNullAt(1)) // the inner NULL propagates through both wraps
  }

  test("natives proven: MEDIAN, PERCENTILE_CONT WITHIN GROUP, POSITION") {
    // these pass through every arm untouched — pin that Spark computes
    // the warehouse semantics (type-7 continuous quantiles, 1-based
    // substring position) so the pass-through is a decision, not a gap
    val r = snow1("SELECT MEDIAN(x) AS m, " +
      "PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY x) AS p, " +
      "POSITION('-', '1-URGENT') AS sp " +
      "FROM VALUES (1), (2), (3), (10) AS t(x)")
    assert(r.getDouble(0) == 2.5)
    assert(r.getDouble(1) == 1.75) // type-7: 1 + 0.75*(2-1)
    assert(r.getInt(2) == 2)
  }

  // ---- batch 10 -----------------------------------------------------

  test("snowflake array set ops and REGEXP_REPLACE default replacement") {
    val r = snow1("SELECT ARRAY_TO_STRING(ARRAY_INTERSECTION(" +
      "array('a', 'x'), array('y', 'x', 'a')), '|') AS i, " +
      "ARRAY_TO_STRING(ARRAY_FLATTEN(array(array('p'), array('q'))), '|') AS f, " +
      "REGEXP_REPLACE('ALGERIA', '[AEIOU]') AS rr")
    assert(r.getString(0) == "a|x") // left-operand order, like Snowflake
    assert(r.getString(1) == "p|q")
    assert(r.getString(2) == "LGR") // ALL occurrences, empty replacement
  }

  test("bigquery JSON scalar accessors and GENERATE_TIMESTAMP_ARRAY") {
    val r = bq1("""SELECT INT64(JSON_QUERY('{"n": 5, "s": "77", "w": "x"}', '$.n')) AS n,
      FLOAT64(JSON_QUERY('{"n": 5}', '$.n')) AS f,
      LAX_INT64(JSON_QUERY('{"s": "77"}', '$.s')) AS coerced,
      LAX_INT64(JSON_QUERY('{"w": "x"}', '$.w')) AS miss,
      LAX_STRING(JSON_QUERY('{"w": "x"}', '$.w')) AS s,
      ARRAY_LENGTH(GENERATE_TIMESTAMP_ARRAY(TIMESTAMP '2024-01-01 00:00:00',
        TIMESTAMP '2024-01-02 00:00:00', INTERVAL 6 HOUR)) AS nts""")
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 5.0)
    assert(r.getLong(2) == 77L)  // LAX coerces numeric strings
    assert(r.isNullAt(3))        // ...and nulls non-numeric ones
    assert(r.getString(4) == "x")
    assert(r.getInt(5) == 5)     // inclusive endpoints: 0,6,12,18,24h
  }

  test("bigquery LAX accessors: non-scalars null, INT64 rounds, BOOL rejects numbers") {
    val r = bq1("""SELECT LAX_STRING(JSON_QUERY('{"o": {"a": 1}}', '$.o')) AS obj,
      LAX_INT64(JSON_QUERY('{"x": 10.9}', '$.x')) AS up,
      LAX_INT64(JSON_QUERY('{"x": -3.5}', '$.x')) AS away,
      LAX_BOOL(JSON_QUERY('{"x": 1}', '$.x')) AS numbool,
      LAX_BOOL(JSON_QUERY('{"x": "TRUE"}', '$.x')) AS strbool,
      LAX_FLOAT64(JSON_QUERY('{"x": [1]}', '$.x')) AS arrf""")
    assert(r.isNullAt(0))          // object -> NULL, not '{"a":1}'
    assert(r.getLong(1) == 11L)    // rounds half away from zero...
    assert(r.getLong(2) == -4L)    // ...in both directions
    assert(r.isNullAt(3))          // numbers are not booleans in LAX_BOOL
    assert(r.getBoolean(4))        // case-insensitive true/false strings are
    assert(r.isNullAt(5))          // array -> NULL
    // integer-schema values above 2^53 cast DIRECTLY — the double
    // route would silently collapse them to the nearest even
    val big = bq1("""SELECT LAX_INT64(JSON_QUERY('{"x": 9007199254740993}', '$.x')) AS b""")
    assert(big.getLong(0) == 9007199254740993L)
  }

  test("sqlite ORDER BY heal leaves output aliases bare, wraps qualified refs") {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("x", 1, 10), Row("x", 1, 30), Row("y", 2, 20))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.IntegerType))))
      .createOrReplaceTempView("heal_t")
    // ORDER BY an aggregate's output alias must stay bare (a wrap broke
    // this previously-working ubiquitous NL2SQL shape)
    val top = spark.sql(Transpiler.transpileSqlite(
      "SELECT name, COUNT(*) AS n FROM heal_t GROUP BY name ORDER BY n DESC LIMIT 1"))
      .collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 2L)))
    // a QUALIFIED ref to a wrapped select item wraps too (an output
    // alias can never shield it in Spark) — and the result analyzes
    val q = spark.sql(Transpiler.transpileSqlite(
      "SELECT T1.b FROM heal_t T1 GROUP BY T1.k ORDER BY T1.b")).collect()
    assert(q.length == 2)
    // a DOTTED backtick-quoted alias is not a qualifier: the sort ref
    // resolves against the output name and must stay bare (identifier
    // set makes both quoted tokens resolve as identifiers)
    assert(Transpiler.transpileSqlite(
      "SELECT COUNT(*) AS \"a.b\" FROM heal_t GROUP BY k ORDER BY \"a.b\"",
      Set("a.b", "heal_t", "k"))
      == "SELECT COUNT(*) AS `a.b` FROM heal_t GROUP BY k ORDER BY `a.b`")
    // idempotence on the healed shapes
    Seq("SELECT b FROM heal_t GROUP BY k ORDER BY b",
      "SELECT T1.b FROM heal_t T1 GROUP BY T1.k ORDER BY T1.b",
      "SELECT name, COUNT(*) AS n FROM heal_t GROUP BY name ORDER BY n DESC")
      .foreach { sql0 =>
        val once = Transpiler.transpileSqlite(sql0)
        assert(Transpiler.transpileSqlite(once) == once,
          s"heal not idempotent: $sql0 ->\n$once")
      }
  }

  // ---- batch 11 -----------------------------------------------------

  test("REGEXP_INSTR: first-match position, newline-safe, position form") {
    val r = snow1("SELECT REGEXP_INSTR('banana', 'an') AS a, " +
      "REGEXP_INSTR('banana', 'zz') AS z, " +
      "REGEXP_INSTR('a\nbcd', 'bc') AS nl, " +
      "REGEXP_INSTR('banana', 'an', 3) AS p3, " +
      "REGEXP_INSTR(CAST(NULL AS STRING), 'x') AS nu, " +
      "REGEXP_INSTR('abc', 'x*', 9) AS oob")
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 0)   // no match -> 0, like both warehouses
    assert(r.getInt(2) == 3)   // [\s\S] prefix crosses the newline
    assert(r.getInt(3) == 4)   // counted in the ORIGINAL subject
    assert(r.isNullAt(4))      // NULL subject propagates, not 0
    assert(r.getInt(5) == 0)   // empty-matching pattern past the end
  }

  test("natives proven: scale CEIL/FLOOR, WIDTH_BUCKET; anchored REGEXP_LIKE") {
    val r = snow1("SELECT CEIL(3.141, 2) AS c, FLOOR(3.149, 2) AS f, " +
      "WIDTH_BUCKET(7, 0, 10, 5) AS w, " +
      "REGEXP_LIKE('URGENT', 'urgent', 'i') AS rl, " +
      // Snowflake's ENTIRE-subject match: a contains-style pass-through
      // would return true here
      "REGEXP_LIKE('1-URGENT', 'URGENT') AS partial, " +
      // params read left-to-right, later wins: 'ic' = case-sensitive
      "REGEXP_LIKE('URGENT', 'urgent', 'ic') AS lastwins, " +
      // \z (not $): '$' matches BEFORE a trailing newline
      "REGEXP_LIKE('abc\n', 'abc') AS trailnl")
    assert(r.get(0).toString == "3.15" && r.get(1).toString == "3.14")
    assert(r.getLong(2) == 4L)
    assert(r.getBoolean(3))
    assert(!r.getBoolean(4))
    assert(!r.getBoolean(5))
    assert(!r.getBoolean(6))
    // the INFIX spelling anchors too
    val ix = spark.sql(Transpiler.transpileSnowflake(
      "SELECT x RLIKE 'URGENT' AS a, x RLIKE '.*URGENT' AS b " +
        "FROM VALUES ('1-URGENT') AS t(x)")).head()
    assert(!ix.getBoolean(0) && ix.getBoolean(1))
  }

  test("snowflake CONVERT_TIMEZONE 3-arg passes through and executes") {
    val r = snow1("SELECT CONVERT_TIMEZONE('UTC', 'America/Los_Angeles', " +
      "TIMESTAMP'2024-01-15 12:00:00') AS t")
    // UTC noon is 04:00 Pacific (PST, UTC-8) — wallclock result
    assert(r.get(0).toString.startsWith("2024-01-15 04:00") ||
      r.get(0).toString.startsWith("2024-01-15T04:00"))
  }
}

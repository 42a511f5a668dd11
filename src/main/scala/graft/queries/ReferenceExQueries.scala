package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.dialect.Transpiler

/** EXECUTION-accuracy net over the reference's own prompt SQL — the
  * round-16 verdict's "execute the corpus, don't just parse it":
  * [[graft.dialect.ReferencePromptSqlSpec]] proves 30+ harvested
  * statements PARSE through the sqlite arm; this pack EXECUTES 47 of
  * them end-to-end on registered Spider/BIRD-style fixtures spanning
  * THREE schema pools — the college schema covering the DIN-SQL
  * prompt pool (plus city/accounts/singer/cards satellites), the
  * BIRD-style frpm/satscores + financial pools from the MAC-SQL
  * decompose templates, and the Spider concert_singer + academic
  * Paper/PaperAuthor pools — with DuckDB executing the SAME
  * statements over the SAME inline fixtures as the oracle.
  *
  * Statement sources (reference file:line): DIN-SQL easy/non-nested/
  * nested prompt examples incl. the decomposition-step statements
  * (core/actor/generator/DINSQLGenerate.py:234-449), MAC-SQL decompose
  * pools (MACSQLGenerate.py:243-331,378,416), OpenSearch examples
  * (OpenSearchSQLGenerate.py:124-130). The two DIN-SQL bare
  * non-grouped-column statements execute through the sqlite arm's
  * any_value rewrite since round 18 (the fixture keeps every bare
  * column functionally determined by its group key, so the
  * arbitrary-row pick is deterministic), and the formerly-last
  * parse-only statement — the OpenSearch style-aligner's bare
  * `ORDER BY spent` under GROUP BY — executes through the arm's
  * ORDER-BY any_value heal against a registered Author fixture.
  * EVERY harvested prompt statement now runs end-to-end.
  *
  * Comparison canon: each statement's result reduces to one row
  * `(stmt, n_rows, fp)` where `fp` is the '|'-joined SORTED list of
  * canonical row texts — strings verbatim, integers as decimal text,
  * doubles as round(x·10⁴) (the fixture makes every AVG exact, so the
  * scaling never meets an ulp boundary). Engine-specific result
  * column names disappear behind positional c0..cn aliases.
  */
object ReferenceExQueries extends QueryPack {

  private val NullTok = "<null>"

  /** One fixture table: name, columns as (name, kind) with kind
    * 'S' (varchar) or 'I' (int), and rows of matching literals.
    */
  private final case class Tbl(name: String, cols: Seq[(String, Char)],
      rows: Seq[Seq[Any]])

  // Spider college-2 style fixture. Shape constraints that keep the
  // EX comparison engine-deterministic:
  //  - every ORDER BY ... LIMIT key is UNIQUE at the cut (tot_cred,
  //    budgets, per-building capacities, course counts 4/2/1, section
  //    year counts 3/2, card spends);
  //  - every AVG is exact in binary (per-group sums divisible by
  //    group sizes; instructor total 420000 / 7 = 60000).
  private val tables: Seq[Tbl] = Seq(
    Tbl("classroom",
      Seq("building" -> 'S', "room_number" -> 'S', "capacity" -> 'I'),
      Seq(Seq("Watson", "100", 70), Seq("Watson", "120", 50),
        Seq("Painter", "514", 10), Seq("Painter", "515", 30),
        Seq("Taylor", "3128", 100), Seq("Taylor", "3130", 80))),
    Tbl("department",
      Seq("dept_name" -> 'S', "building" -> 'S', "budget" -> 'I'),
      Seq(Seq("History", "Watson", 50000), Seq("Marketing", "Taylor", 70000),
        Seq("Finance", "Painter", 120000), Seq("Physics", "Watson", 90000),
        Seq("math", "Taylor", 60000))),
    Tbl("course",
      Seq("course_id" -> 'S', "title" -> 'S', "dept_name" -> 'S',
        "credits" -> 'I'),
      Seq(Seq("CS-101", "Intro Systems", "Finance", 4),
        Seq("CS-201", "Data Structures", "Finance", 3),
        Seq("CS-315", "Robotics", "Finance", 3),
        Seq("CS-319", "Mobile Computing", "Finance", 3),
        Seq("HIS-101", "World History", "History", 3),
        Seq("HIS-201", "World History", "History", 4),
        Seq("PHY-101", "Mechanics", "Physics", 4))),
    Tbl("instructor",
      Seq("id" -> 'I', "name" -> 'S', "dept_name" -> 'S', "salary" -> 'I'),
      Seq(Seq(1, "Srinivasan", "History", 61000), Seq(2, "Wu", "History", 65000),
        Seq(3, "Mozart", "Marketing", 40000),
        Seq(4, "Einstein", "Marketing", 46000),
        Seq(5, "ElSaid", "Finance", 80000), Seq(6, "Gold", "Physics", 68000),
        Seq(7, "Soisalon-Soininen", "math", 60000))),
    Tbl("section",
      Seq("course_id" -> 'S', "sec_id" -> 'S', "semester" -> 'S',
        "year" -> 'I', "building" -> 'S', "room_number" -> 'S'),
      Seq(Seq("CS-101", "1", "Fall", 2009, "Taylor", "3128"),
        Seq("CS-101", "2", "Spring", 2010, "Watson", "100"),
        Seq("CS-319", "1", "Spring", 2010, "Taylor", "3130"),
        Seq("HIS-101", "1", "Fall", 2009, "Painter", "514"),
        Seq("PHY-101", "1", "Spring", 2010, "Watson", "120"))),
    Tbl("teaches",
      Seq("id" -> 'I', "course_id" -> 'S', "sec_id" -> 'S',
        "semester" -> 'S', "year" -> 'I'),
      Seq(Seq(1, "CS-101", "1", "Fall", 2009),
        Seq(2, "CS-101", "2", "Spring", 2010),
        Seq(3, "CS-319", "1", "Spring", 2010),
        Seq(4, "HIS-101", "1", "Fall", 2009),
        Seq(5, "PHY-101", "1", "Spring", 2010),
        Seq(6, "CS-201", "1", "Fall", 2008))),
    Tbl("student",
      Seq("id" -> 'I', "name" -> 'S', "dept_name" -> 'S', "tot_cred" -> 'I'),
      Seq(Seq(101, "Zhang", "History", 102), Seq(102, "Shankar", "Finance", 32),
        Seq(103, "Brown", "History", 80), Seq(104, "Chavez", "math", 110),
        Seq(105, "Peltier", "Physics", 56))),
    Tbl("takes",
      Seq("id" -> 'I', "course_id" -> 'S', "sec_id" -> 'S',
        "semester" -> 'S', "year" -> 'I', "grade" -> 'S'),
      Seq(Seq(101, "CS-101", "1", "Fall", 2009, "A"),
        Seq(102, "CS-101", "2", "Spring", 2010, "B"),
        Seq(103, "HIS-101", "1", "Fall", 2009, "C"),
        Seq(104, "CS-319", "1", "Spring", 2010, "A"),
        Seq(105, "PHY-101", "1", "Spring", 2010, "B"),
        Seq(102, "HIS-101", "1", "Fall", 2003, "B"))),
    Tbl("advisor", Seq("s_id" -> 'I', "i_id" -> 'I'),
      Seq(Seq(101, 1), Seq(102, 5), Seq(103, 2), Seq(104, 7), Seq(105, 6))),
    Tbl("prereq", Seq("course_id" -> 'S', "prereq_id" -> 'S'),
      Seq(Seq("CS-319", "CS-101"), Seq("CS-319", "CS-201"),
        Seq("HIS-201", "HIS-101"))),
    Tbl("city", Seq("status" -> 'S', "population" -> 'I'),
      Seq(Seq("Village", 1000), Seq("Town", 2000))),
    Tbl("accounts",
      Seq("account_id" -> 'I', "date_account_opened" -> 'S',
        "account_name" -> 'S', "other_account_details" -> 'S'),
      Seq(Seq(1, "2003-06-30", "338", "Regular"), Seq(2, "2005-02-15", "562", "VIP"))),
    Tbl("singer",
      Seq("song_name" -> 'S', "song_release_year" -> 'S', "age" -> 'I'),
      Seq(Seq("Sun", "2008", 27), Seq("Gentle", "2010", 32))),
    Tbl("cards", Seq("id" -> 'I', "spend" -> 'I'),
      Seq(Seq(1, 50), Seq(2, 120), Seq(3, 130), Seq(4, 140), Seq(5, 150),
        Seq(6, 160), Seq(7, 99))),
    // ---- second/third schema pools (round-18 EX-net growth) ----
    // BIRD frpm/satscores (MACSQLGenerate.py:216-266 decompose pool).
    // Rates are binary-exact (25/100, 75/100, 50/200) so the charter
    // average (0.5) and the > comparison never meet an ulp boundary.
    Tbl("frpm", Seq("CDSCode" -> 'S', "Charter School (Y/N)" -> 'I'),
      Seq(Seq("C1", 1), Seq("C2", 1), Seq("C3", 0))),
    Tbl("satscores",
      Seq("cds" -> 'S', "sname" -> 'S', "NumGE1500" -> 'I',
        "NumTstTakr" -> 'I'),
      Seq(Seq("C1", "Alpha Charter", 25, 100),
        Seq("C2", "Beta Charter", 75, 100),
        Seq("C3", "Gamma Public", 50, 200))),
    // BIRD financial (MACSQLGenerate.py:275-335): lowest-A11 district
    // unique, birth_dates globally distinct -> the ORDER BY ... LIMIT 1
    // statements are engine-deterministic
    Tbl("district", Seq("district_id" -> 'I', "A4" -> 'S', "A11" -> 'I'),
      Seq(Seq(1, "95907", 12541), Seq(2, "95616", 11277),
        Seq(3, "94812", 8114))),
    Tbl("client",
      Seq("client_id" -> 'I', "gender" -> 'S', "birth_date" -> 'S',
        "district_id" -> 'I'),
      Seq(Seq(10, "F", "1987-09-27", 3), Seq(11, "M", "1986-08-13", 3),
        Seq(12, "F", "1990-01-01", 1))),
    // Spider concert_singer (MACSQLGenerate.py:352-390): stadium 3 has
    // no concerts (inner-join drop); counts 2/1 distinct
    Tbl("stadium", Seq("Stadium_ID" -> 'I', "Name" -> 'S'),
      Seq(Seq(1, "Stark's Park"), Seq(2, "Somerset Park"),
        Seq(3, "Recreation Park"))),
    Tbl("concert", Seq("concert_ID" -> 'I', "Stadium_ID" -> 'I'),
      Seq(Seq(1, 1), Seq(2, 1), Seq(3, 2))),
    // academic Paper/PaperAuthor (OpenSearchSQLGenerate.py:127)
    Tbl("Paper", Seq("Id" -> 'I', "Year" -> 'I'),
      Seq(Seq(1, 0), Seq(2, 0), Seq(3, 1995))),
    Tbl("PaperAuthor", Seq("PaperId" -> 'I', "Name" -> 'S'),
      Seq(Seq(1, "A"), Seq(1, "B"), Seq(2, "C"), Seq(3, "D"))),
    // academic Author (OpenSearchSQLGenerate.py:130 style-aligner):
    // one row PER NAME so the bare ORDER BY spent's arbitrary-row
    // pick is functionally determined — any_value is deterministic
    Tbl("Author", Seq("Name" -> 'S', "Affiliation" -> 'S', "spent" -> 'I'),
      Seq(Seq("Ada", "University of Oxford", 40),
        Seq("Bob", "University of Oxford", 10),
        Seq("Cy", "MIT", 99))))

  /** One executed statement: id, the VERBATIM harvested SQL, and the
    * declared result-column kinds ('S' string, 'I' integer-like,
    * 'D' double) driving the canonicalization on both engines.
    * `duckSql` overrides the oracle-side text where DuckDB cannot run
    * the SQLite-ism verbatim (bare non-grouped SELECT columns — the
    * Spark side heals those through the sqlite arm's any_value
    * rewrite, the oracle mirrors it by hand).
    */
  private final case class Stmt(id: String, sql: String, kinds: Seq[Char],
      duckSql: Option[String] = None)

  private val stmts: Seq[Stmt] = Seq(
    // DINSQLGenerate.py:234-294 (easy)
    Stmt("e01", "SELECT DISTINCT building FROM classroom WHERE capacity  >  50", Seq('S')),
    Stmt("e02", "SELECT building ,  room_number FROM classroom WHERE capacity BETWEEN 50 AND 100", Seq('S', 'S')),
    Stmt("e03", "SELECT name FROM student WHERE dept_name  =  'History' ORDER BY tot_cred DESC LIMIT 1", Seq('S')),
    Stmt("e04", "SELECT sum(budget) FROM department WHERE dept_name  =  'Marketing' OR dept_name  =  'Finance'", Seq('I')),
    Stmt("e05", "SELECT dept_name FROM instructor WHERE name LIKE '%Soisalon%'", Seq('S')),
    Stmt("e06", "SELECT dept_name FROM course GROUP BY dept_name ORDER BY sum(credits) DESC LIMIT 1", Seq('S')),
    Stmt("e07", "SELECT COUNT (DISTINCT ID) FROM teaches WHERE semester  =  'Spring' AND YEAR  =  2010", Seq('I')),
    Stmt("e08", "SELECT name ,  dept_name FROM student ORDER BY tot_cred", Seq('S', 'S')),
    Stmt("e09", "SELECT YEAR FROM SECTION GROUP BY YEAR ORDER BY count(*) DESC LIMIT 1", Seq('I')),
    Stmt("e10", "SELECT dept_name ,  AVG (salary) FROM instructor GROUP BY dept_name HAVING AVG (salary)  >  42000", Seq('S', 'D')),
    Stmt("e11", "SELECT count(*) ,  building FROM classroom WHERE capacity  >  50 GROUP BY building", Seq('I', 'S')),
    Stmt("e12", "SELECT dept_name FROM course GROUP BY dept_name ORDER BY count(*) DESC LIMIT 3", Seq('S')),
    Stmt("e13", "SELECT max(capacity) ,  avg(capacity) ,  building FROM classroom GROUP BY building", Seq('I', 'D', 'S')),
    Stmt("e14", "SELECT title FROM course GROUP BY title HAVING count(*)  >  1", Seq('S')),
    Stmt("e15", "SELECT DISTINCT Status FROM city WHERE Population > 1500 AND Population < 500", Seq('S')),
    Stmt("e16", "SELECT account_id, date_account_opened, account_name, other_account_details FROM Accounts", Seq('I', 'S', 'S', 'S')),
    // DINSQLGenerate.py:300-357 (non-nested medium; the two bare
    // non-grouped-column statements execute below as m04a/m04b)
    Stmt("m01", "SELECT dept_name ,  building FROM department ORDER BY budget DESC LIMIT 1", Seq('S', 'S')),
    Stmt("m02", "SELECT dept_name ,  building FROM department WHERE budget  >  (SELECT avg(budget) FROM department)", Seq('S', 'S')),
    Stmt("m03", "SELECT count(DISTINCT T2.id) ,  count(DISTINCT T3.id) ,  T3.dept_name FROM department AS T1 JOIN student AS T2 ON T1.dept_name  =  T2.dept_name JOIN instructor AS T3 ON T1.dept_name  =  T3.dept_name GROUP BY T3.dept_name", Seq('I', 'I', 'S')),
    Stmt("m05", "SELECT DISTINCT T1.name FROM student AS T1 JOIN takes AS T2 ON T1.id  =  T2.id WHERE T2.YEAR  =  2009 OR T2.YEAR  =  2010", Seq('S')),
    Stmt("m06", "SELECT T1.title ,  T3.name FROM course AS T1 JOIN teaches AS T2 ON T1.course_id  =  T2.course_id JOIN instructor AS T3 ON T2.id  =  T3.id WHERE T2.YEAR  =  2008 ORDER BY T1.title", Seq('S', 'S')),
    Stmt("m07", "SELECT T1.name FROM instructor AS T1 JOIN advisor AS T2 ON T1.ID = T2.i_ID JOIN student AS T3 ON T2.s_ID = T3.ID WHERE T3.dept_name = 'math' ORDER BY T3.tot_cred", Seq('S')),
    // DINSQLGenerate.py:366-449 (nested)
    Stmt("n01", "SELECT id FROM teaches WHERE semester  =  'Fall' AND YEAR  =  2009 EXCEPT SELECT id FROM teaches WHERE semester  =  'Spring' AND YEAR  =  2010", Seq('I')),
    Stmt("n02", "SELECT title FROM course WHERE course_id NOT IN (SELECT course_id FROM prereq)", Seq('S')),
    Stmt("n03", "SELECT DISTINCT salary FROM instructor WHERE salary  <  (SELECT max(salary) FROM instructor)", Seq('I')),
    Stmt("n04", "SELECT name FROM student WHERE id IN (SELECT id FROM takes WHERE semester  =  'Fall' AND YEAR  =  2003)", Seq('S')),
    Stmt("n05", "SELECT min(salary) ,  dept_name FROM instructor GROUP BY dept_name HAVING avg(salary)  >  (SELECT avg(salary) FROM instructor)", Seq('I', 'S')),
    Stmt("n06", "SELECT title FROM course WHERE course_id IN (SELECT T1.prereq_id FROM prereq AS T1 JOIN course AS T2 ON T1.course_id  =  T2.course_id WHERE T2.title  =  'Mobile Computing')", Seq('S')),
    Stmt("n07", "SELECT T3.title ,  T3.credits FROM classroom AS T1 JOIN SECTION AS T2 ON T1.building  =  T2.building AND T1.room_number  =  T2.room_number JOIN course AS T3 ON T2.course_id  =  T3.course_id WHERE T1.capacity  =  (SELECT max(capacity) FROM classroom)", Seq('S', 'I')),
    // DINSQLGenerate.py:329,357 — SQLite's bare non-grouped SELECT
    // columns (parse-only until round 18): the sqlite arm rewrites
    // them to any_value, the oracle mirrors by hand; the fixture keeps
    // title/credits/dept_name functionally determined by course_id
    Stmt("m04a", "SELECT T1.title FROM course AS T1 JOIN prereq AS T2 ON T1.course_id  =  T2.course_id GROUP BY T2.course_id HAVING count(*)  =  2", Seq('S'),
      duckSql = Some("SELECT any_value(T1.title) FROM course AS T1 JOIN prereq AS T2 ON T1.course_id = T2.course_id GROUP BY T2.course_id HAVING count(*) = 2")),
    Stmt("m04b", "SELECT T1.title , T1.credits , T1.dept_name FROM course AS T1 JOIN prereq AS T2 ON T1.course_id = T2.course_id GROUP BY T2.course_id HAVING count(*) > 1", Seq('S', 'I', 'S'),
      duckSql = Some("SELECT any_value(T1.title), any_value(T1.credits), any_value(T1.dept_name) FROM course AS T1 JOIN prereq AS T2 ON T1.course_id = T2.course_id GROUP BY T2.course_id HAVING count(*) > 1")),
    // DINSQLGenerate.py:390-441 — the nested pool's decomposition-step
    // statements, verbatim ("The SQL query for the sub-question ...")
    Stmt("d01", "SELECT avg(budget) FROM department", Seq('D')),
    Stmt("d02", "SELECT avg(salary) FROM instructor", Seq('D')),
    Stmt("d03", "SELECT max(salary) FROM instructor", Seq('I')),
    Stmt("d04", "SELECT course_id FROM prereq", Seq('S')),
    Stmt("d05", "SELECT id FROM takes WHERE semester  =  'Fall' AND YEAR  =  2003", Seq('I')),
    Stmt("d06", "SELECT T1.prereq_id FROM prereq AS T1 JOIN course AS T2 ON T1.course_id  =  T2.course_id WHERE T2.title  =  'Mobile Computing'", Seq('S')),
    // MACSQLGenerate.py:416 (backtick identifiers)
    Stmt("mc2", "SELECT `Song_Name`, `Song_release_year` FROM singer WHERE Age = (SELECT MIN(Age) FROM singer)", Seq('S', 'S')),
    // MACSQLGenerate.py:378 — Spider concert_singer, bare Name under
    // GROUP BY Stadium_ID (the second schema pool's any_value case)
    Stmt("mcs", "SELECT T1.`Name`, COUNT(*) FROM stadium AS T1 JOIN concert AS T2 ON T1.`Stadium_ID` = T2.`Stadium_ID` GROUP BY T1.`Stadium_ID`", Seq('S', 'I'),
      duckSql = Some("SELECT any_value(T1.\"Name\"), COUNT(*) FROM stadium AS T1 JOIN concert AS T2 ON T1.\"Stadium_ID\" = T2.\"Stadium_ID\" GROUP BY T1.\"Stadium_ID\"")),
    // MACSQLGenerate.py:243-248 — BIRD frpm/satscores decompose pool,
    // verbatim including the prompt's indentation
    Stmt("ms1",
      "SELECT AVG(CAST(T2.`NumGE1500` AS REAL) / T2.`NumTstTakr`)\n    FROM frpm AS T1\n    INNER JOIN satscores AS T2\n    ON T1.`CDSCode` = T2.`cds`\n    WHERE T1.`Charter School (Y/N)` = 1",
      Seq('D')),
    // MACSQLGenerate.py:253-264 — the nested excellence-rate statement
    Stmt("ms2",
      "SELECT T2.`sname`\n  FROM frpm AS T1\n  INNER JOIN satscores AS T2\n  ON T1.`CDSCode` = T2.`cds`\n  WHERE T2.`sname` IS NOT NULL\n  AND T1.`Charter School (Y/N)` = 1\n  AND CAST(T2.`NumGE1500` AS REAL) / T2.`NumTstTakr` > (\n    SELECT AVG(CAST(T4.`NumGE1500` AS REAL) / T4.`NumTstTakr`)\n    FROM frpm AS T3\n    INNER JOIN satscores AS T4\n    ON T3.`CDSCode` = T4.`cds`\n    WHERE T3.`Charter School (Y/N)` = 1\n  )",
      Seq('S')),
    // MACSQLGenerate.py:305-331 — BIRD financial decompose steps
    Stmt("mf1", "SELECT `district_id`\n  FROM district\n  ORDER BY `A11` ASC\n  LIMIT 1", Seq('I')),
    Stmt("mf2", "SELECT T1.`client_id`\n  FROM client AS T1\n  INNER JOIN district AS T2\n  ON T1.`district_id` = T2.`district_id`\n  ORDER BY T2.`A11` ASC, T1.`birth_date` DESC \n  LIMIT 1", Seq('I')),
    Stmt("mf3", "SELECT T1.`gender`\n  FROM client AS T1\n  INNER JOIN district AS T2\n  ON T1.`district_id` = T2.`district_id`\n  ORDER BY T2.`A11` ASC, T1.`birth_date` DESC \n  LIMIT 1", Seq('S')),
    // OpenSearchSQLGenerate.py:124,127
    Stmt("os1", "SELECT id FROM cards WHERE spend > 100 ORDER BY spend LIMIT 5", Seq('I')),
    Stmt("os2", "SELECT COUNT(T2.Name) FROM Paper AS T1 INNER JOIN PaperAuthor AS T2 ON T1.Id = T2.PaperId WHERE T1.Year = 0", Seq('I')),
    // OpenSearchSQLGenerate.py:130 — the style-aligner example that
    // was the last parse-only statement: SQLite's bare ORDER BY spent
    // under GROUP BY Name (arbitrary-row sort key). The sqlite arm's
    // ORDER-BY any_value heal (batch 10) makes it analyzable; the
    // fixture keeps one row per Name so the pick is deterministic.
    Stmt("os3", "SELECT Name FROM Author WHERE Affiliation = 'University of Oxford' Group By Name ORDER BY spent ASC", Seq('S'),
      duckSql = Some("SELECT Name FROM Author WHERE Affiliation = 'University of Oxford' GROUP BY Name ORDER BY any_value(spent) ASC")))

  // ---- Spark side ---------------------------------------------------

  private def registerFixture(spark: SparkSession): Unit =
    tables.foreach { t =>
      val schema = org.apache.spark.sql.types.StructType(t.cols.map {
        case (n, 'I') => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.IntegerType)
        case (n, _) => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)
      })
      val rows = t.rows.map(r => org.apache.spark.sql.Row(r: _*))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
        .createOrReplaceTempView(t.name)
    }

  private def sparkCanon(i: Int, kind: Char): org.apache.spark.sql.Column =
    kind match {
      case 'S' => coalesce(col(s"c$i"), lit(NullTok))
      case 'I' => coalesce(col(s"c$i").cast("string"), lit(NullTok))
      case _ => coalesce(
        round(col(s"c$i") * 10000).cast("bigint").cast("string"),
        lit(NullTok))
    }

  private def sparkStmtRow(spark: SparkSession, st: Stmt): DataFrame = {
    val raw = spark.sql(Transpiler.transpileSqlite(st.sql))
    val df = raw.toDF(st.kinds.indices.map(i => s"c$i"): _*)
    df.select(concat_ws(",",
        st.kinds.zipWithIndex.map { case (k, i) => sparkCanon(i, k) }: _*)
      .as("rowtext"))
      .agg(count(lit(1)).as("n_rows"),
        array_join(sort_array(collect_list(col("rowtext"))), "|").as("fp"))
      .select(lit(st.id).as("stmt"), col("n_rows"), col("fp"))
  }

  // ---- DuckDB side --------------------------------------------------

  private def sqlLit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => other.toString
  }

  private def duckFixtureCtes: String =
    tables.map { t =>
      // quoted column names: the frpm pool carries `Charter School
      // (Y/N)` — spaces and parens; DuckDB matches identifiers
      // case-insensitively whether or not they were quoted at definition
      val colList = t.cols.map(c => "\"" + c._1.replace("\"", "\"\"") + "\"")
        .mkString(", ")
      val rows = t.rows
        .map(r => "(" + r.map(sqlLit).mkString(", ") + ")").mkString(",\n    ")
      s"${t.name}($colList) AS (VALUES\n    $rows)"
    }.mkString(",\n")

  private def duckCanon(i: Int, kind: Char): String = kind match {
    case 'S' => s"coalesce(c$i, '$NullTok')"
    case 'I' => s"coalesce(CAST(c$i AS VARCHAR), '$NullTok')"
    case _ =>
      s"coalesce(CAST(CAST(round(c$i * 10000) AS BIGINT) AS VARCHAR), '$NullTok')"
  }

  private def duckStmtRow(st: Stmt): String = {
    // DuckDB quotes identifiers with double quotes, not backticks;
    // bare-GROUP-BY SQLite-isms carry a hand-mirrored any_value form
    val sql = st.duckSql.getOrElse(st.sql).replace('`', '"')
    val cols = st.kinds.indices.map(i => s"c$i").mkString(", ")
    val canon = st.kinds.zipWithIndex
      .map { case (k, i) => duckCanon(i, k) }.mkString(", ")
    s"""SELECT '${st.id}' AS stmt, count(*) AS n_rows,
       |       coalesce(string_agg(rowtext, '|' ORDER BY rowtext), '') AS fp
       |FROM (SELECT concat_ws(',', $canon) AS rowtext
       |      FROM ($sql) AS t($cols))""".stripMargin
  }

  def queries: Seq[GQuery] = Seq(
    GQuery(
      "q_reference_prompt_ex",
      "Execution-accuracy net over 47 harvested reference-prompt SQLs " +
        "across three schema pools (DIN-SQL easy/medium/nested incl. " +
        "bare-GROUP-BY + decomposition steps on the college fixture; " +
        "MAC-SQL BIRD frpm/satscores + financial and Spider " +
        "concert_singer; OpenSearch cards + academic): each statement " +
        "runs through the sqlite arm and reduces to (stmt, n_rows, " +
        "sorted-canonical-rows fingerprint); DuckDB executes the same " +
        "statements (bare-column SQLite-isms hand-mirrored with " +
        "any_value) over the same inline fixtures.",
      (s, dir) => {
        registerFixture(s)
        stmts.map(st => sparkStmtRow(s, st))
          .reduce(_ unionAll _)
          .orderBy(col("stmt"))
      },
      Some {
        val rows = stmts.map(duckStmtRow).mkString("\nUNION ALL\n")
        s"WITH\n$duckFixtureCtes\n$rows\nORDER BY stmt"
      }),

    GQuery(
      "q_reference_prompt_evalx",
      "The reference's CENTRAL metric (eval_generate_execute_accuracy) " +
        "run over its own harvested prompt SQL: gold/pred pairs " +
        "through the sqlite-dialect Evaluator on the college fixture. " +
        "DuckDB COMPUTES the executable pairs' scores by running both " +
        "statements over the same inline fixture and comparing " +
        "multisets (EXCEPT ALL both ways); only the failure branches " +
        "(broken pred -> 0, broken gold -> excluded null) are declared, " +
        "their semantics being pinned by q_eval_ex.",
      (s, dir) => {
        import s.implicits._
        registerFixture(s)
        val g1 = "SELECT name FROM student WHERE dept_name  =  'History' ORDER BY tot_cred DESC LIMIT 1"
        val g2 = "SELECT sum(budget) FROM department WHERE dept_name  =  'Marketing' OR dept_name  =  'Finance'"
        // single-row by fixture construction: the Evaluator compares
        // ordered (reference default), and a multi-row DISTINCT with no
        // ORDER BY could legally reorder between two executions
        val g3 = "SELECT dept_name FROM instructor WHERE name LIKE '%Soisalon%'"
        val g4 = "SELECT COUNT (DISTINCT ID) FROM teaches WHERE semester  =  'Spring' AND YEAR  =  2010"
        val items = Seq(
          // textually different, same result → 1
          ("p1", g1, "SELECT student.name FROM student WHERE student.dept_name = 'History' ORDER BY tot_cred DESC LIMIT 1"),
          // wrong predicate, different aggregate → 0
          ("p2", g2, "SELECT sum(budget) FROM department WHERE dept_name = 'Marketing'"),
          // identical text → 1 (same plan, stable order)
          ("p3", g3, g3),
          // different but equivalent predicate → 1
          ("p4", g4, "SELECT COUNT(DISTINCT id) FROM teaches WHERE year = 2010 AND semester = 'Spring'"),
          // pred does not execute → 0
          ("p5", g4, "SELECT no_such_column FROM teaches"),
          // gold does not execute → excluded (null)
          ("p6", "SELECT broken FROM teaches", g4))
          .toDF("instance_id", "gold_sql", "pred_sql")
        new graft.evalx.Evaluator(s, dialect = "sqlite").evalDataFrame(items)
          .select(col("instance_id"), col("score"))
          .orderBy(col("instance_id"))
      },
      Some {
        def cmp(id: String, gold: String, pred: String): String =
          s"""SELECT '$id' AS instance_id,
             |  CASE WHEN (SELECT count(*) FROM (($gold) EXCEPT ALL ($pred)) tx) = 0
             |        AND (SELECT count(*) FROM (($pred) EXCEPT ALL ($gold)) ty) = 0
             |       THEN 1 ELSE 0 END AS score""".stripMargin
        val g1 = "SELECT name FROM student WHERE dept_name = 'History' ORDER BY tot_cred DESC LIMIT 1"
        val g2 = "SELECT sum(budget) FROM department WHERE dept_name = 'Marketing' OR dept_name = 'Finance'"
        val g3 = "SELECT dept_name FROM instructor WHERE name LIKE '%Soisalon%'"
        val g4 = "SELECT COUNT(DISTINCT ID) FROM teaches WHERE semester = 'Spring' AND YEAR = 2010"
        val computed = Seq(
          cmp("p1", g1, "SELECT student.name FROM student WHERE student.dept_name = 'History' ORDER BY tot_cred DESC LIMIT 1"),
          cmp("p2", g2, "SELECT sum(budget) FROM department WHERE dept_name = 'Marketing'"),
          cmp("p3", g3, g3),
          cmp("p4", g4, "SELECT COUNT(DISTINCT id) FROM teaches WHERE year = 2010 AND semester = 'Spring'"))
          .mkString("\nUNION ALL\n")
        s"""WITH
           |$duckFixtureCtes
           |$computed
           |UNION ALL SELECT 'p5', 0
           |UNION ALL SELECT 'p6', CAST(NULL AS INT)
           |ORDER BY instance_id""".stripMargin
      }))
}

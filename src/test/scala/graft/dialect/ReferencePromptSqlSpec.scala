package graft.dialect

import graft.SparkSpec

/** Every COMPLETE example SQL embedded in the reference's prompt
  * families, harvested verbatim and run through the matching dialect
  * arm → Spark's parser — the closest offline proxy to real
  * Spider/BIRD gold SQL, grounding the transpiler against the
  * reference's actual dialect envelope rather than self-authored
  * cases. Sources (reference file:line):
  *   - DIN-SQL easy/non-nested/nested prompt examples
  *     (core/actor/generator/DINSQLGenerate.py:234-449 and the same
  *     pool in core/actor/scaler/DINSQLScale.py:23-133)
  *   - MAC-SQL backtick-quoted examples
  *     (core/actor/generator/MACSQLGenerate.py:378,416)
  *   - OpenSearch-SQL style-aligner examples
  *     (core/actor/generator/OpenSearchSQLGenerate.py:124-130,1356-1362)
  * All are Spider-family (SQLite) prompts → the sqlite-strict arm.
  * Parsing is analysis-free (unresolved tables are fine); a syntax
  * error the arm failed to heal is not.
  */
class ReferencePromptSqlSpec extends SparkSpec {

  // DINSQLGenerate.py:234-294 (easy split; Scale.py:23-59 repeats most)
  private val dinEasy = Seq(
    "SELECT DISTINCT building FROM classroom WHERE capacity  >  50",
    "SELECT building ,  room_number FROM classroom WHERE capacity BETWEEN 50 AND 100",
    "SELECT name FROM student WHERE dept_name  =  'History' ORDER BY tot_cred DESC LIMIT 1",
    "SELECT sum(budget) FROM department WHERE dept_name  =  'Marketing' OR dept_name  =  'Finance'",
    "SELECT dept_name FROM instructor WHERE name LIKE '%Soisalon%'",
    "SELECT dept_name FROM course GROUP BY dept_name ORDER BY sum(credits) DESC LIMIT 1",
    "SELECT COUNT (DISTINCT ID) FROM teaches WHERE semester  =  'Spring' AND YEAR  =  2010",
    "SELECT name ,  dept_name FROM student ORDER BY tot_cred",
    "SELECT YEAR FROM SECTION GROUP BY YEAR ORDER BY count(*) DESC LIMIT 1",
    "SELECT dept_name ,  AVG (salary) FROM instructor GROUP BY dept_name HAVING AVG (salary)  >  42000",
    "SELECT count(*) ,  building FROM classroom WHERE capacity  >  50 GROUP BY building",
    "SELECT dept_name FROM course GROUP BY dept_name ORDER BY count(*) DESC LIMIT 3",
    "SELECT max(capacity) ,  avg(capacity) ,  building FROM classroom GROUP BY building",
    "SELECT title FROM course GROUP BY title HAVING count(*)  >  1",
    "SELECT DISTINCT Status FROM city WHERE Population > 1500 AND Population < 500",
    "SELECT account_id, date_account_opened, account_name, other_account_details FROM Accounts")

  // DINSQLGenerate.py:300-357 (non-nested medium split, join-heavy)
  private val dinMedium = Seq(
    "SELECT dept_name ,  building FROM department ORDER BY budget DESC LIMIT 1",
    "SELECT dept_name ,  building FROM department WHERE budget  >  (SELECT avg(budget) FROM department)",
    "SELECT count(DISTINCT T2.id) ,  count(DISTINCT T3.id) ,  T3.dept_name FROM department AS T1 JOIN student AS T2 ON T1.dept_name  =  T2.dept_name JOIN instructor AS T3 ON T1.dept_name  =  T3.dept_name GROUP BY T3.dept_name",
    "SELECT T1.title FROM course AS T1 JOIN prereq AS T2 ON T1.course_id  =  T2.course_id GROUP BY T2.course_id HAVING count(*)  =  2",
    "SELECT DISTINCT T1.name FROM student AS T1 JOIN takes AS T2 ON T1.id  =  T2.id WHERE T2.YEAR  =  2009 OR T2.YEAR  =  2010",
    "SELECT T1.title ,  T3.name FROM course AS T1 JOIN teaches AS T2 ON T1.course_id  =  T2.course_id JOIN instructor AS T3 ON T2.id  =  T3.id WHERE T2.YEAR  =  2008 ORDER BY T1.title",
    "SELECT T1.name FROM instructor AS T1 JOIN advisor AS T2 ON T1.ID = T2.i_ID JOIN student AS T3 ON T2.s_ID = T3.ID WHERE T3.dept_name = 'math' ORDER BY T3.tot_cred",
    "SELECT T1.title , T1.credits , T1.dept_name FROM course AS T1 JOIN prereq AS T2 ON T1.course_id = T2.course_id GROUP BY T2.course_id HAVING count(*) > 1")

  // DINSQLGenerate.py:366-449 (nested split, set ops + subqueries;
  // Scale.py:98-133 repeats several)
  private val dinNested = Seq(
    "SELECT id FROM teaches WHERE semester  =  'Fall' AND YEAR  =  2009 EXCEPT SELECT id FROM teaches WHERE semester  =  'Spring' AND YEAR  =  2010",
    "SELECT title FROM course WHERE course_id NOT IN (SELECT course_id FROM prereq)",
    "SELECT DISTINCT salary FROM instructor WHERE salary  <  (SELECT max(salary) FROM instructor)",
    "SELECT name FROM student WHERE id IN (SELECT id FROM takes WHERE semester  =  'Fall' AND YEAR  =  2003)",
    "SELECT min(salary) ,  dept_name FROM instructor GROUP BY dept_name HAVING avg(salary)  >  (SELECT avg(salary) FROM instructor)",
    "SELECT title FROM course WHERE course_id IN (SELECT T1.prereq_id FROM prereq AS T1 JOIN course AS T2 ON T1.course_id  =  T2.course_id WHERE T2.title  =  'Mobile Computing')",
    "SELECT T3.title ,  T3.credits FROM classroom AS T1 JOIN SECTION AS T2 ON T1.building  =  T2.building AND T1.room_number  =  T2.room_number JOIN course AS T3 ON T2.course_id  =  T3.course_id WHERE T1.capacity  =  (SELECT max(capacity) FROM classroom)")

  // MACSQLGenerate.py:378,416 (backtick-quoted identifiers)
  private val macsql = Seq(
    "SELECT T1.`Name`, COUNT(*) FROM stadium AS T1 JOIN concert AS T2 ON T1.`Stadium_ID` = T2.`Stadium_ID` GROUP BY T1.`Stadium_ID`",
    "SELECT `Song_Name`, `Song_release_year` FROM singer WHERE Age = (SELECT MIN(Age) FROM singer)")

  // OpenSearchSQLGenerate.py:124-130 (repeated at 1356-1362)
  private val opensearch = Seq(
    "SELECT id FROM cards WHERE spend > 100 ORDER BY spend LIMIT 5",
    "SELECT COUNT(T2.Name) FROM Paper AS T1 INNER JOIN PaperAuthor AS T2 ON T1.Id = T2.PaperId WHERE T1.Year = 0",
    "SELECT Name FROM Author WHERE Affiliation = 'University of Oxford' Group By Name ORDER BY spent ASC",
    // MACSQLScale.py:226 / RSLSQLScale.py:285 fallback statement
    "SELECT * FROM table LIMIT 1")

  private def parses(sql: String, via: String): Unit =
    try { spark.sessionState.sqlParser.parsePlan(sql); () }
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        fail(s"[$via] harvested prompt SQL does not parse after the arm:\n" +
          s"$sql\n${e.getMessage.take(300)}")
    }

  test("all harvested reference-prompt SQLs parse through the sqlite arm") {
    val all = dinEasy ++ dinMedium ++ dinNested ++ macsql ++ opensearch
    assert(all.size >= 30, s"harvest shrank to ${all.size} — keep it >= 30")
    all.foreach { sql =>
      parses(Transpiler.transpileSqlite(sql), "sqlite")
      // the shared arm must not break Spider-gold SQL either
      parses(Transpiler.transpile(sql), "shared")
    }
  }

  test("the harvest is arm-idempotent (no paren/alias accumulation)") {
    val all = dinEasy ++ dinMedium ++ dinNested ++ macsql ++ opensearch
    all.foreach { sql =>
      val once = Transpiler.transpileSqlite(sql)
      assert(Transpiler.transpileSqlite(once) == once,
        s"sqlite arm not idempotent on harvested SQL: $sql ->\n$once")
    }
  }
}

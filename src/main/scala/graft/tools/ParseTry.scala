package graft.tools

import scala.util.{Failure, Success, Try}

import graft.core.GraftSession

/** Scratch: parse/execute candidate SQL forms against Spark. */
object ParseTry {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("parse-try", cores = 4)
    val parser = spark.sessionState.sqlParser
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    val cases = Seq(
      "SELECT * FROM t, LATERAL POSEXPLODE(t.a) AS (index, value) JOIN u ON u.x = value",
      "SELECT * FROM t, LATERAL EXPLODE(t.a) AS (value)",
      "SELECT * EXCEPT (b) FROM t",
      "SELECT arr[5] FROM (SELECT array(1,2) AS arr)",
      "SELECT try_element_at(array(1,2), 6)"
    )
    cases.foreach { c =>
      Try(parser.parsePlan(c)) match {
        case Success(_) => println(s"OK   $c")
        case Failure(e) =>
          println(s"FAIL $c :: ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ").take(160)}")
      }
    }
    import spark.implicits._
    Seq((1, Seq(10, 20), 2)).toDF("id", "a", "b").createOrReplaceTempView("t")
    Seq((10, "x")).toDF("x", "lbl").createOrReplaceTempView("u")
    for (q <- Seq(
      "SELECT index, value FROM t, LATERAL POSEXPLODE(t.a) AS (index, value)",
      "SELECT * EXCEPT (b) FROM t",
      "SELECT arr[5] AS oob FROM (SELECT array(1,2) AS arr)")) {
      Try(spark.sql(q).collect().mkString(";")) match {
        case Success(r) => println(s"EXEC OK $q => $r")
        case Failure(e) => println(s"EXEC FAIL $q :: ${e.getMessage.take(160)}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import java.nio.file.{Files, Paths}

import scala.util.{Failure, Success, Try}

import graft.core.GraftSession
import graft.dialect.ExemplarCorpus

/** Diagnostic: run every harvested exemplar `# [Sql]:` statement
  * through its dialect arm and Spark's parser, printing per-arm
  * analyzable counts and every failure (file + first error line).
  * Feeds the ExemplarCorpusSpec floors; not part of the bench.
  */
object ExemplarProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("exemplar-probe", cores = 4)
    val parser = spark.sessionState.sqlParser
    val all = ExemplarCorpus.load()
    val byArm = all.groupBy(_.arm)
    byArm.toSeq.sortBy(_._1).foreach { case (arm, es) =>
      var ok = 0
      val fails = scala.collection.mutable.ArrayBuffer[(String, String)]()
      es.foreach { e =>
        Try {
          val t = ExemplarCorpus.transpiled(e)
          parser.parsePlan(t)
        } match {
          case Success(_) => ok += 1
          case Failure(ex) =>
            val msg = Option(ex.getMessage).getOrElse(ex.getClass.getName)
              .linesIterator.take(3).mkString(" | ").take(300)
            fails += ((e.file, msg))
        }
      }
      println(s"== $arm: $ok/${es.size} parse-analyzable")
      fails.foreach { case (f, m) => println(s"  FAIL $f :: $m") }
      // dump failing transpiled statements for offline inspection
      val dumpDir = Paths.get("target/tmp/exemplar_fails")
      Files.createDirectories(dumpDir)
      fails.foreach { case (f, m) =>
        val e = es.find(_.file == f).get
        val t = Try(ExemplarCorpus.transpiled(e)).getOrElse("<transpile threw>")
        Files.write(dumpDir.resolve(f.replace('/', '_')),
          s"-- FILE: $f\n-- ERR: $m\n-- RAW:\n${e.sql}\n-- TRANSPILED:\n$t\n"
            .getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}

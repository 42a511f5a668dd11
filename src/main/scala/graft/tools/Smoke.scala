package graft.tools

import graft.catalog.Tables
import graft.core.GraftSession
import graft.evalx.ResultComparator
import graft.exec.{ExecErr, ExecOk, SqlBackend}

/** End-to-end smoke drive of the engine's SQL front door: dialect
  * transpile → execute → render → EX-compare two candidate results.
  * Run: sbt "runMain graft.tools.Smoke [sfDir]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build("graft-smoke", 4)
    Tables.registerAll(spark, sfDir)
    val be = new SqlBackend(spark)

    val sqliteIsm =
      "SELECT c_mktsegment, GROUP_CONCAT(c_name) AS names " +
        "FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 3) " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    be.runDialect(sqliteIsm) match {
      case ExecOk(df, sec) =>
        println(f"[smoke] sqlite-dialect query OK in $sec%.2fs:")
        df.show(truncate = false)
      case ExecErr(e, _) => println(s"[smoke] FAILED: $e"); sys.exit(1)
    }

    println("[smoke] introspection: " + be.runToString("PRAGMA table_info(region)"))

    val a = be.runDialect("SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag")
    val b = be.runDialect("SELECT COUNT(*) AS n, l_returnflag FROM lineitem GROUP BY l_returnflag")
    (a, b) match {
      case (ExecOk(da, _), ExecOk(db, _)) =>
        val eq = ResultComparator.equivalent(da, db, ignoreOrder = true)
        println(s"[smoke] EX-equivalence of column-permuted candidates = $eq (expect 1)")
        val fa = ResultComparator.columnFingerprints(da)
        val fb = ResultComparator.columnFingerprints(db)
        println(s"[smoke] fingerprint match = ${fa("n") == fb("n") && fa("l_returnflag") == fb("l_returnflag")} (expect true)")
        if (eq != 1 || fa("n") != fb("n")) sys.exit(1)
      case _ => println("[smoke] candidate exec failed"); sys.exit(1)
    }
    val entryRows = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] flagship entry rows = $entryRows (expect > 0)")
    if (entryRows == 0) sys.exit(1)

    spark.stop()
    println("[smoke] OK")
  }
}

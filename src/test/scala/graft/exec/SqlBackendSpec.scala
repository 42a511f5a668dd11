package graft.exec

import graft.SparkSpec
import graft.catalog.Tables

class SqlBackendSpec extends SparkSpec {
  lazy val backend: SqlBackend = {
    Tables.registerAll(spark, sfDir)
    new SqlBackend(spark)
  }

  test("run returns ExecOk with a lazy DataFrame") {
    val r = backend.run("SELECT COUNT(*) AS n FROM lineitem")
    assert(r.isSuccess)
    assert(r.asInstanceOf[ExecOk].df.collect()(0).getLong(0) == 6000L)
  }

  test("analysis errors become ExecErr values, not throws") {
    val r = backend.run("SELECT no_such_col FROM lineitem")
    assert(!r.isSuccess)
    assert(r.errorMessage.get.contains("no_such_col"))
    val r2 = backend.run("THIS IS NOT SQL")
    assert(!r2.isSuccess)
  }

  test("runDialect transpiles sqlite-isms end to end") {
    val r = backend.runDialect(
      "SELECT IIF(l_quantity > 25, 'big', 'small') AS sz, COUNT(*) AS n " +
        "FROM lineitem GROUP BY sz ORDER BY sz")
    assert(r.isSuccess)
    val rows = r.asInstanceOf[ExecOk].df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("big", "small"))
  }

  test("runDialect rewrites QUALIFY") {
    val r = backend.runDialect(
      "SELECT o_custkey, o_totalprice FROM orders " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 1")
    assert(r.isSuccess, r.errorMessage)
    val df = r.asInstanceOf[ExecOk].df
    assert(df.columns.toSeq == Seq("o_custkey", "o_totalprice"))
    val custs = df.collect().map(_.getLong(0))
    assert(custs.length == custs.distinct.length) // one row per customer
  }

  test("introspection shims answer PRAGMA and sqlite_master probes") {
    val info = backend.runDialect("PRAGMA table_info(lineitem)")
    assert(info.isSuccess)
    val names = info.asInstanceOf[ExecOk].df.collect().map(_.getString(1)).toSeq
    assert(names.contains("l_orderkey") && names.contains("l_shipdate"))

    val tables = backend.runDialect("SELECT name FROM sqlite_master WHERE type='table'")
    assert(tables.isSuccess)
    val tnames = tables.asInstanceOf[ExecOk].df.collect().map(_.getString(0)).toSet
    assert(Tables.all.toSet.subsetOf(tnames))
  }

  test("INFO_SCHEMA.COLUMNS projection honors aliases, qualifiers and DISTINCT") {
    // aliased: positional reader must get column_name under the alias
    val aliased = backend.runDialect(
      "SELECT column_name AS c FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'region'")
    assert(aliased.isSuccess)
    val adf = aliased.asInstanceOf[ExecOk].df
    assert(adf.columns.toSeq == Seq("c"))
    assert(adf.collect().map(_.getString(0)).contains("r_name"))

    // qualified: `c.column_name` resolves to column_name
    val qualified = backend.runDialect(
      "SELECT c.column_name, c.data_type FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'region'")
    assert(qualified.isSuccess)
    val qdf = qualified.asInstanceOf[ExecOk].df
    assert(qdf.columns.toSeq == Seq("column_name", "data_type"))

    // DISTINCT select list still projects (not the 5-column fallback)
    val distinct = backend.runDialect(
      "SELECT DISTINCT table_name FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'region'")
    assert(distinct.isSuccess)
    val ddf = distinct.asInstanceOf[ExecOk].df
    assert(ddf.columns.toSeq == Seq("table_name"))
    assert(ddf.count() == 1)

    // unresolvable item: full layout fallback, never an error
    val fallback = backend.runDialect(
      "SELECT no_such_col FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'region'")
    assert(fallback.isSuccess)
    assert(fallback.asInstanceOf[ExecOk].df.columns.length == 5)
  }

  test("runToString renders results and the empty-result convention") {
    val s = backend.runToString("SELECT r_name FROM region ORDER BY r_name")
    assert(s.startsWith("r_name"))
    val empty = backend.runToString("SELECT r_name FROM region WHERE r_name = 'NOPE'")
    assert(empty.contains("No data found"))
    val err = backend.runToString("SELECT * FROM not_a_table")
    assert(err.startsWith("Execution error:"))
    // 1x1 result renders as a bare scalar (reference shortcut)
    assert(backend.runToString("SELECT COUNT(*) FROM region") == "5")
    assert(backend.runToString("SELECT NULL AS x") == "NULL")
  }

  test("runCollect enforces timeout via job-group cancel") {
    // A tiny query finishes well within the timeout
    val ok = backend.runCollect("SELECT 1 AS one", timeoutSec = 60)
    assert(ok.isSuccess)
  }
}

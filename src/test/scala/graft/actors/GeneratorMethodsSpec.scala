package graft.actors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.{SchemaCodec, Tables}
import graft.exec.SqlBackend
import graft.llm.MockLlm

/** Method-specific generator mechanics + schema codec. */
class GeneratorMethodsSpec extends SparkSpec {

  private lazy val backend = {
    Tables.registerAll(spark, sfDir)
    new SqlBackend(spark)
  }

  private def schemaOf(n: Int, tables: Int) = {
    import spark.implicits._
    (0 until n).map(i => (s"t${i % tables}", s"c$i", "TEXT"))
      .toDF("table_name", "column_name", "column_types")
  }

  test("central→parallel codec: star offset, composite PKs, FK rendering") {
    val central = SchemaCodec.CentralSchema(
      dbId = "db1",
      tableNamesOriginal = Seq("users", "orders"),
      columnNamesOriginal = Seq((-1, "*"), (0, "id"), (0, "name"), (1, "uid")),
      columnTypes = Seq("number", "text", "number"),
      primaryKeys = Seq(Seq(1), Seq(3)), // star-offset indices
      foreignKeys = Seq((3, 1)))
    val cols = SchemaCodec.centralToParallel(central)
    assert(cols.map(_.columnName) == Seq("id", "name", "uid"))
    assert(cols.head.primaryKey && cols(2).primaryKey && !cols(1).primaryKey)
    assert(cols(2).foreignKey == "[users(id)]")
    val df = SchemaCodec.toDF(spark, cols)
    assert(df.columns.contains("table_name") && df.count() == 3)
  }

  test("fromRegisteredTables harvests a central record with star marker") {
    Tables.registerAll(spark, sfDir)
    val central = SchemaCodec.fromRegisteredTables(spark, "tpch", Seq("region", "nation"))
    assert(central.columnNamesOriginal.head == ((-1, "*")))
    assert(central.tableNamesOriginal == Seq("region", "nation"))
    // round trip: parallel rows carry the right tables
    val back = SchemaCodec.centralToParallel(central)
    assert(back.count(_.tableName == "region") == spark.table("region").schema.length)
    assert(back.count(_.tableName == "nation") == spark.table("nation").schema.length)
  }

  test("MAC-SQL prune heuristic thresholds and link-based pruning") {
    assert(!MacSqlPrune.needsPrune(schemaOf(12, 3)))  // 3 tables → no
    assert(MacSqlPrune.needsPrune(schemaOf(40, 5)))   // 5 tables, 40 cols → yes
    assert(MacSqlPrune.needsPrune(schemaOf(28, 4)))   // avg 7 > 6 → yes
    assert(!MacSqlPrune.needsPrune(schemaOf(20, 4)))  // avg 5, 20 cols → no
    val pruned = MacSqlPrune.prune(schemaOf(40, 5), Seq("t0.c0", "t1.c1"))
    assert(pruned.select("table_name").distinct().collect()
      .map(_.getString(0)).toSet == Set("t0", "t1"))
  }

  test("DIN-SQL tier classification drives the generation prompt") {
    val llm = MockLlm(playbook = Seq(
      "Classify the question" -> "NON-NESTED",
      "[NON-NESTED]" -> "SELECT a FROM t JOIN u ON t.id = u.id"))
    assert(DinSqlMethod.classify(llm, "q", Nil) == "NON-NESTED")
    assert(DinSqlMethod.generate(llm, "schema", "q", Nil).startsWith("SELECT a FROM t JOIN"))
    assert(DinSqlMethod.classify(MockLlm(default = "garbage"), "q", Nil) == "NESTED")
  }

  test("ReFoRCE explores via engine-executed probes then refines") {
    val llm = MockLlm(playbook = Seq(
      "probe SQLs" -> "[SELECT DISTINCT r_name FROM region LIMIT 20, SELECT COUNT(*) FROM region]",
      "Probe results" -> "SELECT COUNT(*) AS n FROM region"))
    val probes = ReForce.explore(llm, backend, "schema", "q")
    assert(probes.length == 2)
    assert(probes(1)._2 == "5") // scalar shortcut on COUNT(*)
    assert(ReForce.generate(llm, backend, "schema", "q") == "SELECT COUNT(*) AS n FROM region")
  }

  test("Recursive stage0 per-table drafts + stageN combine with execution feedback") {
    import spark.implicits._
    val schema = Seq(("region", "r_name", "TEXT"), ("nation", "n_name", "TEXT"))
      .toDF("table_name", "column_name", "column_types")
    val llm = MockLlm(playbook = Seq(
      "ONLY this table" -> "SELECT 1",
      "Combine these per-table" -> "SELECT broken FROM region",
      "The combined SQL failed" -> "SELECT r_name FROM region"))
    val parts = RecursiveMethod.stage0(llm, schema, "q", Seq("region", "nation"))
    assert(parts.keySet == Set("region", "nation"))
    val combined = RecursiveMethod.stageN(llm, backend, "q", parts)
    assert(combined == "SELECT r_name FROM region") // repaired on feedback
  }

  test("LinkAlign response filtering flags pairs per chunk") {
    val schema = schemaOf(10, 2)
    val llm = MockLlm(default = "[t0.c0, t1.c3, not_a_pair]")
    val flagged = ResponseFilter.flaggedPairs(llm, schema, "q", chunkSize = 5)
    val pairs = flagged.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("t0", "c0"), ("t1", "c3")))
    // feeds straight into the reducer's anti-filter
    val kept = graft.operators.RowOps.antiFilter(schema, flagged,
      Seq("table_name", "column_name"))
    assert(kept.count() == 8)
  }
}

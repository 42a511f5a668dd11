package graft.actors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.exec.SqlBackend
import graft.llm.MockLlm

/** Generator/optimizer/selector family over the real backend with mock
  * LLMs: repair loops, meta-SQL decomposition, vote/tournament/debate
  * selection, single-record serving.
  */
class GenerateSelectSpec extends SparkSpec {

  private lazy val backend = {
    Tables.registerAll(spark, sfDir)
    new SqlBackend(spark)
  }

  private lazy val schemaDf = {
    import spark.implicits._
    Seq(("region", "r_regionkey", "INTEGER"), ("region", "r_name", "TEXT"))
      .toDF("table_name", "column_name", "column_types")
  }

  test("debugByFeedback repairs a broken SQL using error history") {
    val llm = MockLlm(playbook = Seq(
      "Error history" -> "SELECT r_name FROM region"))
    val (ok, fixed, hist) = SqlDebug.debugByFeedback(
      backend, llm, "names", "schema", "SELECT nope FROM region")
    assert(ok && fixed == "SELECT r_name FROM region" && hist.length == 1)
    assert(hist.head._2.nonEmpty)
    // already-valid SQL returns untouched with empty history
    val (ok2, same, h2) = SqlDebug.debugByFeedback(
      backend, llm, "q", "s", "SELECT 1 AS x")
    assert(ok2 && same == "SELECT 1 AS x" && h2.isEmpty)
  }

  test("generator + optimizer actors write pred_sql per row") {
    import spark.implicits._
    val qs = Seq(("i1", "how many regions")).toDF("instance_id", "question")
    val gen = LlmGenerator(MockLlm(default = "SELECT COUNT(*) FROM nope_table"), schemaDf)
    val generated = gen.act(qs)
    assert(generated.select("pred_sql").head().getString(0).contains("nope_table"))

    val opt = OptimizeActors.macsql(
      MockLlm(playbook = Seq("Error history" -> "SELECT COUNT(*) AS n FROM region")),
      backend, schemaDf)
    val repaired = opt.act(generated)
    assert(repaired.select("pred_sql").head().getString(0) == "SELECT COUNT(*) AS n FROM region")
  }

  test("decomposer extends sub_questions; scaler dedupes candidates") {
    import spark.implicits._
    val qs = Seq(("i1", "q")).toDF("instance_id", "question")
    val dec = LlmDecomposer(MockLlm(default = "[first part, second part]")).act(qs)
    assert(dec.select("sub_questions").head().getSeq[String](0) ==
      Seq("first part", "second part"))
    val sc = LlmScaler(MockLlm(playbook = Seq(
      "Variant 0" -> "SELECT 1", "Variant 1" -> "SELECT 1", "Variant 2" -> "SELECT 2")),
      generateNum = 3).act(qs)
    assert(sc.select("pred_sql_list").head().getSeq[String](0) == Seq("SELECT 1", "SELECT 2"))
  }

  test("AdaptiveOptimize: meta-SQL decomposition, feedback, triage") {
    val metas = AdaptiveOptimize.metaSqls(
      "SELECT a FROM (SELECT a FROM t WHERE x IN (SELECT y FROM u)) z")
    assert(metas.length == 3)
    assert(metas.head.startsWith("SELECT a FROM t"))
    assert(metas(1) == "SELECT y FROM u")

    val fb = AdaptiveOptimize.feedback(backend,
      "SELECT r_name FROM (SELECT r_name FROM region) t")
    assert(fb.forall(_._2.isRight))

    assert(AdaptiveOptimize.classify("ParseException: bad syntax near") == "syntax")
    assert(AdaptiveOptimize.classify("AnalysisException: cannot be resolved") == "schema")
    assert(AdaptiveOptimize.classify("ArithmeticException: divide by zero") == "logic")
  }

  test("majorityVote picks agreement group; LLM breaks leader ties") {
    val sel = SelectActors.majorityVote(spark, Seq(
      "SELECT COUNT(*) FROM region",
      "SELECT COUNT(*) FROM region WHERE 1 = 1",
      "SELECT COUNT(*) FROM region WHERE r_regionkey > 100",
      "SELECT kaput FROM region"))
    assert(sel == Some("SELECT COUNT(*) FROM region"))
    val tied = SelectActors.majorityVote(spark, Seq(
      "SELECT 1 AS a", "SELECT 2 AS a"), llm = Some(MockLlm(default = "1")))
    assert(tied == Some("SELECT 2 AS a"))
  }

  test("chaseTournament dedups by result group and lets the judge pick") {
    val winner = SelectActors.chaseTournament(spark,
      MockLlm(default = "B"), "count regions", Seq(
        "SELECT COUNT(*) FROM region",
        "SELECT COUNT(*) FROM region", // same group — no extra duel
        "SELECT COUNT(*) - 1 FROM region"))
    assert(winner == Some("SELECT COUNT(*) - 1 FROM region")) // judge said B
  }

  test("agentDebate returns judged index; serving handles one record end to end") {
    val pick = SelectActors.agentDebate(spark, MockLlm(
      playbook = Seq("Reply with the index" -> "1", "Argue briefly" -> "it is right")),
      "q", Seq("SELECT 1 AS x", "SELECT 2 AS x"))
    assert(pick == Some("SELECT 2 AS x"))

    val serving = new Serving(spark,
      LlmGenerator(MockLlm(default = "SELECT COUNT(*) AS n FROM region"), schemaDf))
    val out = serving.handle("s1", "how many regions",
      goldSql = Some("SELECT COUNT(*) AS n FROM region"))
    assert(out == Right(("SELECT COUNT(*) AS n FROM region", Some(1))))
  }
}

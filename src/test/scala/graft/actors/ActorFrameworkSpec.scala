package graft.actors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.MockLlm
import graft.tasks.{ComplexTask, ExecProcess, MetaTask, ParallelTask, SequenceTask}

/** Composition framework: merge strategies, pipeline/tree/group, task
  * graph + exec_process grammar, workflow agents with a mock planner.
  */
class ActorFrameworkSpec extends SparkSpec {

  import MergeStrategy._

  private lazy val questions = {
    import spark.implicits._
    Seq(
      ("q1", "select name from users where id = 7", 120L),
      ("q2", "count orders by region last month", 450L),
      ("q3", "", 80L),
      ("q4", "top suppliers by revenue", 300L))
      .toDF("instance_id", "question", "db_size")
  }

  test("pipeline: filter -> slice -> link parse end to end") {
    val out = PipelineActor(Seq(
      FilterReducer("question.db_size-me-100"),
      SliceParser("instance_id", 2),
      RegexLinkParser("question", "[a-z]+s\\b"))).act(questions)
    val rows = out.orderBy("instance_id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("q1", "q2", "q4")) // q3 empty question dropped
    assert(out.columns.contains("slice_id") && out.columns.contains("schema_links"))
    assert(rows.find(_.getString(0) == "q2").get
      .getSeq[String](out.columns.indexOf("schema_links")).contains("orders"))
  }

  test("merge strategies: overwrite replaces, extend concatenates") {
    val gen = TemplateGenerator("SELECT '{}' AS q", Seq("instance_id"))
    val once = Actor.applyMerged(gen, questions)
    val twice = Actor.applyMerged(gen, once)
    assert(twice.select("pred_sql").head().getString(0).startsWith("SELECT '"))

    val scaled = Actor.applyMerged(VariantScaler(Seq(" -- v1", " -- v2")), once)
    val rescaled = Actor.applyMerged(VariantScaler(Seq(" -- v3")), scaled)
    val arr = rescaled.filter(col("instance_id") === "q1")
      .select("pred_sql_list").head().getSeq[String](0)
    assert(arr.length == 3 && arr.last.endsWith("-- v3"))
  }

  test("tree actor groups same-output branches and merges distinct links") {
    val tree = TreeActor(Seq(
      RegexLinkParser("question", "[a-z]+s\\b"),
      RegexLinkParser("question", "order[a-z]*"),
      TemplateGenerator("Q:{}", Seq("question"))))
    val out = tree.act(questions)
    val q2 = out.filter(col("instance_id") === "q2").head()
    val links = q2.getSeq[String](out.columns.indexOf("schema_links"))
    assert(links.distinct.length == links.length) // deduped
    assert(links.contains("orders"))
    assert(q2.getString(out.columns.indexOf("pred_sql")).startsWith("Q:"))
  }

  test("exec_process grammar parses and runs sequence/parallel trees") {
    val n = ExecProcess.parse("[t1,[t2,t3,~p],~s]")
    assert(n == ExecProcess.Branch(Seq(
      ExecProcess.Leaf("t1"),
      ExecProcess.Branch(Seq(ExecProcess.Leaf("t2"), ExecProcess.Leaf("t3")), parallel = true)),
      parallel = false))

    val reg = Map(
      "t1" -> (MetaTask("t1", questions, FilterReducer("question")): graft.tasks.Task),
      "t2" -> MetaTask("t2", questions, SliceParser("instance_id", 2)),
      "t3" -> ComplexTask("t3", questions, Seq(
        RegexLinkParser("question", "[a-z]+"), TemplateGenerator("X{}", Seq("instance_id")))))
    val outs = ExecProcess.run("[t1,[t2,t3,~p],~s]", reg)
    assert(outs.keySet == Set("t1", "t2", "t3"))
    assert(outs("t1").count() == 3)
    assert(outs("t3").columns.contains("pred_sql"))
  }

  test("meta task failure becomes error_info, not a throw") {
    val bad = MetaTask("boom", questions, FilterReducer("no_such_field-me-1"))
    val out = bad.run()("boom")
    assert(out.columns.contains("error_info"))
  }

  test("workflow agents: registry resolve, fork-gather with mock planner") {
    ActorPool.register("KeepAllReducer", () => ZeroReducer())
    ActorPool.register("ShortQReducer", () => FilterReducer("question_length-l-30"))
    val wf = WorkflowAgent("reducer: KeepAllReducer; ShortQReducer")
    assert(wf.run(questions).count() == 2)

    val agent = ForkGatherAgent(MockLlm(default =
      "NopeActor; AlsoNope\nKeepAllReducer; ShortQReducer"))
    assert(!agent.validate("NopeActor"))
    val out = agent.run("shrink the question set", questions)
    assert(out.isRight && out.toOption.get.count() == 2)

    val multi = MultiWorkflowAgent(Seq("KeepAllReducer"))
    assert(multi.run(questions).isRight)
  }
}

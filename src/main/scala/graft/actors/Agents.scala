package graft.actors

import org.apache.spark.sql.DataFrame

import graft.llm.LlmClient

/** Config-driven workflow agents (reference
  * `core/actor/agent/WorkflowAgent.py` / `ForkGatherAgent.py`): build
  * actor pipelines from declarative specs; the planner (LLM) only
  * chooses WHICH registered actors run — execution is always Spark.
  */

/** Declarative pipeline from a spec string of registered actor names,
  * e.g. "FilterReducer; SliceParser" (reference WorkflowAgent's
  * `"reducer: LinkAlignReducer"` stage list,
  * `core/actor/agent/WorkflowAgent.py:24-157`).
  */
final case class WorkflowAgent(spec: String,
    resolve: String => Option[Actor] = ActorPool.create) {

  val actors: Seq[Actor] = spec.split(";").map(_.trim).filter(_.nonEmpty).toSeq
    .map { token =>
      // accept "family: Name" or bare "Name"
      val name = token.split(":").last.trim
      resolve(name).getOrElse(
        throw new IllegalArgumentException(s"unknown actor '$name' " +
          s"(registered: ${ActorPool.registered.mkString(", ")})"))
    }

  def run(ds: DataFrame): DataFrame = PipelineActor(actors, "workflow").act(ds)
}

/** Run several workflows on the same input and pick one output
  * (reference `MultiWorkflowAgent`, `WorkflowAgent.py:159-305`): the
  * selector is pluggable; default picks the first workflow whose run
  * succeeds (error-as-value, never throws).
  */
final case class MultiWorkflowAgent(specs: Seq[String],
    select: Seq[(String, Either[String, DataFrame])] => Either[String, DataFrame] =
      MultiWorkflowAgent.firstSuccess) {

  def run(ds: DataFrame): Either[String, DataFrame] = {
    val outcomes = specs.map { spec =>
      spec -> (try Right(WorkflowAgent(spec).run(ds))
      catch { case scala.util.control.NonFatal(e) => Left(s"$spec: ${e.getMessage}") })
    }
    select(outcomes)
  }
}

object MultiWorkflowAgent {
  def firstSuccess(outcomes: Seq[(String, Either[String, DataFrame])]): Either[String, DataFrame] =
    outcomes.collectFirst { case (_, Right(df)) => Right(df) }
      .getOrElse(Left(outcomes.map(_._2.left.getOrElse("")).mkString(" | ")))
}

/** Plan → validate → fork → gather (reference `ForkGatherAgent`,
  * `core/actor/agent/ForkGatherAgent.py:16-326`): an LLM plans candidate
  * workflows from the SKILL registry; invalid plans are rejected against
  * the registry (`validate_response_str` analog); valid ones run
  * (fork) and a selector gathers the winner. The LLM is behind
  * `LlmClient` so tests use a mock; execution never depends on it.
  */
final case class ForkGatherAgent(llm: LlmClient, maxPlans: Int = 3) {

  /** Prompt the planner with the skill registry; one plan per line. */
  def plan(goal: String): Seq[String] = {
    val skills = ActorPool.gatherSkills()
      .map { case (n, s) => s"$n: $s" }.mkString("\n")
    val raw = llm.complete(
      s"Available actors:\n$skills\nGoal: $goal\n" +
        "Reply with one workflow per line, actors separated by ';'.")
    raw.linesIterator.map(_.trim).filter(_.nonEmpty).take(maxPlans).toSeq
      .filter(validate)
  }

  /** A plan is valid iff every referenced actor is registered. */
  def validate(spec: String): Boolean =
    spec.split(";").map(_.split(":").last.trim).filter(_.nonEmpty)
      .forall(n => ActorPool.create(n).isDefined)

  def run(goal: String, ds: DataFrame): Either[String, DataFrame] = {
    val plans = plan(goal)
    if (plans.isEmpty) Left("no valid plans")
    else MultiWorkflowAgent(plans).run(ds)
  }
}

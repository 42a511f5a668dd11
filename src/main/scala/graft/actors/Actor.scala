package graft.actors

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-merge semantics (reference `core/actor/base.py:109-162`):
  * how an actor's fresh output combines with an existing column of the
  * same name. In Spark the per-item results dict becomes columns, so
  * overwrite/append/extend are column expressions, not dict ops.
  */
sealed trait MergeStrategy
object MergeStrategy {
  /** Replace the old value. */
  case object Overwrite extends MergeStrategy
  /** old (scalar or array) + [new scalar] → array. */
  case object Append extends MergeStrategy
  /** old array ++ new array. */
  case object Extend extends MergeStrategy
}

/** An operator over a question/record dataset (reference `Actor` ABC,
  * `core/actor/base.py:10-53`). The reference's per-item
  * `act(item, **ctx)` loop is vectorized: `act` transforms the WHOLE
  * dataset (one Spark plan), writing `outputName` when the actor is
  * column-producing (generators/parsers) or reshaping rows when it is a
  * dataset operator (reducers/filters, outputName = None analog: "").
  */
trait Actor {
  def name: String
  def outputName: String = ""
  def strategy: MergeStrategy = MergeStrategy.Overwrite
  /** One-line capability doc (the reference's SKILL, used by planners). */
  def skill: String = name
  def act(ds: DataFrame): DataFrame
}

object Actor {

  /** Apply an actor respecting its merge strategy
    * (`MergeFunction.merge_result` analog).
    */
  def applyMerged(actor: Actor, ds: DataFrame): DataFrame = {
    val out = actor.outputName
    if (out.isEmpty || !ds.columns.contains(out) ||
        actor.strategy == MergeStrategy.Overwrite)
      return actor.act(ds)
    val old = s"__old_$out"
    val acted = actor.act(ds.withColumnRenamed(out, old))
    val merged = actor.strategy match {
      case MergeStrategy.Append =>
        // old may be scalar or array; normalize old to array, append new
        concat(
          when(col(old).isNull, array().cast(s"array<string>"))
            .otherwise(arrayOf(acted, old)),
          array(col(out).cast("string")))
      case MergeStrategy.Extend =>
        concat(coalesce(col(old), array().cast("array<string>")), col(out))
      case MergeStrategy.Overwrite => col(out)
    }
    acted.withColumn(out, merged).drop(old)
  }

  private def arrayOf(ds: DataFrame, c: String) = {
    import org.apache.spark.sql.types.ArrayType
    ds.schema(c).dataType match {
      case _: ArrayType => col(c).cast("array<string>")
      case _ => array(col(c).cast("string"))
    }
  }
}

/** Global actor registry (reference `ActorPool`,
  * `core/actor/base.py:165-205`): name → factory, with the per-family
  * suffix syntax check (`*Reducer`/`*Parser`/... naming convention) and
  * SKILL export for planners.
  */
object ActorPool {
  val FamilySuffixes = Seq(
    "Reducer", "Parser", "Generator", "Decomposer", "Scaler", "Optimizer", "Selector", "Actor")

  private val registry = scala.collection.concurrent.TrieMap[String, () => Actor]()

  def register(name: String, factory: () => Actor): Unit = {
    require(FamilySuffixes.exists(name.endsWith),
      s"actor name '$name' must end with one of $FamilySuffixes")
    registry(name) = factory
  }

  def create(name: String): Option[Actor] = registry.get(name).map(_())
  def registered: Seq[String] = registry.keys.toSeq.sorted

  /** SKILL docstrings for agent planning (`gather_skills`). */
  def gatherSkills(): Map[String, String] =
    registry.map { case (n, f) => n -> f().skill }.toMap
}

/** Sequential composition (reference `PipelineActor`,
  * `core/actor/nest/pipeline.py:28-72`): each actor's output dataset
  * feeds the next; merge strategies apply per stage.
  */
final case class PipelineActor(actors: Seq[Actor],
    override val name: String = "pipeline") extends Actor {
  override def skill: String = actors.map(_.name).mkString(" -> ")
  def act(ds: DataFrame): DataFrame =
    actors.foldLeft(ds)((d, a) => Actor.applyMerged(a, d))
}

/** Same-family parallel group (reference `ActorGroup`,
  * `core/actor/nest/tree.py:175-341`): run N same-type actors on the
  * same input and merge outputs. Parse-flavored merge dedups link
  * arrays (`nest/tree.py:273-275`): array_distinct of the concatenation.
  */
final case class ActorGroup(actors: Seq[Actor],
    override val name: String = "group",
    dedupArrays: Boolean = true) extends Actor {
  require(actors.nonEmpty)
  override val outputName: String = actors.head.outputName

  def act(ds: DataFrame): DataFrame = {
    val out = outputName
    require(out.nonEmpty && actors.forall(_.outputName == out),
      "ActorGroup requires a shared output column")
    val acted = actors.map(a => a.act(ds))
    // rowwise merge: rename each actor's output, join back on key-free
    // positional identity is unsafe — require an instance_id column.
    val key = "instance_id"
    val merged = acted.zipWithIndex
      .map { case (d, i) => d.select(col(key), col(out).as(s"__o$i")) }
      .reduceLeft((a, b) => a.join(b, key))
    val outs = acted.indices.map(i => col(s"__o$i"))
    val combined =
      if (dedupArrays) array_distinct(concat(outs.map(o => coalesce(o, array().cast("array<string>"))): _*))
      else concat(outs: _*)
    ds.drop(out).join(
      merged.withColumn(out, combined).select(col(key), col(out)), key)
  }
}

/** Fan-out composition (reference `TreeActor`,
  * `core/actor/nest/tree.py:54-172`): group same-family actors into
  * ActorGroups (`group_partition`), run every branch on the same input
  * concurrently (Spark jobs in driver futures), and merge all outputs
  * into the dataset keyed by instance_id (the reference's
  * `update_dataset(..., merge_dataset=True)` rowwise merge).
  */
final case class TreeActor(branches: Seq[Actor],
    override val name: String = "tree",
    maxWorkers: Int = 3) extends Actor {

  def act(ds: DataFrame): DataFrame = {
    val key = "instance_id"
    val grouped = TreeActor.groupPartition(branches)
    val pool = Executors.newFixedThreadPool(math.max(maxWorkers, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val outs =
      try Await.result(
        Future.sequence(grouped.map(a => Future(a -> Actor.applyMerged(a, ds)))),
        Duration.Inf)
      finally pool.shutdown()
    outs.foldLeft(ds) { case (acc, (a, out)) =>
      if (a.outputName.isEmpty) acc // dataset-reshaping branches merge nothing
      else acc.drop(a.outputName)
        .join(out.select(col(key), col(a.outputName)), key)
    }
  }
}

object TreeActor {
  /** Group same-output actors into ActorGroups (`group_partition`). */
  def groupPartition(actors: Seq[Actor]): Seq[Actor] =
    actors.groupBy(_.outputName).toSeq.sortBy(_._1).flatMap {
      case ("", singles) => singles
      case (_, Seq(single)) => Seq(single)
      case (out, group) => Seq(ActorGroup(group, s"group_$out"))
    }
}

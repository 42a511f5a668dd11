package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

import graft.evalx.ResultComparator
import graft.exec.{ExecErr, ExecOk, SqlBackend}

/** Candidate selection by execution — the reference's `FastExecSelector`
  * (`core/actor/selector/FastExecSelect.py:104-192`): execute N candidate
  * SQLs, group by result-equivalence, pick the fastest member of the
  * largest group (all-distinct degenerates to fastest overall).
  *
  * Differences from the reference, by design:
  *  - results are never collected: equivalence keys are the distributed
  *    commutative column fingerprints (order-insensitive, 1e-2-rounded,
  *    column-NAME-insensitive via sorted multiset), so candidate results
  *    can be arbitrarily large;
  *  - grouping uses symmetric fingerprint equality — a true equivalence
  *    relation — where the reference's asymmetric subset-column compare
  *    can produce order-dependent groupings.
  */
object FastExecSelect {

  final case class CandidateExec(
      index: Int,
      sql: String,
      seconds: Double,
      error: Option[String],
      fingerprint: Option[Seq[Long]])

  final case class Selection(
      index: Int,
      sql: String,
      seconds: Double,
      groupIndices: Seq[Int],
      groupSize: Int)

  /** Execute all candidates (bounded driver pool — each is a distributed
    * job) and fingerprint their results.
    */
  def execCandidates(spark: SparkSession, sqls: Seq[String],
      timeoutSec: Int = 60, parallelism: Int = 5): Seq[CandidateExec] = {
    val backend = new SqlBackend(spark, timeoutSec)
    val pool = Executors.newFixedThreadPool(math.max(parallelism, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      Await.result(Future.sequence(sqls.zipWithIndex.map { case (sql, i) =>
        Future {
          val t0 = System.nanoTime()
          backend.run(graft.dialect.Transpiler.transpile(sql)) match {
            case ExecOk(df, _) =>
              try {
                val fp = ResultComparator.columnFingerprints(df).values.toSeq.sorted
                CandidateExec(i, sql, (System.nanoTime() - t0) / 1e9, None, Some(fp))
              } catch {
                case scala.util.control.NonFatal(e) =>
                  CandidateExec(i, sql, (System.nanoTime() - t0) / 1e9,
                    Some(e.getClass.getSimpleName), None)
              }
            case ExecErr(e, sec) => CandidateExec(i, sql, sec, Some(e), None)
          }
        }
      }), Duration.Inf)
    } finally pool.shutdown()
  }

  /** Largest equivalence group, fastest member. Deterministic tie-breaks:
    * equal-size groups → the one containing the fastest candidate;
    * equal latency → smallest index.
    */
  def select(spark: SparkSession, sqls: Seq[String],
      timeoutSec: Int = 60, parallelism: Int = 5): Option[Selection] = {
    val execs = execCandidates(spark, sqls, timeoutSec, parallelism)
    groupAndPick(execs)
  }

  /** Pure selection logic over executed candidates (unit-testable). */
  def groupAndPick(execs: Seq[CandidateExec]): Option[Selection] = {
    val ok = execs.filter(e => e.error.isEmpty && e.fingerprint.isDefined)
    if (ok.isEmpty) return None
    val groups = ok.groupBy(_.fingerprint.get).values.toSeq
    val best = groups.maxBy(g => (g.size, -g.map(_.seconds).min))
    val winner = best.minBy(e => (e.seconds, e.index))
    Some(Selection(winner.index, winner.sql, winner.seconds,
      best.map(_.index).sorted, best.size))
  }
}

package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Session-level registry for persisted frames whose lifetime outlives
  * the operator that created them.
  *
  * Several operators persist an intermediate frame because the RETURNED
  * (lazy) plan consumes it more than once — e.g. the tokenized corpus
  * feeding both a frequency table and a score join, or a shingle table
  * feeding both sides of a banded join. The operator cannot unpersist
  * before returning (the caller has not executed the plan yet) and the
  * caller holds no handle to the intermediate. Left alone, a long-lived
  * serving/ingestion session accumulates MEMORY_AND_DISK blocks until
  * executor storage is exhausted.
  *
  * Contract: operators register such frames via [[track]]; whoever
  * MATERIALIZES the returned frame (the Verify/Bench runners, the
  * serving pipeline, a batch job between actions) calls [[drain]] once
  * the results are on disk / collected. Draining between benchmark runs
  * also keeps timings honest — a re-run starts cold instead of silently
  * reusing the previous run's cache.
  *
  * Frames with a bounded in-operator lifetime (e.g. the k-means Lloyd
  * loop base) should keep their local try/finally and never touch this.
  */
object CacheBin {

  private val bin = new ConcurrentLinkedQueue[DataFrame]()

  /** Register an already-persisted frame for deferred release. */
  def track(df: DataFrame): DataFrame = { bin.add(df); df }

  /** Number of tracked, not-yet-released frames (for specs). */
  def pending: Int = bin.size()

  /** Unpersist every tracked frame. Safe to call at any point between
    * actions; a subsequent action on a drained plan just recomputes.
    */
  def drain(blocking: Boolean = false): Unit = {
    var df = bin.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = bin.poll()
    }
  }
}

package graft.util

/** Task-id hash helpers (reference `core/utils.py:237-247`) and a thin
  * structured logger facade (reference `core/log.py` — here delegating
  * to log4j, which Spark already configures).
  */
object Hashes {

  /** Map any index to a stable Int in [100, 999]
    * (`throw_hash_id`: `(ind ^ (ind >> 3)) * 2654435761 % 900 + 100`).
    */
  def throwHashId(ind: Long): Int = {
    val h = (ind ^ (ind >> 3)) * 2654435761L
    ((h % 900 + 900) % 900 + 100).toInt
  }

  /** Timestamp-derived unique-ish key (`timestamp_hash_key`): seconds
    * mod 1e6 concatenated with a 2-digit salt.
    */
  def timestampHashKey(nowSec: Long = System.currentTimeMillis() / 1000,
      salt: Int = scala.util.Random.nextInt(100)): Long =
    s"${nowSec % 1000000}${"%02d".format(salt)}".toLong
}

object GraftLog {
  private val log = org.apache.logging.log4j.LogManager.getLogger("graft")
  def info(msg: => String): Unit = log.info(msg)
  def warn(msg: => String): Unit = log.warn(msg)
  def error(msg: => String): Unit = log.error(msg)
}

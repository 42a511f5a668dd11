package graft.operators

/** Subprocess body for LeaseKillSpec: holds the compaction lease the
  * way a real owner's files look on disk (create-exclusive with a
  * token, then mtime heartbeats), so the parent can SIGKILL a REAL
  * process mid-heartbeat and exercise takeover against the exact
  * state a crashed owner leaves. `mode = lock` additionally leaves a
  * takeover LOCK behind (a contender crashed inside the takeover
  * critical section). No Spark in here — the protocol is defined by
  * file contents and mtimes, and a bare JVM starts fast enough to
  * iterate the kill loop.
  */
object LeaseKillHolder {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val beatMs = args(1).toLong
    val mode = if (args.length > 2) args(2) else "hold"
    val token = java.util.UUID.randomUUID().toString
    val lease = new java.io.File(dir, TextDedup.CompactionLeaseFile)
    java.nio.file.Files.createFile(lease.toPath)
    java.nio.file.Files.write(lease.toPath, token.getBytes("UTF-8"))
    if (mode == "lock") {
      val lock = new java.io.File(dir, TextDedup.TakeoverLockFile)
      java.nio.file.Files.createFile(lock.toPath)
      java.nio.file.Files.write(lock.toPath, token.getBytes("UTF-8"))
    }
    println(s"HOLDING $token")
    System.out.flush()
    while (true) {
      Thread.sleep(beatMs)
      if (mode == "hold") { lease.setLastModified(System.currentTimeMillis()); () }
    }
  }
}

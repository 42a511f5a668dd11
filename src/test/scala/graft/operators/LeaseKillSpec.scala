package graft.operators

import java.io.File
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.SparkSpec

/** The lease protocol against a REAL process death: LeaseStressSpec
  * races threads, this spec SIGKILLs a subprocess holding the lease
  * mid-heartbeat and proves (over repeated iterations) that
  *   - while the holder lives, acquisition is refused;
  *   - after the kill the lease stops renewing, goes stale, and is
  *     taken over cleanly — the new token lands in the lease file and
  *     no takeover-lock or tombstone litter survives;
  *   - a holder killed INSIDE the takeover critical section (stale
  *     lease + stale lock on disk) is also recovered from, via the
  *     lock's rename-to-tombstone arbitration.
  */
class LeaseKillSpec extends SparkSpec {

  private val Beat = 100L

  private def launchHolder(dir: String, mode: String): Process = {
    val javaBin = new File(new File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val pb = new ProcessBuilder(javaBin, "-cp",
      System.getProperty("java.class.path"),
      "graft.operators.LeaseKillHolder", dir, Beat.toString, mode)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val line = br.readLine() // blocks until the lease exists on disk
    assert(line != null && line.startsWith("HOLDING"), s"holder failed: $line")
    p
  }

  private def assertCleanTakeover(idx: String, staleMs: Long,
      killedAt: Long): Unit = {
    // wait past the stale threshold (local-FS mtimes can truncate to
    // seconds, which only makes the lease look OLDER — safe direction)
    while (System.currentTimeMillis() - killedAt <= staleMs + 300)
      Thread.sleep(50)
    val token = TextDedup.acquireCompactionLease(spark, idx, staleMs)
    val lease = new File(idx, TextDedup.CompactionLeaseFile)
    assert(Files.readString(lease.toPath) === token,
      "lease file must carry the NEW owner's token after takeover")
    val litter = new File(idx).list()
      .filter(_.startsWith(TextDedup.TakeoverLockFile))
    assert(litter.isEmpty, s"takeover left lock/tombstone litter: ${litter.toSeq}")
    TextDedup.releaseCompactionLease(spark, idx, token)
    assert(!lease.exists(), "release by the rightful owner must clear the lease")
  }

  test("SIGKILL mid-heartbeat: stale after death, clean takeover, 12 iterations") {
    val base = Files.createTempDirectory("lease-kill").toString
    (0 until 12).foreach { iter =>
      val idx = s"$base/idx$iter"
      new File(idx).mkdirs()
      val p = launchHolder(idx, "hold")
      try {
        val lease = new File(idx, TextDedup.CompactionLeaseFile)
        // the holder is genuinely heartbeating: mtime advances
        val m0 = lease.lastModified()
        val deadline = System.currentTimeMillis() + 10000
        while (lease.lastModified() <= m0 &&
            System.currentTimeMillis() < deadline) Thread.sleep(25)
        assert(lease.lastModified() > m0, s"iter $iter: no heartbeat observed")
        // live holder -> acquisition refused
        intercept[IllegalStateException] {
          TextDedup.acquireCompactionLease(spark, idx, staleMs = 60000L)
        }
        p.destroyForcibly()
        assert(p.waitFor(10, TimeUnit.SECONDS), s"iter $iter: kill hung")
        val killedAt = System.currentTimeMillis()
        // dead but not yet stale -> still refused
        intercept[IllegalStateException] {
          TextDedup.acquireCompactionLease(spark, idx, staleMs = 60000L)
        }
        assertCleanTakeover(idx, staleMs = 1200L, killedAt)
      } finally { p.destroyForcibly(); () }
    }
  }

  test("SIGKILL inside the takeover critical section: stale lock cleared via tombstone") {
    val base = Files.createTempDirectory("lease-kill-lock").toString
    (0 until 6).foreach { iter =>
      val idx = s"$base/idx$iter"
      new File(idx).mkdirs()
      // holder leaves BOTH a lease and a takeover lock, renews neither
      val p = launchHolder(idx, "lock")
      try {
        p.destroyForcibly()
        assert(p.waitFor(10, TimeUnit.SECONDS), s"iter $iter: kill hung")
        assertCleanTakeover(idx, staleMs = 1200L,
          killedAt = System.currentTimeMillis())
      } finally { p.destroyForcibly(); () }
    }
  }
}

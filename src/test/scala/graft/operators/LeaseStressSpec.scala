package graft.operators

import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}

import graft.SparkSpec

/** Concurrency stress for the compaction-lease takeover protocol: the
  * rename-to-tombstone arbitration is correct by construction
  * (TextDedup.acquireCompactionLease), but construction arguments do
  * not survive refactors — racing real threads does. Each seeded
  * iteration races N contenders at a stale lease and asserts the
  * protocol's three invariants:
  *   1. exactly ONE contender wins;
  *   2. a FRESH lease (the winner's) is never deleted by a loser or by
  *      the paused ex-owner's release;
  *   3. the paused ex-owner fails its pre-swap ownership verify and
  *      must abort instead of racing the winner's swap.
  */
class LeaseStressSpec extends SparkSpec {

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def leaseFile(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/${TextDedup.CompactionLeaseFile}")

  test("N simultaneous takeovers of a stale lease: one winner, fresh lease survives, ex-owner aborts") {
    val iterations = 25
    val contenders = 8
    val base = java.nio.file.Files.createTempDirectory("lease-stress").toString
    (0 until iterations).foreach { iter =>
      val idx = s"$base/idx$iter"
      fs(idx).mkdirs(new org.apache.hadoop.fs.Path(idx))
      // a crashed owner left a stale lease behind
      val dead = TextDedup.acquireCompactionLease(spark, idx,
        TextDedup.DefaultLeaseStaleMs)
      fs(idx).setTimes(leaseFile(idx),
        System.currentTimeMillis() - TextDedup.DefaultLeaseStaleMs - 60000L, -1)

      // race: all contenders hit the stale lease at the same instant
      val start = new CyclicBarrier(contenders)
      val done = new CountDownLatch(contenders)
      val wins = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val losses = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until contenders).map { i =>
        val t = new Thread(() => {
          try {
            start.await(30, TimeUnit.SECONDS)
            wins.add(TextDedup.acquireCompactionLease(spark, idx,
              TextDedup.DefaultLeaseStaleMs))
          } catch {
            case e: IllegalStateException => losses.add(e)
          } finally done.countDown()
        }, s"lease-contender-$iter-$i")
        t.start(); t
      }
      assert(done.await(60, TimeUnit.SECONDS), s"iter $iter: contenders hung")
      threads.foreach(_.join(10000))

      // invariant 1: exactly one winner, everyone else saw a clean loss
      assert(wins.size == 1,
        s"iter $iter: ${wins.size} contenders think they own the lease")
      assert(losses.size == contenders - 1)
      val winner = wins.peek()
      assert(fs(idx).exists(leaseFile(idx)),
        s"iter $iter: the winner's fresh lease vanished in the race")

      // invariant 3: the paused ex-owner fails its pre-swap verify
      val abort = intercept[IllegalStateException](
        TextDedup.verifyLeaseOwner(spark, idx, dead))
      assert(abort.getMessage.contains("taken over"))
      // ... and the winner's pre-swap verify passes
      TextDedup.verifyLeaseOwner(spark, idx, winner)

      // invariant 2: neither the ex-owner's release nor a loser's
      // release may delete the winner's fresh lease
      TextDedup.releaseCompactionLease(spark, idx, dead)
      assert(fs(idx).exists(leaseFile(idx)),
        s"iter $iter: ex-owner release deleted the winner's lease")
      val notOwner = java.util.UUID.randomUUID().toString
      TextDedup.releaseCompactionLease(spark, idx, notOwner)
      assert(fs(idx).exists(leaseFile(idx)),
        s"iter $iter: non-owner release deleted the winner's lease")
      // the winner's own release works
      TextDedup.releaseCompactionLease(spark, idx, winner)
      assert(!fs(idx).exists(leaseFile(idx)))
    }
  }

  test("a crashed takeover LOCK plus a stale lease: one winner through the lock-clear rename") {
    // the reviewer-found weapon: the old code DELETED a stale takeover
    // lock, and that pending delete could land on a successor's fresh
    // lock, double-admitting contenders; the clear is now an atomic
    // rename. Seed BOTH artifacts stale and race the full protocol.
    val iterations = 20
    val contenders = 8
    val base = java.nio.file.Files.createTempDirectory("lock-stress").toString
    (0 until iterations).foreach { iter =>
      val idx = s"$base/idx$iter"
      fs(idx).mkdirs(new org.apache.hadoop.fs.Path(idx))
      val dead = TextDedup.acquireCompactionLease(spark, idx,
        TextDedup.DefaultLeaseStaleMs)
      val past = System.currentTimeMillis() -
        TextDedup.DefaultLeaseStaleMs - 60000L
      fs(idx).setTimes(leaseFile(idx), past, -1)
      // a contender crashed mid-takeover holding the lock
      val lockP = new org.apache.hadoop.fs.Path(
        s"$idx/${TextDedup.TakeoverLockFile}")
      val out = fs(idx).create(lockP, false)
      out.write("crashed-contender".getBytes); out.close()
      fs(idx).setTimes(lockP, past, -1)

      val start = new CyclicBarrier(contenders)
      val done = new CountDownLatch(contenders)
      val wins = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (0 until contenders).map { i =>
        val t = new Thread(() => {
          try {
            start.await(30, TimeUnit.SECONDS)
            wins.add(TextDedup.acquireCompactionLease(spark, idx,
              TextDedup.DefaultLeaseStaleMs))
          } catch { case _: IllegalStateException => () }
          finally done.countDown()
        }, s"lock-contender-$iter-$i")
        t.start(); t
      }
      assert(done.await(60, TimeUnit.SECONDS), s"iter $iter: contenders hung")
      threads.foreach(_.join(10000))
      assert(wins.size == 1,
        s"iter $iter: ${wins.size} contenders own the lease " +
          "(stale-lock clear double-admitted)")
      assert(fs(idx).exists(leaseFile(idx)),
        s"iter $iter: the winner's fresh lease vanished")
      // the dead owner aborts; the winner verifies and releases cleanly
      intercept[IllegalStateException](
        TextDedup.verifyLeaseOwner(spark, idx, dead))
      TextDedup.verifyLeaseOwner(spark, idx, wins.peek())
      TextDedup.releaseCompactionLease(spark, idx, wins.peek())
      // no takeover-lock residue survives the race (tombstones are
      // self-owned and deleted; the lock itself is cleared or expired)
      assert(!fs(idx).exists(lockP),
        s"iter $iter: takeover lock leaked past the race")
    }
  }

  test("contenders racing a FRESH lease all lose and never disturb it") {
    val idx = java.nio.file.Files.createTempDirectory("lease-fresh").toString
    val owner = TextDedup.acquireCompactionLease(spark, idx,
      TextDedup.DefaultLeaseStaleMs)
    val start = new CyclicBarrier(6)
    val done = new CountDownLatch(6)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    (0 until 6).foreach { i =>
      new Thread(() => {
        try {
          start.await(30, TimeUnit.SECONDS)
          TextDedup.acquireCompactionLease(spark, idx,
            TextDedup.DefaultLeaseStaleMs)
          outcomes.add(true)
        } catch { case _: IllegalStateException => outcomes.add(false) }
        finally done.countDown()
      }, s"fresh-contender-$i").start()
    }
    assert(done.await(60, TimeUnit.SECONDS))
    assert(!outcomes.asScala.exists(identity),
      "a contender acquired over a FRESH lease")
    TextDedup.verifyLeaseOwner(spark, idx, owner) // still the owner's
    TextDedup.releaseCompactionLease(spark, idx, owner)
  }

  private implicit class QueueOps[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      q.forEach(a => b += a)
      b.result()
    }
  }
}

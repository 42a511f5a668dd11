package graft.core

import java.util.concurrent.CountDownLatch

import graft.SparkSpec

/** CacheBin scoping: a drain inside a scope must release only frames
  * tracked by that scope (or threads it spawned) — never frames a
  * concurrent pipeline tracked into the global bin.
  */
class CacheBinSpec extends SparkSpec {

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel.useMemory || df.storageLevel.useDisk

  test("withScope drains its own frames on exit") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x").persist()
    df.count()
    CacheBin.withScope {
      CacheBin.track(df)
      assert(CacheBin.pending == 1)
    }
    assert(!cached(df))
  }

  test("a scoped drain cannot release a global-bin frame") {
    import spark.implicits._
    val global = Seq(1, 2).toDF("g").persist()
    global.count()
    CacheBin.track(global) // tracked outside any scope → global bin
    CacheBin.withScope {
      CacheBin.drain() // drains the (empty) scope bin only
    }
    assert(cached(global), "scoped drain must not touch the global bin")
    CacheBin.drain() // global cleanup
    assert(!cached(global))
  }

  test("a worker thread spawned inside a scope tracks into that scope") {
    import spark.implicits._
    val df = Seq(1).toDF("w").persist()
    df.count()
    CacheBin.withScope {
      val started = new CountDownLatch(1)
      val t = new Thread(() => { CacheBin.track(df); started.countDown() })
      t.start()
      started.await()
      t.join()
      assert(CacheBin.pending == 1)
    }
    assert(!cached(df), "scope exit must drain worker-tracked frames")
  }

  test("scopes nest: inner drain leaves the outer scope intact") {
    import spark.implicits._
    val outer = Seq(1).toDF("o").persist()
    outer.count()
    CacheBin.withScope {
      CacheBin.track(outer)
      CacheBin.withScope {
        CacheBin.drain() // empty inner bin
      }
      assert(cached(outer))
      assert(CacheBin.pending == 1)
    }
    assert(!cached(outer))
  }
}

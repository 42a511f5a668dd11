package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{QualityClassifier, TextDedup}

/** Durable streaming ingest dedup — the production loop the
  * materialized dedup index ([[TextDedup.writeDedupIndex]]) exists for:
  * every micro-batch is screened against everything EVER admitted (the
  * index survives restarts, unlike `flatMapGroupsWithState` state tied
  * to one checkpoint), then self-deduped within the batch, and the
  * survivors are appended to both the output corpus and the index — so
  * the next batch, and the next job, screen against them.
  *
  * Contrast with [[StreamDedup.nearDupCandidates]]: that is the
  * low-latency in-stream suppressor (band state in the state store,
  * candidates only); this is the corpus-building admit pipeline (exact
  * Jaccard verify on both the index screen and the in-batch pass, and
  * a durable, restart-proof memory).
  *
  * Scale shape per batch: screening is the one-sided banded join of
  * `dedupAgainstIndex` (batch band rows meet stored band rows keyed on
  * (band, value) with the band directories partition-pruned); in-batch
  * dedup is bounded by batch size, not corpus size; index growth is an
  * append of band/shingle files, never a rewrite.
  */
object IngestDedup {

  /** Admit one batch: screen against the index (ignoring a doc's OWN
    * prior index rows — the replay guard), self-dedup within the batch
    * (keep the lower id of each verified near-dup pair), then commit:
    *
    *  1. output FIRST, to a per-batch `ingest_batch=<id>` directory in
    *     overwrite mode — an idempotent write, so a replayed batch
    *     rewrites its own partition instead of appending duplicates;
    *  2. index append SECOND, re-derived from the files just written —
    *     re-appending the same rows after a crash only duplicates
    *     band/shingle rows, which screening tolerates (candidates and
    *     drops are distinct()-ed) and compaction folds away.
    *
    * Both steps are idempotent under replay (the screen self-excludes
    * a doc's own index rows and the survivor set is deterministic), so
    * the order is NOT a correctness choice — it is an execution-safety
    * one: every cached plan that READS the index must be dropped
    * before anything WRITES the index. An append into the band table
    * triggers Spark's recache-by-path on cached plans scanning it, and
    * a plan captured when the table was empty re-executes against the
    * appended layout with a stale (empty) partition schema — the
    * reader then fails its partition-values assertion. Hence the inner
    * cache scope ends before step 2, and step 2 reads the committed
    * output files instead of the screening plan.
    *
    * Net semantics: exactly-once OUTPUT, at-least-once (duplicate-row
    * tolerant) index. Returns the number of admitted rows. All hash
    * parameters come from the index meta.
    */
  def admitBatch(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, threshold: Double,
      batchId: Long = 0L): Long = {
    val spark = batch.sparkSession
    val batchDir = s"$outPath/ingest_batch=$batchId"
    val nAdmitted = graft.core.CacheBin.withScope {
      val (n, h, bands, seed) = TextDedup.readIndexMeta(spark, indexPath)
      val vsIndex = TextDedup.dedupAgainstIndex(
        spark, indexPath, batch, idCol, textCol, threshold, excludeSelf = true)
      val dupIds = TextDedup.minhashNearDupPairs(
        vsIndex, idCol, textCol, threshold, n, h, bands, seed)
        .select(col("id2").as(idCol)).distinct()
      val admitted = vsIndex.join(dupIds, Seq(idCol), "left_anti")
        .persist()
      try {
        val n0 = admitted.count()
        if (n0 > 0) admitted.write.mode("overwrite").parquet(batchDir)
        n0
      } finally admitted.unpersist()
    }
    if (nAdmitted > 0)
      TextDedup.appendToDedupIndex(spark, indexPath,
        spark.read.parquet(batchDir), idCol, textCol)
    nAdmitted
  }

  /** Parquet data files under `dir`, recursively (the footer-read cost
    * a screen pays per probe — the quantity the compaction trigger
    * bounds).
    */
  private[streaming] def parquetFileCount(spark: SparkSession,
      dir: String): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
  }

  /** Index maintenance trigger: every [[admitBatch]] append lands one
    * more file generation per band directory, and each later screen
    * then pays a parquet footer read per file — unbounded appends turn
    * the screen scan-bound. When either index table has GROWN by more
    * than `maxNewFiles` files since the last compaction, rewrite both
    * via [[TextDedup.compactDedupIndex]] (size-targeted files, band
    * rows range-partitioned for footer pruning, replay-duplicate
    * folding) and record the compacted file count as the new baseline.
    *
    * The trigger is growth-relative, not an absolute count: a large
    * index legitimately compacts to MORE than `maxNewFiles`
    * size-targeted files, and an absolute threshold would then fire a
    * full two-table rewrite after every batch — O(index) work per
    * micro-batch. Against the baseline, steady state compacts once per
    * `maxNewFiles` appended generations regardless of index size.
    *
    * Compaction is documented not-concurrent-safe; the between-batches
    * call site inside `foreachBatch` is exactly its safe window (the
    * loop is the only reader and writer, and no screening plan is in
    * flight). Returns whether it compacted.
    */
  def maybeCompactIndex(spark: SparkSession, indexPath: String,
      maxNewFiles: Int, targetBytesPerFile: Long = 128L * 1024 * 1024): Boolean = {
    if (maxNewFiles <= 0) return false
    val conf = spark.sessionState.newHadoopConf()
    val marker = new org.apache.hadoop.fs.Path(s"$indexPath/compact_baseline")
    val fs = marker.getFileSystem(conf)
    def count() = math.max(parquetFileCount(spark, s"$indexPath/bands"),
      parquetFileCount(spark, s"$indexPath/shingles"))
    val baseline =
      if (!fs.exists(marker)) 0
      else {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8").trim.toInt
        finally in.close()
      }
    val n = count()
    if (n - baseline <= maxNewFiles) return false
    TextDedup.compactDedupIndex(spark, indexPath, targetBytesPerFile)
    val out = fs.create(marker, true)
    try out.write(count().toString.getBytes("UTF-8")) finally out.close()
    true
  }

  /** Attach the admit loop to a streaming frame of documents. The
    * index at `indexPath` must already exist (seed it with
    * [[TextDedup.writeDedupIndex]], possibly on an empty corpus).
    * `checkpoint` replays an uncommitted batch on restart; combined
    * with [[admitBatch]]'s idempotent commits (self-excluding screen,
    * per-batch overwrite output, duplicate-tolerant index append) a
    * crash anywhere in the batch cannot duplicate or lose output rows.
    *
    * `compactAtFiles` bounds index fragmentation: after each admitted
    * batch, when either index table has grown by more than that many
    * parquet files since the last compaction the loop compacts the
    * index in place ([[maybeCompactIndex]] — 0 disables). A crash
    * around the compaction loses nothing: the swap renames the live
    * table aside before promoting the compacted one, and the read
    * path heals any intermediate state
    * ([[TextDedup.recoverDedupIndex]]) before planning against the
    * files.
    *
    * `qualityModelPath` + `minQualityMicro` install the LEARNED
    * quality gate at scan time: the saved [[QualityClassifier]] model
    * scores every incoming document through the join-free, codegen'd
    * [[QualityClassifier.scoreExpr]] row expression — a plain
    * streaming `filter`, so the gate adds NO streaming aggregation
    * state (no state store, no watermark) and below-floor documents
    * never reach the dedup screen. This is the streaming shape of the
    * batch pipeline's classifier gate: train offline, save, gate every
    * ingested byte at scan time.
    *
    * `repetitionGate` installs the Gopher within-document repetition
    * filter the same way: [[org.apache.spark.sql.graftvec.RepetitionStats]]
    * computes every fraction inside one codegen'd row expression, so
    * the gate is another stateless scan filter — self-repeating spam
    * is dropped before it costs a dedup screen or an index append.
    *
    * `tokenizerPath` annotates every admitted document with
    * tokenizer-accurate `n_tokens` at scan time, from a saved
    * unigram-LM piece table ([[graft.operators.TokenizerIO]]): the
    * Viterbi kernel is a stateless scan expression (no join, no
    * state), so the output corpus lands already carrying the counts
    * the pack/budget stages consume — train the tokenizer once
    * offline, count every ingested byte with it.
    *
    * `fixText` + `c4MinWords` install the batch pipeline's byte-repair
    * and C4 line-curation stages at scan time: NFC normalization /
    * control strip / space collapse rewrite the text column, the C4
    * line rules rebuild it from surviving lines, and the document gate
    * drops thin/blocked pages — all per-row column expressions. Both
    * run BEFORE the quality and dedup screens, so a chrome-heavy page
    * is cut down before it costs a score, a shingle, or an index
    * append.
    *
    * `lineIndexPath` installs corpus-LEVEL exact line dedup — the one
    * line operator whose document-frequency aggregation cannot run
    * in-stream — via the materialized [[graft.operators.LineIndex]]:
    * a batch-built duplicate-line-hash artifact compiles once at
    * stream start into a broadcast Bloom bitset and flagged lines are
    * stripped by a stateless scan expression (the blocklist pattern);
    * periodic batch re-index refreshes it on the next (re)start.
    *
    * `paragraphIndexPath` installs the FUZZY grain of the same
    * pattern — corpus-level paragraph NEAR-dup screening via a
    * batch-built [[graft.operators.ParagraphIndex]] MinHash band-key
    * artifact: the stream recomputes each incoming paragraph's
    * signature per row (same coefficients and banding as the batch
    * side) and strips on any Bloom band-key hit. A hit is an LSH
    * candidate (no in-stream Jaccard verify), so the screen
    * over-strips at the banding's false-candidate rate — the batch
    * twin [[graft.operators.LineCuration.stripNearDupParagraphsAgainst]]
    * is the verified ground truth.
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpoint: String,
      threshold: Double = 0.5,
      compactAtFiles: Int = 64,
      compactTargetBytes: Long = 128L * 1024 * 1024,
      qualityModelPath: Option[String] = None,
      minQualityMicro: Long = 0L,
      repetitionGate: Boolean = false,
      repetitionMinWords: Int = 50,
      tokenizerPath: Option[String] = None,
      fixText: Boolean = false,
      redactPii: Boolean = false,
      c4MinWords: Int = 0,
      c4MinKeptLines: Int =
        graft.operators.LineCuration.DefaultMinKeptLines,
      lineIndexPath: Option[String] = None,
      // corpus-level FUZZY paragraph screen (the LineIndex pattern at
      // near-dup grain): a batch-built ParagraphIndex band-key
      // artifact compiles once to a broadcast Bloom; each incoming
      // paragraph recomputes its MinHash banding per row and is
      // stripped on any hit — stateless, zero joins. LSH-candidate
      // strip (no in-stream Jaccard verify): over-strips at the
      // banding + Bloom false-positive rate; batch twin
      // LineCuration.stripNearDupParagraphsAgainst is ground truth
      paragraphIndexPath: Option[String] = None,
      // saved LangIdTrain model + allowlist: language admission as a
      // stateless scan predicate (the batch pipeline's langIdModelPath
      // + langs pair) — for streams without trusted language labels
      langIdModelPath: Option[String] = None,
      allowedLangs: Seq[String] = Nil,
      // streaming-safe domain blocklist: compiled ONCE to a broadcast
      // Bloom bitset, probed by a stateless scan predicate over the
      // url column's host suffixes (the exact equi-join form's
      // distinct would need a streaming state store); requires urlCol
      urlCol: Option[String] = None,
      domainBlocklist: Option[org.apache.spark.sql.DataFrame] = None,
      // 0 = size the bitset from the list (~10 bits/key, 64 Kib
      // floor) — a fixed small default saturates on UT1-scale lists
      blocklistBits: Int = 0): StreamingQuery = {
    require(domainBlocklist.isEmpty || urlCol.nonEmpty,
      "a domain blocklist requires urlCol: the blocklist probes the " +
        "url column's host suffixes")
    val spark = docs.sparkSession
    val unblocked = (urlCol, domainBlocklist) match {
      case (Some(u), Some(bl)) =>
        val words = graft.operators.UrlOps.buildDomainFilter(
          bl, mBits = blocklistBits)
        docs.filter(!coalesce(
          graft.operators.UrlOps.blockedByFilter(
            graft.operators.UrlOps.canonicalize(col(u)), words),
          lit(false)))
      case _ => docs
    }
    val repaired0 =
      if (!fixText) unblocked
      else unblocked.withColumn(textCol,
        graft.functions.TextAnalysis.fixText(col(textCol)))
    // PII scrub shares the batch pipeline's expression — another
    // stateless per-row scan rewrite, BEFORE any hashing/screening
    val repaired =
      if (!redactPii) repaired0
      else repaired0.withColumn(textCol,
        graft.functions.TextAnalysis.redactPii(col(textCol)))
    val lined =
      if (c4MinWords <= 0) repaired
      else {
        import graft.operators.LineCuration
        val kept = filter(split(col(textCol), "\n"),
          l => LineCuration.lineOk(l, c4MinWords,
            LineCuration.DefaultBlockPhrases, LineCuration.DefaultTerminalRe))
        // the SHARED doc-gate predicate — same lowercasing as the batch
        // path, so batch and streaming admission cannot diverge
        val docBlocked = LineCuration.docBlocked(col(textCol))
        repaired
          .withColumn("__kept", kept)
          .filter(size(col("__kept")) >= c4MinKeptLines && !docBlocked)
          .withColumn(textCol, array_join(col("__kept"), "\n"))
          .drop("__kept")
      }
    // corpus-level line dedup as a stateless scan: the batch-built
    // line-hash index compiles ONCE here; flagged lines are stripped
    // per row with zero joins and zero state
    val lineScreened = lineIndexPath match {
      case None => lined
      case Some(p) =>
        val f = graft.operators.LineIndex.loadFilter(spark, p)
        lined.withColumn(textCol,
          graft.operators.LineIndex.stripLinesExpr(col(textCol), f))
    }
    // corpus-level fuzzy paragraph screen: the batch-built band-key
    // index compiles ONCE; each paragraph's MinHash banding is
    // recomputed per row and flagged paragraphs are stripped — zero
    // joins, zero state (the LineIndex pattern at near-dup grain)
    val paraScreened = paragraphIndexPath match {
      case None => lineScreened
      case Some(p) =>
        val f = graft.operators.ParagraphIndex.loadFilter(spark, p)
        lineScreened.withColumn(textCol,
          graft.operators.ParagraphIndex.stripParagraphsExpr(col(textCol), f))
    }
    // trained language-ID admission: the model compiles once to a
    // per-row scoring expression (zero joins, zero state)
    val langGated = langIdModelPath match {
      case None => paraScreened
      case Some(p) =>
        require(allowedLangs.nonEmpty,
          "langIdModelPath needs allowedLangs: an admission gate with " +
            "an empty allowlist would drop every document")
        val profiles = graft.operators.LangIdTrain.profilesOf(
          graft.operators.LangIdTrain.load(spark, p))
        paraScreened.filter(graft.operators.LangIdTrain
          .predictExpr(col(textCol), profiles).isin(allowedLangs: _*))
    }
    val quality = qualityModelPath match {
      case None => langGated
      case Some(p) =>
        val model = QualityClassifier.loadModel(spark, p)
        langGated.filter(
          QualityClassifier.scoreExpr(col(textCol), model) >= lit(minQualityMicro))
    }
    // ONE kernel call per row by construction (RepetitionPass folds the
    // threshold test into the expression) — field-wise predicates on a
    // projected stats struct get alias-substituted by predicate
    // pushdown and re-evaluate the kernel per referenced field
    val gated =
      if (!repetitionGate) quality
      else quality.filter(
        org.apache.spark.sql.graftvec.RepetitionStatsExpr
          .passCol(col(textCol), repetitionMinWords))
    val annotated = tokenizerPath match {
      case None => gated
      case Some(tp) =>
        val vocab = graft.operators.TokenizerIO.loadUnigram(spark, tp)
        gated.withColumn("n_tokens",
          size(graft.operators.UnigramLearn.encodeExpr(col(textCol), vocab))
            .cast("long"))
    }
    annotated.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          admitBatch(batch.toDF(), idCol, textCol, indexPath, outPath,
            threshold, batchId)
          maybeCompactIndex(spark, indexPath, compactAtFiles, compactTargetBytes)
        }
        ()
      }
      .start()
  }
}

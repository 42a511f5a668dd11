package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.TextDedup

/** The durable ingest-dedup loop running as a REAL stream: an index
  * seeded from an empty corpus, micro-batches screened against it,
  * survivors appended to the output corpus and the index — so later
  * batches are screened against earlier admissions.
  */
final case class IngestDoc(doc_id: Long, text: String)

class IngestDedupSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_ingest_$tag").toString

  test("admitted docs suppress later copies across micro-batches; output corpus accumulates survivors") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx") + "/index"
    val out = freshDir("out") + "/corpus"
    val ckp = freshDir("ckp")
    // seed an index from an EMPTY corpus: first batch screens against nothing
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5)
    try {
      // batch 1: two distinct docs plus an in-batch exact copy of the first
      src.addData(
        IngestDoc(1L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(2L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(3L, "one two three four five six seven"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after1 === Set(1L, 3L)) // in-batch copy kept the lower id
      // batch 2: a copy of an admitted doc drops; a new doc is admitted
      src.addData(
        IngestDoc(10L, "one two three four five six seven"),
        IngestDoc(11L, "completely different content arrives here now"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after2 === Set(1L, 3L, 11L))
    } finally q.stop()
  }

  test("admitBatch returns the admitted count and appends to the index") {
    import spark.implicits._
    val idx = freshDir("idx2") + "/index"
    val out = freshDir("out2") + "/corpus"
    TextDedup.writeDedupIndex(
      Seq(IngestDoc(1L, "alpha beta gamma delta epsilon zeta")).toDF(),
      "doc_id", "text", idx)
    val n1 = IngestDedup.admitBatch(
      Seq(IngestDoc(2L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(3L, "one two three four five six seven")).toDF(),
      "doc_id", "text", idx, out, threshold = 0.5, batchId = 1L)
    assert(n1 === 1L)
    // the admitted doc 3 now lives in the index: its copy is rejected
    val n2 = IngestDedup.admitBatch(
      Seq(IngestDoc(4L, "one two three four five six seven")).toDF(),
      "doc_id", "text", idx, out, threshold = 0.5, batchId = 2L)
    assert(n2 === 0L)
    assert(spark.read.parquet(out).count() === 1L)
  }

  test("replaying a committed batch is idempotent (crash-recovery contract)") {
    import spark.implicits._
    val idx = freshDir("idx3") + "/index"
    val out = freshDir("out3") + "/corpus"
    val batch = Seq(
      IngestDoc(1L, "alpha beta gamma delta epsilon zeta"),
      IngestDoc(2L, "one two three four five six seven")).toDF()
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val n1 = IngestDedup.admitBatch(batch, "doc_id", "text", idx, out,
      threshold = 0.5, batchId = 7L)
    // simulate the checkpoint not committing: the SAME batch replays —
    // its rows are already in the index (self-excluded from screening)
    // and the per-batch output directory is overwritten, not appended
    val n2 = IngestDedup.admitBatch(batch, "doc_id", "text", idx, out,
      threshold = 0.5, batchId = 7L)
    assert(n1 === 2L && n2 === 2L)
    assert(spark.read.parquet(out).select($"doc_id").distinct().count() === 2L)
    assert(spark.read.parquet(out).count() === 2L) // no duplicate rows
  }

  test("auto-compaction fires on growth, bounds index files; screening unchanged") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx4") + "/index"
    val out = freshDir("out4") + "/corpus"
    val ckp = freshDir("ckp4")
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    // growth trigger of 3 new files: 8 single-doc batches (one band
    // generation each) must trip it at least once
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, compactAtFiles = 3)
    try {
      val texts = Seq(
        "alpha beta gamma delta epsilon zeta", "one two three four five six",
        "red green blue yellow purple orange", "north south east west up down",
        "cat dog bird fish horse mouse", "spring summer autumn winter rain snow",
        "iron copper silver gold tin lead", "earth mars venus saturn pluto moon")
      texts.zipWithIndex.foreach { case (t, i) =>
        src.addData(IngestDoc(i.toLong + 1, t))
        q.processAllAvailable()
      }
      // compaction actually FIRED (the baseline marker is only written
      // by a compaction run) — without this a broken trigger condition
      // could pass any loose file-count bound
      val conf = spark.sessionState.newHadoopConf()
      val marker = new org.apache.hadoop.fs.Path(s"$idx/compact_baseline")
      assert(marker.getFileSystem(conf).exists(marker),
        "auto-compaction never fired across 8 appended generations")
      // and the layout stayed bounded: strictly fewer band files than
      // the 8 per-batch generations an uncompacted index accumulates
      val bandFiles = IngestDedup.parquetFileCount(spark, s"$idx/bands")
      assert(bandFiles < 8, s"bands never compacted: $bandFiles files")
      // screening over the compacted index is unchanged: copies of
      // early AND late admissions are still rejected
      src.addData(
        IngestDoc(100L, texts.head), IngestDoc(101L, texts.last),
        IngestDoc(102L, "a genuinely novel document closes the loop"))
      q.processAllAvailable()
      val ids = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === (1L to 8L).toSet + 102L)
    } finally q.stop()
  }

  test("growth trigger is baseline-relative: a large compacted index does not re-compact every batch") {
    import spark.implicits._
    val idx = freshDir("idx6") + "/index"
    val out = freshDir("out6") + "/corpus"
    TextDedup.writeDedupIndex(
      Seq(IngestDoc(1L, "alpha beta gamma delta epsilon zeta")).toDF(),
      "doc_id", "text", idx)
    def admit(id: Long, text: String): Unit = {
      IngestDedup.admitBatch(Seq(IngestDoc(id, text)).toDF(),
        "doc_id", "text", idx, out, threshold = 0.5, batchId = id)
      ()
    }
    admit(2L, "one two three four five six seven")
    admit(3L, "red green blue yellow purple orange pink")
    // growth since the (never-run) baseline exceeds 1 → compacts
    assert(IngestDedup.maybeCompactIndex(spark, idx, maxNewFiles = 1))
    // immediately after, growth is zero — must NOT compact again even
    // though the absolute file count may exceed the threshold
    assert(!IngestDedup.maybeCompactIndex(spark, idx, maxNewFiles = 1))
    // one more append: growth 1 <= 1, still quiet
    admit(4L, "north south east west up down sideways")
    val before = IngestDedup.parquetFileCount(spark, s"$idx/bands")
    assert(!IngestDedup.maybeCompactIndex(spark, idx, maxNewFiles = before + 100))
  }

  test("a crash mid-compaction-swap is healed before the next screen") {
    import spark.implicits._
    val idx = freshDir("idx7") + "/index"
    TextDedup.writeDedupIndex(
      Seq(IngestDoc(1L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(2L, "one two three four five six seven")).toDF(),
      "doc_id", "text", idx)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def screenSurvivors(): Set[Long] =
      try TextDedup.dedupAgainstIndex(spark, idx,
        Seq(IngestDoc(10L, "alpha beta gamma delta epsilon zeta"),
          IngestDoc(11L, "a wholly new document about nothing else")).toDF(),
        "doc_id", "text", threshold = 0.5)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      finally graft.core.CacheBin.drain() // identical screens re-persist the same frame
    // state A — crashed between the two renames: live table missing,
    // completed compacted table waiting (roll FORWARD)
    fs.rename(p(s"$idx/bands"), p(s"$idx/bands__compact"))
    fs.mkdirs(p(s"$idx/bands__old"))
    assert(screenSurvivors() === Set(11L), "roll-forward recovery failed")
    // state B — crashed before the forward rename: live renamed aside,
    // no compacted table (roll BACK)
    fs.rename(p(s"$idx/bands"), p(s"$idx/bands__old"))
    assert(screenSurvivors() === Set(11L), "roll-back recovery failed")
    // healed: no leftovers
    assert(!fs.exists(p(s"$idx/bands__old")) && !fs.exists(p(s"$idx/bands__compact")))
  }

  test("a second writer is rejected while a compaction lease is live; stale leases recover") {
    import spark.implicits._
    val idx = freshDir("idx8") + "/index"
    TextDedup.writeDedupIndex(
      Seq(IngestDoc(1L, "alpha beta gamma delta epsilon zeta"),
        IngestDoc(2L, "one two three four five six seven")).toDF(),
      "doc_id", "text", idx)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(s"$idx/${TextDedup.CompactionLeaseFile}")
    // simulate a concurrent compactor holding the lease
    TextDedup.acquireCompactionLease(spark, idx, TextDedup.DefaultLeaseStaleMs)
    assert(fs.exists(lease))
    // second compactor: rejected
    val e1 = intercept[IllegalStateException](
      TextDedup.compactDedupIndex(spark, idx))
    assert(e1.getMessage.contains("another writer"))
    // screener and appender: fail fast instead of reading mid-swap
    val e2 = intercept[IllegalStateException](
      TextDedup.dedupAgainstIndex(spark, idx,
        Seq(IngestDoc(10L, "whatever text this is")).toDF(),
        "doc_id", "text", threshold = 0.5).collect())
    assert(e2.getMessage.contains("being compacted"))
    val e3 = intercept[IllegalStateException](
      TextDedup.appendToDedupIndex(spark, idx,
        Seq(IngestDoc(11L, "some new appended document")).toDF(),
        "doc_id", "text"))
    assert(e3.getMessage.contains("being compacted"))
    // owner finishes: lease released, everything proceeds again
    TextDedup.releaseCompactionLease(spark, idx)
    TextDedup.compactDedupIndex(spark, idx)
    assert(!fs.exists(lease), "compaction must release its lease")
    // stale lease (crashed owner): a new compactor takes over
    TextDedup.acquireCompactionLease(spark, idx, TextDedup.DefaultLeaseStaleMs)
    TextDedup.compactDedupIndex(spark, idx, leaseStaleMs = 0L)
    assert(!fs.exists(lease), "stale lease was not recovered")
    // and a stale lease never blocks the read path
    TextDedup.acquireCompactionLease(spark, idx, TextDedup.DefaultLeaseStaleMs)
    val lp = fs.getFileStatus(lease)
    fs.setTimes(lease, System.currentTimeMillis() - TextDedup.DefaultLeaseStaleMs - 60000L, lp.getAccessTime)
    val survivors = TextDedup.dedupAgainstIndex(spark, idx,
      Seq(IngestDoc(12L, "a wholly new document about nothing else")).toDF(),
      "doc_id", "text", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(12L))
    fs.delete(lease, false)
  }

  test("lease carries an owner token: takeover is rename-atomic and release is owner-checked") {
    import spark.implicits._
    val idx = freshDir("idx8b") + "/index"
    TextDedup.writeDedupIndex(
      Seq(IngestDoc(1L, "alpha beta gamma delta epsilon zeta")).toDF(),
      "doc_id", "text", idx)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(s"$idx/${TextDedup.CompactionLeaseFile}")
    // crashed owner leaves a stale lease
    val t0 = TextDedup.acquireCompactionLease(spark, idx, TextDedup.DefaultLeaseStaleMs)
    fs.setTimes(lease, System.currentTimeMillis() - TextDedup.DefaultLeaseStaleMs - 60000L, -1)
    // takeover: the new owner's token replaces the dead one's
    val t1 = TextDedup.acquireCompactionLease(spark, idx, TextDedup.DefaultLeaseStaleMs)
    assert(t1 !== t0)
    assert(fs.exists(lease))
    // a release with the WRONG token (the dead owner waking up) is a
    // no-op — it must not delete the new owner's fresh lease
    TextDedup.releaseCompactionLease(spark, idx, t0)
    assert(fs.exists(lease), "stale ex-owner deleted the new owner's lease")
    // ... and the new owner's release works
    TextDedup.releaseCompactionLease(spark, idx, t1)
    assert(!fs.exists(lease))
  }

  test("repetition gate drops self-repeating docs at scan time with no streaming state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx9") + "/index"
    val out = freshDir("out9") + "/corpus"
    val ckp = freshDir("ckp9")
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, repetitionGate = true)
    try {
      // > 50 distinct words, nothing repeats — the gate must admit it
      val prose = "the quick brown fox jumps over a lazy dog and then " +
        "rests beneath an old oak tree while evening settles quietly " +
        "around this wide open field as distant bells begin ringing " +
        "softly from some village church beyond those rolling hills " +
        "where farmers finish their long day of honest autumn work " +
        "before walking home under early stars"
      src.addData(
        IngestDoc(1L, prose),
        IngestDoc(2L, ("buy cheap now " * 40).trim), // self-repeating spam
        IngestDoc(3L, "short doc passes via the word floor"))
      q.processAllAvailable()
      val ids = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L), s"gate admitted $ids")
      assert(q.lastProgress.stateOperators.isEmpty,
        "repetition gate introduced streaming state")
    } finally q.stop()
  }

  test("lease renewal heartbeat keeps a long compaction fresh and stops after takeover") {
    import spark.implicits._
    val idx = freshDir("idx8c") + "/index"
    TextDedup.writeDedupIndex(
      Seq(IngestDoc(1L, "alpha beta gamma delta epsilon zeta")).toDF(),
      "doc_id", "text", idx)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(s"$idx/${TextDedup.CompactionLeaseFile}")
    val t1 = TextDedup.acquireCompactionLease(spark, idx, TextDedup.DefaultLeaseStaleMs)
    // age the lease as if the owner had been running a long time
    val old = System.currentTimeMillis() - 60000L
    fs.setTimes(lease, old, -1)
    val renewer = new TextDedup.LeaseRenewer(spark, idx, t1, periodMs = 100L)
    renewer.start()
    try {
      Thread.sleep(600L)
      val m1 = fs.getFileStatus(lease).getModificationTime
      assert(m1 > old, "heartbeat must refresh the lease modification time")
      // another writer takes over (stale path): heartbeat must NOT
      // resurrect the lost lease
      fs.delete(lease, false)
      val t2 = TextDedup.acquireCompactionLease(spark, idx, TextDedup.DefaultLeaseStaleMs)
      assert(t2 !== t1)
      fs.setTimes(lease, old, -1)
      Thread.sleep(600L)
      assert(fs.getFileStatus(lease).getModificationTime === old,
        "a taken-over owner kept renewing a lease it no longer holds")
    } finally {
      renewer.shutdown()
      TextDedup.releaseCompactionLease(spark, idx)
    }
  }

  test("saved tokenizer annotates admitted docs with n_tokens at scan time") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx10") + "/index"
    val out = freshDir("out10") + "/corpus"
    val ckp = freshDir("ckp10")
    val tok = freshDir("tok10") + "/model"
    // train the tokenizer offline on the batch corpus, save it
    val corpus = graft.catalog.Tables.load(spark, sfDir, "documents")
    val res = graft.operators.UnigramLearn.learn(corpus, "text")
    graft.operators.TokenizerIO.saveUnigram(spark, res.vocab, tok)
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, tokenizerPath = Some(tok))
    try {
      src.addData(
        IngestDoc(1L, "spark query plan join"),
        IngestDoc(2L, "hash table scan filter group"))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select($"doc_id", $"n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Seq((1L, "spark query plan join"),
        (2L, "hash table scan filter group")).toDF("doc_id", "text")
        .select($"doc_id", org.apache.spark.sql.functions.size(
          graft.operators.UnigramLearn.encodeExpr($"text", res.vocab))
          .cast("long").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, "streamed n_tokens must equal the batch encode")
      assert(got.values.forall(_ > 0))
      assert(q.lastProgress.stateOperators.isEmpty,
        "tokenizer annotation introduced streaming state")
    } finally q.stop()
  }

  test("ALL gates composed in one stream survive a crash/replay restart with exactly-once admission") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idxE2E") + "/index"
    val out = freshDir("outE2E") + "/corpus"
    val ckp = freshDir("ckpE2E")
    val tok = freshDir("tokE2E") + "/model"
    val mdl = freshDir("mdlE2E") + "/model"
    // ---- offline artifacts: quality model + tokenizer ----
    val labeled = Seq(
      (1L, "clean well formed prose sentence example", 1),
      (2L, "clean well formed prose paragraph sample", 1),
      (3L, "spam spam junk junk garbage garbage noise", 0),
      (4L, "junk garbage spam noise spam junk words", 0))
      .toDF("doc_id", "text", "lab")
    val model = graft.operators.QualityClassifier.train(
      spark, labeled, "doc_id", "text", "lab", buckets = 64, iters = 8)
    graft.operators.QualityClassifier.saveModel(spark, model, mdl)
    val tokRes = graft.operators.UnigramLearn.learn(
      labeled.select($"text"), "text")
    graft.operators.TokenizerIO.saveUnigram(spark, tokRes.vocab, tok)
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    graft.core.CacheBin.drain()

    def startQuery(src: MemoryStream[IngestDoc]) =
      IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
        threshold = 0.5, qualityModelPath = Some(mdl),
        minQualityMicro = 500000L, repetitionGate = true,
        repetitionMinWords = 50, tokenizerPath = Some(tok))

    val src = MemoryStream[IngestDoc]
    val repSpam = Seq.fill(30)("spam words").mkString(" ") // 60 words, 2 distinct
    val q1 = startQuery(src)
    try {
      // batch 1 exercises every gate at once: 1 admits; 2 is an
      // in-batch exact dup (dedup); 3 fails the learned quality floor;
      // 4 fails the Gopher repetition gate
      src.addData(
        IngestDoc(1L, "clean well formed prose sentence example"),
        IngestDoc(2L, "clean well formed prose sentence example"),
        IngestDoc(3L, "garbage junk spam noise junk garbage"),
        IngestDoc(4L, repSpam))
      q1.processAllAvailable()
      assert(q1.lastProgress.stateOperators.isEmpty,
        "the composed gates must add no streaming state")
    } finally q1.stop()
    assert(spark.read.parquet(out).select($"doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L))

    // ---- CRASH: the offsets for batch 0 were written but the commit
    // was not — delete the newest commit marker so the restarted query
    // REPLAYS the batch against an index that already contains doc 1
    val commits = new java.io.File(s"$ckp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty, "no commit markers written")
    assert(commits.last.delete(), "could not simulate the crash")
    // the local checksum FS keeps a .N.crc sidecar per marker; left
    // behind, the replay's marker rewrite fails on the sidecar rename
    // ("Rename destination .0.crc already exists") instead of replaying
    new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
      .delete()

    val q2 = startQuery(src)
    try {
      q2.processAllAvailable() // replay of batch 0 (idempotent admit)
      // batch 2 after the restart: a copy of an admitted doc drops via
      // the INDEX screen; a fresh clean doc admits
      src.addData(
        IngestDoc(10L, "clean well formed prose sentence example"),
        IngestDoc(11L, "clean well formed prose paragraph sample"))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .select($"doc_id", $"n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // exactly-once: each admitted id appears ONCE despite the replay
    assert(rows.map(_._1).sorted.toSeq === Seq(1L, 11L),
      s"exactly-once admission violated: ${rows.toSeq}")
    // ... and the annotation is still the saved model's Viterbi count
    val want = Seq((1L, "clean well formed prose sentence example"),
      (11L, "clean well formed prose paragraph sample"))
      .toDF("doc_id", "text")
      .select($"doc_id", org.apache.spark.sql.functions.size(
        graft.operators.UnigramLearn.encodeExpr($"text", tokRes.vocab))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.toMap === want)
  }

  test("batch-built line-hash index strips chrome lines in-stream; admission equals the batch twin, restart included") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idxLine") + "/index"
    val lidx = freshDir("lineIdx") + "/lineindex"
    val out = freshDir("outLine") + "/corpus"
    val ckp = freshDir("ckpLine")
    // reference corpus with cross-document chrome: the subscribe and
    // cookie lines repeat across documents, every other line is unique
    val ref = Seq(
      IngestDoc(1L, "unique alpha opening line\nSUBSCRIBE to our newsletter\nalpha closing thoughts here"),
      IngestDoc(2L, "different beta body text\nSUBSCRIBE to our newsletter\naccept our cookie policy\nbeta conclusion paragraph"),
      IngestDoc(3L, "gamma standalone content\naccept our cookie policy\ngamma final remarks"))
      .toDF()
    // ---- the batch twin: corpus-level exact line dedup ----
    val twin = graft.operators.LineCuration
      .stripDuplicateLines(ref, "doc_id", "text", minDocFreq = 2)
      .select($"doc_id", $"clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twin.values.forall(t => !t.contains("SUBSCRIBE") &&
      !t.contains("cookie")), s"twin kept chrome: $twin")
    // ---- batch-built index from the same reference corpus ----
    val n = graft.operators.LineIndex.writeLineIndex(
      ref, "doc_id", "text", lidx, minDocFreq = 2)
    assert(n == 2L, s"expected the 2 chrome-line hashes, got $n")
    graft.core.CacheBin.drain()
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)

    def startQuery(src: MemoryStream[IngestDoc]) =
      IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
        threshold = 0.5, lineIndexPath = Some(lidx))

    val src = MemoryStream[IngestDoc]
    val docs = ref.as[IngestDoc].collect()
    val q1 = startQuery(src)
    try {
      src.addData(docs(0), docs(1))
      q1.processAllAvailable()
      assert(q1.lastProgress.stateOperators.isEmpty,
        "the line screen must add no streaming state")
    } finally q1.stop()

    // ---- CRASH between offsets and commit: delete the newest commit
    // marker so the restarted query replays batch 0 ----
    val commits = new java.io.File(s"$ckp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty, "no commit markers written")
    assert(commits.last.delete(), "could not simulate the crash")
    new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
      .delete()

    val q2 = startQuery(src)
    try {
      q2.processAllAvailable() // replay of batch 0 (idempotent admit)
      src.addData(docs(2))
      q2.processAllAvailable()
    } finally q2.stop()

    // exactly-once admission AND per-document text equal to the twin's
    val admitted = spark.read.parquet(out)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(admitted.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L),
      s"exactly-once admission violated: ${admitted.toSeq}")
    assert(admitted.toMap === twin,
      s"stream admission diverged from the batch twin:\n" +
        s"stream=${admitted.toMap}\ntwin=$twin")
  }

  test("batch-built paragraph band index strips near-dup paragraphs in-stream; admission equals the batch twin, restart included") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idxPara") + "/index"
    val pidx = freshDir("paraIdx") + "/paraindex"
    val out = freshDir("outPara") + "/corpus"
    val ckp = freshDir("ckpPara")
    val template =
      "please subscribe to our weekly newsletter for updates offers and community news every single week"
    val template2 =
      "all rights reserved contact the site administrator for takedown requests and licensing questions anytime"
    // reference corpus: the templated paragraphs repeat across pages
    val ref = Seq(
      IngestDoc(101L, s"reference page one body content\n\n$template"),
      IngestDoc(102L, s"$template2\n\nreference second page story"),
      IngestDoc(103L, s"reference third page article\n\n$template"))
      .toDF()
    val n = graft.operators.ParagraphIndex.writeParagraphIndex(
      ref, "doc_id", "text", pidx, threshold = 0.5)
    assert(n > 0L, "paragraph index wrote no band keys")
    graft.core.CacheBin.drain()
    // incoming docs: LIGHTLY-EDITED template copies (one-word edits —
    // the fuzzy grain exact paragraph dedup misses) plus unique prose
    val edited =
      "please subscribe to our weekly newsletter for updates offers and community news every single month"
    val edited2 =
      "all rights reserved contact the site administrator for takedown requests and licensing details anytime"
    val incoming = Seq(
      IngestDoc(1L, s"completely original alpha essay opening\n\n$edited"),
      IngestDoc(2L, s"$edited2\n\nsecond original beta travel report"),
      IngestDoc(3L, s"third unique gamma cooking recipe\n\n$template"))
      .toDF()
    // ---- the batch ground-truth twin over the same reference ----
    val twin = graft.operators.LineCuration
      .stripNearDupParagraphsAgainst(incoming, ref, "doc_id", "text",
        threshold = 0.5)
      .select($"doc_id", $"clean_text", $"n_removed").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    graft.core.CacheBin.drain()
    assert(twin.values.forall(_._2 == 1L),
      s"every incoming doc carries exactly one templated paragraph: $twin")
    assert(twin.values.forall(t => !t._1.contains("newsletter") &&
      !t._1.contains("takedown")), s"twin kept a template: $twin")

    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    def startQuery(src: MemoryStream[IngestDoc]) =
      IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
        threshold = 0.5, paragraphIndexPath = Some(pidx))

    val src = MemoryStream[IngestDoc]
    val docs = incoming.as[IngestDoc].collect().sortBy(_.doc_id)
    val q1 = startQuery(src)
    try {
      src.addData(docs(0), docs(1))
      q1.processAllAvailable()
      assert(q1.lastProgress.stateOperators.isEmpty,
        "the paragraph screen must add no streaming state")
    } finally q1.stop()

    // ---- CRASH between offsets and commit: replay batch 0 ----
    val commits = new java.io.File(s"$ckp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty, "no commit markers written")
    assert(commits.last.delete(), "could not simulate the crash")
    new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
      .delete()

    val q2 = startQuery(src)
    try {
      q2.processAllAvailable() // idempotent replay
      src.addData(docs(2))
      q2.processAllAvailable()
    } finally q2.stop()

    val admitted = spark.read.parquet(out)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(admitted.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L),
      s"exactly-once admission violated: ${admitted.toSeq}")
    assert(admitted.toMap === twin.view.mapValues(_._1).toMap,
      s"stream admission diverged from the batch twin:\n" +
        s"stream=${admitted.toMap}\ntwin=${twin.view.mapValues(_._1).toMap}")
  }

  test("hybrid paragraph index in-stream: gray band survives, both strip regimes hold") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idxHyb") + "/index"
    val pidx = freshDir("hybIdx") + "/paraindex"
    val out = freshDir("outHyb") + "/corpus"
    val ckp = freshDir("ckpHyb")
    val template =
      "please subscribe to our weekly newsletter for updates offers and community news every single week"
    val tailPara =
      "rare appendix paragraph describing maritime signal flag etiquette aboard sailing vessels"
    // template is HOT (3 pages) → head at K=1; tailPara appears once
    val ref = Seq(
      IngestDoc(101L, s"reference page one body content\n\n$template"),
      IngestDoc(102L, s"$template\n\nreference second page story"),
      IngestDoc(103L, s"reference third page article\n\n$template\n\n$tailPara"))
      .toDF()
    graft.operators.ParagraphIndex.writeParagraphIndex(
      ref, "doc_id", "text", pidx, threshold = 0.5, headK = 1)
    // screen-only twin from the same reference: proves the gray-band
    // paragraph DOES band-collide at this seed (so the hybrid's keep
    // below is the verify's doing, not a missed collision)
    val sidx = freshDir("screenIdx") + "/paraindex"
    graft.operators.ParagraphIndex.writeParagraphIndex(
      ref, "doc_id", "text", sidx, threshold = 0.5)
    graft.core.CacheBin.drain()
    // gray band: keep the template's first 9 of 15 words, then
    // diverge — Jaccard lands under 0.5, so the HEAD VERIFY must keep
    // it where the pure screen (r16 behavior) strips it. That claim
    // is proven below, not assumed: a screen-only index built from
    // the SAME reference must band-flag and strip this exact
    // paragraph (band collision at this Jaccard is probabilistic in
    // general — the assertion pins it for the fixed seed/banding)
    val grayMiss = template.split(" ").take(9).mkString(" ") +
      " entirely different closing clause about glacier moraines"
    val incoming = Seq(
      IngestDoc(1L, s"original alpha essay opening\n\n$grayMiss"),
      IngestDoc(2L, s"$template\n\nsecond original beta report"),
      IngestDoc(3L, s"third unique gamma recipe\n\n$tailPara"))
      .toDF()
    graft.operators.TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, paragraphIndexPath = Some(pidx))
    try {
      src.addData(incoming.as[IngestDoc].collect().toIndexedSeq: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "the hybrid screen must add no streaming state")
    } finally q.stop()
    val got = spark.read.parquet(out).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // not vacuous: the pure screen strips the gray paragraph
    val screenF = graft.operators.ParagraphIndex.loadFilter(spark, sidx)
    val screened = Seq(IngestDoc(99L, grayMiss)).toDF()
      .withColumn("c", graft.operators.ParagraphIndex
        .stripParagraphsExpr($"text", screenF))
      .collect()(0).getString(2)
    assert(screened === "",
      "fixture drifted: the gray-band paragraph no longer band-collides " +
        "under the pure screen, so the hybrid keep below proves nothing")
    assert(got(1L).contains("glacier moraines"),
      s"gray-band near-miss must SURVIVE the head verify: ${got(1L)}")
    assert(!got(2L).contains("newsletter"),
      s"exact head template must verify and strip: ${got(2L)}")
    assert(!got(3L).contains("maritime"),
      s"tail copy must strip on the screen contract: ${got(3L)}")
  }

  test("trained language-ID gate admits only allowed languages, stateless") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idxLang") + "/index"
    val mdl = freshDir("mdlLang") + "/langid"
    val out = freshDir("outLang") + "/corpus"
    val ckp = freshDir("ckpLang")
    // offline: train the char-gram model on disjoint toy languages
    val labeled = Seq(
      (1L, "xx", "xaxa xbxb xaxa xcxc xaxa"),
      (2L, "xx", "xbxb xaxa xaxa xdxd xaxa"),
      (3L, "yy", "yoyo ypyp yoyo yqyq yoyo"),
      (4L, "yy", "ypyp yoyo yoyo yryr yoyo"))
      .toDF("doc_id", "lang", "text")
    graft.operators.LangIdTrain.save(
      graft.operators.LangIdTrain.train(labeled, "text", "lang", 3, 5), mdl)
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, langIdModelPath = Some(mdl), allowedLangs = Seq("xx"))
    try {
      src.addData(
        IngestDoc(10L, "xaxa xcxc xbxb fresh content"), // xx → admit
        IngestDoc(11L, "yqyq yoyo ypyp other language")) // yy → drop
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "the language gate must add no streaming state")
    } finally q.stop()
    val admitted = spark.read.parquet(out).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted === Set(10L), s"admitted: $admitted")
    // misconfiguration fails loudly, not by dropping everything
    val err = intercept[IllegalArgumentException] {
      IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
        threshold = 0.5, langIdModelPath = Some(mdl))
    }
    assert(err.getMessage.contains("allowedLangs"))
  }

  test("saved-model quality gate filters at scan time with no streaming state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx5") + "/index"
    val out = freshDir("out5") + "/corpus"
    val ckp = freshDir("ckp5")
    val modelDir = freshDir("mdl") + "/model"
    // train offline on labeled fixtures: "good" docs share vocabulary,
    // "bad" docs share another; save, then gate the stream on the floor
    val labeled = Seq(
      (1L, "clean well formed prose sentence example", 1),
      (2L, "clean well formed prose paragraph sample", 1),
      (3L, "spam spam junk junk garbage garbage noise", 0),
      (4L, "junk garbage spam noise spam junk words", 0))
      .toDF("doc_id", "text", "lab")
    val model = graft.operators.QualityClassifier.train(
      spark, labeled, "doc_id", "text", "lab", buckets = 64, iters = 8)
    graft.operators.QualityClassifier.saveModel(spark, model, modelDir)
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, qualityModelPath = Some(modelDir),
      minQualityMicro = 500000L)
    try {
      src.addData(
        IngestDoc(1L, "clean well formed prose sentence text"),
        IngestDoc(2L, "garbage junk spam noise junk garbage"))
      q.processAllAvailable()
      val ids = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L), s"gate admitted $ids")
      // the gate is a scan-time filter: the streaming query carries NO
      // state operators (no aggregation state store, no watermark)
      assert(q.lastProgress.stateOperators.isEmpty,
        "quality gate introduced streaming state")
    } finally q.stop()
  }

  test("domain blocklist gates the stream via the Bloom scan predicate, stateless") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx13") + "/index"
    val out = freshDir("out13") + "/corpus"
    val ckp = freshDir("ckp13")
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val block = Seq("spam.example").toDF("domain")
    val src = MemoryStream[IngestDoc]
    // url derives from the id: odd ids sit on the blocked domain
    val docs = src.toDF().withColumn("url",
      concat(lit("http://"),
        when(col("doc_id") % 2 === 1, lit("ads.spam.example"))
          .otherwise(lit("ok.example")),
        lit("/p/"), col("doc_id").cast("string")))
    val q = IngestDedup.start(docs, "doc_id", "text", idx, out, ckp,
      threshold = 0.5, urlCol = Some("url"), domainBlocklist = Some(block))
    try {
      src.addData(
        IngestDoc(1L, "a perfectly fine text on a blocked domain"),
        IngestDoc(2L, "a perfectly fine text on a clean domain"))
      q.processAllAvailable()
      val ids = spark.read.parquet(out).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(2L), s"blocklist admitted $ids")
      assert(q.lastProgress.stateOperators.isEmpty,
        "blocklist gate introduced streaming state")
    } finally q.stop()
  }

  test("PII scrub rewrites at scan time, stateless") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx12") + "/index"
    val out = freshDir("out12") + "/corpus"
    val ckp = freshDir("ckp12")
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, redactPii = true)
    try {
      src.addData(IngestDoc(1L,
        "reach me at a.b@example.com or 192.168.0.1 with pin 987654 thanks"))
      q.processAllAvailable()
      val rows = spark.read.parquet(out).select($"doc_id", $"text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows(1L) ===
        "reach me at <EMAIL> or <IP> with pin <NUM> thanks")
      assert(q.lastProgress.stateOperators.isEmpty,
        "PII scrub introduced streaming state")
    } finally q.stop()
  }

  test("byte repair + C4 line gates rewrite and filter at scan time, stateless") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = freshDir("idx11") + "/index"
    val out = freshDir("out11") + "/corpus"
    val ckp = freshDir("ckp11")
    TextDedup.writeDedupIndex(
      spark.emptyDataset[IngestDoc].toDF(), "doc_id", "text", idx)
    val src = MemoryStream[IngestDoc]
    val q = IngestDedup.start(src.toDF(), "doc_id", "text", idx, out, ckp,
      threshold = 0.5, fixText = true, c4MinWords = 3, c4MinKeptLines = 2)
    try {
      src.addData(
        // two good lines + one chrome line that fails the word floor;
        // the kept text carries a control char and a DECOMPOSED e-acute
        IngestDoc(1L, "a proper first sentence stands here.\nok.\n" +
          "the cafe\u0301\u0007 second line also survives intact."),
        // every line fails (no terminal punct / blocked) -> doc dropped
        IngestDoc(2L, "no terminal punctuation anywhere\n" +
          "enable javascript to continue reading this."),
        // doc-level block phrase -> dropped despite good lines
        IngestDoc(3L, "a fine lorem ipsum sentence right here.\n" +
          "another perfectly good line follows it."))
      q.processAllAvailable()
      val rows = spark.read.parquet(out).select($"doc_id", $"text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set(1L), s"gates admitted ${rows.keySet}")
      // C4 dropped the thin line, fixText stripped the control char
      // and composed the e-acute
      assert(rows(1L) === "a proper first sentence stands here.\n" +
        "the caf\u00e9 second line also survives intact.")
      assert(q.lastProgress.stateOperators.isEmpty,
        "line gates introduced streaming state")
    } finally q.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** End-to-end corpus preparation invariants over the real documents
  * table: stage composition, split hygiene, packing bounds,
  * decontamination, and determinism.
  */
class CorpusPipelineSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  private lazy val evalSet = {
    import spark.implicits._
    // "benchmark" = two real documents: their 13-gram content must not
    // survive into the training corpus
    docs.filter(col("doc_id").isin(3L, 7L))
      .select(col("doc_id"), col("text"))
  }

  private lazy val out = CorpusPipeline.prepare(
    docs, evalSet,
    CorpusPipeline.Config(
      langs = Seq("en", "de", "fr"), minChars = 100,
      packTokens = 256L),
    "doc_id", "text", "source").cache()

  test("output is one row per surviving doc with a legal split label") {
    val n = out.count()
    assert(n > 0 && n < docs.count(), "pipeline must filter something")
    assert(out.select("doc_id").distinct().count() == n, "ids must be unique")
    val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")), splits.toString)
  }

  test("train rows are packed within the token budget; held-out rows are not") {
    val bad = out.filter(col("split") === "train" &&
      (col("bin_id").isNull || col("bin_offset") < 0 ||
        col("bin_offset") >= 256)).count()
    assert(bad == 0, s"$bad train rows violate packing bounds")
    assert(out.filter(col("split") =!= "train" && col("bin_id").isNotNull)
      .count() == 0, "held-out rows must not be packed")
  }

  test("benchmark documents are decontaminated out of the corpus") {
    assert(out.filter(col("doc_id").isin(3L, 7L)).count() == 0,
      "eval-set documents must not survive")
  }

  test("optional stages: window dedup tightens, learned gate filters") {
    val nBase = CorpusPipeline.prepare(docs, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
        packTokens = 256L),
      "doc_id", "text", "source").count()
    // the two builds share persisted/checkpointed prefix stages — drain
    // between them (base is fully materialized above)
    graft.core.CacheBin.drain()
    val strict = CorpusPipeline.prepare(
      docs.withColumn("__lab", (col("source") === "src0").cast("int")),
      evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
        packTokens = 256L,
        windowDedupN = 8,
        classifierLabel = Some("__lab"),
        minQualityMicro = 1L),
      "doc_id", "text", "source")
    val nStrict = strict.count()
    // both optional stages only ever REMOVE rows
    assert(nStrict <= nBase, s"strict $nStrict must be <= base $nBase")
    // the strict output keeps the full schema contract
    assert(strict.columns.toSeq ==
      Seq("doc_id", "split", "n_tokens", "bin_id", "bin_offset", "clean_text"))
  }

  test("langIdModelPath re-derives the lang column before the allowlist") {
    import spark.implicits._
    val mdl = java.nio.file.Files.createTempDirectory("cp_langid").toString + "/m"
    // disjoint toy languages; the corpus arrives with NO trusted label
    val labeled = Seq(
      (1L, "xx", "xaxa xbxb xaxa xcxc xaxa"),
      (2L, "yy", "yoyo ypyp yoyo yqyq yoyo"))
      .toDF("doc_id", "lang", "text")
    LangIdTrain.save(LangIdTrain.train(labeled, "text", "lang", 3, 5), mdl)
    val body = Seq.fill(30)("xaxa xbxb xcxc").mkString(" ") // >= minChars, xx
    val bodyY = Seq.fill(30)("yoyo ypyp yqyq").mkString(" ")
    val unlabeled = Seq(
      (10L, "mislabeled", body, "web"),
      (11L, "mislabeled", bodyY, "web"))
      .toDF("doc_id", "lang", "text", "source")
    val out = CorpusPipeline.prepare(
      unlabeled, spark.emptyDataFrame.select(lit(0L).as("doc_id"),
        lit("").as("text")).limit(0),
      CorpusPipeline.Config(langs = Seq("xx"), langIdModelPath = Some(mdl),
        minChars = 10, packTokens = 256L),
      "doc_id", "text", "source")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(10L),
      s"trained lang-ID must override the untrusted label: $ids")
  }

  test("URL stage dedups canonical twins and caps domains ahead of content stages") {
    graft.core.CacheBin.drain()
    // deterministic messy URLs: canonical key = doc_id % 40 (so ~n/40
    // raw URLs collide per key), 5 domains, case/port/tracking noise
    val k = col("doc_id") % 40
    val urlDocs = docs.withColumn("url", concat(
      when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("http")),
      lit("://Site"), (k % 5).cast("string"), lit(".example.com"),
      when(col("doc_id") % 3 === 0, lit(":80")).otherwise(lit("")),
      lit("/p/"), k.cast("string"),
      when(col("doc_id") % 2 === 1, lit("?utm_source=f")).otherwise(lit(""))))
    val out = CorpusPipeline.prepare(urlDocs, evalSet,
      CorpusPipeline.Config(urlCol = Some("url"), domainCap = 3,
        langs = Seq("en", "de", "fr"), minChars = 100, packTokens = 256L),
      "doc_id", "text", "source")
    val n = out.count()
    // 40 canonical keys -> <= 40 URL-dedup survivors; 5 domains x cap 3
    // -> <= 15 into the content stages, which only ever remove more
    assert(n > 0 && n <= 15, s"URL stage let $n rows through (cap 15)")
    // the schema contract is unchanged by the URL stage
    assert(out.columns.toSeq ==
      Seq("doc_id", "split", "n_tokens", "bin_id", "bin_offset", "clean_text"))
    // every survivor is its canonical key's longest text (keep-best)
    val canonKey = UrlOps.canonicalize(col("url"))
    val winners = urlDocs
      .groupBy(canonKey.as("ck"))
      .agg(max(struct(length(col("text")).as("s"), (-col("doc_id")).as("ni")))
        .as("w"))
      .select((-col("w.ni")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(winners),
      s"non-winners survived the URL stage: ${survivors -- winners}")
  }

  test("optional span dedup strips repeated spans but keeps the documents") {
    val base = CorpusPipeline.prepare(docs, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
        packTokens = 256L),
      "doc_id", "text", "source")
    // span dedup rewrites text, it does not drop documents — survivor
    // sets can only shrink via the (text-dependent) quality gates
    val nBase = base.count()
    val totBase = base.agg(sum(col("n_tokens"))).head().getLong(0)
    // base fully materialized: drain before the second build, which
    // shares its persisted/checkpointed prefix stages
    graft.core.CacheBin.drain()
    val spanned = CorpusPipeline.prepare(docs, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
        packTokens = 256L,
        spanDedupWindow = 5),
      "doc_id", "text", "source")
    val nSpan = spanned.count()
    assert(nSpan <= nBase, s"span $nSpan must be <= base $nSpan")
    // and it genuinely removes repeated-span tokens somewhere
    val totSpan = spanned.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(totSpan < totBase,
      s"span dedup should shorten the corpus ($totSpan vs $totBase)")
  }

  test("bloom decontamination only ever drops MORE; huge filter equals exact") {
    import spark.implicits._
    val cfg = CorpusPipeline.Config(
      langs = Seq("en", "de", "fr"), minChars = 100, packTokens = 256L)
    def ids(c: CorpusPipeline.Config) =
      try CorpusPipeline.prepare(docs, evalSet, c, "doc_id", "text", "source")
        .select($"doc_id").as[Long].collect().toSet
      finally graft.core.CacheBin.drain() // the three variants share prefixes
    val exact = ids(cfg)
    val bloomTight = ids(cfg.copy(bloomDecontaminationBits = 1 << 14))
    val bloomAmple = ids(cfg.copy(bloomDecontaminationBits = 1 << 22))
    assert(bloomTight.subsetOf(exact), "bloom kept a doc exact dropped")
    assert(bloomAmple === exact, "ample bloom should equal exact")
  }

  test("modern tail: chunk/epoch/shard invariants hold end to end") {
    val out = CorpusPipeline.prepare(docs, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
        packTokens = 64L,
        temperatureMixDocs = 50L,
        chunkTokens = 16, chunkOverlap = 4,
        epochBudgetPerSource = 400L, epochMaxEpochs = 3,
        nShards = 4),
      "doc_id", "text", "source").cache()
    try {
      assert(out.columns.toSeq == Seq("doc_id", "split", "epoch",
        "chunk_idx", "n_tokens", "bin_id", "bin_offset", "shard",
        "clean_text"))
      val train = out.filter(col("split") === "train")
      assert(train.count() > 0, "modern tail must emit train units")
      // chunks respect the token window; epochs respect the cap
      assert(train.filter(col("n_tokens") > 16).count() == 0,
        "a chunk exceeded chunkTokens")
      assert(train.filter(col("epoch") < 0 || col("epoch") > 3).count() == 0)
      assert(train.filter(col("shard") < 0 || col("shard") >= 4).count() == 0)
      assert(train.filter(col("bin_offset") < 0 || col("bin_offset") >= 64)
        .count() == 0, "packing bound violated")
      // epoch repetition emits identical chunk text per repeat
      val reps = train.groupBy("doc_id", "chunk_idx")
        .agg(countDistinct(col("clean_text")).as("v"))
        .filter(col("v") > 1).count()
      assert(reps == 0, "repeated chunks must carry identical text")
      // held rows keep nulls in every train-only column
      assert(out.filter(col("split") =!= "train" &&
        (col("epoch").isNotNull || col("shard").isNotNull ||
          col("bin_id").isNotNull)).count() == 0)
    } finally out.unpersist()
  }

  test("repetition gate composes: an injected self-repeating doc is dropped") {
    val spam = ("buy cheap now " * 40).trim
    val spamRow = docs.limit(1)
      .withColumn("doc_id", lit(99999L))
      .withColumn("text", lit(spam))
      .withColumn("lang", lit("en"))
    val withSpam = docs.unionByName(spamRow)
    def ids(gate: Boolean) =
      try CorpusPipeline.prepare(withSpam, evalSet,
        CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
          packTokens = 256L, repetitionGate = gate),
        "doc_id", "text", "source")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      finally graft.core.CacheBin.drain()
    assert(ids(gate = false).contains(99999L),
      "spam must survive the heuristic gates alone (it is long enough)")
    assert(!ids(gate = true).contains(99999L),
      "the composed repetition gate must drop the self-repeating doc")
  }

  test("tokenizerPath makes every n_tokens a saved-model Viterbi count") {
    // train on the corpus, SAVE, run the pipeline against the loaded
    // artifact — the full train-once/count-everywhere seam, same as
    // streaming ingest's tokenizerPath
    val res = UnigramLearn.learn(docs, "text")
    val tp = java.nio.file.Files.createTempDirectory("pipe-tok").toString + "/unigram"
    TokenizerIO.saveUnigram(spark, res.vocab, tp)
    graft.core.CacheBin.drain()
    val out = CorpusPipeline.prepare(docs, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
        packTokens = 256L, tokenizerPath = Some(tp)),
      "doc_id", "text", "source")
    // every output row's n_tokens equals the direct encode count of its
    // CLEAN text (the pipeline counts post-boilerplate text)
    val mismatches = out
      .withColumn("__direct",
        size(UnigramLearn.encodeExpr(col("clean_text"), res.vocab)).cast("long"))
      .filter(col("n_tokens") =!= col("__direct"))
      .count()
    assert(mismatches == 0,
      s"$mismatches rows carry non-model token counts under tokenizerPath")
    // model counts differ from whitespace counts (the seam is live)
    val diff = out.withColumn("__ws",
        size(graft.functions.TextAnalysis.tokens(col("clean_text"))).cast("long"))
      .filter(col("n_tokens") =!= col("__ws")).count()
    assert(diff > 0, "model token counts never diverged from whitespace")
  }

  test("line-curation stages: byte repair, C4 gate, corpus line dedup compose") {
    graft.core.CacheBin.drain()
    // multi-line synth: body chunks end with '.', two shared chrome
    // lines (line-dedup bait), one unique tail per doc carrying a
    // control char + a DECOMPOSED e-acute (fixText bait)
    val lineDocs = docs.withColumn("text", concat(
      regexp_replace(col("text"), " merge ", ".\n"),
      lit("\nsubscribe to our newsletter today."),
      lit("\nthe quick brown fox jumps over the dog."),
      lit("\nunique tail "), col("doc_id").cast("string"),
      lit(" carries e\u0301lan\u0007 forward.")))
    val out = CorpusPipeline.prepare(lineDocs, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 20,
        packTokens = 256L,
        fixText = true, c4MinWords = 3, lineDedupMinDocFreq = 2,
        // neutralize the token-window boilerplate scrub so shared-line
        // removal is attributable to the line-dedup stage alone
        boilerMinDocFreq = 1000000),
      "doc_id", "text", "source")
    assert(out.count() > 0, "line-curation run must keep something")
    assert(out.columns.toSeq ==
      Seq("doc_id", "split", "n_tokens", "bin_id", "bin_offset", "clean_text"))
    // corpus line dedup removed the shared chrome lines from EVERY doc
    assert(out.filter(col("clean_text").contains("subscribe to our newsletter"))
      .count() == 0, "shared chrome line survived line dedup")
    assert(out.filter(col("clean_text").contains("quick brown fox"))
      .count() == 0, "second shared line survived line dedup")
    // fixText stripped the control char and composed the e-acute
    assert(out.filter(col("clean_text").contains("\u0007")).count() == 0,
      "control char survived byte repair")
    assert(out.filter(col("clean_text").contains("\u0301")).count() == 0,
      "decomposed combining mark survived byte repair")
    assert(out.filter(col("clean_text").contains("\u00e9lan")).count() > 0,
      "composed form should appear in surviving unique tails")
  }

  test("URL blocklist: blocked domains (and subdomains) never reach content stages") {
    graft.core.CacheBin.drain()
    import spark.implicits._
    // host depends on doc_id % 3: a third of docs sit on the blocked
    // registered domain (some as subdomains)
    val urled = docs.withColumn("url",
      concat(lit("http://"),
        when(col("doc_id") % 3 === 0, lit("ads.bad.example"))
          .when(col("doc_id") % 3 === 1, lit("bad.example"))
          .otherwise(lit("good.example")),
        lit("/p/"), col("doc_id").cast("string")))
    val block = Seq("bad.example").toDF("domain")
    val out = CorpusPipeline.prepare(urled, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 20,
        packTokens = 256L, urlCol = Some("url")),
      "doc_id", "text", "source", blocklist = Some(block))
    assert(out.count() > 0)
    assert(out.filter(pmod(col("doc_id"), lit(3)) =!= 2).count() == 0,
      "documents on the blocked domain (or its subdomains) survived")
    // blocklist without urlCol fails loudly instead of silently no-op
    intercept[IllegalArgumentException] {
      CorpusPipeline.prepare(urled, evalSet,
        CorpusPipeline.Config(langs = Seq("en")),
        "doc_id", "text", "source", blocklist = Some(block))
    }
  }

  test("PII scrub stage: typed tags in, raw PII out, before any hashing") {
    graft.core.CacheBin.drain()
    // doc_id sits OUTSIDE the redacted spans: after redaction the
    // tails stay doc-unique, so the boilerplate scrub (which would
    // correctly remove a corpus-wide identical tail) leaves them
    val piiDocs = docs.withColumn("text", concat(col("text"),
      lit(" contact user@mail.example id "), col("doc_id").cast("string"),
      lit(" ssn 987-65-4321 now.")))
    val out = CorpusPipeline.prepare(piiDocs, evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 20,
        packTokens = 256L, redactPii = true),
      "doc_id", "text", "source")
    assert(out.count() > 0)
    assert(out.filter(col("clean_text").rlike("@mail\\.example")).count() == 0,
      "raw email survived the scrub")
    assert(out.filter(col("clean_text").contains("987-65-4321")).count() == 0,
      "raw SSN survived the scrub")
    // downstream of the boilerplate scrub clean_text is rebuilt from
    // lowercased tokens, so the tags read <email>/<ssn> there; a few
    // docs legitimately lose a tag to shared-window boilerplate
    // removal (the word-soup prefix collides across docs), so the tag
    // presence check is a strong majority, while the NO-RAW-PII
    // invariant above is absolute
    val tagged = out.filter(lower(col("clean_text")).contains("<email>") &&
      lower(col("clean_text")).contains("<ssn>")).count()
    assert(tagged * 10 >= out.count() * 9,
      s"typed tags survive in too few documents: $tagged of ${out.count()}")
  }

  test("prepareWithReport emits the survivor funnel; prepare is unchanged") {
    graft.core.CacheBin.drain()
    val cfg = CorpusPipeline.Config(langs = Seq("en", "de", "fr"),
      minChars = 100, packTokens = 256L)
    val (out, funnel) = CorpusPipeline.prepareWithReport(docs, evalSet, cfg,
      "doc_id", "text", "source")
    val byName = funnel.map(s => s.stage -> s.rows).toMap
    // stage order for this config (optional stages absent)
    assert(funnel.map(_.stage) === Seq("input", "dedup", "quality_gates",
      "decontaminated", "train_mixed", "output"))
    assert(byName("input") === docs.count())
    // document stages only ever remove rows
    assert(byName("dedup") <= byName("input"))
    assert(byName("quality_gates") <= byName("dedup"))
    assert(byName("decontaminated") <= byName("quality_gates"))
    assert(byName("train_mixed") <= byName("decontaminated"))
    // output = packed train + held-out rows, one row per survivor
    assert(byName("output") === out.count())
    assert(byName("output") === byName("decontaminated"))
    // materialize before draining the checkpoints out's lineage rides on
    val reported = out.select("doc_id").collect().map(_.getLong(0)).toSet
    graft.core.CacheBin.drain()
    // and the count-free path returns the identical corpus
    val plain = CorpusPipeline.prepare(docs, evalSet, cfg,
      "doc_id", "text", "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plain === reported)
  }

  test("the pipeline is deterministic under repartitioning") {
    def run(parts: Int) = CorpusPipeline.prepare(
      docs.repartition(parts), evalSet,
      CorpusPipeline.Config(langs = Seq("en", "de", "fr"), minChars = 100,
        packTokens = 256L),
      "doc_id", "text", "source")
      .select("doc_id", "split", "bin_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(run(2) == run(9))
  }

  test("delta run equals a full curate over the combined corpus (keep-first pinned)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_delta").toString
    val idx = s"$base/dedupindex"
    val lidx = s"$base/lineindex"
    val oldChrome = "visit our generous sponsor page today for deals"
    val newChrome = "download our mobile application from the store now"
    val bodyA = "the quick brown fox jumps over the lazy dog near the river bank today morning"
    val bodyF = "fourteenth unique travel journal describing long caravan routes across vast desert landscapes and oases"
    val olds = Seq(
      (1L, "en", bodyA),
      (2L, "en", "completely different second document about mountain hiking and alpine trail maps for summer"),
      (3L, "en", s"third document body text about cooking pasta recipes with garlic and olive oil\n$oldChrome"),
      (4L, "en", s"fourth document discusses astronomy telescopes and detailed star charts for northern skies\n$oldChrome"))
    val news = Seq(
      // unique, chrome-free: admitted verbatim (cleaned == original)
      (11L, "en", "eleventh fresh essay on underwater photography techniques with coral reefs and ambient natural light"),
      // one-word edit of old 1: dropped (near-dup of the accepted corpus)
      (12L, "en", bodyA.replace("morning", "evening")),
      // exact copy of old 2: dropped (J = 1 via the index screen)
      (13L, "en", "completely different second document about mountain hiking and alpine trail maps for summer"),
      // admitted; NEWCHROME stripped by the WITHIN-delta line dedup
      (14L, "en", s"$bodyF\n$newChrome"),
      // one-word edit of 14: dropped (within-delta near-dup, keep-first)
      (15L, "en", s"${bodyF.replace("oases", "canyons")}\n$newChrome"),
      // admitted; OLDCHROME stripped via the index, NEWCHROME within-delta
      (16L, "en", s"sixteenth report on municipal recycling programs and seasonal collection schedules for residents\n$oldChrome\n$newChrome"),
      // below the char floor: dropped
      (17L, "en", "too short to keep"),
      // near-dup of 12 ONLY (two words from old 1): the loser-chain
      // ordering pin — in-delta clean must see 12 BEFORE the index
      // screen drops it, so 18 still loses to 12 exactly as in a full
      // run's direct-pair rule
      (18L, "en", bodyA.replace("morning", "evening").replace("quick", "swift")))
    val oldDf = olds.toDF("doc_id", "lang", "text")
    val newDf = news.toDF("doc_id", "lang", "text")
    val cfg = CorpusPipeline.Config(langs = Seq("en"), minChars = 40,
      jaccardThreshold = 0.5, lineDedupMinDocFreq = 2,
      boilerMinDocFreq = 99)
    val empty = spark.emptyDataFrame.withColumn("doc_id", lit(0L))
      .withColumn("text", lit("")).limit(0)
    // ---- bootstrap artifacts from the day-0 corpus (bands must match
    // CorpusClean's in-pipeline banding: threshold 0.5 -> 8 bands) ----
    TextDedup.writeDedupIndex(oldDf, "doc_id", "text", idx, bands = 8)
    LineIndex.writeLineIndex(oldDf, "doc_id", "text", lidx, minDocFreq = 2)
    graft.core.CacheBin.drain()
    val arts = CorpusPipeline.DeltaArtifacts(
      dedupIndexPath = idx, lineIndexPath = Some(lidx))
    val delta = CorpusPipeline.prepareDelta(newDf, empty, cfg, arts)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    // ---- the full-run twin over the combined corpus ----
    val full = CorpusPipeline.curate(oldDf.unionByName(newDf), empty, cfg)
      .filter(col("doc_id") > 10L)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(delta.keySet === Set(11L, 14L, 16L),
      s"delta admission set: ${delta.keySet}")
    assert(delta === full,
      s"delta diverged from the full twin:\ndelta=$delta\nfull=$full")
    assert(!delta(16L).contains("sponsor") && !delta(16L).contains("mobile"),
      s"both chrome grains must be stripped: ${delta(16L)}")
    // ---- delta 2 screens against delta 1's APPENDED admissions ----
    val delta2 = CorpusPipeline.prepareDelta(Seq(
        (21L, "en", news.head._3), // exact copy of accepted 11
        (22L, "en", "twentysecond brand new chronicle of harbor renovations and ferry schedule changes this autumn"))
        .toDF("doc_id", "lang", "text"),
      empty, cfg, arts)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.core.CacheBin.drain()
    val full2 = CorpusPipeline.curate(
      oldDf.unionByName(newDf).unionByName(Seq(
        (21L, "en", news.head._3),
        (22L, "en", "twentysecond brand new chronicle of harbor renovations and ferry schedule changes this autumn"))
        .toDF("doc_id", "lang", "text")),
      empty, cfg)
      .filter(col("doc_id") > 20L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.core.CacheBin.drain()
    assert(delta2 === Set(22L), s"delta2 admission: $delta2")
    assert(delta2 === full2, s"delta2=$delta2 full2=$full2")
  }

  test("threshold straddle: delta admits it, the true-up removes it") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trueup").toString
    val idx = s"$base/dedupindex"
    val lidx = s"$base/lineindex"
    // the straddle: df 1 in the old corpus + 1 in the delta, at the
    // floor of 2 only when SUMMED — each side alone is below floor
    val straddle = "limited time offer subscribe now for exclusive member benefits"
    val olds = Seq(
      (1L, "en", "first long unique document about volcanic geology and basalt column formations in iceland\n" + straddle),
      (2L, "en", "second unique document describing medieval manuscript preservation and vellum restoration techniques"))
    val news = Seq(
      (11L, "en", "eleventh wholly distinct piece on urban beekeeping rooftop hives and pollinator corridors\n" + straddle),
      (12L, "en", "twelfth separate article about tidal energy turbines and estuary environmental assessments"))
    val oldDf = olds.toDF("doc_id", "lang", "text")
    val newDf = news.toDF("doc_id", "lang", "text")
    val cfg = CorpusPipeline.Config(langs = Seq("en"), minChars = 40,
      jaccardThreshold = 0.5, lineDedupMinDocFreq = 2,
      boilerMinDocFreq = 99)
    val empty = spark.emptyDataFrame.withColumn("doc_id", lit(0L))
      .withColumn("text", lit("")).limit(0)
    TextDedup.writeDedupIndex(oldDf, "doc_id", "text", idx, bands = 8)
    LineIndex.writeLineIndex(oldDf, "doc_id", "text", lidx, minDocFreq = 2)
    graft.core.CacheBin.drain()
    val arts = CorpusPipeline.DeltaArtifacts(
      dedupIndexPath = idx, lineIndexPath = Some(lidx))
    // materialize the delta output before draining the pipeline's
    // checkpoints — production shape too: the accepted delta is
    // written out long before a later re-index trues it up
    val deltaRows = CorpusPipeline.prepareDelta(newDf, empty, cfg, arts)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    graft.core.CacheBin.drain()
    val delta = deltaRows.toSeq.toDF("doc_id", "lang", "text")
    val deltaTexts = deltaRows.map(r => r._1 -> r._3).toMap
    // corner (a) as documented: the delta ADMITS the straddled line
    // (old df 1 is below the index floor, delta df 1 below the
    // within-delta floor)...
    assert(deltaTexts(11L).contains("exclusive member benefits"),
      s"fixture no longer straddles: ${deltaTexts(11L)}")
    // ...where the full-run twin removes it (combined df 2 = floor)
    val full = CorpusPipeline.curate(oldDf.unionByName(newDf), empty, cfg)
      .filter(col("doc_id") > 10L)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(!full(11L).contains("exclusive member benefits"))
    // the true-up closes it: recompute df over old ++ delta, diff the
    // at-floor set, re-screen the delta's accepted docs
    val trued = CorpusPipeline.trueUpDelta(oldDf, newDf, delta, arts)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(trued === full,
      s"true-up must land on the full twin:\ntrued=$trued\nfull=$full")
    // and the artifact was refreshed IN PLACE: the next delta carrying
    // the same line screens it at ingest, no true-up needed
    val delta2 = CorpusPipeline.prepareDelta(Seq(
        (21L, "en", "twentyfirst fresh chronicle of alpine observatory construction and winter logistics\n" + straddle))
        .toDF("doc_id", "lang", "text"),
      empty, cfg, arts)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(delta2.contains(21L) &&
      !delta2(21L).contains("exclusive member benefits"),
      s"refreshed index must screen the straddled line: $delta2")
  }

  test("true-up strips only whole-line provenance; embedded runs survive") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trueup2").toString
    val idx = s"$base/dedupindex"
    val lidx = s"$base/lineindex"
    val straddle = "seasonal clearance announcement for loyal patrons"
    val olds = Seq(
      (1L, "en", "opening standalone essay on glacial moraine stratigraphy and sediment dating\n" + straddle),
      (2L, "en", "second standalone study of coastal erosion management and dune restoration"))
    val news = Seq(
      // 11 carries the unit as a WHOLE line -> the full twin strips it
      (11L, "en", "eleventh independent report on geothermal district heating economics\n" + straddle),
      // 12 carries the SAME TOKEN RUN only EMBEDDED inside a longer
      // line -> the full twin's line dedup does NOT touch it (the long
      // line's own df is 1), so the true-up must not either
      (12L, "en", "twelfth distinct piece quoting the " + straddle +
        " banner while analyzing retail messaging strategies"))
    val oldDf = olds.toDF("doc_id", "lang", "text")
    val newDf = news.toDF("doc_id", "lang", "text")
    val cfg = CorpusPipeline.Config(langs = Seq("en"), minChars = 40,
      jaccardThreshold = 0.5, lineDedupMinDocFreq = 2,
      boilerMinDocFreq = 99)
    val empty = spark.emptyDataFrame.withColumn("doc_id", lit(0L))
      .withColumn("text", lit("")).limit(0)
    TextDedup.writeDedupIndex(oldDf, "doc_id", "text", idx, bands = 8)
    LineIndex.writeLineIndex(oldDf, "doc_id", "text", lidx, minDocFreq = 2)
    graft.core.CacheBin.drain()
    val arts = CorpusPipeline.DeltaArtifacts(
      dedupIndexPath = idx, lineIndexPath = Some(lidx))
    val deltaRows = CorpusPipeline.prepareDelta(newDf, empty, cfg, arts)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    graft.core.CacheBin.drain()
    val delta = deltaRows.toSeq.toDF("doc_id", "lang", "text")
    val full = CorpusPipeline.curate(oldDf.unionByName(newDf), empty, cfg)
      .filter(col("doc_id") > 10L)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    // ground truth: the full twin strips 11's whole line, keeps 12's
    // embedded occurrence
    assert(!full(11L).contains("loyal patrons"), s"full kept 11: $full")
    assert(full(12L).contains("loyal patrons"), s"full stripped 12: $full")
    val trued = CorpusPipeline.trueUpDelta(oldDf, newDf, delta, arts,
      regate = Some(cfg))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(trued === full,
      s"line-provenance strip must land on the full twin:\ntrued=$trued\nfull=$full")
  }

  test("true-up re-gates modified docs: strip below minChars drops the doc") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trueup3").toString
    val idx = s"$base/dedupindex"
    val lidx = s"$base/lineindex"
    val straddle = "weekly digest subscription reminder for registered readers"
    val olds = Seq(
      (1L, "en", "first standalone treatise on orchard grafting compatibility and rootstock vigor\n" + straddle),
      (2L, "en", "second standalone account of river delta sediment transport and channel migration"))
    val news = Seq(
      // 11 passes minChars=40 ONLY with the straddled line: base text
      // is 21 chars, the line brings raw length past the gate; after
      // the strip its flattened text is back under 40
      (11L, "en", "tiny beekeeping note\n" + straddle),
      (12L, "en", "twelfth unrelated survey of tram network electrification and depot siting"))
    val oldDf = olds.toDF("doc_id", "lang", "text")
    val newDf = news.toDF("doc_id", "lang", "text")
    val cfg = CorpusPipeline.Config(langs = Seq("en"), minChars = 40,
      jaccardThreshold = 0.5, lineDedupMinDocFreq = 2,
      boilerMinDocFreq = 99)
    val empty = spark.emptyDataFrame.withColumn("doc_id", lit(0L))
      .withColumn("text", lit("")).limit(0)
    TextDedup.writeDedupIndex(oldDf, "doc_id", "text", idx, bands = 8)
    LineIndex.writeLineIndex(oldDf, "doc_id", "text", lidx, minDocFreq = 2)
    graft.core.CacheBin.drain()
    val arts = CorpusPipeline.DeltaArtifacts(
      dedupIndexPath = idx, lineIndexPath = Some(lidx))
    val deltaRows = CorpusPipeline.prepareDelta(newDf, empty, cfg, arts)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    graft.core.CacheBin.drain()
    assert(deltaRows.exists(_._1 == 11L),
      "fixture broken: 11 must be admitted by the delta (raw length passes)")
    val delta = deltaRows.toSeq.toDF("doc_id", "lang", "text")
    // with the re-gate: 11's post-strip text (21 chars) fails minChars
    // -> dropped; 12 was never modified -> never re-checked
    val trued = CorpusPipeline.trueUpDelta(oldDf, newDf, delta, arts,
      regate = Some(cfg))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(!trued.contains(11L),
      s"modified doc below minChars must be re-gated out: $trued")
    assert(trued.contains(12L), s"unmodified doc must stay: $trued")
    // the artifact refresh must describe the DELIVERED corpus: with 11
    // dropped, the straddle's df is 1 (old doc 1 only) — under the
    // floor, so its hash must NOT be in the refreshed index (a kept
    // contribution from the undelivered doc would over-flag future
    // deltas)
    val straddleHash = spark.range(1)
      .select(graft.functions.TextAnalysis.polyHash(lit(straddle)).as("h"))
      .head().getLong(0)
    val storedHashes = spark.read.parquet(s"$lidx/hashes")
      .select("hash").collect().map(_.getLong(0)).toSet
    assert(!storedHashes.contains(straddleHash),
      "refreshed artifact must exclude the re-gated doc's line-df contribution")
    // without the re-gate (back-compat): 11 stays, stripped. The first
    // true-up refreshed the artifact in place (its diff is now empty),
    // so restore the pre-true-up index before the second call.
    LineIndex.writeLineIndex(oldDf, "doc_id", "text", lidx, minDocFreq = 2)
    graft.core.CacheBin.drain()
    val truedNoGate = CorpusPipeline.trueUpDelta(oldDf, newDf, delta, arts)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.core.CacheBin.drain()
    assert(truedNoGate.contains(11L) &&
      !truedNoGate(11L).contains("registered readers"),
      s"no-gate true-up keeps the shrunken doc, stripped: $truedNoGate")
  }
}

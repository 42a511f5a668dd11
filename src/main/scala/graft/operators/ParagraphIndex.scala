package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.TextHashExpr

import graft.functions.TextAnalysis

/** Materialized paragraph MinHash band-key index — corpus-level FUZZY
  * paragraph dedup for the STREAMING ingest path, completing the
  * in-stream screen family: exact line/paragraph screens exist
  * ([[LineIndex]]); this is the near-dup grain
  * ([[LineCuration.stripNearDupParagraphs]]'s flag side), mirroring
  * the same materialized-artifact pattern:
  *
  *  1. a BATCH job computes every reference-corpus paragraph's MinHash
  *     signature and materializes the DISTINCT band keys (a model-
  *     sized artifact: band keys dedup heavily on templated corpora);
  *  2. the STREAM compiles the artifact once at start into a broadcast
  *     Bloom bitset; each incoming paragraph recomputes its signature
  *     with the SAME coefficients and banding (one shared
  *     [[TextDedup.bandValue]] construction) and is stripped when ANY
  *     of its band keys probes positive — a pure per-row scan
  *     expression, zero joins, zero streaming state;
  *  3. periodic batch re-index refreshes the artifact on restart.
  *
  * Screen semantics: a band-key hit is an LSH CANDIDATE — the batch
  * twin ([[LineCuration.stripNearDupParagraphsAgainst]]) additionally
  * verifies exact shingle Jaccard >= threshold. In-stream the verify
  * would need the reference shingle sets (corpus-sized, not
  * broadcastable), so the screen strips candidates directly: it
  * OVER-strips at the banding's false-positive rate plus the Bloom's —
  * same acceptable-over-strip contract as [[LineIndex]]'s Bloom, with
  * the batch twin as ground truth. Tune `bands` (fewer bands = longer
  * rows = fewer false candidates) for precision.
  *
  * Precision hybrid (`headK > 0`): the top-K hottest reference
  * paragraphs' exact shingle sets ARE broadcastable (model-sized), so
  * the artifact carries them plus a tail-only Bloom — the stream then
  * runs the exact verify for head collisions (precision 1.0 against
  * the head, where templated corpora concentrate their collisions)
  * and keeps the screen for the tail. [[ParagraphIndexSpec]] pins the
  * measured false-positive budget both ways.
  */
object ParagraphIndex {

  private val Family = "paragraph-band-index"

  /** Compiled probe state. `headSets`/`tailWords` are the optional
    * precision hybrid (headK > 0 at build time): the top-K hottest
    * reference paragraphs' EXACT shingle sets ride along (model-sized:
    * K × ~200 longs), and the Bloom splits in two — `tailWords` holds
    * band keys belonging ONLY to non-head paragraphs. A tail hit
    * strips on the screen contract; a head-only hit gets the exact
    * Jaccard >= threshold verify the batch twin runs, so the gray band
    * (Jaccard just below threshold) keeps its paragraphs whenever the
    * collision came from the head — which on templated corpora is
    * where almost all collisions come from.
    */
  final case class ParagraphFilter(words: Array[Long], kHashes: Int,
      n: Int, h: Int, bands: Int, seed: Long,
      threshold: Double = 0.5,
      headSets: Array[Array[Long]] = Array.empty,
      tailWords: Array[Long] = Array.empty)

  /** (band, value) → one Bloom-probe key, reduced into fingerprint
    * space: the shared [[BloomDecontaminate.position]] double hash
    * assumes inputs < FingerprintMod (its multiplies overflow ANSI
    * long arithmetic on full-range xxhash64 output). One definition,
    * used verbatim by the batch writer and the stream probe.
    */
  private def bandKey(band: Column, value: Column): Column =
    pmod(xxhash64(band, value),
      lit(graft.functions.TextAnalysis.FingerprintMod))

  /** Non-blank paragraphs of the corpus as (doc, pos, text) rows. */
  private def units(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol),
        posexplode(split(col(textCol), "\n\n")).as(Seq("__pos", "__u")))
      .filter(length(trim(col("__u"))) > 0)

  /** Keys beyond this and [[UrlOps.domainFilterBits]]'s 1<<30-bit
    * (128 MiB) broadcast ceiling caps the bitset at FEWER than its
    * target 10 bits/key — the screen's false-positive rate would then
    * degrade SILENTLY with corpus growth, over-stripping clean
    * paragraphs at an unbounded rate. The build fails loudly instead
    * (the RangeJoin / doc·2^20 guard discipline: an actionable error
    * beats a quietly-wrong artifact).
    */
  val MaxIndexKeys: Long = (1L << 30) / 10

  /** Byte-budget cap on an AUTO-sized head (headK < 0): each head set
    * is ~200 shingle longs (~1.6 KiB), so 4096 sets ≈ 6.7 MiB of
    * broadcast — comfortably model-sized next to the 128 MiB bitset
    * ceiling. An auto pick never exceeds it even when the hotness
    * distribution is too flat to reach the mass target.
    */
  val MaxAutoHeadK: Int = 4096

  /** Batch (re-)build: writes `path/meta` (family + signature scheme)
    * and `path/hashes` (distinct xxhash64(band, val) keys). Returns
    * the key count. The signature scheme rides in the meta so a
    * stream can never probe with mismatched hashing. The distinct-key
    * count is checked against [[MaxIndexKeys]] BEFORE anything is
    * written: an over-budget corpus must not leave a half-built
    * artifact behind.
    *
    * `headK`: 0 = pure screen; > 0 = fixed-size precision head;
    * NEGATIVE = AUTO — the right K is a property of the corpus's
    * hotness distribution, not a constant, so the build picks the
    * smallest K whose cumulative `__hot` mass covers `headMassTarget`
    * of the REPEATED paragraph mass (occurrences of paragraphs seen in
    * >= 2 places — where expected collisions concentrate), capped at
    * [[MaxAutoHeadK]] by the broadcast byte budget. The resolved K and
    * the coverage it achieved are recorded in the artifact meta
    * (`head_k`, `head_mass`) so an operator can see what the auto pick
    * did without re-deriving the distribution.
    */
  def writeParagraphIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, threshold: Double = 0.5, n: Int = 3, h: Int = 16,
      bands: Int = 0, seed: Long = 42L,
      maxKeys: Long = MaxIndexKeys, headK: Int = 0,
      headMassTarget: Double = 0.9): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = if (bands > 0) bands else TextDedup.bandsFor(threshold)
    // distinct unit texts with their corpus occurrence count (the
    // "hotness" that picks the head) — templated corpora dedup heavily
    // here, so this is the model-sized grain everything downstream
    // hangs off
    val unitCounts = units(docs, idCol, textCol)
      .groupBy(col("__u")).agg(count(lit(1)).as("__hot"))
    val banded = TextDedup.bandedSignatures(
      unitCounts.select(col("__u").as("__text"), col("__hot")),
      "__text", "__text", n, h, b, seed, carry = Seq("__hot"))
    // persisted: the guard's count() and the writes below must not
    // each pay the full tokenize+shingle+minhash pass over the corpus
    val keyed = banded
      .select(col("__text"), col("__hot"),
        bandKey(col("band"), col("val")).as("hash"))
      .persist()
    try {
      // auto head sizing (headK < 0): bounded collect — at most
      // MaxAutoHeadK hotness values, each one long. The distinct
      // (text, hot) grain is read back from the PERSISTED keyed frame
      // (one distinct over cached rows) rather than re-running the
      // corpus tokenize/explode/groupBy lineage of unitCounts.
      lazy val hotDistinct = keyed
        .select(col("__text").as("__u"), col("__hot")).distinct()
      val (resolvedHeadK, headMass): (Int, Double) =
        if (headK >= 0) (headK, -1.0)
        else {
          val totalRep = hotDistinct.filter(col("__hot") >= 2)
            .agg(coalesce(sum(col("__hot")), lit(0L))).head().getLong(0)
          if (totalRep == 0L) (0, 0.0)
          else {
            val topHots = hotDistinct.filter(col("__hot") >= 2)
              .orderBy(desc("__hot"), xxhash64(col("__u")))
              .limit(MaxAutoHeadK)
              .select(col("__hot")).collect().map(_.getLong(0))
            val target = headMassTarget * totalRep
            var cum = 0L
            var k = 0
            while (k < topHots.length && cum < target) {
              cum += topHots(k); k += 1
            }
            (k, cum.toDouble / totalRep)
          }
        }
      val nKeys = keyed.select("hash").distinct().count()
      require(nKeys <= maxKeys,
        s"paragraph index over the broadcast-Bloom budget: $nKeys distinct " +
          s"band keys > $maxKeys (10 bits/key inside the 128 MiB bitset " +
          "ceiling). Beyond it the false-positive rate degrades silently " +
          "and the stream over-strips clean paragraphs. Shard the corpus " +
          "into per-partition indexes, raise `threshold` (fewer bands), " +
          "or index only the head of the reference corpus.")
      keyed.select("hash").distinct()
        .coalesce(1).write.mode("overwrite").parquet(s"$path/hashes")
      if (resolvedHeadK > 0) {
        // head = the resolvedHeadK hottest distinct paragraphs
        // (deterministic tiebreak on the text hash); their EXACT
        // shingle sets ship in the artifact for stream-side verify,
        // and the tail-only Bloom keys let the probe tell which regime
        // a collision came from
        val headTexts = hotDistinct
          .orderBy(desc("__hot"), xxhash64(col("__u")))
          .limit(resolvedHeadK).select(col("__u"))
        TextDedup.withShingleHashes(
          headTexts.withColumn("__id", lit(0L)), "__id", "__u", n)
          .select(sort_array(col("__shh")).as("shingles"))
          .coalesce(1).write.mode("overwrite").parquet(s"$path/head")
        keyed.join(broadcast(headTexts.select(col("__u").as("__text"))),
            Seq("__text"), "left_anti")
          .select("hash").distinct()
          .coalesce(1).write.mode("overwrite").parquet(s"$path/hashes_tail")
      }
      Seq((Family, n, h, b, seed, threshold, resolvedHeadK, headMass))
        .toDF("family", "n", "h", "bands", "seed", "threshold", "head_k",
          "head_mass")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      nKeys
    } finally keyed.unpersist()
  }

  /** Compile the artifact to a broadcast-ready Bloom bitset carrying
    * its signature scheme.
    */
  def loadFilter(spark: SparkSession, path: String,
      kHashes: Int = 3): ParagraphFilter = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1 && meta(0).getString(0) == Family,
      s"not a $Family artifact at $path " +
        s"(found ${meta.headOption.map(_.getString(0))})")
    def bloomOf(dir: String): Array[Long] = {
      val hashes = spark.read.parquet(dir)
      val bits = UrlOps.domainFilterBits(hashes.count())
      BloomDecontaminate.buildFilterFromHashes(
        hashes.select(col("hash").as("__h")), bits, kHashes)
    }
    val words = bloomOf(s"$path/hashes")
    // artifacts written before the hybrid carry a 5-column meta
    // (family, n, h, bands, seed) — they load as a pure screen with
    // the default threshold instead of crashing a running ingest
    val hasHybridMeta = meta(0).length > 6
    val headK = if (hasHybridMeta) meta(0).getInt(6) else 0
    val threshold = if (hasHybridMeta) meta(0).getDouble(5) else 0.5
    val (headSets, tailWords) =
      if (headK <= 0) (Array.empty[Array[Long]], Array.empty[Long])
      else (spark.read.parquet(s"$path/head").collect()
          .map(_.getSeq[Long](0).toArray),
        bloomOf(s"$path/hashes_tail"))
    ParagraphFilter(words, kHashes, meta(0).getInt(1), meta(0).getInt(2),
      meta(0).getInt(3), meta(0).getLong(4), threshold,
      headSets, tailWords)
  }

  /** Rebuild `text` without the paragraphs whose MinHash banding
    * collides with the index — a stateless per-row expression (the
    * signature recomputation is the same codegen kernels the batch
    * side uses). Blank paragraphs and paragraphs too short to shingle
    * never participate and never drop (the batch-twin contract).
    *
    * With the precision hybrid compiled in (`headSets` non-empty), the
    * drop rule refines: a TAIL-bloom hit keeps the screen contract
    * (strip on candidacy), while a head-only hit runs the EXACT
    * shingle-Jaccard verify against the broadcast head sets and strips
    * only at >= threshold — the gray band (Jaccard just below
    * threshold) keeps its paragraphs wherever the collision came from
    * the head. The verify is gated behind the all-keys Bloom hit, so
    * clean paragraphs (the overwhelming majority) never pay it.
    */
  def stripParagraphsExpr(text: Column, f: ParagraphFilter): Column = {
    val coeffs = TextDedup.minhashCoeffs(f.h, f.seed)
    val r = f.h / f.bands
    // two staged transforms MATERIALIZE the shingle set and signature
    // per paragraph — HOF lambdas get no common-subexpression
    // elimination, so probing `bands` band keys against an inline
    // signature would recompute tokenize+shingle+minhash per band
    // (the LangIdTrain.train lesson, measured 5.8x there)
    val withShh = transform(split(text, "\n\n"), p =>
      struct(p.as("u"), array_distinct(
        TextHashExpr.shingleHashes(TextAnalysis.tokens(p), f.n)).as("shh")))
    val withSig = transform(withShh, s =>
      struct(s.getField("u").as("u"), s.getField("shh").as("shh"),
        size(s.getField("shh")).as("nsh"),
        TextHashExpr.minhashSignature(s.getField("shh"), coeffs).as("sig")))
    def anyBand(sig: Column, words: Array[Long]): Column =
      if (words.isEmpty) lit(false)
      else (0 until f.bands).map { j =>
        BloomDecontaminate.mightContain(words,
          bandKey(lit(j), TextDedup.bandValue(sig, j, r)),
          words.length * 64, f.kHashes)
      }.reduce(_ || _)
    val kept = filter(withSig, s => {
      val hitAll = anyBand(s.getField("sig"), f.words)
      val drop =
        if (f.headSets.isEmpty) hitAll
        else {
          // head sets ship sorted+distinct; exists() short-circuits so
          // the Jaccard loop runs only for Bloom-candidate paragraphs
          val headLit = typedLit(f.headSets.map(_.toSeq).toSeq)
          val verifyHead = exists(headLit, hs => {
            val inter = size(array_intersect(s.getField("shh"), hs))
              .cast("double")
            // J = |∩|/|∪| >= t  ⟺  |∩|·(1+t) >= t·(|a|+|b|)
            inter * (1.0 + f.threshold) >=
              (s.getField("nsh") + size(hs)).cast("double") * f.threshold
          })
          anyBand(s.getField("sig"), f.tailWords) || (hitAll && verifyHead)
        }
      length(trim(s.getField("u"))) === 0 || s.getField("nsh") === 0 || !drop
    })
    concat_ws("\n\n", transform(kept, s => s.getField("u")))
  }
}

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
  */
object ParagraphIndex {

  private val Family = "paragraph-band-index"

  final case class ParagraphFilter(words: Array[Long], kHashes: Int,
      n: Int, h: Int, bands: Int, seed: Long)

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

  /** Batch (re-)build: writes `path/meta` (family + signature scheme)
    * and `path/hashes` (distinct xxhash64(band, val) keys). Returns
    * the key count. The signature scheme rides in the meta so a
    * stream can never probe with mismatched hashing.
    */
  def writeParagraphIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, threshold: Double = 0.5, n: Int = 3, h: Int = 16,
      bands: Int = 0, seed: Long = 42L): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = if (bands > 0) bands else TextDedup.bandsFor(threshold)
    val banded = TextDedup.bandedSignatures(
      units(docs, idCol, textCol)
        .select(col(idCol).as("__doc"), col("__u").as("__text")),
      "__doc", "__text", n, h, b, seed)
    banded.select(bandKey(col("band"), col("val")).as("hash"))
      .distinct()
      .coalesce(1).write.mode("overwrite").parquet(s"$path/hashes")
    Seq((Family, n, h, b, seed))
      .toDF("family", "n", "h", "bands", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    spark.read.parquet(s"$path/hashes").count()
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
    val hashes = spark.read.parquet(s"$path/hashes")
    val bits = UrlOps.domainFilterBits(hashes.count())
    val words = BloomDecontaminate.buildFilterFromHashes(
      hashes.select(col("hash").as("__h")), bits, kHashes)
    ParagraphFilter(words, kHashes, meta(0).getInt(1), meta(0).getInt(2),
      meta(0).getInt(3), meta(0).getLong(4))
  }

  /** Rebuild `text` without the paragraphs whose MinHash banding
    * collides with the index — a stateless per-row expression (the
    * signature recomputation is the same codegen kernels the batch
    * side uses). Blank paragraphs and paragraphs too short to shingle
    * never participate and never drop (the batch-twin contract).
    */
  def stripParagraphsExpr(text: Column, f: ParagraphFilter): Column = {
    val coeffs = TextDedup.minhashCoeffs(f.h, f.seed)
    val r = f.h / f.bands
    val mBits = f.words.length * 64
    // two staged transforms MATERIALIZE the shingle set and signature
    // per paragraph — HOF lambdas get no common-subexpression
    // elimination, so probing `bands` band keys against an inline
    // signature would recompute tokenize+shingle+minhash per band
    // (the LangIdTrain.train lesson, measured 5.8x there)
    val withShh = transform(split(text, "\n\n"), p =>
      struct(p.as("u"), array_distinct(
        TextHashExpr.shingleHashes(TextAnalysis.tokens(p), f.n)).as("shh")))
    val withSig = transform(withShh, s =>
      struct(s.getField("u").as("u"), size(s.getField("shh")).as("nsh"),
        TextHashExpr.minhashSignature(s.getField("shh"), coeffs).as("sig")))
    val kept = filter(withSig, s => {
      val hit = (0 until f.bands).map { j =>
        BloomDecontaminate.mightContain(f.words,
          bandKey(lit(j), TextDedup.bandValue(s.getField("sig"), j, r)),
          mBits, f.kHashes)
      }.reduce(_ || _)
      length(trim(s.getField("u"))) === 0 || s.getField("nsh") === 0 || !hit
    })
    concat_ws("\n\n", transform(kept, s => s.getField("u")))
  }
}

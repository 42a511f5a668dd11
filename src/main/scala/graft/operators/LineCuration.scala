package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextAnalysis

/** Line-granular web-corpus curation — the C4 cleaning rules (Raffel et
  * al. 2020, "Exploring the Limits of Transfer Learning", §2.2) and the
  * RefinedWeb/Dolma corpus-level line deduplication stage. These run
  * BEFORE document-level dedup: navigation chrome, cookie banners and
  * footer lines otherwise dominate MinHash shingles and glue unrelated
  * pages into one near-dup cluster.
  *
  * Scale shape: [[c4Clean]] and [[filterLines]] are pure per-row
  * higher-order-function pipelines — zero shuffle, cost = the scan,
  * fully inside whole-stage codegen. [[stripDuplicateLines]] follows the
  * [[Boilerplate]] design: one map-side-combinable groupBy on an 8-byte
  * line hash (never the line text), one equi-join back, one bounded
  * per-doc coverage aggregation — O(total lines), no pairwise stage.
  */
object LineCuration {

  /** The published C4 defaults (Raffel et al. 2020 §2.2 and the
    * reference TensorFlow-datasets `c4_utils` cleaner): drop lines
    * mentioning javascript or any of the cookie/policy boilerplate
    * phrases, keep lines with >= 5 words, drop pages with fewer than 3
    * surviving lines (C4 counts SENTENCES; kept lines are this
    * engine's documented approximation — the paper's cleaner operates
    * line-wise too) or containing "lorem ipsum" / a curly brace.
    * SHARED by the batch operators and the streaming ingest gate
    * (IngestDedup), so tuning one cannot silently diverge batch and
    * streaming admission for identical documents.
    */
  val DefaultBlockPhrases: Seq[String] = Seq(
    "javascript", "terms of use", "privacy policy", "cookie policy",
    "uses cookies", "use of cookies", "use cookies")
  val DefaultDocBlockPhrases: Seq[String] = Seq("lorem ipsum", "{")
  val DefaultTerminalRe: String = "[.!?\"]$"
  val DefaultMinWords: Int = 5
  val DefaultMinKeptLines: Int = 3

  /** Document-level block predicate (case-insensitive) — the SINGLE
    * definition used by both [[c4Clean]] and the streaming ingest gate,
    * so a non-lowercase phrase in the shared default list cannot make
    * batch and streaming admission diverge.
    */
  def docBlocked(t: Column,
      phrases: Seq[String] = DefaultDocBlockPhrases): Column =
    phrases.foldLeft(lit(false))((acc, p) =>
      acc || lower(t).contains(lit(p.toLowerCase)))

  /** Whitespace-token count of a (trimmed) line. */
  def wordCount(t: Column): Column =
    size(filter(split(t, "\\s+"), w => length(w) > 0))

  /** C4's keep-a-line predicate: terminal punctuation, a word-count
    * floor, and no blocked phrase (case-insensitive).
    */
  def lineOk(l: Column, minWords: Int, blockPhrases: Seq[String],
      terminalRe: String): Column = {
    val t = trim(l)
    val blocked = blockPhrases.foldLeft(lit(false))((acc, p) =>
      acc || lower(t).contains(lit(p.toLowerCase)))
    t.rlike(terminalRe) && wordCount(t) >= minWords && !blocked
  }

  /** Per-document line filtering: `(idCol, n_lines, n_kept, clean_text)`
    * with `clean_text` the surviving lines newline-joined. Keeps every
    * document (the gate is [[c4Clean]]'s job).
    */
  def filterLines(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = DefaultMinWords,
      blockPhrases: Seq[String] = DefaultBlockPhrases,
      terminalRe: String = DefaultTerminalRe): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => lineOk(l, minWords, blockPhrases, terminalRe))
    docs.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("clean_text"))
  }

  /** The full C4 document rule: line-filter, then DROP the document when
    * fewer than `minKeptLines` lines survive or the ORIGINAL text
    * contains a document-level block phrase (C4 uses "lorem ipsum" and
    * the curly brace as a code tell). Returns survivors only.
    */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = DefaultMinWords,
      minKeptLines: Int = DefaultMinKeptLines,
      blockPhrases: Seq[String] = DefaultBlockPhrases,
      docBlockPhrases: Seq[String] = DefaultDocBlockPhrases,
      terminalRe: String = DefaultTerminalRe): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, l => lineOk(l, minWords, blockPhrases, terminalRe))
    docs.select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, "\n").as("clean_text"),
        docBlocked(t, docBlockPhrases).as("__blocked"))
      .filter(col("n_kept") >= minKeptLines && !col("__blocked"))
      .drop("__blocked")
  }

  /** Corpus-level exact line deduplication (RefinedWeb "line-wise
    * corrections" / Dolma's cross-document line dedup): a non-blank
    * trimmed line occurring in at least `minDocFreq` DISTINCT documents
    * is removed from EVERY document. Blank lines are never counted and
    * never removed. One row per input document:
    * `(idCol, n_lines, n_removed, clean_text)`.
    *
    * The flag key is the corpus-portable polynomial hash of the trimmed
    * line ([[TextAnalysis.polyHash]]) — an 8-byte shuffle key instead of
    * the line text; the DuckDB oracle mirrors the same hash so both
    * engines make identical decisions, collisions included.
    */
  def stripDuplicateLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int = 2): DataFrame =
    stripDuplicateUnits(docs, idCol, textCol, minDocFreq, sep = "\n")

  /** [[stripDuplicateLines]] at PARAGRAPH granularity (units split on
    * blank lines) — RefinedWeb's other exact-dedup grain: a repeated
    * paragraph (quoted passage, templated intro) is removed from every
    * document while its unique surroundings survive. Same plan, same
    * output contract, `sep = "\n\n"`.
    */
  def stripDuplicateParagraphs(docs: DataFrame, idCol: String,
      textCol: String, minDocFreq: Int = 2): DataFrame =
    stripDuplicateUnits(docs, idCol, textCol, minDocFreq, sep = "\n\n")

  /** The flag side of [[stripDuplicateLines]] exposed on its own: the
    * polyHash of every trimmed non-blank unit occurring in at least
    * `minDocFreq` DISTINCT documents, with its document frequency.
    * This is what [[LineIndex.writeLineIndex]] materializes so the
    * streaming ingest can probe corpus-level line dedup as a stateless
    * scan (the document-frequency aggregation itself needs the whole
    * reference corpus and cannot run in-stream).
    */
  def duplicateUnitHashes(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int = 2, sep: String = "\n"): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), sep)).as("__l"))
      .filter(length(trim(col("__l"))) > 0)
      .select(col(idCol), TextAnalysis.polyHash(trim(col("__l"))).as("hash"))
      .groupBy(col("hash"))
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)

  /** Paragraph-grain NEAR-duplicate dedup — the fuzzy counterpart of
    * [[stripDuplicateParagraphs]]: paragraphs that are near-dups of an
    * EARLIER paragraph anywhere in the corpus (MinHash+LSH candidates
    * over the unit text, verified by exact shingle Jaccard >=
    * `threshold`) are removed, and each document's text is rebuilt
    * from its survivors — templated intros with per-page fill-ins,
    * lightly-edited quoted passages, the chrome exact paragraph dedup
    * misses by one token. Keep rule: global unit order is
    * (doc, position) and every verified pair drops its LATER unit
    * (direct pairs, not transitive closure — deterministic and
    * engine-mirrorable). Blank units never participate and never drop.
    * Output contract matches the exact form: one row per input doc,
    * `(idCol, n_units, n_removed, clean_text)`.
    *
    * 100 TB shape: units ride the same banded (band, value) shuffle as
    * document-grain MinHash (no pair blowup), the unit key is an
    * 8-byte composite (doc * 2^20 + pos, loudly guarded), and the
    * rebuild is one per-doc sort of surviving positions — no
    * interval machinery needed because survivors rebuild directly.
    */
  def stripNearDupParagraphs(docs: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.5, n: Int = 3,
      h: Int = 16, bands: Int = 0): DataFrame = {
    val K = 1L << 20 // unit radix (the SeqPack ChunkCap discipline)
    val units = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n\n"))
        .as(Seq("__pos", "__u")))
      // a >= 2^20-paragraph document would alias unit keys: fail loudly
      .filter(assert_true(col("__pos") < lit(K),
        lit(s"document with >= $K paragraphs")).isNull)
      .withColumn("__uid", col(idCol) * K + col("__pos"))
    val nonBlank = units.filter(length(trim(col("__u"))) > 0)
    val pairs = TextDedup.minhashNearDupPairs(
      nonBlank.select(col("__uid").as("doc_id"), col("__u").as("text")),
      "doc_id", "text", threshold, n, h, bands)
    val losers = pairs.select(col("id2").as("__uid")).distinct()
    val surviving = units.join(losers, Seq("__uid"), "left_anti")
    val rebuilt = surviving
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__kept"),
        concat_ws("\n\n",
          transform(
            sort_array(collect_list(struct(
              col("__pos").as("p"), col("__u").as("u")))),
            s => s("u"))).as("clean_text"))
    val totals = docs.select(col(idCol),
      size(split(col(textCol), "\n\n")).cast("long").as("n_units"))
    totals.join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_units"),
        (col("n_units") - coalesce(col("__kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Paragraph-grain near-dup screen AGAINST a reference corpus — the
    * batch ground-truth twin of the streaming
    * [[ParagraphIndex.stripParagraphsExpr]] probe: every incoming
    * paragraph that is a verified near-dup (banded MinHash candidates,
    * exact shingle Jaccard >= `threshold`) of ANY reference paragraph
    * is removed, and each incoming document's text is rebuilt from its
    * survivors. Blank paragraphs and paragraphs too short to shingle
    * never participate and never drop. Output contract matches
    * [[stripNearDupParagraphs]]: one row per incoming doc,
    * `(idCol, n_units, n_removed, clean_text)`.
    *
    * 100 TB shape: one-sided banded join — incoming unit band rows
    * only ever meet reference unit band rows keyed on (band, value),
    * never a growing pair space (the [[TextDedup.minhashDedupAgainst]]
    * shape at unit grain).
    */
  def stripNearDupParagraphsAgainst(incoming: DataFrame,
      reference: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, n: Int = 3, h: Int = 16,
      bands: Int = 0, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.graftvec.TextHashExpr
    val b = if (bands > 0) bands else TextDedup.bandsFor(threshold)
    val K = 1L << 20
    val units = incoming
      .select(col(idCol), posexplode(split(col(textCol), "\n\n"))
        .as(Seq("__pos", "__u")))
      .filter(assert_true(col("__pos") < lit(K),
        lit(s"document with >= $K paragraphs")).isNull)
      .withColumn("__uid", col(idCol) * K + col("__pos"))
    val inUnits = units.filter(length(trim(col("__u"))) > 0)
      .select(col("__uid").as("doc_id"), col("__u").as("text"))
    val refUnits = reference
      .select(posexplode(split(col(textCol), "\n\n")).as(Seq("__rp", "__ru")))
      .filter(length(trim(col("__ru"))) > 0)
      .select(monotonically_increasing_id().as("doc_id"),
        col("__ru").as("text"))
    val survivors = TextDedup.minhashDedupAgainst(
      inUnits, refUnits, "doc_id", "text", threshold, n, h, b, seed)
      .select(col("doc_id").as("__uid"))
    // units that never participated (blank / unshingleable) survive by
    // construction: they are absent from inUnits but present in units
    val dropped = inUnits.select(col("doc_id").as("__uid"))
      .join(survivors, Seq("__uid"), "left_anti")
    val surviving = units.join(dropped, Seq("__uid"), "left_anti")
    val rebuilt = surviving
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__kept"),
        concat_ws("\n\n",
          transform(
            sort_array(collect_list(struct(
              col("__pos").as("p"), col("__u").as("u")))),
            s => s("u"))).as("clean_text"))
    val totals = incoming.select(col(idCol),
      size(split(col(textCol), "\n\n")).cast("long").as("n_units"))
    totals.join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_units"),
        (col("n_units") - coalesce(col("__kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  private def stripDuplicateUnits(docs: DataFrame, idCol: String,
      textCol: String, minDocFreq: Int, sep: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // split once; consumed by the flag counts and the rebuild
    // (CacheBin contract — runner drains)
    // sep is a literal ("\n" or "\n\n" — no regex metacharacters)
    val base = graft.core.CacheBin.trackEager(
      docs.select(col(idCol), split(col(textCol), sep).as("__ls"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val wins = base.select(col(idCol),
        posexplode(col("__ls")).as(Seq("__pos", "__l")))
      .filter(length(trim(col("__l"))) > 0)
      .select(col(idCol), col("__pos"),
        TextAnalysis.polyHash(trim(col("__l"))).as("__h"))
    val flagged = wins.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__h"))
    // covered line positions fold into SORTED (start, len) intervals
    // (gaps-and-islands, doc-bounded window) and the clean text is
    // rebuilt from their COMPLEMENT via array slices — O(lines + spans)
    // per document; a per-line membership test against an expanded
    // removal-position set would be O(lines × removed) and straggle on
    // a chrome-heavy 20k-line page (the same corner SpanDedup's
    // rebuild was reworked for)
    val covered = wins.join(flagged, "__h")
      .select(col(idCol), col("__pos").as("__p"))
      .repartition(col(idCol))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val spans = covered
      .withColumn("__grp", col("__p") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__p")).as("__start"), count(lit(1)).as("__len"))
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col("__start").cast("long").as("__start"),
        col("__len").cast("long").as("__len")))).as("__spans"))
    val sp = col("__sp")
    val segments = transform(sequence(lit(0), size(sp)), i => {
      val segStart = when(i === 0, lit(0L))
        .otherwise(element_at(sp, i)("__start") + element_at(sp, i)("__len"))
      val segStop = when(i === size(sp), size(col("__ls")).cast("long"))
        .otherwise(element_at(sp, i + 1)("__start"))
      slice(col("__ls"), (segStart + 1).cast("int"),
        (segStop - segStart).cast("int"))
    })
    base
      .join(perDoc, Seq(idCol), "left_outer")
      .withColumn("__sp", coalesce(col("__spans"),
        array().cast("array<struct<__start:bigint,__len:bigint>>")))
      .select(col(idCol),
        size(col("__ls")).cast("long").as("n_lines"),
        coalesce(aggregate(sp, lit(0L), (acc, s) => acc + s("__len")), lit(0L))
          .as("n_removed"),
        concat_ws(sep, flatten(segments)).as("clean_text"))
  }
}

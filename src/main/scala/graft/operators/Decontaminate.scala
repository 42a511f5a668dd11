package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: drop every training
  * document sharing at least one word n-gram with a held-out
  * evaluation set — the standard n-gram-overlap decontamination step
  * between corpus curation and training.
  *
  * Shape: both sides reduce to distinct shingle hashes (scan-time,
  * codegen'd); contaminated ids come from an equi-join on the 8-byte
  * hash (shuffle keyed on hash, never on documents); survivors are a
  * left-anti join. Eval sets are small, so their shingle table
  * broadcasts; corpus cost is one scan + one anti-join.
  */
object Decontaminate {

  /** Training docs that share an n-gram with the eval set. */
  def contaminatedIds(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusShingles = TextDedup.withShingleHashes(corpus, idCol, textCol, n)
      .select(col(idCol), explode(col("__shh")).as("__h"))
    val evalShingles = TextDedup.withShingleHashes(evalSet, idCol, textCol, n)
      .select(explode(col("__shh")).as("__h")).distinct()
    corpusShingles
      .join(broadcast(evalShingles), "__h")
      .select(col(idCol)).distinct()
  }

  /** Contamination audit: per EVAL item, how many corpus documents
    * share at least one n-gram and how many distinct n-grams leak —
    * the report a benchmark owner reads before trusting scores. One
    * row per contaminated eval id: `(idCol, n_corpus_docs,
    * n_shared_ngrams)`. Same join shape as [[contaminatedIds]] with
    * the eval id carried through.
    */
  def contaminationReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusShingles = TextDedup.withShingleHashes(corpus, idCol, textCol, n)
      .select(col(idCol).as("__cid"), explode(col("__shh")).as("__h"))
    val evalShingles = TextDedup.withShingleHashes(evalSet, idCol, textCol, n)
      .select(col(idCol), explode(col("__shh")).as("__h"))
    evalShingles
      .join(corpusShingles, "__h")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__cid")).as("n_corpus_docs"),
        countDistinct(col("__h")).as("n_shared_ngrams"))
  }

  /** The corpus minus contaminated documents. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame =
    corpus.join(
      contaminatedIds(corpus, evalSet, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** EMBEDDING-space decontamination: drop every corpus row whose
    * vector's cosine to ANY eval vector reaches `threshold` — the
    * semantic complement to the n-gram passes, catching paraphrased or
    * reformatted benchmark leakage that shares no 13-gram with the
    * eval set.
    *
    * 100 TB shape: the eval side is small by construction, so it
    * broadcasts with precomputed norms and the whole operator is ONE
    * broadcast anti-join — each corpus row probes the in-memory eval
    * vectors and short-circuits on its first hit (anti-join early
    * exit); the corpus never shuffles, no pair set materializes, and
    * corpus norms are computed once per row, not once per pair. Same
    * float kernels and mirror-exact arithmetic as the kNN family.
    */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      evalVecCol: String = "embedding"): DataFrame = {
    import graft.functions.FloatVec
    // zero-norm guards: a zero-norm vector on either side makes the
    // cosine denominator 0 — an ANSI divide-by-zero error (or, with
    // ANSI off, a NaN that Spark orders ABOVE every double, so
    // `NaN >= threshold` is TRUE and one degenerate eval row silently
    // drops the whole corpus). Filter zero-norm eval vectors out (no
    // semantic content to match) and try_divide the cosine so a
    // zero-norm CORPUS row compares as NULL (kept) in both ANSI modes.
    val ev = evalSet.select(col(evalVecCol).as("__evec"),
      FloatVec.normF(col(evalVecCol)).as("__enorm"))
      .filter(col("__enorm") > lit(0.0))
    corpus.withColumn("__cnorm", FloatVec.normF(col(vecCol)))
      .join(broadcast(ev),
        nanvl(try_divide(FloatVec.dotF(col(vecCol), col("__evec")),
          col("__cnorm") * col("__enorm")), lit(0.0)) >= threshold,
        "left_anti")
      .drop("__cnorm")
  }

  /** Per-TRAINING-doc overlap audit: the fraction of each document's
    * DISTINCT word n-grams that also appear anywhere in the eval set —
    * the graded signal behind threshold decontamination (the any-hit
    * rule above is this with threshold > 0). One row per corpus doc
    * with at least one n-gram: `(idCol, n_ngrams, n_contaminated,
    * overlap_frac)`; all counts exact integers, the fraction one final
    * double division.
    *
    * Shape at 100 TB: shingles are scan-time codegen'd hashes; the
    * eval shingle set is distinct-reduced and broadcast (eval sets are
    * benchmark-sized); per-doc counts partial-aggregate map-side — a
    * document's exploded shingles never leave the partition its row
    * was scanned into, so the id-keyed shuffle ships ONE count row per
    * document, not its n-grams.
    */
  def overlapReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusShingles = TextDedup.withShingleHashes(corpus, idCol, textCol, n)
      .select(col(idCol), explode(col("__shh")).as("__h"))
    val evalShingles = TextDedup.withShingleHashes(evalSet, idCol, textCol, n)
      .select(explode(col("__shh")).as("__h")).distinct()
      .withColumn("__hit", lit(1L))
    corpusShingles
      .join(broadcast(evalShingles), Seq("__h"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_contaminated"))
      .withColumn("overlap_frac",
        col("n_contaminated").cast("double") / col("n_ngrams").cast("double"))
  }

  /** Threshold decontamination (the PaLM/GPT-3-family rule): drop a
    * training document only when at least `maxOverlap` of its distinct
    * n-grams leak into the eval set — high-overlap docs are true
    * benchmark copies, while a single shared idiom (which the any-hit
    * rule would kill) survives. Documents too short to form an n-gram
    * have nothing to leak and are kept.
    */
  def decontaminateByFraction(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      maxOverlap: Double = 0.5): DataFrame = {
    require(maxOverlap > 0.0,
      s"maxOverlap must be positive (got $maxOverlap); " +
        "use decontaminate() for the any-hit rule")
    // overlap_frac can never exceed 1, so a caller passing percent
    // (e.g. 25) would get a silent no-op decontamination
    require(maxOverlap <= 1.0,
      s"maxOverlap is a fraction in (0, 1] (got $maxOverlap)")
    val bad = overlapReport(corpus, evalSet, idCol, textCol, n)
      .filter(col("overlap_frac") >= lit(maxOverlap))
      .select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}

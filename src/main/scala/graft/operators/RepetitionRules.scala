package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Gopher-style WITHIN-document repetition filters (Rae et al. 2021,
  * Table A1 — the companion family to [[graft.functions.GopherRules]]'
  * quality signals): self-repeating documents (boilerplate templates,
  * scraper loops, keyword stuffing) are detected by how much of the
  * document is covered by repeated units. Cross-document dedup cannot
  * catch these — the repetition is inside one row.
  *
  * Measured per document, all in exact integer arithmetic (micro
  * fixed-point fractions, so the DuckDB oracle matches bit-for-bit):
  *
  *  - `dup_line_frac`: Σ count over duplicated lines / total lines
  *    (a line is duplicated when its exact trimmed text occurs > 1
  *    time in the document; blank lines are not lines);
  *  - `dup_line_char_frac`: the same weighted by line length;
  *  - `top{2,3,4}gram_char_frac`: characters covered by the single
  *    most frequent n-gram (count × n-gram length over the kind's
  *    total char mass; ties break to the smallest unit hash so the
  *    statistic is total-order deterministic);
  *  - `dup{5,10}gram_char_frac`: characters covered by n-grams
  *    occurring more than once.
  *
  * Scale shape: every unit of a document lives inside its own row, so
  * the hot path is ONE codegen'd expression per row
  * ([[org.apache.spark.sql.graftvec.RepetitionStats]]) — zero
  * shuffles, cost = the scan, usable as a stateless streaming filter.
  * [[reportRelational]] keeps the exploded two-aggregation form as the
  * pinned semantic definition (hashed units, both shuffle keys carry
  * the doc id — no skew funnel; no HOF struct folds, which DuckDB's
  * list_reduce mis-executes — measured, see the dedup oracle notes);
  * the DuckDB oracle replays that relational shape.
  */
object RepetitionRules {

  /** (kind, threshold in micro units) — Gopher's published cut lines;
    * a document PASSES when every fraction is AT OR BELOW its
    * threshold (boundary passes, matching GopherRules' convention).
    * The values live next to the kernel
    * ([[org.apache.spark.sql.graftvec.RepetitionStatsExpr.ThresholdsMicro]])
    * so the single-call gate predicate and this table can never drift.
    */
  val Thresholds: Seq[(String, Long)] = {
    import org.apache.spark.sql.graftvec.RepetitionStatsExpr
    RepetitionStatsExpr.FracNames.zip(RepetitionStatsExpr.ThresholdsMicro)
  }

  private val NgramNs = Seq(2, 3, 4, 5, 10)

  /** Non-blank trimmed lines of the raw text. */
  private def lineUnits(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Hash base for combining per-token fingerprints into an n-gram
    * identity: h(g) = fold of h(tok)·B + h(next) mod P. Two distinct
    * n-grams colliding would merge their counts — at P ≈ 1e9 and
    * per-document unit counts in the thousands, the per-doc collision
    * probability is ~1e-3 of a single pair and only perturbs a
    * STATISTIC, never document identity; the price buys fixed-width
    * shuffle rows (id, kind, hash, len) instead of shuffling every
    * n-gram STRING — at 100 TB the string form shuffles ~6× the
    * corpus bytes, the hashed form a small constant per token.
    */
  val HashBase = 1000003L
  val HashMod = 1000000007L

  /** One row per (idCol, kind, unit-hash, unit-char-length) occurrence
    * — every statistic derives from this. n-grams are built from ONE
    * `posexplode` of the token stream plus `lead()` columns of the
    * per-token fingerprint/length over a per-document window (shared
    * by every n — lead j computes once): no per-position array slices
    * (the slice-per-position HOF form measured ~6 s per kind at sf0.1)
    * and no n-gram string construction at all — identity is the
    * combined hash, length is the lead-sum of token lengths plus the
    * joining spaces. The window partitions on the doc id — bounded
    * groups, no skew funnel.
    */
  private[graft] def unitTable(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs.select(col(idCol), lit("line").as("kind"),
      explode(lineUnits(col(textCol))).as("__u"))
      .select(col(idCol), col("kind"),
        TextAnalysis.fingerprint(col("__u")).as("h"),
        length(col("__u")).cast("long").as("ulen"))
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__p", "__t")))
      .select(col(idCol), col("__p"),
        TextAnalysis.fingerprint(col("__t")).as("__h0"),
        length(col("__t")).cast("long").as("__tl0"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val maxN = NgramNs.max
    val withLeads = toks.select(
      (col(idCol) +: col("__h0") +: col("__tl0") +:
        (1 until maxN).flatMap(j => Seq(
          lead(col("__h0"), j).over(w).as(s"__h$j"),
          lead(col("__tl0"), j).over(w).as(s"__tl$j")))): _*)
    val kindCols = NgramNs.map { n =>
      val h = (1 until n).foldLeft(col("__h0")) { (acc, j) =>
        // acc < P and B·P + P < 2^63: overflow-free by construction
        pmod(acc * lit(HashBase) + col(s"__h$j"), lit(HashMod))
      }
      val len = (0 until n).map(j =>
        col(if (j == 0) "__tl0" else s"__tl$j")).reduce(_ + _) +
        lit((n - 1).toLong)
      // emit only complete n-grams: the last lead must exist
      when(col(s"__h${n - 1}").isNotNull,
        struct(lit(s"${n}gram").as("kind"), h.as("h"), len.as("ulen")))
    }
    val grams = withLeads
      .select(col(idCol),
        explode(filter(array(kindCols: _*), x => x.isNotNull)).as("__ku"))
      .select(col(idCol), col("__ku.kind").as("kind"),
        col("__ku.h").as("h"), col("__ku.ulen").as("ulen"))
    lines.unionByName(grams)
  }

  /** floor(1e6·num/den) in INTEGER division (`div` — a `/` on longs is
    * double division in Spark, and a 1-ULP rounding there would break
    * the bit-exact oracle). Both operands are non-negative here, so
    * `div` IS the floor.
    */
  private def microFrac(num: Column, den: Column): Column =
    when(den > 0, call_function("div", num * lit(1000000L), den))
      .otherwise(lit(0L)).cast("long")

  /** Per-document repetition report: every fraction in micro units,
    * the word count, and `repetition_pass`. Documents with no units of
    * a kind score 0 for that kind — absence of n-grams is absence of
    * repetition. The pass rule only BINDS at or above `minWords`
    * (Gopher's 50-word floor): the thresholds were tuned for web-scale
    * documents, and on a 2-word document the top-2-gram fraction is
    * trivially 1.0 — degenerate statistics, not repetition. Short
    * documents report their raw fractions but pass; culling them is
    * the word-count quality rule's job, not this family's.
    *
    * Runs as ONE codegen'd expression per row
    * ([[org.apache.spark.sql.graftvec.RepetitionStats]]) — every unit
    * of a document lives inside its row, so the statistics need zero
    * shuffles; [[reportRelational]] is the pinned semantic definition
    * (and the shape the DuckDB oracle replays).
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50): DataFrame = {
    val rs = org.apache.spark.sql.graftvec.RepetitionStatsExpr
      .statsCol(col(textCol))
    val base = docs
      .select(col(idCol), rs.as("__rs"))
      .select(
        (col(idCol) +: col("__rs.n_words").as("n_words") +:
          Thresholds.map { case (c, _) => col(s"__rs.$c").as(c) }): _*)
    base.withColumn("repetition_pass",
      (col("n_words") < minWords) ||
        Thresholds.map { case (c, t) => col(c) <= t }.reduce(_ && _))
  }

  /** The relational definition of [[report]] — explode + two doc-keyed
    * aggregations; RepetitionRulesSpec pins the kernel to it
    * value-for-value.
    */
  def reportRelational(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50): DataFrame = {
    val counts = unitTable(docs, idCol, textCol)
      .groupBy(col(idCol), col("kind"), col("h"))
      .agg(count(lit(1)).as("cnt"), max(col("ulen")).as("ulen"))
      .withColumn("w", col("ulen") * col("cnt"))
    // per (doc, kind): total units / char mass, duplicated share, and
    // the top unit by (count desc, hash asc) via min on (-cnt, h) —
    // the hash IS the deterministic tie-break in hashed-identity space
    val perKind = counts
      .groupBy(col(idCol), col("kind"))
      .agg(
        sum(col("cnt")).as("units"),
        sum(col("w")).as("chars"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_units"),
        sum(when(col("cnt") > 1, col("w")).otherwise(0L)).as("dup_chars"),
        min(struct((-col("cnt")).as("nc"), col("h").as("h"),
          col("ulen").as("ulen"))).as("top"))
      .withColumn("top_chars", (-col("top.nc")) * col("top.ulen"))
    def kindAgg(kind: String, c: Column): Column =
      max(when(col("kind") === kind, c)) // one row per kind: max = the value
    val folded = perKind
      .groupBy(col(idCol))
      .agg(
        microFrac(kindAgg("line", col("dup_units")),
          kindAgg("line", col("units"))).as("dup_line_frac_micro"),
        microFrac(kindAgg("line", col("dup_chars")),
          kindAgg("line", col("chars"))).as("dup_line_char_frac_micro"),
        microFrac(kindAgg("2gram", col("top_chars")),
          kindAgg("2gram", col("chars"))).as("top2gram_char_frac_micro"),
        microFrac(kindAgg("3gram", col("top_chars")),
          kindAgg("3gram", col("chars"))).as("top3gram_char_frac_micro"),
        microFrac(kindAgg("4gram", col("top_chars")),
          kindAgg("4gram", col("chars"))).as("top4gram_char_frac_micro"),
        microFrac(kindAgg("5gram", col("dup_chars")),
          kindAgg("5gram", col("chars"))).as("dup5gram_char_frac_micro"),
        microFrac(kindAgg("10gram", col("dup_chars")),
          kindAgg("10gram", col("chars"))).as("dup10gram_char_frac_micro"))
    // a doc whose every unit list is empty never reaches the aggregate:
    // join back so it reports all-zero fractions (and passes)
    val spine = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_words"))
    val zeroed = Thresholds.foldLeft(spine.join(folded, Seq(idCol), "left")) {
      case (df, (c, _)) => df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    zeroed.withColumn("repetition_pass",
      (col("n_words") < minWords) ||
        Thresholds.map { case (c, t) => col(c) <= t }.reduce(_ && _))
  }

  /** Keep only documents passing every repetition threshold — a plain
    * `filter` on ONE boolean kernel call per row
    * ([[org.apache.spark.sql.graftvec.RepetitionPass]]): no join, no
    * shuffle, the gate rides the scan like the streaming path. `idCol`
    * is kept for signature stability but unused — the predicate is
    * row-local.
    */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50): DataFrame =
    docs.filter(
      org.apache.spark.sql.graftvec.RepetitionStatsExpr
        .passCol(col(textCol), minWords))
}

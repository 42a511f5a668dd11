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
  *    total char mass; ties break to the lexicographically smallest
  *    n-gram so the statistic is total-order deterministic);
  *  - `dup{5,10}gram_char_frac`: characters covered by n-grams
  *    occurring more than once.
  *
  * Scale shape: the document is tokenized/split ONCE and every unit
  * kind (line + each n) is emitted from the same scan into one
  * exploded (doc, kind, unit) table; counts come from a map-side
  * combinable `groupBy(doc, kind, unit)`, per-kind statistics from a
  * second bounded aggregation keyed on (doc, kind), and the kinds
  * fold back to columns with conditional aggregation (no pivot scan).
  * Both shuffles carry the doc id in the key, so a single pathological
  * document cannot funnel a reducer. No window over an unbounded key,
  * no HOF struct folds (DuckDB mis-executes list_reduce struct
  * accumulators — measured, see the dedup oracle notes), no UDFs.
  */
object RepetitionRules {

  /** (kind, threshold in micro units) — Gopher's published cut lines;
    * a document PASSES when every fraction is AT OR BELOW its
    * threshold (boundary passes, matching GopherRules' convention).
    */
  val Thresholds: Seq[(String, Long)] = Seq(
    "dup_line_frac_micro" -> 300000L,
    "dup_line_char_frac_micro" -> 200000L,
    "top2gram_char_frac_micro" -> 200000L,
    "top3gram_char_frac_micro" -> 180000L,
    "top4gram_char_frac_micro" -> 160000L,
    "dup5gram_char_frac_micro" -> 150000L,
    "dup10gram_char_frac_micro" -> 100000L)

  private val NgramNs = Seq(2, 3, 4, 5, 10)

  /** Non-blank trimmed lines of the raw text. */
  private def lineUnits(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Space-joined n-grams over the lowercased token stream. */
  private def ngramUnits(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** One row per (idCol, kind, unit) occurrence — the single corpus
    * scan every statistic derives from.
    */
  private[graft] def unitTable(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val kinds = ("line" -> lineUnits(col(textCol))) +:
      NgramNs.map(n => s"${n}gram" -> ngramUnits(col(textCol), n))
    val tagged = kinds.map { case (kind, units) =>
      transform(units, u => struct(lit(kind).as("kind"), u.as("u")))
    }
    docs.select(col(idCol), explode(concat(tagged: _*)).as("__ku"))
      .select(col(idCol), col("__ku.kind").as("kind"), col("__ku.u").as("u"))
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
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50): DataFrame = {
    val counts = unitTable(docs, idCol, textCol)
      .groupBy(col(idCol), col("kind"), col("u"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", length(col("u")).cast("long") * col("cnt"))
    // per (doc, kind): total units / char mass, duplicated share, and
    // the top unit by (count desc, unit asc) via min on (-cnt, u)
    val perKind = counts
      .groupBy(col(idCol), col("kind"))
      .agg(
        sum(col("cnt")).as("units"),
        sum(col("w")).as("chars"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_units"),
        sum(when(col("cnt") > 1, col("w")).otherwise(0L)).as("dup_chars"),
        min(struct((-col("cnt")).as("nc"), col("u"))).as("top"))
      .withColumn("top_chars",
        (-col("top.nc")) * length(col("top.u")).cast("long"))
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

  /** Keep only documents passing every repetition threshold. */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50): DataFrame =
    docs.join(
      report(docs, idCol, textCol, minWords)
        .filter(col("repetition_pass")).select(col(idCol)),
      Seq(idCol))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trainable character-n-gram language identification — the learned
  * counterpart of the fixed-marker determinism fixtures
  * [[graft.functions.TextAnalysis.langId]]/`langIdNgram` (which stay
  * as test fixtures): per-language char-gram profiles are LEARNED from
  * labeled data into a model-sized table, persisted with the tokenizer
  * save/load pattern ([[TokenizerIO]]), and scoring runs through the
  * same zero-join codegen path as the fixture variants
  * (length-shrinkage occurrence counting — pure string arithmetic, so
  * a SQL-engine mirror is exact).
  *
  * 100 TB shape: training is one (lang, gram) hash-aggregate over the
  * LABELED set (labeled data is the small side by construction) with a
  * per-language top-K window over ~#langs partitions; the model is
  * driver-bounded (#langs x topK rows, the tokenizer-artifact class).
  * Scoring is a stateless per-row scan expression over the 100 TB
  * side — no join, no shuffle, streaming-safe like every other scan
  * gate in [[graft.streaming.IngestDedup]].
  *
  * Determinism contract (what the DuckDB oracle mirrors): grams are
  * the n-char substrings of lower(text); profile = top-K grams per
  * language by (count DESC, gram ASC); score(doc, lang) = sum over the
  * language's profile of occurrences(gram, text) * count; prediction =
  * max score with lexicographic language order breaking ties.
  */
object LangIdTrain {

  final case class Profile(lang: String, grams: Seq[(String, Long)])

  /** Learn per-language char-n-gram profiles from labeled documents.
    * Returns the model as a DataFrame (lang, gram, weight) — save with
    * [[save]], score with [[scoreExpr]]/[[predictExpr]].
    */
  def train(docs: DataFrame, textCol: String, langCol: String,
      n: Int = 3, topK: Int = 20): DataFrame = {
    require(n >= 1 && topK >= 1, s"need n >= 1 and topK >= 1: n=$n topK=$topK")
    // explode POSITIONS, not a pre-built substring array: a
    // `transform(..., i -> substr(lower(text), i, n))` lambda
    // re-lowers the whole document once PER ELEMENT (no common-subexpr
    // elimination across HOF iterations — measured 7.5 s at sf0.1);
    // here lower() runs once per row and each exploded row takes one
    // substr off the already-lowered column (1.3 s)
    val grams = docs
      .filter(length(col(textCol)) >= n)
      .select(col(langCol).as("lang"), lower(col(textCol)).as("__lt"))
      .select(col("lang"), col("__lt"),
        explode(sequence(lit(1), length(col("__lt")) - (n - 1))).as("__i"))
      .select(col("lang"),
        col("__lt").substr(col("__i"), lit(n)).as("gram"))
    val counts = grams.groupBy("lang", "gram").count()
    // per-language top-K: the window partitions on lang (bounded
    // cardinality, never single-partition on real label sets) and the
    // (count DESC, gram ASC) order makes ties deterministic
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("count").desc, col("gram"))
    counts.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select(col("lang"), col("gram"), col("count").as("weight"))
  }

  /** Collect a model table to driver-side profiles (model-sized:
    * #langs x topK rows), languages in lexicographic order.
    */
  def profilesOf(model: DataFrame): Seq[Profile] =
    model.select("lang", "gram", "weight").collect()
      .groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (lang, rows) =>
        Profile(lang,
          rows.map(r => (r.getString(1), r.getLong(2)))
            .sortBy { case (g, w) => (-w, g) }.toSeq)
      }

  /** Occurrence count of a literal gram in lower(text): length
    * shrinkage under removal divided by gram length — the same
    * codegen'd string arithmetic as the fixture's charGramVote.
    */
  private def occ(lowered: Column, gram: String): Column =
    ((length(lowered) -
      length(call_function("replace", lowered, lit(gram), lit("")))) /
      lit(gram.length)).cast("long")

  /** score(doc, lang) for one profile. */
  def scoreExpr(text: Column, p: Profile): Column = {
    val lowered = lower(text)
    p.grams.map { case (g, w) => occ(lowered, g) * lit(w) }
      .reduceOption(_ + _).getOrElse(lit(0L))
  }

  /** Predicted language: max score, lexicographic language order on
    * ties (languages with zero evidence still rank — mirroring a SQL
    * row_number over (score DESC, lang ASC) exactly); NULL text
    * predicts NULL (so an `isin(allowlist)` admission gate drops
    * NULL-text rows instead of silently labeling them).
    *
    * Production path: the model rides as ONE compact reference object
    * inside a codegen [[org.apache.spark.sql.graftvec.LangIdPredict]]
    * kernel — plan and task-binary size are independent of model
    * dimension (the inlined-literal chain it replaced cost 1.45 MiB of
    * task binary at a TOY 6x20 model; a fastText-class 176x200 model
    * is only expressible this way). Pinned bit-identical to
    * [[predictExprLiteral]] by LangIdKernelSpec.
    */
  def predictExpr(text: Column, profiles: Seq[Profile]): Column = {
    require(profiles.nonEmpty, "empty language-ID model")
    import org.apache.spark.sql.graftvec.{LangIdExpr, LangIdModel}
    LangIdExpr.predictCol(text,
      LangIdModel(profiles.map(p => (p.lang, p.grams))))
  }

  /** The literal `replace()`-chain form of [[predictExpr]] — the
    * SQL-engine-mirrorable definition the kernel is pinned against.
    * Plan size grows with #langs x topK; use only for small models,
    * oracles, and the equivalence spec.
    */
  def predictExprLiteral(text: Column, profiles: Seq[Profile]): Column = {
    require(profiles.nonEmpty, "empty language-ID model")
    val ordered = profiles.sortBy(_.lang)
    val votes = ordered.map(p => p.lang -> scoreExpr(text, p))
    val best = votes.map(_._2).reduce((a, b) => greatest(a, b))
    // first language in ASC order holding the max — foldRight so the
    // earliest declaration wins; NULL text falls through every (NULL)
    // comparison to the seed, which must therefore be NULL, not the
    // lexicographically last language (the r15 advice hole)
    val seed = when(text.isNull, lit(null).cast("string"))
      .otherwise(lit(ordered.head.lang))
    votes.foldRight(seed) { case ((lang, v), acc) =>
      when(v === best, lit(lang)).otherwise(acc)
    }
  }

  // ---- persistence (the TokenizerIO artifact discipline) ----

  private val Family = "langid-chargram"

  def save(model: DataFrame, path: String): Unit =
    model.select(lit(Family).as("family"), col("lang"), col("gram"),
      col("weight"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("family"),
      s"not a tokenizer-family artifact at $path")
    val fams = df.select("family").distinct().collect().map(_.getString(0))
    require(fams.sameElements(Array(Family)),
      s"not a $Family artifact at $path (found ${fams.mkString(",")})")
    df.select("lang", "gram", "weight")
  }
}

package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Question↔schema linking utilities (reference
  * `DAILSQLGenerate.py:203-242, 369-431, 433-720, 722-773`): n-gram
  * matching, overlap resolution, question masking, and DB cell-value
  * probes. The n-gram/mask/shift pieces are driver-side (question-sized
  * strings); the cell-value probe is the one data-touching member and
  * runs as a single Spark scan per table — not the reference's
  * query-per-token loop.
  */
object SchemaLinking {

  sealed trait MatchFlag
  case object ColExact extends MatchFlag
  case object ColPartial extends MatchFlag
  case object TabExact extends MatchFlag
  case object TabPartial extends MatchFlag

  final case class Match(qId: Int, targetId: Int, flag: MatchFlag)

  private def toTokens(v: String): Seq[String] =
    v.split("[\\s_]+").filter(_.nonEmpty).toSeq

  /** n-gram (5→1) question↔column/table matching
    * (`compute_schema_linking`, `DAILSQLGenerate.py:369-431`): exact
    * n-gram equality first, then word-boundary partial containment;
    * earlier (longer) matches keep priority per (q,target) pair.
    */
  def computeSchemaLinking(question: Seq[String], columns: Seq[String],
      tables: Seq[String], stopwords: Set[String] = DefaultStopwords): Seq[Match] = {
    val colToks = columns.map(c => toTokens(c.toLowerCase).mkString(" "))
    val tabToks = tables.map(t => toTokens(t.toLowerCase).mkString(" "))
    val seen = scala.collection.mutable.Map[(String, Int), MatchFlag]()

    def note(kind: String, qIds: Range, id: Int, flag: MatchFlag): Unit =
      qIds.foreach { q =>
        val k = (s"$kind,$q", id)
        if (!seen.contains(k)) seen(k) = flag
        else (seen(k), flag) match {
          case (ColPartial, ColExact) | (TabPartial, TabExact) => seen(k) = flag
          case _ =>
        }
      }

    for (n <- 5 to 1 by -1; i <- 0 to question.length - n) {
      val gram = question.slice(i, i + n).mkString(" ").toLowerCase
      if (gram.trim.nonEmpty) {
        val partialOk = !stopwords.contains(gram) && gram.exists(_.isLetterOrDigit)
        colToks.zipWithIndex.foreach { case (c, id) =>
          if (gram == c) note("c", i until i + n, id, ColExact)
          else if (partialOk && s" $c ".contains(s" $gram "))
            note("c", i until i + n, id, ColPartial)
        }
        tabToks.zipWithIndex.foreach { case (t, id) =>
          if (gram == t) note("t", i until i + n, id, TabExact)
          else if (partialOk && s" $t ".contains(s" $gram "))
            note("t", i until i + n, id, TabPartial)
        }
      }
    }
    seen.map { case ((key, id), flag) =>
      Match(key.split(",")(1).toInt, id, flag)
    }.toSeq.sortBy(m => (m.qId, m.targetId, m.flag.toString))
  }

  /** Overlap resolution (`match_shift`, `DAILSQLGenerate.py:722-773`):
    * question tokens with fewer candidate matches claim first; exact
    * matches beat partials; already-claimed (flag, target) pairs are
    * reused rather than re-claimed.
    */
  def matchShift(matches: Seq[Match]): Seq[Match] = {
    val byQ = matches.groupBy(_.qId).view.mapValues(_.map(m => (m.flag, m.targetId)).distinct).toMap
    val priority = byQ.toSeq.map { case (q, ms) => (ms.length, q) }.sorted
    val claimed = scala.collection.mutable.Set[(MatchFlag, Int)]()
    val out = scala.collection.mutable.ArrayBuffer[Match]()
    priority.foreach { case (_, q) =>
      val ms = byQ(q)
      val overlap = ms.filter(claimed.contains)
      val res =
        if (overlap.nonEmpty) overlap
        else {
          val exact = ms.filter(m => m._1 == ColExact || m._1 == TabExact)
          val pick = if (exact.nonEmpty) exact else ms
          claimed ++= pick
          pick
        }
      res.foreach { case (f, id) => out += Match(q, id, f) }
    }
    out.toSeq.sortBy(m => (m.qId, m.targetId, m.flag.toString))
  }

  /** Question masking (`mask_question_with_schema_linking`,
    * `DAILSQLGenerate.py:203-242`): value-linked tokens get `valueTag`,
    * schema-linked tokens get `maskTag`.
    */
  def maskQuestion(question: Seq[String], schemaIds: Set[Int], valueIds: Set[Int],
      maskTag: String = "<mask>", valueTag: String = ""): String =
    question.zipWithIndex.map { case (tok, i) =>
      if (schemaIds.contains(i)) maskTag
      else if (valueIds.contains(i)) valueTag
      else tok
    }.mkString(" ")

  val DefaultStopwords: Set[String] = Set(
    "the", "a", "an", "of", "in", "on", "for", "to", "and", "or", "is",
    "are", "was", "what", "which", "who", "how", "many", "much", "all")

  /** Cell-value linking (`compute_cell_value_linking`,
    * `DAILSQLGenerate.py:433-720`) as ONE aggregation scan per table:
    * for every (token, column) pair, exact (lower(value) = token) and
    * partial (contains) hit flags — where the reference issues a
    * `SELECT ... LIMIT 5` probe per token per column.
    */
  /** Build-once value index for repeated cell-value linking: the
    * distinct lowered values of the probe columns, one (col, value)
    * row each. Built once per table, a SMALL index (distinct values of
    * name/category-like columns) broadcasts under every later question
    * batch's token probe — the per-batch cost drops from a table scan
    * to a broadcast join against tokens (`linkAgainstIndex`). Guard
    * `maxDistinctPerCol` REJECTS free-text columns loudly (at 100 TB an
    * unbounded distinct of a text column is its own job): silently
    * dropping a column would make later probes return false-negative
    * 0/0 hits with no signal, breaking the cellValueLinks contract.
    */
  def buildValueIndex(table: DataFrame, stringCols: Seq[String],
      maxDistinctPerCol: Int = 100000): DataFrame = {
    require(stringCols.nonEmpty,
      "buildValueIndex needs at least one string column to index")
    val stacked = stringCols.map { c =>
      table.select(lit(c).as("col"), lower(col(c).cast("string")).as("value"))
        .filter(col("value").isNotNull).distinct()
    }.reduce(_ unionAll _)
    // validation via groupBy count (map-side partials — no window
    // shuffle) and the RETURNED plan is the plain stacked frame, so the
    // production index plan carries no leftover counting machinery
    val over = stacked.groupBy(col("col")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxDistinctPerCol)
      .select(col("col")).collect().map(_.getString(0))
    require(over.isEmpty,
      s"columns exceed maxDistinctPerCol=$maxDistinctPerCol and cannot be " +
        s"value-indexed (probe them with cellValueLinks instead): ${over.mkString(", ")}")
    stacked
  }

  /** Token linking against a prebuilt value index: exact hit = token
    * equals a distinct value; partial hit = token contained in one.
    * Same output contract as `cellValueLinks`, but the probe side is a
    * tokens×cols frame joined under the broadcast index — no table
    * scan per question batch.
    */
  def linkAgainstIndex(index: DataFrame, tokens: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val probes = (for (t <- tokens; c <- stringCols) yield (t.toLowerCase, c))
      .toDF("token", "col")
    probes.as("p")
      .join(broadcast(index).as("i"), col("p.col") === col("i.col"), "left_outer")
      .groupBy(col("p.token").as("token"), col("p.col").as("col"))
      .agg(
        max(when(col("i.value") === col("p.token"), 1L).otherwise(0L)).as("exact_hit"),
        max(when(col("i.value").contains(col("p.token")), 1L).otherwise(0L)).as("partial_hit"))
  }

  def cellValueLinks(table: DataFrame, tokens: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val combos = (for (t <- tokens; c <- stringCols) yield (t, c)).zipWithIndex
    // aliases are INDEX-based: raw token text in a column name breaks
    // col() resolution (dots parse as struct access, duplicates become
    // ambiguous) — LLM-extracted keywords are arbitrary strings
    val aggs = combos.flatMap { case ((t, c), i) =>
      val v = lower(col(c).cast("string"))
      Seq(
        max(when(v === t.toLowerCase, 1L).otherwise(0L)).as(s"__e_$i"),
        max(when(v.contains(t.toLowerCase), 1L).otherwise(0L)).as(s"__p_$i"))
    }
    val row = table.agg(aggs.head, aggs.tail: _*)
    val stacked = combos.map { case ((t, c), i) =>
      struct(lit(t).as("token"), lit(c).as("col"),
        col(s"__e_$i").as("exact_hit"), col(s"__p_$i").as("partial_hit"))
    }
    row.select(explode(array(stacked: _*)).as("m"))
      .select(col("m.token").as("token"), col("m.col").as("col"),
        col("m.exact_hit").as("exact_hit"), col("m.partial_hit").as("partial_hit"))
  }
}

package graft.evalx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-linking quality metrics (reference `core/evaluate.py:305-396`).
  *
  * The reference's hit rule is *substring containment*: a gold entry is
  * hit when any pred link is contained in it (recall), and a pred link
  * counts when it is contained in any gold entry (precision).
  * "Exact match" is defined — as in the reference — as recall == precision,
  * not set equality.
  */
object SchemaMetrics {

  /** Normalize pred links of `table.column` / `[table, column]` shapes
    * into a set of "table.column" strings (`_normalize_pred_schemas`).
    */
  def normalizeLinks(links: Seq[Any]): Set[String] = links.collect {
    case s: String => s
    case (t: String, c: String) => s"$t.$c"
    case l: Seq[_] if l.length == 2 => s"${l.head}.${l(1)}"
  }.toSet

  def recall(gold: Seq[String], pred: Set[String]): Option[Double] =
    if (gold.isEmpty || pred == null) None
    else Some(gold.count(g => pred.exists(p => g.contains(p))).toDouble / gold.length)

  def precision(gold: Seq[String], pred: Set[String]): Option[Double] =
    if (gold.isEmpty || pred == null) None
    else if (pred.isEmpty) Some(0.0)
    else Some(pred.count(p => gold.exists(g => g.contains(p))).toDouble / pred.size)

  def exactMatch(gold: Seq[String], pred: Set[String]): Option[Boolean] =
    for { r <- recall(gold, pred); p <- precision(gold, pred) } yield r == p

  /** Compression achieved by a reducer: |pred| / db_size
    * (`eval_reduce_rate`, `core/evaluate.py:160-182`).
    */
  def reduceRate(pred: Set[String], dbSize: Int): Option[Double] =
    if (dbSize == 0) None else Some(pred.size.toDouble / dbSize)

  /** Distributed evaluation over a whole benchmark: one row per question
    * with `gold_schemas` and `pred_schemas` array columns; computes the
    * per-row metrics with an explode + fuzzy-contains join (no UDF-per-row
    * loops — the plan is two exploded joins + a groupBy, which scales to
    * arbitrarily many questions).
    */
  def evalDataset(questions: DataFrame): DataFrame = {
    val base = questions.select(col("instance_id"),
      col("gold_schemas"), col("pred_schemas"))

    // gold entries keep their MULTIPLICITY (position-keyed): the
    // reference divides by len(gold), so a duplicated gold link counts
    // twice in the denominator — grouping by value would silently
    // dedup it. Pred links are set-semantics (normalize_pred_schemas
    // builds a set), so value grouping is correct below.
    val goldHits = base
      .select(col("instance_id"),
        posexplode(col("gold_schemas")).as(Seq("gi", "g")))
      .join(base.select(col("instance_id").as("iid"),
        explode(col("pred_schemas")).as("p")),
        col("instance_id") === col("iid") && col("g").contains(col("p")),
        "left_outer")
      .groupBy(col("instance_id"), col("gi"))
      .agg(max(col("p").isNotNull).as("hit"))
      .groupBy(col("instance_id"))
      .agg((sum(col("hit").cast("int")) / count(lit(1))).as("__recall_raw"))

    val predHits = base
      .select(col("instance_id"), explode(col("pred_schemas")).as("p"))
      .join(base.select(col("instance_id").as("iid"),
        explode(col("gold_schemas")).as("g")),
        col("instance_id") === col("iid") && col("g").contains(col("p")),
        "left_outer")
      .groupBy(col("instance_id"), col("p"))
      .agg(max(col("g").isNotNull).as("hit"))
      .groupBy(col("instance_id"))
      .agg((sum(col("hit").cast("int")) / count(lit(1))).as("__precision_raw"))

    // explode() drops empty/null-array rows, so re-anchor on the full
    // question set and encode the driver-side None/Some(0.0) semantics:
    // gold empty or pred null → undefined (null); pred present-but-empty
    // → precision 0.0 (and recall 0.0, every gold entry missed).
    base
      .select(col("instance_id"),
        (col("gold_schemas").isNull || size(col("gold_schemas")) === 0).as("__gold_undef"),
        col("pred_schemas").isNull.as("__pred_null"),
        (col("pred_schemas").isNotNull && size(col("pred_schemas")) === 0).as("__pred_empty"))
      .join(goldHits, Seq("instance_id"), "left_outer")
      .join(predHits, Seq("instance_id"), "left_outer")
      .withColumn("recall",
        when(col("__gold_undef") || col("__pred_null"), lit(null).cast("double"))
          .otherwise(coalesce(col("__recall_raw"), lit(0.0))))
      .withColumn("precision",
        when(col("__gold_undef") || col("__pred_null"), lit(null).cast("double"))
          .when(col("__pred_empty"), lit(0.0))
          .otherwise(col("__precision_raw")))
      .withColumn("exact_match", col("recall") === col("precision"))
      .select("instance_id", "recall", "precision", "exact_match")
  }
}

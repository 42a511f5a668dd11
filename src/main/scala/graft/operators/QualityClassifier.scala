package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Trainable document-quality classifier (the CCNet / fastText-family
  * linear model: Wenzek et al. 2020, Joulin et al. 2017): logistic
  * regression over hashed unigram+bigram bag-of-words features,
  * trained by full-batch gradient descent AS SPARK AGGREGATIONS and
  * scored as a broadcast map-side join. The reference pipeline filters
  * corpora with exactly this model shape; here both training and
  * inference are distributed.
  *
  * Determinism contract (same discipline as [[ImportanceResample]]):
  * every cross-row reduction is over INTEGERS, so partitioning and
  * add-order cannot change results, and any engine mirroring the
  * recipe reproduces it bit-for-bit:
  *
  *  - features: per-doc bucket counts (hashed, `buckets`-bounded);
  *    the bias is bucket −1 with count 1, so one aggregation shape
  *    serves weights and bias alike;
  *  - forward: margin_micro = Σ w_b·cnt_b (exact integer);
  *    p_micro = floor(1e6·sigmoid(margin_micro/1e6)) — the only
  *    floating step, per-row and never accumulated;
  *  - backward: residual r = p_micro − y·1e6 (integer);
  *    grad_b = Σ_docs r·cnt_b summed as DECIMAL(38,0) (exact at any
  *    corpus size — Long would overflow near 1e12 docs);
  *  - update: w ← w − fld(etaNum·grad, etaDen·N) in BigInt floor
  *    division (identical on both engines; truncating division is NOT
  *    engine-portable for negative gradients).
  *
  * Scale shape: the model is `buckets`+1 integers BY CONSTRUCTION —
  * it broadcasts whatever the corpus size. Each GD iteration is one
  * pass over the persisted feature table: a broadcast join + two
  * bounded aggregations (per-doc, then per-bucket), i.e. the same
  * plan family as the DSIR scorer. Iterations are few and fixed
  * (full-batch GD on a 513-parameter model converges in single-digit
  * steps); the per-iteration driver state is B+1 longs.
  */
object QualityClassifier {

  /** Trained model in integer micro units. `weights(b)` is the micro
    * weight of bucket `b`; `bias` is bucket −1.
    */
  final case class Model(bias: Long, weights: Array[Long]) {
    def buckets: Int = weights.length
  }

  /** Per-doc hashed feature counts with the bias row: `(idCol, bucket,
    * cnt)` where bucket −1 carries cnt 1 for every document (so docs
    * with no tokens still score).
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val counts = ImportanceResample.features(docs, idCol, textCol, buckets)
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val bias = docs.select(col(idCol), lit(-1L).as("bucket"), lit(1L).as("cnt"))
    counts.unionByName(bias)
  }

  /** Margin in micro units per document: broadcast the (B+1)-row
    * weight table, join, sum. Integer-exact.
    */
  private def margins(spark: SparkSession, feats: DataFrame, idCol: String,
      model: Model): DataFrame = {
    import spark.implicits._
    val wRows = (-1L, model.bias) +:
      model.weights.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq
    val wDf = wRows.toDF("bucket", "__w")
    feats.join(broadcast(wDf), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("__w")).as("__m"))
  }

  /** `floor(1e6 · sigmoid(mMicro/1e6))` — the one floating-point step,
    * evaluated per row, never accumulated.
    */
  private def pMicro(mMicro: org.apache.spark.sql.Column) =
    floor(lit(1e6) / (lit(1.0) + exp(-(mMicro.cast("double") / lit(1e6)))))
      .cast("long")

  /** BigInt floor division (round toward −∞) — portable across engines,
    * unlike truncating integer division for negative numerators.
    */
  private def fld(a: BigInt, b: BigInt): BigInt = {
    val q = a / b
    if (a % b != 0 && (a.signum != b.signum)) q - 1 else q
  }

  /** Persist a model as a tiny parquet weight table (`bucket`, `w`;
    * bias at bucket −1) — the classifier analog of the materialized
    * IVF index: train once, score many later sessions/streams.
    */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    ((-1L, model.bias) +:
      model.weights.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq)
      .toDF("bucket", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model written by [[saveModel]]. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val buckets = rows.keys.max.toInt + 1
    require(buckets > 0 && rows.contains(-1L),
      s"not a classifier model at $path")
    Model(rows(-1L), Array.tabulate(buckets)(b => rows.getOrElse(b.toLong, 0L)))
  }

  /** Train `iters` full-batch GD steps with learning rate
    * etaNum/etaDen on label column `labelCol` (0/1 int). Weights start
    * at zero — step 1's forward pass is exactly p=500000, a useful
    * cross-engine anchor — unless `init` warm-starts from an earlier
    * model (continual curation: refresh the gate on fresh labels
    * without retraining from scratch).
    */
  def train(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, buckets: Int, iters: Int,
      etaNum: Long = 1L, etaDen: Long = 10L,
      init: Option[Model] = None): Model = {
    val feats = features(docs, idCol, textCol, buckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val labels = docs.select(col(idCol),
      col(labelCol).cast("long").as("__y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // pin both caches before the loop: each gradient job reads feats
      // through TWO joins (margins + the residual join) — unmaterialized,
      // those consumers race to compute every cached partition twice
      feats.count()
      val n = BigInt(labels.count())
      require(n > 0, "cannot train on an empty corpus")
      init.foreach(m => require(m.buckets == buckets,
        s"warm-start bucket mismatch: model ${m.buckets} vs requested $buckets"))
      var model = init.getOrElse(Model(0L, Array.fill(buckets)(0L)))
      val den = BigInt(etaDen) * n
      for (_ <- 1 to iters) {
        // residuals (integer) from the current model's forward pass
        val r = labels.join(margins(spark, feats, idCol, model), Seq(idCol))
          .select(col(idCol), (pMicro(col("__m")) - col("__y") * lit(1000000L)).as("__r"))
        // per-bucket gradient, exact decimal sum; ≤ B+1 rows collected
        val grads = r.join(feats, Seq(idCol))
          .groupBy(col("bucket"))
          .agg(sum(col("__r").cast("decimal(38,0)") * col("cnt")).as("__g"))
          .collect()
          .map(row => row.getLong(0) ->
            BigInt(row.getDecimal(1).toBigInteger))
          .toMap
        val num = BigInt(etaNum)
        val newBias = BigInt(model.bias) -
          fld(num * grads.getOrElse(-1L, BigInt(0)), den)
        val newW = Array.tabulate(buckets) { b =>
          (BigInt(model.weights(b)) -
            fld(num * grads.getOrElse(b.toLong, BigInt(0)), den)).toLong
        }
        model = Model(newBias.toLong, newW)
      }
      model
    } finally {
      feats.unpersist()
      labels.unpersist()
    }
  }

  /** Score documents with a trained model: `(idCol, quality_micro)` in
    * [0, 1e6]. Broadcast join — the model never shuffles the corpus.
    */
  def score(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, model: Model): DataFrame = {
    val feats = features(docs, idCol, textCol, model.buckets)
    margins(spark, feats, idCol, model)
      .select(col(idCol), pMicro(col("__m")).as("quality_micro"))
  }

  /** Row-wise scoring COLUMN: the margin computed inside one codegen'd
    * expression — the model rides along as a (B+1)-element array
    * literal and each n-gram hash looks its weight up with
    * `element_at`, so there is no join, no explode and no per-doc
    * aggregation. Bit-identical to [[score]] (same hash, same integer
    * sum, same sigmoid floor) but usable ANYWHERE a Column is: in
    * Structured Streaming filters (no streaming aggregation state), in
    * scan-time projections, inside other operators' expressions.
    */
  def scoreExpr(textCol: org.apache.spark.sql.Column, model: Model): org.apache.spark.sql.Column = {
    val toks = graft.functions.TextAnalysis.tokens(textCol)
    val hashes = concat(
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 1),
      org.apache.spark.sql.graftvec.TextHashExpr.shingleHashes(toks, 2))
    val wArr = array(model.weights.toIndexedSeq.map(lit): _*)
    val margin = aggregate(
      // tokens(NULL) is NULL → treat as no n-grams (bias-only score),
      // matching features()'s bias row for empty documents
      coalesce(hashes, array().cast("array<long>")),
      lit(model.bias),
      (acc, h) => acc + element_at(wArr, (pmod(h, lit(model.buckets.toLong)) + 1).cast("int")))
    pMicro(margin)
  }

  /** Train-and-score in one call (the q_quality_classifier shape):
    * fit on `docs` with `labelCol`, then score every document.
    */
  def trainAndScore(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, buckets: Int,
      iters: Int): DataFrame = {
    val model = train(spark, docs, idCol, textCol, labelCol, buckets, iters)
    score(spark, docs, idCol, textCol, model)
  }
}

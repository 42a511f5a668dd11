package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tokenizer artifacts — the train-once / encode-everywhere
  * seam for all three learned families (the [[QualityClassifier]]
  * save/load pattern): a tokenizer trained by one curation run is
  * written as a small parquet table and reloaded by any later batch
  * job or streaming ingest, which then encodes at scan time with the
  * usual zero-join kernels. Artifacts are model-sized (merge rows /
  * piece rows — the driver-side bounded class), so a `coalesce(1)`
  * single-file layout keeps the load a one-footer read.
  *
  * Each loader validates the artifact's `family` column — loading a
  * BPE table as a unigram model fails loudly, not with garbage
  * tokens.
  */
object TokenizerIO {

  private def write(spark: SparkSession, path: String,
      family: String, rows: Seq[(Int, String, String, Long)]): Unit = {
    import spark.implicits._
    rows.map { case (rank, a, b, n) => (family, rank, a, b, n) }
      .toDF("family", "rank", "a", "b", "n")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def read(spark: SparkSession, path: String,
      family: String): Seq[(Int, String, String, Long)] = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty && rows.forall(_.getString(0) == family),
      s"not a $family tokenizer artifact at $path " +
        s"(found family ${rows.headOption.map(_.getString(0))})")
    rows.map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
  }

  // ---- BPE ----

  def saveBpe(spark: SparkSession, merges: Seq[BpeLearn.Merge],
      path: String, byteLevel: Boolean = false): Unit =
    write(spark, path, if (byteLevel) "bpe-bytes" else "bpe",
      merges.map(m => (m.rank, m.left, m.right, m.pairCount)))

  def loadBpe(spark: SparkSession, path: String,
      byteLevel: Boolean = false): Seq[BpeLearn.Merge] =
    read(spark, path, if (byteLevel) "bpe-bytes" else "bpe")
      .map { case (rank, l, r, n) => BpeLearn.Merge(rank, l, r, n) }

  def bpeEncodeExpr(spark: SparkSession, path: String, text: Column,
      byteLevel: Boolean = false): Column =
    BpeLearn.encodeExprFast(text, loadBpe(spark, path, byteLevel), byteLevel)

  // ---- WordPiece (merge table; MaxMatch wants the vocab below) ----

  def saveWordPiece(spark: SparkSession,
      merges: Seq[WordPieceLearn.Merge], path: String): Unit =
    write(spark, path, "wordpiece",
      merges.map(m => (m.rank, m.left, m.right, m.pairCount)))

  def loadWordPiece(spark: SparkSession,
      path: String): Seq[WordPieceLearn.Merge] =
    read(spark, path, "wordpiece").map { case (rank, l, r, n) =>
      WordPieceLearn.Merge(rank, l, r, WordPieceLearn.mergedToken(l, r), n)
    }

  /** MaxMatch vocabulary (token strings; counts ride along). */
  def saveWordPieceVocab(spark: SparkSession,
      vocab: Seq[(String, Long)], path: String): Unit =
    write(spark, path, "wordpiece-vocab",
      vocab.zipWithIndex.map { case ((t, c), i) => (i, t, "", c) })

  def loadWordPieceVocab(spark: SparkSession,
      path: String): Seq[(String, Long)] =
    read(spark, path, "wordpiece-vocab").map(r => (r._2, r._4))

  def wordPieceMaxMatchExpr(spark: SparkSession, path: String,
      text: Column, unk: String = "[UNK]"): Column =
    WordPieceLearn.maxMatchExpr(text,
      loadWordPieceVocab(spark, path).map(_._1), unk)

  // ---- Unigram-LM ----

  def saveUnigram(spark: SparkSession, vocab: Seq[(String, Long)],
      path: String): Unit =
    write(spark, path, "unigram",
      vocab.zipWithIndex.map { case ((p, c), i) => (i, p, "", c) })

  def loadUnigram(spark: SparkSession, path: String): Seq[(String, Long)] =
    read(spark, path, "unigram").map(r => (r._2, r._4))

  def unigramEncodeExpr(spark: SparkSession, path: String,
      text: Column): Column =
    UnigramLearn.encodeExpr(text, loadUnigram(spark, path))
}

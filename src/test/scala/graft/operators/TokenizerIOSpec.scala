package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Train-once / encode-everywhere round trips: every family's artifact
  * reloads to an identical model and identical encodings; loading the
  * wrong family fails loudly.
  */
class TokenizerIOSpec extends SparkSpec {

  private lazy val docs = graft.catalog.Tables.load(spark, sfDir, "documents")

  private def freshDir(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft_tok_$name").toString

  private def encoded(c: org.apache.spark.sql.Column): Seq[(Long, Seq[String])] =
    docs.select(col("doc_id"), c.as("t")).orderBy(col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toSeq

  test("BPE merges round-trip; encode identical after reload") {
    val res = BpeLearn.learn(docs, "text", 3)
    val p = freshDir("bpe") + "/model"
    TokenizerIO.saveBpe(spark, res.merges, p)
    assert(TokenizerIO.loadBpe(spark, p) === res.merges)
    assert(encoded(TokenizerIO.bpeEncodeExpr(spark, p, col("text")))
      === encoded(BpeLearn.encodeExprFast(col("text"), res.merges)))
  }

  test("WordPiece merges + MaxMatch vocab round-trip") {
    val res = WordPieceLearn.learn(docs, "text", 3)
    val p = freshDir("wp") + "/model"
    TokenizerIO.saveWordPiece(spark, res.merges, p)
    assert(TokenizerIO.loadWordPiece(spark, p) === res.merges)
    val vocab = WordPieceLearn.vocabulary(res.wordFreq)
      .orderBy(col("token")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val pv = freshDir("wpv") + "/vocab"
    TokenizerIO.saveWordPieceVocab(spark, vocab, pv)
    assert(TokenizerIO.loadWordPieceVocab(spark, pv) === vocab)
    assert(encoded(TokenizerIO.wordPieceMaxMatchExpr(spark, pv, col("text")))
      === encoded(WordPieceLearn.maxMatchExpr(col("text"), vocab.map(_._1))))
  }

  test("unigram piece table round-trips; Viterbi encode identical") {
    val res = UnigramLearn.learn(docs, "text")
    val p = freshDir("uni") + "/model"
    TokenizerIO.saveUnigram(spark, res.vocab, p)
    assert(TokenizerIO.loadUnigram(spark, p) === res.vocab)
    assert(encoded(TokenizerIO.unigramEncodeExpr(spark, p, col("text")))
      === encoded(UnigramLearn.encodeExpr(col("text"), res.vocab)))
  }

  test("loading the wrong family fails loudly") {
    val res = BpeLearn.learn(docs, "text", 1)
    val p = freshDir("mismatch") + "/model"
    TokenizerIO.saveBpe(spark, res.merges, p)
    val e = intercept[IllegalArgumentException](
      TokenizerIO.loadUnigram(spark, p))
    assert(e.getMessage.contains("unigram"))
    assert(e.getMessage.contains("bpe"))
  }
}

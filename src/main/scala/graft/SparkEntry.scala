package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{BpeQueries, CoverageQueries, DedupQueries, DialectQueries, EvalQueries, LineQueries, PqQueries, ReferenceExQueries, Relational, RelationalExt, RowOpsQueries, SimilarityQueries, SketchQueries, StreamQueries, TemporalQueries, TextQueries, UnigramQueries, UrlQueries, WordPieceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared engine capability from the query packs; each
  * pack is one SURVEY §2 operator family. The driver runs `queries` through
  * Verify (sf0.01, DuckDB-oracle compare) and Bench (sf0.1).
  */
object SparkEntry {

  /** All query packs, in SURVEY §2 inventory order. */
  def packs: Seq[QueryPack] = Seq(
    Relational,
    RelationalExt,
    RowOpsQueries,
    TextQueries,
    LineQueries,
    BpeQueries,
    UnigramQueries,
    WordPieceQueries,
    SimilarityQueries,
    PqQueries,
    DedupQueries,
    UrlQueries,
    EvalQueries,
    StreamQueries,
    TemporalQueries,
    SketchQueries,
    CoverageQueries,
    DialectQueries,
    ReferenceExQueries)

  def allQueries: Seq[GQuery] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the composed training-corpus curation pipeline —
    * language filter → length floor → exact dedup → near-dup removal —
    * the engine's 100 TB headline capability (see SCALE.md).
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q_corpus_clean")
      .getOrElse(allQueries.head)
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

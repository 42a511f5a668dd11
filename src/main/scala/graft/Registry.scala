package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.catalog.Tables

/** One declared engine capability: a Spark query plus (when the semantics
  * are SQL-expressible) an equivalent ANSI SQL oracle run by DuckDB on the
  * same parquet tables. The driver's correctness gate hash-compares the two.
  */
final case class GQuery(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[GQuery]
}

object QueryPack {

  /** Register all tables then run a DataFrame-building body. */
  def withTables(spark: SparkSession, dir: String)(body: SparkSession => DataFrame): DataFrame = {
    Tables.registerAll(spark, dir)
    body(spark)
  }

  // ---- deterministic numeric helpers -----------------------------------
  // Double aggregation is order-sensitive, and Spark (partial aggregation
  // across partitions) and DuckDB (its own parallel accumulation) will not
  // sum doubles in the same order. Exact decimal arithmetic sidesteps this:
  // cast each term to a decimal, sum exactly, convert the final value to
  // double once. Both engines then produce bit-identical doubles.

  /** Exact sum of a money column (2 dp) as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a derived term (4 dp) as double. */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Order-insensitive average: exact decimal sum / double count. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(c).cast(DoubleType)

  /** Oracle-side (DuckDB) equivalents of the helpers above. */
  def oSum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  def oSum4(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
  def oAvg(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)"
}

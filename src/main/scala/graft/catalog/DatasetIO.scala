package graft.catalog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Polymorphic dataset load/save (reference `load_dataset`/`save_dataset`,
  * `core/utils.py:157-214`) and file→table import
  * (`demo/file_to_db.py`): extension-dispatched readers/writers.
  *
  * Tabular formats load distributed (`spark.read`); text-ish artifacts
  * (.txt/.sql/.md — prompts, predicted SQL) are driver-sized by nature
  * and load as strings, exactly like the reference.
  */
object DatasetIO {

  /** Extension-dispatched DataFrame reader. JSON uses multiLine so both
    * JSON-array files (the reference's dataset format) and JSONL work.
    */
  def load(spark: SparkSession, path: String): DataFrame = ext(path) match {
    case "json" => spark.read.option("multiLine", "true").json(path)
    case "jsonl" => spark.read.json(path)
    case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    case "tsv" => spark.read.option("header", "true").option("inferSchema", "true")
      .option("sep", "\t").csv(path)
    case "parquet" => spark.read.parquet(path)
    case "xlsx" => // driver-side pre-convert (XlsxConvert), distributed read;
      // multiLine + escape because csvQuote emits quoted embedded
      // newlines and doubled quotes (Alt+Enter cells are common)
      spark.read.option("header", "true").option("inferSchema", "true")
        .option("multiLine", "true").option("escape", "\"")
        .csv(XlsxConvert.toCsv(path))
    case other => throw new IllegalArgumentException(
      s"unsupported tabular format .$other (use loadText for txt/sql/md)")
  }

  /** Driver-side text artifact load (.txt/.sql/.md → String). */
  def loadText(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  /** Extension-dispatched writer; tabular formats write distributed,
    * single-file text artifacts go through the driver (mkdir -p like the
    * reference).
    */
  def save(df: DataFrame, path: String): Unit = ext(path) match {
    case "json" => df.write.mode(SaveMode.Overwrite).json(path)
    case "csv" => df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    case "parquet" => df.write.mode(SaveMode.Overwrite).parquet(path)
    case other => throw new IllegalArgumentException(s"unsupported write format .$other")
  }

  def saveText(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, content.getBytes("UTF-8"))
    ()
  }

  private def ext(path: String): String =
    path.substring(path.lastIndexOf('.') + 1).toLowerCase

  // ---- file → table import (demo/file_to_db.py analog) ----------------

  /** One (db_id, table, column) row of harvested schema — the parallel
    * wire format (`core/data_manage.py:1631-1641`) as a DataFrame.
    */
  final case class ColumnMeta(
      dbId: String, tableName: String, columnName: String,
      columnType: String, primaryKey: Boolean)

  /** Import data files as temp views (one file = one table, named by
    * file stem) and harvest a parallel-format schema DataFrame — the
    * reference's upload + Spider-schema extraction flow.
    */
  def importFiles(spark: SparkSession, dbId: String,
      paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val metas = paths.flatMap { p =>
      val table = Paths.get(p).getFileName.toString.replaceAll("\\.[^.]+$", "")
      val df = load(spark, p)
      df.createOrReplaceTempView(table)
      df.schema.fields.zipWithIndex.map { case (f, i) =>
        ColumnMeta(dbId, table, f.name, f.dataType.simpleString, i == 0)
      }
    }
    metas.toDF("db_id", "table_name", "column_name", "column_type", "primary_key")
  }
}

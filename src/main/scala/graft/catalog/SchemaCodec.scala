package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central (Spider-style) ↔ parallel schema codecs (reference
  * `single_central_process`, `core/data_manage.py:1604-1675`, and the
  * per-column-file layout `core/data_manage.py:1126-1136`).
  *
  * The central wire format is one record per DATABASE (table list +
  * indexed column list with an optional `(-1, "*")` star marker +
  * composite PKs + FK index pairs); the working format is one row per
  * COLUMN — already a DataFrame, which is the whole point (SURVEY §1.2).
  */
object SchemaCodec {

  /** One central-format database record. */
  final case class CentralSchema(
      dbId: String,
      dbType: String = "sqlite",
      tableNamesOriginal: Seq[String],
      /** (tableIdx, columnName); may start with (-1, "*"). */
      columnNamesOriginal: Seq[(Int, String)],
      /** aligned with the non-star columns. */
      columnTypes: Seq[String],
      columnDescriptions: Seq[String] = Nil,
      /** composite keys are nested lists in the wire format. */
      primaryKeys: Seq[Seq[Int]] = Nil,
      /** (fkColIdx, referencedColIdx) pairs (star-offset indices). */
      foreignKeys: Seq[(Int, Int)] = Nil)

  final case class ParallelColumn(
      dbId: String, dbType: String, tableName: String, columnName: String,
      columnTypes: String, columnDescriptions: String,
      primaryKey: Boolean, foreignKey: String)

  /** Central → parallel: flatMap with the reference's index bookkeeping
    * (star-column offset 1621-1623, FK rendering as `[table(col)]`
    * strings 1657-1673).
    */
  def centralToParallel(row: CentralSchema): Seq[ParallelColumn] = {
    val hasStar = row.columnNamesOriginal.headOption.exists(_._1 == -1)
    val offset = if (hasStar) 1 else 0
    val columns = row.columnNamesOriginal.filter(_._1 != -1)

    val base = columns.zipWithIndex.map { case ((tableIdx, colName), i) =>
      ParallelColumn(
        row.dbId, row.dbType,
        tableName = row.tableNamesOriginal(tableIdx),
        columnName = colName,
        columnTypes = if (i < row.columnTypes.length) row.columnTypes(i) else "",
        columnDescriptions =
          if (i < row.columnDescriptions.length) row.columnDescriptions(i) else "",
        primaryKey = false, foreignKey = "")
    }.toArray

    row.primaryKeys.flatten.foreach { pk =>
      val i = pk - offset
      if (i >= 0 && i < base.length) base(i) = base(i).copy(primaryKey = true)
    }
    row.foreignKeys.foreach { case (c1, c2) =>
      val (i, j) = (c1 - offset, c2 - offset)
      if (i >= 0 && i < base.length && j >= 0 && j < base.length)
        base(i) = base(i).copy(foreignKey =
          base(i).foreignKey + s"[${base(j).tableName}(${base(j).columnName})]")
    }
    base.toSeq
  }

  /** Parallel rows → DataFrame in the working-format column layout. */
  def toDF(spark: SparkSession, cols: Seq[ParallelColumn]): DataFrame = {
    import spark.implicits._
    cols.toDF()
      .withColumnRenamed("dbId", "db_id")
      .withColumnRenamed("dbType", "db_type")
      .withColumnRenamed("tableName", "table_name")
      .withColumnRenamed("columnName", "column_name")
      .withColumnRenamed("columnTypes", "column_types")
      .withColumnRenamed("columnDescriptions", "column_descriptions")
      .withColumnRenamed("primaryKey", "primary_key")
      .withColumnRenamed("foreignKey", "foreign_key")
  }

  /** Harvest a central record from the live catalog (DDL-scan analog:
    * the reverse direction, used by file→DB import flows).
    */
  def fromRegisteredTables(spark: SparkSession, dbId: String,
      tables: Seq[String]): CentralSchema = {
    val cols = tables.zipWithIndex.flatMap { case (t, ti) =>
      spark.table(t).schema.fields.map(f => (ti, f.name, f.dataType.simpleString))
    }
    CentralSchema(
      dbId = dbId,
      tableNamesOriginal = tables,
      columnNamesOriginal = (-1, "*") +: cols.map(c => (c._1, c._2)),
      columnTypes = cols.map(_._3))
  }
}

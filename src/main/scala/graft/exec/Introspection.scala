package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Introspection shims: generated SQL probes schema metadata with
  * backend-specific incantations (`PRAGMA table_info`, `sqlite_master`,
  * `INFORMATION_SCHEMA.*` — reference usage at
  * `core/actor/generator/OpenSearchSQLGenerate.py:231-279` and
  * `DAILSQLGenerate.py:244-312`). Spark's catalog answers all of them;
  * this layer intercepts the probe shapes and returns result tables in
  * the layout the caller expects.
  */
object Introspection {

  private val pragmaRe = """(?is)\s*PRAGMA\s+table_info\s*\(\s*['"`]?(\w+)['"`]?\s*\)\s*;?\s*""".r
  private val masterRe = """(?is)\s*SELECT\s+name\s+FROM\s+sqlite_master\s+WHERE\s+type\s*=\s*'table'(.*)""".r
  private val infoTablesRe = """(?is)\s*SELECT\s+.*FROM\s+INFORMATION_SCHEMA\.TABLES(.*)""".r
  // trailing name predicate of a table-listing probe — an existence
  // check must NOT get the full catalog back as a truthy answer
  private val nameEqRe = """(?is).*\b(?:name|TABLE_NAME)\s*=\s*'(\w+)'.*""".r
  private val infoColumnsRe = """(?is)\s*SELECT\s+(.*?)\s+FROM\s+INFORMATION_SCHEMA\.COLUMNS\s+WHERE\s+TABLE_NAME\s*=\s*'(\w+)'.*""".r

  /** If `sql` is a recognized introspection probe, answer it from the
    * Spark catalog; otherwise None and the SQL goes to `spark.sql`.
    */
  def answer(spark: SparkSession, sql: String): Option[DataFrame] = sql match {
    case pragmaRe(table) => Some(tableInfo(spark, table))
    case masterRe(rest) => Some(filterByName(tableList(spark), rest))
    case infoTablesRe(rest) =>
      // the standard vocabulary names the column TABLE_NAME
      Some(filterByName(tableList(spark), rest)
        .withColumnRenamed("name", "table_name"))
    case infoColumnsRe(selectList, table) =>
      // honor the probe's projection: a caller reading positionally
      // (row(0) = column_name) must get the columns it asked for —
      // including aliased (`column_name AS c`), qualified
      // (`c.column_name`), and DISTINCT select lists. Only a select
      // item that still cannot be resolved falls back to the full
      // layout.
      import org.apache.spark.sql.functions.col
      val full = infoSchemaColumns(spark, table)
      val distinctRe = """(?is)^\s*DISTINCT\s+(.*)$""".r
      val (wantDistinct, items) = selectList match {
        case distinctRe(rest) => (true, rest)
        case other            => (false, other)
      }
      // each item: [qualifier.]name [AS alias] | [qualifier.]name alias
      val itemRe = """(?is)^\s*(?:(\w+)\s*\.\s*)?(\w+)(?:\s+(?:AS\s+)?(\w+))?\s*$""".r
      val resolved = items.split(",").toSeq.map {
        case itemRe(_, name, alias) =>
          val base = name.toLowerCase
          if (full.columns.contains(base))
            Some(col(base).as(Option(alias).map(_.toLowerCase).getOrElse(base)))
          else None
        case _ => None
      }
      if (resolved.nonEmpty && resolved.forall(_.isDefined)) {
        val projected = full.select(resolved.flatten: _*)
        Some(if (wantDistinct) projected.distinct() else projected)
      } else Some(full)
    case _ => None
  }

  /** PRAGMA table_info layout: (cid, name, type, notnull, dflt_value, pk). */
  def tableInfo(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val cols = spark.catalog.listColumns(table).collect()
    cols.zipWithIndex.map { case (c, i) =>
      (i, c.name, c.dataType, if (c.nullable) 0 else 1,
        null.asInstanceOf[String], 0)
    }.toSeq.toDF("cid", "name", "type", "notnull", "dflt_value", "pk")
  }

  /** INFORMATION_SCHEMA.COLUMNS layout with standard SQL type names:
    * `(table_name, column_name, ordinal_position, data_type,
    * is_nullable)` — the vocabulary Snowflake/BigQuery-family probes
    * expect (VARCHAR/BIGINT/…), mapped from Spark's catalog names.
    */
  def infoSchemaColumns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val cols = spark.catalog.listColumns(table).collect()
    cols.zipWithIndex.map { case (c, i) =>
      (table, c.name, i + 1, ansiTypeName(c.dataType),
        if (c.nullable) "YES" else "NO")
    }.toSeq.toDF("table_name", "column_name", "ordinal_position",
      "data_type", "is_nullable")
  }

  /** Spark catalog type name → standard SQL (INFORMATION_SCHEMA) name. */
  private def ansiTypeName(sparkType: String): String =
    sparkType.toLowerCase match {
      case "int" | "integer"    => "INTEGER"
      case "bigint" | "long"    => "BIGINT"
      case "smallint" | "short" => "SMALLINT"
      case "tinyint" | "byte"   => "TINYINT"
      case "string"             => "VARCHAR"
      case "double"             => "DOUBLE"
      case "float" | "real"     => "FLOAT"
      case "boolean"            => "BOOLEAN"
      case "date"               => "DATE"
      case "binary"             => "BLOB"
      case t if t.startsWith("decimal")   => t.toUpperCase
      case t if t.startsWith("timestamp") => "TIMESTAMP"
      case t if t.startsWith("array<") =>
        ansiTypeName(t.stripPrefix("array<").stripSuffix(">")) + "[]"
      case t => t.toUpperCase
    }

  /** sqlite_master-style table listing: a single `name` column. */
  def tableList(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().map(_.name).toSeq.toDF("name")
  }

  private def filterByName(list: DataFrame, rest: String): DataFrame =
    rest match {
      case nameEqRe(t) =>
        list.filter(org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("name")) === t.toLowerCase)
      case _ => list
    }

  /** `CREATE TABLE` DDL text per table (reference builds prompt DDL from
    * sqlite_master / INFORMATION_SCHEMA; Spark derives it from the schema).
    */
  def ddl(spark: SparkSession, table: String): String = {
    val schema = spark.table(table).schema
    s"CREATE TABLE $table (${schema.toDDL})"
  }
}

package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Polymorphic IO + file→table import round trips. */
class DatasetIOSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-io").toString

  test("json array round trip (the reference's dataset wire format)") {
    val p = s"$tmp/items.json"
    DatasetIO.saveText(p,
      """[{"instance_id": "a", "question": "q1"}, {"instance_id": "b", "question": "q2"}]""")
    val df = DatasetIO.load(spark, p)
    assert(df.count() == 2 && df.columns.sorted.sameElements(Array("instance_id", "question")))
  }

  test("csv round trip distributed") {
    import spark.implicits._
    val p = s"$tmp/t.csv"
    DatasetIO.save(Seq((1, "x"), (2, "y")).toDF("id", "v"), p)
    val back = DatasetIO.load(spark, p)
    assert(back.count() == 2 && back.columns.contains("id"))
  }

  test("text artifacts load as strings; unsupported formats reject") {
    val p = s"$tmp/pred.sql"
    DatasetIO.saveText(p, "SELECT 1")
    assert(DatasetIO.loadText(p) == "SELECT 1")
    intercept[IllegalArgumentException](DatasetIO.load(spark, s"$tmp/x.docx"))
  }

  /** Minimal real .xlsx (zip of OOXML parts): header + 2 rows, shared
    * strings, an inline string, a number, a comma-bearing value, and a
    * sparse row that skips a column.
    */
  private def writeXlsx(path: String): Unit = {
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">""" +
        "<si><t>pid</t></si><si><t>pname</t></si><si><t>price</t></si>" +
        "<si><r><t>wid</t></r><r><t>get</t></r></si></sst>") // rich-text runs
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""" +
        """<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>a,comma</t></is></c><c r="C2"><v>9.5</v></c></row>""" +
        """<row r="3"><c r="A3"><v>2</v></c><c r="C3"><v>3.25</v></c></row>""" +
        "</sheetData></worksheet>")
    zos.close()
  }

  test("xlsx pre-convert: load + importFiles round trip with schema harvest") {
    writeXlsx(s"$tmp/products.xlsx")
    val df = DatasetIO.load(spark, s"$tmp/products.xlsx")
    assert(df.columns.toSeq == Seq("pid", "pname", "price"))
    val rows = df.collect().map(r =>
      (r.getInt(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(rows == Set((1, Some("a,comma"), 9.5), (2, None, 3.25)),
      s"got ${rows.mkString(", ")}")

    // mixed csv + xlsx import (the reference's upload flow)
    import spark.implicits._
    DatasetIO.save(Seq((1, "x")).toDF("oid", "oname"), s"$tmp/orders_import.csv")
    val schema = DatasetIO.importFiles(spark, "db2",
      Seq(s"$tmp/orders_import.csv", s"$tmp/products.xlsx"))
    val byTable = schema.collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(byTable == Set(
      ("orders_import", "oid"), ("orders_import", "oname"),
      ("products", "pid"), ("products", "pname"), ("products", "price")))
    assert(spark.sql("SELECT SUM(price) s FROM products").head().getDouble(0) == 12.75)
  }

  test("importFiles registers views and harvests parallel-format schema") {
    import spark.implicits._
    DatasetIO.save(Seq((1, "a"), (2, "b")).toDF("uid", "uname"), s"$tmp/users_import.csv")
    val schema = DatasetIO.importFiles(spark, "db1", Seq(s"$tmp/users_import.csv"))
    assert(schema.count() == 2)
    val cols = schema.collect().map(r => (r.getString(1), r.getString(2), r.getBoolean(4)))
    assert(cols.contains(("users_import", "uid", true)))
    assert(spark.sql("SELECT COUNT(*) FROM users_import").head().getLong(0) == 2)
  }
}

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
    intercept[IllegalArgumentException](DatasetIO.load(spark, s"$tmp/x.xlsx"))
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

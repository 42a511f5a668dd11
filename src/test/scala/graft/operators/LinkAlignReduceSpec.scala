package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.exec.ScanMetrics

/** LinkAlign reduction loop composition + scan-metrics accounting. */
class LinkAlignReduceSpec extends SparkSpec {

  /** Synthetic schema: 300 columns in 30 tables; columns of table_0 sit
    * near the query vector, the rest are random.
    */
  private lazy val schemaCorpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 32
    val target = Array.fill(dim)(rnd.nextGaussian())
    val rows = (0 until 300).map { i =>
      val vec =
        if (i < 10) target.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
        else Array.fill(dim)(rnd.nextGaussian().toFloat)
      (i.toLong, s"table_${i / 10}", s"col_$i", vec.toSeq)
    }
    rows.toDF("col_id", "table_name", "column_name", "embedding")
  }

  private lazy val queryVec =
    schemaCorpus.filter(col("col_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("small DBs bypass reduction untouched") {
    val out = LinkAlignReduce.reduce(schemaCorpus, queryVec, dbSize = 50)
    assert(out.count() == 300)
    assert(out.select(max(col("turn_n"))).head().getInt(0) == 0)
  }

  test("reduction retrieves target columns first and decays later turns") {
    val out = LinkAlignReduce.reduce(schemaCorpus, queryVec, dbSize = 300,
      initRetainRate = 1.0, decayRate = 0.5)
    val rows = out.select("col_id", "turn_n").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.nonEmpty && rows.length < 300, "must actually reduce")
    // the 10 near-target columns retrieve in turn 0 and survive rate 1.0
    val turn0 = rows.filter(_._2 == 0).map(_._1).toSet
    assert((0L until 10L).forall(turn0.contains))
    // floor: turns with rate <= 0.1 dropped → decay 0.5 keeps turns 0..2
    assert(rows.map(_._2).max <= 2)
  }

  test("flagged pairs are anti-filtered out") {
    import spark.implicits._
    val flagged = Seq(("table_0", "col_0"), ("table_0", "col_1"))
      .toDF("table_name", "column_name")
    val out = LinkAlignReduce.reduce(schemaCorpus, queryVec, dbSize = 300,
      flagged = Some(flagged))
    val ids = out.select("col_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(0L) && !ids.contains(1L))
  }

  test("scan metrics report bytes and rows for a parquet scan") {
    val df = graft.catalog.Tables.load(spark, sfDir, "customer")
      .filter(col("c_acctbal") > 0)
    val (n, stats) = ScanMetrics.execAndMeasure(df)
    assert(n > 0)
    assert(stats.bytesRead > 0 && stats.filesRead >= 1 && stats.rowsScanned > 0)

    val listener = new ScanMetrics.Listener
    spark.listenerManager.register(listener)
    try {
      graft.catalog.Tables.load(spark, sfDir, "region").count()
      // QueryExecutionListener events post asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.lastStats.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.lastStats.exists(_._2.bytesRead > 0))
    } finally spark.listenerManager.unregister(listener)
  }
}

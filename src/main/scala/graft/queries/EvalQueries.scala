package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.evalx.{Evaluator, ExItem}
import graft.operators.FastExecSelect

/** End-to-end evaluation + selection operators, driven over the real
  * engine (transpile → execute → compare). The oracles are fixture
  * expectations (VALUES literals): the outcome semantics — exclusion,
  * zero-on-pred-failure, subset-column equivalence, tolerance — are not
  * SQL-expressible, but the expected scores on these fixed items are
  * exact and engine-checkable.
  */
object EvalQueries extends QueryPack {

  /** Shared by the single-scan and indexed cell-linking variants. */
  private def cellLinkOracle: String = {
    val combos = for {
      t <- Seq("building", "automobile", "unfindable")
      c <- Seq("c_name", "c_mktsegment")
    } yield
      s"""SELECT '$t' AS token, '$c' AS col,
         |  CAST(MAX(CASE WHEN lower(CAST($c AS VARCHAR)) = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS exact_hit,
         |  CAST(MAX(CASE WHEN contains(lower(CAST($c AS VARCHAR)), '$t') THEN 1 ELSE 0 END) AS BIGINT) AS partial_hit
         |FROM customer""".stripMargin
    combos.mkString("\nUNION ALL\n") + "\nORDER BY token, col"
  }

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_eval_ex",
      "Execute-accuracy (EX) end-to-end: gold fail→excluded(null), pred " +
        "fail→0, else bipartite-column comparison with 1e-2 tolerance. " +
        "Six fixture items exercise every branch.",
      (s, dir) => {
        import s.implicits._
        Tables.registerAll(s, dir)
        val items = Seq(
          // identical result, different text → 1
          ("ex1", "SELECT r_name FROM region ORDER BY r_name",
            "SELECT region.r_name FROM region WHERE 1 = 1 ORDER BY r_name"),
          // pred has extra column + permuted order → 1 (subset columns)
          ("ex2", "SELECT n_name, n_regionkey FROM nation ORDER BY n_name",
            "SELECT n_regionkey, n_name, n_nationkey FROM nation ORDER BY n_name"),
          // wrong result → 0
          ("ex3", "SELECT COUNT(*) AS c FROM customer",
            "SELECT COUNT(*) AS c FROM customer WHERE c_acctbal > 0"),
          // pred does not execute → 0
          ("ex4", "SELECT COUNT(*) AS c FROM orders",
            "SELECT no_such_column FROM orders"),
          // gold does not execute → excluded (null)
          ("ex5", "SELECT broken FROM region", "SELECT 1 AS x"),
          // numeric tolerance 1e-2 → 1
          ("ex6", "SELECT CAST(100.004 AS DOUBLE) AS v",
            "SELECT CAST(100.01 AS DOUBLE) AS v"))
          .toDF("instance_id", "gold_sql", "pred_sql")
        new Evaluator(s).evalDataFrame(items)
          .select(col("instance_id"), col("score"))
          .orderBy(col("instance_id"))
      },
      Some("""SELECT * FROM (VALUES
             |  ('ex1', 1), ('ex2', 1), ('ex3', 0), ('ex4', 0),
             |  ('ex5', CAST(NULL AS INT)), ('ex6', 1)) AS t(instance_id, score)
             |ORDER BY instance_id""".stripMargin)),

    GQuery(
      "q_eval_ex_ordered",
      "EX respects row order by default (reference compare default): " +
        "same rows, different order → 0.",
      (s, dir) => {
        import s.implicits._
        Tables.registerAll(s, dir)
        val items = Seq(
          ("ord1", "SELECT r_name FROM region ORDER BY r_name",
            "SELECT r_name FROM region ORDER BY r_name"),
          ("ord2", "SELECT c_custkey FROM customer ORDER BY c_custkey",
            "SELECT c_custkey FROM customer ORDER BY c_custkey DESC"))
          .toDF("instance_id", "gold_sql", "pred_sql")
        new Evaluator(s).evalDataFrame(items)
          .select(col("instance_id"), col("score"))
          .orderBy(col("instance_id"))
      },
      Some("""SELECT * FROM (VALUES ('ord1', 1), ('ord2', 0)) AS t(instance_id, score)
             |ORDER BY instance_id""".stripMargin)),

    GQuery(
      "q_eval_passn",
      "Pass@n over generation replicas (the reproduction-harness " +
        "aggregate): a question is valid when >=1 replica's gold " +
        "executes, passes when >=1 replica scores EX=1. Fixture: q1 " +
        "passes only in replica 2, q2 never passes, q3's gold is broken " +
        "in both -> pass@2 = 1/2.",
      (s, dir) => {
        import s.implicits._
        Tables.registerAll(s, dir)
        val gold = "SELECT COUNT(*) AS c FROM region"
        val r1 = Seq(
          ExItem("q1", Some(gold), Some("SELECT COUNT(*) AS c FROM region WHERE r_name = 'NOPE'")),
          ExItem("q2", Some(gold), Some("SELECT broken FROM region")),
          ExItem("q3", Some("SELECT broken FROM region"), Some(gold)))
        val r2 = Seq(
          ExItem("q1", Some(gold), Some(gold)),
          ExItem("q2", Some(gold), Some("SELECT COUNT(*) AS c FROM region WHERE 1 = 0")),
          ExItem("q3", Some("SELECT broken FROM region"), Some(gold)))
        val p = new Evaluator(s).passAtN(Seq(r1, r2))
        Seq((p.passRate, p.passedQuestions, p.validQuestions, p.totalQuestions))
          .toDF("pass_rate", "passed", "valid", "total")
      },
      Some("""SELECT CAST(0.5 AS DOUBLE) AS pass_rate, 1 AS passed,
             |       2 AS valid, 3 AS total""".stripMargin)),

    GQuery(
      "q_select_fastexec",
      "FastExecSelect: execute candidates, group by distributed result " +
        "fingerprints, largest group wins. Output is the winning group " +
        "(member indices + size) — deterministic regardless of timing.",
      (s, dir) => {
        import s.implicits._
        Tables.registerAll(s, dir)
        val candidates = Seq(
          "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment",
          "SELECT COUNT(*) AS cnt, c_mktsegment AS seg FROM customer GROUP BY c_mktsegment",
          "SELECT c_mktsegment, COUNT(*) AS n FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment",
          "SELECT broken_column FROM customer")
        val sel = FastExecSelect.select(s, candidates).get
        Seq((sel.groupIndices.mkString(","), sel.groupSize.toLong))
          .toDF("group_members", "group_size")
      },
      Some("SELECT * FROM (VALUES ('0,1', CAST(2 AS BIGINT))) AS t(group_members, group_size)")),

    GQuery(
      "q_actor_pipeline",
      "Actor composition end-to-end: PipelineActor(FilterReducer -> " +
        "SliceParser) over documents, then per-slice aggregation — the " +
        "workflow layer driving real distributed operators.",
      (s, dir) => {
        val pipeline = graft.actors.PipelineActor(Seq(
          graft.actors.FilterReducer("lang-en"),
          graft.actors.SliceParser("doc_id", 100)))
        pipeline.act(Tables.load(s, dir, "documents"))
          .groupBy(col("slice_id"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("slice_id"))
      },
      Some("""WITH f AS (SELECT * FROM documents WHERE lang = 'en'),
             |sliced AS (
             |  SELECT doc_id,
             |         CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / 100) AS BIGINT) AS slice_id
             |  FROM f)
             |SELECT slice_id, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
             |FROM sliced GROUP BY slice_id ORDER BY slice_id""".stripMargin)),

    GQuery(
      "q_cell_link",
      "Cell-value linking as ONE aggregation scan: exact/partial hit " +
        "flags for every (token, column) pair — replacing the " +
        "reference's probe-query-per-token loop.",
      (s, dir) =>
        graft.text.SchemaLinking.cellValueLinks(
          Tables.load(s, dir, "customer"),
          tokens = Seq("building", "automobile", "unfindable"),
          stringCols = Seq("c_name", "c_mktsegment"))
          .orderBy(col("token"), col("col")),
      Some(cellLinkOracle)),

    GQuery(
      "q_cell_link_indexed",
      "Cell-value linking with the split a 100 TB user should copy: the " +
        "bounded category column (c_mktsegment, 5 values) goes into the " +
        "build-once broadcast value index under the DEFAULT cardinality " +
        "guard; the unique-per-row c_name — exactly what the guard " +
        "rejects — is probed by the single aggregation scan instead. " +
        "Union of both paths, same oracle as the single-scan variant.",
      (s, dir) => {
        val tokens = Seq("building", "automobile", "unfindable")
        val cust = Tables.load(s, dir, "customer")
        val index = graft.text.SchemaLinking.buildValueIndex(
          cust, Seq("c_mktsegment"))
        val viaIndex = graft.text.SchemaLinking.linkAgainstIndex(
          index, tokens, Seq("c_mktsegment"))
        val viaScan = graft.text.SchemaLinking.cellValueLinks(
          cust, tokens, Seq("c_name"))
        viaIndex.unionByName(viaScan).orderBy(col("token"), col("col"))
      },
      Some(cellLinkOracle)),

    GQuery(
      "q_media_sniff",
      "Multimodal binary columns: synthesize media payloads (magic bytes " +
        "+ text body), sniff container format from magic via pure " +
        "expressions, aggregate per format — binary plumbing end to end.",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val magic = Multimodal.Magic.toMap
        val docs = Tables.load(s, dir, "documents")
        val body = col("text").cast("binary")
        val bytes = when(pmod(col("doc_id"), lit(5)) === 0, concat(lit(magic("jpeg")), body))
          .when(pmod(col("doc_id"), lit(5)) === 1, concat(lit(magic("png")), body))
          .when(pmod(col("doc_id"), lit(5)) === 2,
            concat(lit(Multimodal.RiffWavePrefix), body))
          .when(pmod(col("doc_id"), lit(5)) === 3,
            concat(lit(Multimodal.RiffAviPrefix), body))
          .otherwise(body)
        docs.select(col("doc_id"), bytes.as("bytes"))
          .select(col("doc_id"),
            Multimodal.sniffFormat(col("bytes")).as("format"),
            length(col("bytes")).cast("long").as("n_bytes"))
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bytes")).as("total_bytes"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("format"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CASE CAST(doc_id % 5 AS INT)
             |      WHEN 0 THEN '\xFF\xD8\xFF'::BLOB || CAST(text AS BLOB)
             |      WHEN 1 THEN '\x89\x50\x4E\x47'::BLOB || CAST(text AS BLOB)
             |      WHEN 2 THEN 'RIFF'::BLOB || '\x00\x00\x00\x00'::BLOB
             |                  || 'WAVE'::BLOB || CAST(text AS BLOB)
             |      WHEN 3 THEN 'RIFF'::BLOB || '\x00\x00\x00\x00'::BLOB
             |                  || 'AVI '::BLOB || CAST(text AS BLOB)
             |      ELSE CAST(text AS BLOB) END AS bytes
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, CAST(octet_length(bytes) AS BIGINT) AS n_bytes,
             |    CASE
             |      WHEN substring(hex(bytes), 1, 8) = '52494646'
             |           AND substring(hex(bytes), 17, 8) = '57415645' THEN 'wav'
             |      WHEN substring(hex(bytes), 1, 8) = '52494646'
             |           AND substring(hex(bytes), 17, 8) = '41564920' THEN 'avi'
             |      WHEN substring(hex(bytes), 1, 8) = '52494646' THEN 'riff'
             |      WHEN substring(hex(bytes), 1, 6) = 'FFD8FF' THEN 'jpeg'
             |      WHEN substring(hex(bytes), 1, 8) = '89504E47' THEN 'png'
             |      WHEN substring(hex(bytes), 1, 8) = '47494638' THEN 'gif'
             |      WHEN substring(hex(bytes), 1, 6) = '494433' THEN 'mp3'
             |      ELSE 'unknown' END AS format
             |  FROM m)
             |SELECT format, COUNT(*) AS n_docs,
             |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
             |       MIN(doc_id) AS first_doc
             |FROM f GROUP BY format ORDER BY format""".stripMargin))
  )
}

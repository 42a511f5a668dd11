package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.functions.KmvSketch
import graft.operators.{BloomDecontaminate, QuantileGate}

/** Sketch / approximate operators whose approximation is DETERMINISTIC
  * — engine-portable hashes make the sketch contents, the estimates,
  * and even the Bloom false positives bit-identical in Spark and the
  * DuckDB oracle, so "approximate" still hash-verifies exactly.
  */
object SketchQueries extends QueryPack {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_kmv_distinct",
      "KMV distinct-count sketch: per ship-year, the k=64 smallest " +
        "distinct part-key draws (bounded typed-Aggregator buffer, " +
        "map-side partials ship <= 64 longs per group vs COUNT(DISTINCT)'s " +
        "full value shuffle) and the (k-1)*M/h_k estimate next to the " +
        "exact count. Oracle replays the draw, the threshold, and the " +
        "integer estimate in SQL.",
      (s, dir) => {
        import s.implicits._
        val k = 64
        val sk = t(s, dir, "lineitem")
          .select(year(col("l_shipdate").cast("timestamp")).cast("long").as("ship_year"),
            KmvSketch.draw(col("l_partkey")).as("d"))
          .as[(Long, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(KmvSketch(k).toColumn.name("sketch"))
          .toDF("ship_year", "sketch")
        val exact = t(s, dir, "lineitem")
          .groupBy(year(col("l_shipdate").cast("timestamp")).cast("long").as("ship_year"))
          .agg(countDistinct(col("l_partkey")).as("n_exact"))
        sk.join(exact, "ship_year")
          .select(col("ship_year"), col("n_exact"),
            KmvSketch.estimate(col("sketch"), k).as("kmv_est"),
            KmvSketch.threshold(col("sketch"), k).as("h_k"))
          .orderBy(col("ship_year"))
      },
      Some(s"""WITH h AS (SELECT DISTINCT year(CAST(l_shipdate AS TIMESTAMP)) AS ship_year,
              |                  ((l_partkey % 999999937) * 2654435761) % ${KmvSketch.M} AS d
              |           FROM lineitem),
              |r AS (SELECT ship_year, d,
              |             ROW_NUMBER() OVER (PARTITION BY ship_year ORDER BY d) AS rn,
              |             COUNT(*) OVER (PARTITION BY ship_year) AS nd
              |      FROM h),
              |s AS (SELECT ship_year,
              |             MAX(CASE WHEN rn = 64 THEN d END) AS h_k,
              |             MAX(nd) AS nd
              |      FROM r GROUP BY 1),
              |e AS (SELECT year(CAST(l_shipdate AS TIMESTAMP)) AS ship_year,
              |             COUNT(DISTINCT l_partkey) AS n_exact
              |      FROM lineitem GROUP BY 1)
              |SELECT s.ship_year, e.n_exact,
              |       CAST(CASE WHEN s.nd >= 64 THEN (63 * ${KmvSketch.M}) // s.h_k
              |                 ELSE s.nd END AS BIGINT) AS kmv_est,
              |       s.h_k
              |FROM s JOIN e USING (ship_year)
              |ORDER BY ship_year""".stripMargin)),

    GQuery(
      "q_bloom_decontaminate",
      "Bloom-filter decontamination: eval 8-grams fold into a fixed " +
        "8 KB broadcast bitset; the training side is filtered by a " +
        "codegen'd scan predicate — zero shuffles on the corpus, the " +
        "100 TB form of q_decontaminate. The false positives are " +
        "deterministic (portable double-hashed probe positions), so " +
        "the oracle's logical replay drops the identical doc set.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        BloomDecontaminate.decontaminate(
          docs.filter(col("doc_id") >= 50),
          docs.filter(col("doc_id") < 50),
          "doc_id", "text", n = 8)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${DedupOracles.baseN(
                 "(SELECT doc_id, text FROM documents WHERE doc_id >= 50) src_c", 8, "_c")},
              |${DedupOracles.baseN(
                 "(SELECT doc_id, text FROM documents WHERE doc_id < 50) src_e", 8, "_e")},
              |ks AS (SELECT unnest(generate_series(0, 2)) AS i),
              |bloom AS (
              |  SELECT DISTINCT
              |    (((h * 2654435761) % 1000000007
              |      + ks.i * ((h * 2246822519) % 1000000007)) % 1000000007) % 65536 AS pos
              |  FROM s_e, ks),
              |probe AS (
              |  SELECT s_c.doc_id, s_c.h, ks.i,
              |    (((h * 2654435761) % 1000000007
              |      + ks.i * ((h * 2246822519) % 1000000007)) % 1000000007) % 65536 AS pos
              |  FROM s_c, ks),
              |hit AS (
              |  SELECT probe.doc_id, probe.h, COUNT(*) AS k_in
              |  FROM probe JOIN bloom USING (pos)
              |  GROUP BY 1, 2),
              |bad AS (SELECT DISTINCT doc_id FROM hit WHERE k_in = 3)
              |SELECT d.doc_id FROM documents d
              |WHERE d.doc_id >= 50
              |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)
              |ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_quantile_gate",
      "Distribution-aware outlier trim: per-source p05/p95 discrete " +
        "quantiles of document length (percentile_disc — real group " +
        "elements, no interpolated doubles) gate the corpus; summary " +
        "per source proves the kept range.",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        QuantileGate.gate(docs, Seq("source"), "n_chars", 0.05, 0.95)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            min(col("n_chars")).as("min_kept"),
            max(col("n_chars")).as("max_kept"))
          .orderBy(col("source"))
      },
      Some("""WITH b AS (
             |  SELECT source,
             |         quantile_disc(n_chars, 0.05) AS lo,
             |         quantile_disc(n_chars, 0.95) AS hi
             |  FROM documents GROUP BY source)
             |SELECT d.source, COUNT(*) AS n_kept,
             |       MIN(d.n_chars) AS min_kept, MAX(d.n_chars) AS max_kept
             |FROM documents d JOIN b ON d.source = b.source
             |WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
             |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    GQuery(
      "q_kmv_set_ops",
      "KMV sketch algebra (Beyer et al. 2007): per-source 5-gram " +
        "sketches compose into union and intersection estimates for " +
        "adjacent source pairs WITHOUT rescanning the corpus — the " +
        "persisted-sketch overlap index. rho (union-sketch members " +
        "drawn from both sides) and the integer estimates replay " +
        "exactly in SQL; exact intersections sit alongside.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.graftvec.TextHashExpr
        import graft.functions.TextAnalysis
        val k = 64
        val sh = t(s, dir, "documents")
          .select(col("source"),
            explode(array_distinct(TextHashExpr.shingleHashes(
              TextAnalysis.tokens(col("text")), 5))).as("h"))
          .distinct()
        val sk = sh
          .select(col("source"), KmvSketch.draw(col("h")).as("d"))
          .distinct()
          .as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(KmvSketch(k).toColumn.name("sketch"))
          .toDF("source", "sketch")
          .withColumn("sid", expr("CAST(substring(source, 4) AS BIGINT)"))
        val a = sk.select(col("sid").as("sid_a"), col("sketch").as("sa"))
        val b = sk.select((col("sid") - 1).as("sid_a"), col("sketch").as("sb"))
        val shIdx = sh.select(
          expr("CAST(substring(source, 4) AS BIGINT)").as("sid_a"), col("h"))
        val ex = shIdx.join(
            shIdx.select((col("sid_a") - 1).as("sid_a"), col("h")),
            Seq("sid_a", "h"))
          .groupBy(col("sid_a")).agg(count(lit(1)).as("__nx"))
        a.join(b, "sid_a")
          .join(ex, Seq("sid_a"), "left")
          .select(col("sid_a"),
            coalesce(col("__nx"), lit(0L)).as("n_exact_inter"),
            KmvSketch.overlapCount(col("sa"), col("sb"), k).cast("long").as("rho"),
            KmvSketch.estimate(KmvSketch.unionSketch(col("sa"), col("sb"), k), k)
              .as("union_est"),
            KmvSketch.intersectionEstimate(col("sa"), col("sb"), k).as("inter_est"))
          .orderBy(col("sid_a"))
      },
      Some(s"""WITH ${DedupOracles.baseN(
                 "(SELECT source AS doc_id, text FROM documents) srcd", 5, "_s")},
              |sh AS (SELECT doc_id AS source, h FROM s_s),
              |dd AS (SELECT DISTINCT source,
              |              ((h % 999999937) * 2654435761) % ${KmvSketch.M} AS d
              |       FROM sh),
              |r AS (SELECT source, d,
              |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY d) AS rn
              |      FROM dd),
              |sk AS (SELECT CAST(substr(source, 4) AS BIGINT) AS sid, d, rn
              |       FROM r WHERE rn <= 64),
              |sids AS (SELECT DISTINCT sid FROM sk),
              |pairs AS (SELECT a.sid FROM sids a JOIN sids b ON b.sid = a.sid + 1),
              |pd AS (SELECT DISTINCT p.sid, s.d
              |       FROM pairs p JOIN sk s ON s.sid = p.sid OR s.sid = p.sid + 1),
              |pu AS (SELECT sid, d,
              |              ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d) AS rn
              |       FROM pd),
              |uk AS (SELECT sid, d, rn FROM pu WHERE rn <= 64),
              |un AS (SELECT sid, COUNT(*) AS nu,
              |              MAX(CASE WHEN rn = 64 THEN d END) AS hk
              |       FROM uk GROUP BY 1),
              |rho AS (SELECT uk.sid, COUNT(*) AS rho
              |        FROM uk
              |        JOIN sk a ON a.sid = uk.sid AND a.d = uk.d
              |        JOIN sk b ON b.sid = uk.sid + 1 AND b.d = uk.d
              |        GROUP BY uk.sid),
              |ex AS (SELECT CAST(substr(a.source, 4) AS BIGINT) AS sid,
              |              COUNT(*) AS n_exact_inter
              |       FROM sh a JOIN sh b ON b.h = a.h
              |       WHERE CAST(substr(b.source, 4) AS BIGINT)
              |             = CAST(substr(a.source, 4) AS BIGINT) + 1
              |       GROUP BY 1)
              |SELECT un.sid AS sid_a,
              |       COALESCE(ex.n_exact_inter, 0) AS n_exact_inter,
              |       COALESCE(rho.rho, 0) AS rho,
              |       CAST(CASE WHEN un.nu >= 64 THEN (63 * ${KmvSketch.M}) // un.hk
              |                 ELSE un.nu END AS BIGINT) AS union_est,
              |       CAST(CASE WHEN un.nu >= 64
              |                 THEN (COALESCE(rho.rho, 0)
              |                       * ((63 * ${KmvSketch.M}) // un.hk)) // 64
              |                 ELSE COALESCE(rho.rho, 0) END AS BIGINT) AS inter_est
              |FROM un
              |LEFT JOIN rho ON rho.sid = un.sid
              |LEFT JOIN ex ON ex.sid = un.sid
              |ORDER BY sid_a""".stripMargin)),

    GQuery(
      "q_kmv_sketch",
      "The KMV sketch path ALONE — q_kmv_set_ops minus its brute-force " +
        "exact-intersection companion, so the sweep measures the " +
        "sketch's own scaling (the composed row's 1.03 exponent was " +
        "the O(shared-shingle) verifier, not the sketch algebra, " +
        "which composes from k=64 signatures without rescanning).",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.graftvec.TextHashExpr
        import graft.functions.TextAnalysis
        val k = 64
        val sh = t(s, dir, "documents")
          .select(col("source"),
            explode(array_distinct(TextHashExpr.shingleHashes(
              TextAnalysis.tokens(col("text")), 5))).as("h"))
          .distinct()
        val sk = sh
          .select(col("source"), KmvSketch.draw(col("h")).as("d"))
          .distinct()
          .as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(KmvSketch(k).toColumn.name("sketch"))
          .toDF("source", "sketch")
          .withColumn("sid", expr("CAST(substring(source, 4) AS BIGINT)"))
        val a = sk.select(col("sid").as("sid_a"), col("sketch").as("sa"))
        val b = sk.select((col("sid") - 1).as("sid_a"), col("sketch").as("sb"))
        a.join(b, "sid_a")
          .select(col("sid_a"),
            KmvSketch.overlapCount(col("sa"), col("sb"), k).cast("long").as("rho"),
            KmvSketch.estimate(KmvSketch.unionSketch(col("sa"), col("sb"), k), k)
              .as("union_est"),
            KmvSketch.intersectionEstimate(col("sa"), col("sb"), k).as("inter_est"))
          .orderBy(col("sid_a"))
      },
      Some(s"""WITH ${DedupOracles.baseN(
                 "(SELECT source AS doc_id, text FROM documents) srcd", 5, "_s")},
              |sh AS (SELECT doc_id AS source, h FROM s_s),
              |dd AS (SELECT DISTINCT source,
              |              ((h % 999999937) * 2654435761) % ${KmvSketch.M} AS d
              |       FROM sh),
              |r AS (SELECT source, d,
              |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY d) AS rn
              |      FROM dd),
              |sk AS (SELECT CAST(substr(source, 4) AS BIGINT) AS sid, d, rn
              |       FROM r WHERE rn <= 64),
              |sids AS (SELECT DISTINCT sid FROM sk),
              |pairs AS (SELECT a.sid FROM sids a JOIN sids b ON b.sid = a.sid + 1),
              |pd AS (SELECT DISTINCT p.sid, s.d
              |       FROM pairs p JOIN sk s ON s.sid = p.sid OR s.sid = p.sid + 1),
              |pu AS (SELECT sid, d,
              |              ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d) AS rn
              |       FROM pd),
              |uk AS (SELECT sid, d, rn FROM pu WHERE rn <= 64),
              |un AS (SELECT sid, COUNT(*) AS nu,
              |              MAX(CASE WHEN rn = 64 THEN d END) AS hk
              |       FROM uk GROUP BY 1),
              |rho AS (SELECT uk.sid, COUNT(*) AS rho
              |        FROM uk
              |        JOIN sk a ON a.sid = uk.sid AND a.d = uk.d
              |        JOIN sk b ON b.sid = uk.sid + 1 AND b.d = uk.d
              |        GROUP BY uk.sid)
              |SELECT un.sid AS sid_a,
              |       COALESCE(rho.rho, 0) AS rho,
              |       CAST(CASE WHEN un.nu >= 64 THEN (63 * ${KmvSketch.M}) // un.hk
              |                 ELSE un.nu END AS BIGINT) AS union_est,
              |       CAST(CASE WHEN un.nu >= 64
              |                 THEN (COALESCE(rho.rho, 0)
              |                       * ((63 * ${KmvSketch.M}) // un.hk)) // 64
              |                 ELSE COALESCE(rho.rho, 0) END AS BIGINT) AS inter_est
              |FROM un
              |LEFT JOIN rho ON rho.sid = un.sid
              |ORDER BY sid_a""".stripMargin)),

    GQuery(
      "q_cms_heavy",
      "Count-min sketch as a relational grid: a 4x1024 counter table " +
        "built by partial-aggregating groupBy (each task ships <= d*w " +
        "cells regardless of scan size), persisted/joinable, with the " +
        "top-20 tokens' min-over-rows estimates next to exact counts " +
        "(CMS never underestimates). Grid and estimates replay " +
        "bit-identically in SQL.",
      (s, dir) => {
        import graft.functions.{CmsSketch, TextAnalysis}
        val depth = 4; val width = 1024
        val occ = t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
          .withColumn("__x", TextAnalysis.fingerprint(col("token")))
        val cms = CmsSketch.build(occ, "__x", depth, width)
        val top = occ.groupBy(col("token"))
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("token"))
          .limit(20)
          .withColumn("__x", TextAnalysis.fingerprint(col("token")))
        CmsSketch.estimate(cms, top, "__x", depth, width)
          .select(col("token"), col("n_exact"), col("cms_est"))
          .orderBy(col("token"))
      },
      Some(s"""WITH tk AS (
              |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
              |                            t -> length(t) > 0)) AS token
              |  FROM documents),
              |hx AS (SELECT token, ${DedupOracles.polyHash("token")} AS x FROM tk),
              |js AS (SELECT unnest(generate_series(0, 3)) AS j),
              |cms AS (SELECT js.j,
              |               (((x * 2654435761) % 1000000007
              |                 + js.j * ((x * 2246822519) % 1000000007))
              |                % 1000000007) % 1024 AS pos,
              |               COUNT(*) AS cnt
              |        FROM hx, js GROUP BY 1, 2),
              |top AS (SELECT token, COUNT(*) AS n_exact FROM tk
              |        GROUP BY 1 ORDER BY n_exact DESC, token LIMIT 20),
              |tx AS (SELECT t.token, t.n_exact,
              |              ${DedupOracles.polyHash("t.token")} AS x
              |       FROM top t),
              |pe AS (SELECT tx.token, tx.n_exact, js.j,
              |              (((x * 2654435761) % 1000000007
              |                + js.j * ((x * 2246822519) % 1000000007))
              |               % 1000000007) % 1024 AS pos
              |       FROM tx, js)
              |SELECT pe.token, pe.n_exact,
              |       MIN(COALESCE(cms.cnt, 0)) AS cms_est
              |FROM pe LEFT JOIN cms ON cms.j = pe.j AND cms.pos = pe.pos
              |GROUP BY 1, 2 ORDER BY token""".stripMargin)))
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.operators.{AsofJoin, RangeJoin}

/** Temporal join operators — as-of (point-in-time) joins and bucketed
  * range joins — verified against DuckDB's native ASOF JOIN and its
  * IEJoin inequality join, so the oracle exercises independently
  * implemented semantics, not a mirror of our own rewrite.
  */
object TemporalQueries extends QueryPack {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** One day in the long microsecond axis the range joins bin on. */
  private val DayMicros = 86400000000L

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_asof_join",
      "As-of join: each click event picks up the most recent purchase " +
        "value of the same user at-or-before its time (union + ordered " +
        "window carry — one shuffle on the key, no build-probe pair " +
        "ever materialized). Oracle is DuckDB's native ASOF LEFT JOIN.",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
        AsofJoin.asofJoin(clicks, purchases,
            keyCols = Seq("user_id"), probeTsCol = "ts", buildTsCol = "ts",
            payloadCols = Seq("purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |             MAX(value) AS purchase_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT c.event_id, c.user_id, c.ts,
             |       p.ts AS matched_ts, p.purchase_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "q_asof_tolerance",
      "Strict as-of join with a 1-day tolerance: purchases strictly " +
        "before the click and at most a day old; older matches null out " +
        "but the probe row survives (left-outer row count preserved).",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
        AsofJoin.asofJoin(clicks, purchases,
            keyCols = Seq("user_id"), probeTsCol = "ts", buildTsCol = "ts",
            payloadCols = Seq("purchase_value"),
            strict = true, tolerance = Some(expr("INTERVAL 1 DAY")))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |             MAX(value) AS purchase_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT c.event_id, c.user_id, c.ts,
             |       CASE WHEN p.ts >= c.ts - INTERVAL 1 DAY
             |            THEN p.ts END AS matched_ts,
             |       CASE WHEN p.ts >= c.ts - INTERVAL 1 DAY
             |            THEN p.purchase_value END AS purchase_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts > p.ts
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "q_asof_bucketed",
      "Hot-key as-of join: same semantics as q_asof_join but the " +
        "sort-and-carry parallelizes WITHIN a key via day buckets — " +
        "per-key serial work collapses from #events to #buckets, the " +
        "form that survives a firehose key. Same independent DuckDB " +
        "ASOF oracle.",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
        AsofJoin.asofJoinBucketed(clicks, purchases,
            keyCols = Seq("user_id"), probeTsCol = "ts", buildTsCol = "ts",
            payloadCols = Seq("purchase_value"), bucketMicros = DayMicros)
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |             MAX(value) AS purchase_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT c.event_id, c.user_id, c.ts,
             |       p.ts AS matched_ts, p.purchase_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "q_asof_forward",
      "Forward as-of join: each click picks up the EARLIEST purchase " +
        "at-or-after it (pandas merge_asof direction='forward'; same " +
        "one-shuffle ordered-window carry, descending time). Oracle is " +
        "DuckDB's ASOF LEFT JOIN with the <= comparator.",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
        AsofJoin.asofJoin(clicks, purchases,
            keyCols = Seq("user_id"), probeTsCol = "ts", buildTsCol = "ts",
            payloadCols = Seq("purchase_value"), direction = "forward")
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |             MAX(value) AS purchase_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT c.event_id, c.user_id, c.ts,
             |       p.ts AS matched_ts, p.purchase_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts <= p.ts
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "q_asof_nearest",
      "Nearest as-of join: whichever same-user purchase is closer in " +
        "time, before or after (merge_asof direction='nearest', ties " +
        "backward); both carries run over ONE exchange. Oracle composes " +
        "DuckDB's two ASOF directions and picks the closer.",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
        AsofJoin.asofJoin(clicks, purchases,
            keyCols = Seq("user_id"), probeTsCol = "ts", buildTsCol = "ts",
            payloadCols = Seq("purchase_value"), direction = "nearest")
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |             MAX(value) AS purchase_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |bwd AS (SELECT c.event_id, c.user_id, c.ts,
             |               p.ts AS bts, p.purchase_value AS bv
             |        FROM c ASOF LEFT JOIN p
             |          ON c.user_id = p.user_id AND c.ts >= p.ts),
             |fwd AS (SELECT c.event_id, p.ts AS fts, p.purchase_value AS fv
             |        FROM c ASOF LEFT JOIN p
             |          ON c.user_id = p.user_id AND c.ts <= p.ts)
             |SELECT b.event_id, b.user_id, b.ts,
             |       CASE WHEN f.fts IS NULL THEN b.bts
             |            WHEN b.bts IS NULL THEN f.fts
             |            WHEN (b.ts - b.bts) <= (f.fts - b.ts) THEN b.bts
             |            ELSE f.fts END AS matched_ts,
             |       CASE WHEN f.fts IS NULL THEN b.bv
             |            WHEN b.bts IS NULL THEN f.fv
             |            WHEN (b.ts - b.bts) <= (f.fts - b.ts) THEN b.bv
             |            ELSE f.fv END AS purchase_value
             |FROM bwd b JOIN fwd f USING (event_id)
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "q_range_join",
      "Point-in-interval range join as a bucket equi-join: shipments " +
        "falling inside per-order date windows (1-3 days wide), binned " +
        "at one-day buckets so the inequality never plans as a nested " +
        "loop; exact bounds re-filter after the hash join. Oracle is " +
        "DuckDB's inequality join.",
      (s, dir) => {
        val iv = t(s, dir, "orders")
          .filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("lo"))
          .withColumn("hi",
            col("lo") + (col("o_orderkey") % 3 + 1) * DayMicros)
        val pts = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        RangeJoin.pointInInterval(pts, iv,
            point = unix_micros(col("l_shipdate").cast("timestamp")),
            lo = col("lo"), hi = col("hi"),
            bucketWidth = DayMicros)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("o_orderkey")).as("n_orders"),
            countDistinct(col("l_orderkey")).as("n_ship_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH iv AS (
             |  SELECT o_orderkey, o_orderpriority,
             |         CAST(o_orderdate AS TIMESTAMP) AS lo,
             |         CAST(o_orderdate AS TIMESTAMP)
             |           + (o_orderkey % 3 + 1) * INTERVAL 1 DAY AS hi
             |  FROM orders WHERE o_orderkey % 50 = 0)
             |SELECT iv.o_orderpriority, COUNT(*) AS n_pairs,
             |       COUNT(DISTINCT iv.o_orderkey) AS n_orders,
             |       COUNT(DISTINCT l.l_orderkey) AS n_ship_orders
             |FROM iv JOIN lineitem l
             |  ON CAST(l.l_shipdate AS TIMESTAMP) >= iv.lo
             | AND CAST(l.l_shipdate AS TIMESTAMP) < iv.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    GQuery(
      "q_interval_overlap",
      "Interval-overlap join, each qualifying pair emitted exactly once " +
        "from the bucket holding max(lo_a, lo_b): order date-windows " +
        "overlapping other orders' windows.",
      (s, dir) => {
        def iv(pfx: String) = t(s, dir, "orders")
          .filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey").as(s"${pfx}_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as(s"${pfx}_lo"))
          .withColumn(s"${pfx}_hi",
            col(s"${pfx}_lo") + (col(s"${pfx}_orderkey") % 3 + 1) * DayMicros)
        RangeJoin.intervalOverlap(iv("a"), iv("b"),
            loA = col("a_lo"), hiA = col("a_hi"),
            loB = col("b_lo"), hiB = col("b_hi"),
            bucketWidth = DayMicros)
          .filter(col("a_orderkey") < col("b_orderkey"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("a_orderkey")).as("n_a"),
            countDistinct(col("b_orderkey")).as("n_b"))
      },
      Some("""WITH iv AS (
             |  SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS lo,
             |         CAST(o_orderdate AS TIMESTAMP)
             |           + (o_orderkey % 3 + 1) * INTERVAL 1 DAY AS hi
             |  FROM orders WHERE o_orderkey % 100 = 0)
             |SELECT COUNT(*) AS n_pairs,
             |       COUNT(DISTINCT a.o_orderkey) AS n_a,
             |       COUNT(DISTINCT b.o_orderkey) AS n_b
             |FROM iv a JOIN iv b
             |  ON a.o_orderkey < b.o_orderkey
             | AND a.lo < b.hi AND b.lo < a.hi""".stripMargin)))
}

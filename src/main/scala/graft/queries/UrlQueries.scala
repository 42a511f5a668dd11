package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GQuery, QueryPack}
import graft.catalog.Tables
import graft.operators.UrlOps

/** URL/domain-level curation operators, oracle-checked. The documents
  * table has no URL column, so both engines derive the SAME messy URL
  * deterministically from doc_id — mixed-case scheme/host, default and
  * explicit ports, tracking parameters, unsorted query parameters,
  * trailing slashes, fragments — and the oracle then mirrors the full
  * canonicalization string surgery step by step. The canonical key is
  * a function of doc_id % 199 while the mess is a function of doc_id,
  * so ~25 raw URLs per canonical key collide at sf0.01: exactly the
  * duplicate density URL-keyed dedup exists for.
  */
object UrlQueries extends QueryPack {

  /** Deterministic messy URL per document (Spark side). */
  private def withUrl(df: DataFrame): DataFrame = {
    val id = col("doc_id")
    val k = id % 199
    val schemeCanon = when(k % 2 === 0, lit("http")).otherwise(lit("https"))
    val scheme = when(id % 5 === 0, upper(schemeCanon)).otherwise(schemeCanon)
    val host = concat(
      when(id % 4 === 0, lit("WWW.Site")).otherwise(lit("www.site")),
      (k % 29).cast("string"), lit(".Example.com"))
    val port = when(k % 7 === 3, lit(":8080"))
      .when(id % 6 === 0, when(k % 2 === 0, lit(":80")).otherwise(lit(":443")))
      .otherwise(lit(""))
    val path = concat(lit("/p/"), k.cast("string"),
      when(id % 3 === 0, lit("/")).otherwise(lit("")))
    val query = concat_ws("&",
      concat(lit("q="), (k % 13).cast("string")),
      when(k % 3 === 0, concat(lit("page="), (k % 5).cast("string"))),
      when(id % 2 === 0, lit("utm_source=feed")),
      when(id % 7 === 2, lit("ref=tw")),
      when(id % 11 === 5, lit("fbclid=XyZ")))
    val frag = when(id % 5 === 1, lit("#sec2")).otherwise(lit(""))
    df.withColumn("url", concat(scheme, lit("://"), host, port, path,
      lit("?"), query, frag))
  }

  /** Oracle CTE chain: the same messy URL + the same canonicalization,
    * ending in `canon(doc_id, n_chars, url, url_canon)`.
    */
  private val UrlCanonCte: String =
    s"""u AS (
       |  SELECT doc_id, n_chars,
       |    (CASE WHEN doc_id % 5 = 0 THEN upper(sc) ELSE sc END) || '://' ||
       |    (CASE WHEN doc_id % 4 = 0 THEN 'WWW.Site' ELSE 'www.site' END) ||
       |    CAST(k % 29 AS VARCHAR) || '.Example.com' ||
       |    (CASE WHEN k % 7 = 3 THEN ':8080'
       |          WHEN doc_id % 6 = 0 THEN
       |            (CASE WHEN k % 2 = 0 THEN ':80' ELSE ':443' END)
       |          ELSE '' END) ||
       |    '/p/' || CAST(k AS VARCHAR) ||
       |    (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
       |    '?' || concat_ws('&',
       |      'q=' || CAST(k % 13 AS VARCHAR),
       |      CASE WHEN k % 3 = 0 THEN 'page=' || CAST(k % 5 AS VARCHAR) END,
       |      CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed' END,
       |      CASE WHEN doc_id % 7 = 2 THEN 'ref=tw' END,
       |      CASE WHEN doc_id % 11 = 5 THEN 'fbclid=XyZ' END) ||
       |    (CASE WHEN doc_id % 5 = 1 THEN '#sec2' ELSE '' END) AS url
       |  FROM (SELECT doc_id, n_chars, doc_id % 199 AS k,
       |          CASE WHEN (doc_id % 199) % 2 = 0 THEN 'http' ELSE 'https' END AS sc
       |        FROM documents)),
       |c1 AS (SELECT *, regexp_replace(trim(url), '#.*$$', '') AS u0 FROM u),
       |c2 AS (SELECT *,
       |  lower(regexp_extract(u0, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |  regexp_replace(u0, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM c1),
       |c3 AS (SELECT *,
       |  lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
       |  regexp_replace(rest, '^[^/?]*', '') AS pathq FROM c2),
       |c4 AS (SELECT *,
       |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |       WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |       ELSE hostport END AS host,
       |  regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$$', '') AS path,
       |  regexp_extract(pathq, '\\?(.*)$$', 1) AS rawq FROM c3),
       |c5 AS (SELECT *, array_to_string(list_sort(list_filter(
       |    string_split(rawq, '&'),
       |    p -> NOT (regexp_matches(p,
       |      '^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=|${"$"})')
       |      OR p = ''))), '&') AS q FROM c4),
       |canon AS (SELECT doc_id, n_chars, url,
       |  scheme || '://' || host || path ||
       |  (CASE WHEN length(q) > 0 THEN '?' || q ELSE '' END) AS url_canon
       |  FROM c5)""".stripMargin

  val queries: Seq[GQuery] = Seq(

    GQuery(
      "q_url_canon",
      "URL canonicalization: lowercase scheme/host, default-port strip, " +
        "fragment strip, trailing-slash strip, tracking-param drop, " +
        "query-param sort — pure codegen'd string expressions, oracle " +
        "mirrors every step.",
      (s, dir) =>
        withUrl(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), col("url"),
            UrlOps.canonicalize(col("url")).as("url_canon"))
          .orderBy(col("doc_id")),
      Some(
        s"""WITH $UrlCanonCte
           |SELECT doc_id, url, url_canon FROM canon ORDER BY doc_id""".stripMargin)),

    GQuery(
      "q_url_dedup",
      "URL-keyed exact dedup keep-best: one survivor per canonical URL " +
        "(max score, ties to the smaller doc_id) — one map-side-" +
        "combinable groupBy argmax on a ~100-byte key, the cheapest " +
        "volume cut of a crawl curation pipeline.",
      (s, dir) =>
        UrlOps.dedupByUrl(withUrl(Tables.load(s, dir, "documents")),
          "url", "n_chars", "doc_id")
          .select(col("url_canon"), col("doc_id"), col("n_chars").as("score"))
          .orderBy(col("url_canon")),
      Some(
        s"""WITH $UrlCanonCte,
           |best AS (
           |  SELECT url_canon, max(n_chars) AS bs FROM canon GROUP BY url_canon),
           |pick AS (
           |  SELECT c.url_canon, min(c.doc_id) AS doc_id, min(b.bs) AS score
           |  FROM canon c
           |  JOIN best b ON c.url_canon = b.url_canon AND c.n_chars = b.bs
           |  GROUP BY c.url_canon)
           |SELECT url_canon, doc_id, score FROM pick ORDER BY url_canon""".stripMargin)),

    GQuery(
      "q_domain_cap",
      "Per-domain document cap: top-5 per registered domain by (score " +
        "desc, doc_id) — bounded-rank window, WindowGroupLimit prunes " +
        "to k rows per domain map-side before the shuffle.",
      (s, dir) =>
        UrlOps.capPerDomain(withUrl(Tables.load(s, dir, "documents")),
          "url", "n_chars", "doc_id", k = 5)
          .select(col("domain"), col("doc_id"), col("n_chars").as("score"))
          .orderBy(col("domain"), col("doc_id")),
      Some(
        s"""WITH $UrlCanonCte,
           |ranked AS (
           |  SELECT regexp_extract(url_canon, '^[a-z0-9+.-]*://([^/:?]*)', 1) AS domain,
           |         doc_id, n_chars AS score,
           |         row_number() OVER (
           |           PARTITION BY regexp_extract(url_canon, '^[a-z0-9+.-]*://([^/:?]*)', 1)
           |           ORDER BY n_chars DESC, doc_id) AS rn
           |  FROM canon)
           |SELECT domain, doc_id, score FROM ranked
           |WHERE rn <= 5 ORDER BY domain, doc_id""".stripMargin)),

    GQuery(
      "q_url_blocklist",
      "UT1-style domain-blocklist filtering: hosts explode into their " +
        "domain suffixes (bounded by label count) and a pure EQUI " +
        "semi-join probes the blocklist — a registered-domain entry " +
        "blocks every subdomain, a full-host entry blocks exactly " +
        "that host; survivors pass unchanged. No LIKE/suffix join " +
        "anywhere, so a multi-million-row UT1 list is a plain hash " +
        "join at 100 TB.",
      (s, dir) => {
        import s.implicits._
        // one registered-domain entry (blocks www.site3.* subdomains)
        // and one exact-host entry
        val block = Seq("site3.example.com", "www.site7.example.com")
          .toDF("domain")
        UrlOps.dropBlockedDomains(
          withUrl(Tables.load(s, dir, "documents")), "url", "doc_id", block)
          .select(col("doc_id"),
            UrlOps.domainOf(col("url_canon")).as("host"))
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH $UrlCanonCte,
           |blk AS (SELECT * FROM (VALUES ('site3.example.com'),
           |                              ('www.site7.example.com')) b(domain)),
           |hosts AS (
           |  SELECT doc_id,
           |         regexp_extract(url_canon, '^[a-z0-9+.-]*://([^/:?]*)', 1) AS host
           |  FROM canon),
           |sfx AS (
           |  SELECT doc_id,
           |         unnest(CASE WHEN len(ls) >= 2
           |           THEN list_transform(range(0, len(ls) - 1),
           |                i -> array_to_string(list_slice(ls, i + 1, len(ls)), '.'))
           |           ELSE [array_to_string(ls, '.')] END) AS s
           |  FROM (SELECT doc_id, string_split(host, '.') AS ls FROM hosts)),
           |flagged AS (
           |  SELECT DISTINCT sfx.doc_id
           |  FROM sfx JOIN blk ON sfx.s = lower(blk.domain))
           |SELECT h.doc_id, h.host FROM hosts h
           |ANTI JOIN flagged f USING (doc_id)
           |ORDER BY h.doc_id""".stripMargin)),

    GQuery(
      "q_url_blocklist_bloom",
      "The STREAMING-SAFE blocklist form: the domain list compiles to " +
        "a Bloom bitset (polyHash keys, the portable double-hashed " +
        "probe positions) and blocking is a per-row scan predicate " +
        "over the host's suffix set — zero joins, zero state. False " +
        "positives are deterministic, so the oracle's logical replay " +
        "of the same positions drops the identical doc set.",
      (s, dir) => {
        import s.implicits._
        val block = Seq("site3.example.com", "www.site7.example.com")
          .toDF("domain")
        UrlOps.dropBlockedDomainsBloom(
          withUrl(Tables.load(s, dir, "documents")), "url", block)
          .select(col("doc_id"),
            UrlOps.domainOf(col("url_canon")).as("host"))
          .orderBy(col("doc_id"))
      },
      Some {
        val polyOf = (e: String) => DedupOracles.polyHash(e)
        def positions(h: String) =
          s"""(((($h) * 2654435761) % 1000000007
             |  + ks.i * ((($h) * 2246822519) % 1000000007)) % 1000000007) % 65536""".stripMargin
        s"""WITH $UrlCanonCte,
           |blk AS (SELECT * FROM (VALUES ('site3.example.com'),
           |                              ('www.site7.example.com')) b(domain)),
           |ks AS (SELECT unnest(generate_series(0, 2)) AS i),
           |bloom AS (
           |  SELECT DISTINCT ${positions(polyOf("lower(domain)"))} AS pos
           |  FROM blk, ks),
           |hosts AS (
           |  SELECT doc_id,
           |         regexp_extract(url_canon, '^[a-z0-9+.-]*://([^/:?]*)', 1) AS host
           |  FROM canon),
           |sfx AS (
           |  SELECT doc_id,
           |         unnest(CASE WHEN len(ls) >= 2
           |           THEN list_transform(range(0, len(ls) - 1),
           |                i -> array_to_string(list_slice(ls, i + 1, len(ls)), '.'))
           |           ELSE [array_to_string(ls, '.')] END) AS sfv
           |  FROM (SELECT doc_id, string_split(host, '.') AS ls FROM hosts)),
           |probe AS (
           |  SELECT sfx.doc_id, sfx.sfv, ks.i,
           |         ${positions(polyOf("sfx.sfv"))} AS pos
           |  FROM sfx, ks),
           |hit AS (
           |  SELECT probe.doc_id, probe.sfv, COUNT(*) AS k_in
           |  FROM probe JOIN bloom USING (pos)
           |  GROUP BY 1, 2),
           |bad AS (SELECT DISTINCT doc_id FROM hit WHERE k_in = 3)
           |SELECT h.doc_id, h.host FROM hosts h
           |ANTI JOIN bad USING (doc_id)
           |ORDER BY h.doc_id""".stripMargin
      }))
}

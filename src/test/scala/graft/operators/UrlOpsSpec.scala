package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed canonicalization fixtures plus the dedup/cap
  * policies. The cross-engine (DuckDB) mirror of the same rules is
  * verified by q_url_canon / q_url_dedup / q_domain_cap.
  */
class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalization: case, default ports, fragments, trailing slash, tracking params, param sort") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag")
      == Seq("http://www.example.com/a/b?a=1&b=2"))
    assert(canon("https://Site.com:443/") == Seq("https://site.com"))
    // non-default port survives; https default on an http url survives
    assert(canon("https://site.com:8443/x") == Seq("https://site.com:8443/x"))
    assert(canon("http://site.com:443/x") == Seq("http://site.com:443/x"))
    // all-tracking query vanishes entirely (no dangling '?')
    assert(canon("http://site.com/path?fbclid=1&gclid=2&ref=3&utm_medium=m&mc_cid=z")
      == Seq("http://site.com/path"))
    // ref as a VALUE is not the ref PARAM
    assert(canon("http://site.com/p?href=x&ref=y") == Seq("http://site.com/p?href=x"))
    assert(canon("http://site.com") == Seq("http://site.com"))
    assert(canon("http://site.com/?q=1") == Seq("http://site.com?q=1"))
    assert(canon("  http://site.com/a  ") == Seq("http://site.com/a"))
    // malformed input: deterministic degradation, never an error
    assert(canon("not a url") == Seq("://not a url"))
    // idempotent: canonicalizing a canonical url is the identity
    val once = canon("HTTPS://A.B:443/x/?z=1&utm_id=9&a=2#f").head
    assert(canon(once) == Seq(once))
  }

  test("dedupByUrl keeps max score, ties to the smaller id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "http://A.com/x?utm_source=a", 10L),
      (2L, "http://a.com/x/", 30L),          // same canonical key, best
      (3L, "http://a.com:80/x#frag", 30L),   // tie on score: loses to id 2
      (4L, "http://b.com/y", 5L)
    ).toDF("doc_id", "url", "score")
    val kept = UrlOps.dedupByUrl(docs, "url", "score", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("capPerDomain keeps top-k by (score desc, id) within each domain") {
    import spark.implicits._
    val docs = (0 until 10).map(i =>
      (i.toLong, s"http://d${i % 2}.com/p$i", (i % 5).toLong))
      .toDF("doc_id", "url", "score")
    val kept = UrlOps.capPerDomain(docs, "url", "score", "doc_id", k = 2)
      .select("domain", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // d0.com holds even ids (scores 0,2,4,1,3 for ids 0,2,4,6,8):
    // top-2 = id 4 (score 4), id 8 (score 3); d1.com odd ids → id 9
    // (score 4), id 3 (score 3)
    assert(kept == Set(("d0.com", 4L), ("d0.com", 8L),
      ("d1.com", 9L), ("d1.com", 3L)))
    val plan = UrlOps.capPerDomain(docs, "url", "score", "doc_id", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("null-URL rows route around both stages untouched") {
    import spark.implicits._
    // two canonical twins + three URL-less rows (a mixed-source corpus)
    val docs = Seq(
      (0L, "http://a.com/p", 1L), (1L, "HTTP://A.com/p", 2L),
      (2L, null.asInstanceOf[String], 0L),
      (3L, null.asInstanceOf[String], 0L),
      (4L, null.asInstanceOf[String], 0L))
      .toDF("doc_id", "url", "score")
    // dedupByUrl: the twin pair collapses to the higher score; EVERY
    // null-URL row survives (a null key can never equi-join — dropped
    // silently before this guard)
    val deduped = UrlOps.dedupByUrl(docs, "url", "score", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deduped === Set(1L, 2L, 3L, 4L))
    // capPerDomain k=1: the null rows must NOT pool into one phantom
    // domain and get cut to k
    val capped = UrlOps.capPerDomain(docs, "url", "score", "doc_id", 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped === Set(1L, 2L, 3L, 4L))
  }

  test("domain blocklist: registered-domain entry blocks subdomains, exact host exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "http://ads.tracker.example.com/x"), // subdomain of blocked
      (1L, "http://tracker.example.com/y"),     // the blocked domain itself
      (2L, "http://example.com/z"),             // PARENT of blocked: survives
      (3L, "http://news.example.org/a"),        // exact-host entry
      (4L, "http://example.org/b"),             // sibling: survives
      (5L, "http://clean.site.net/c"),          // unrelated
      (6L, null.asInstanceOf[String]))          // null URL passes through
      .toDF("doc_id", "url")
    val block = Seq("tracker.example.com", "NEWS.example.org").toDF("domain")
    val kept = UrlOps.dropBlockedDomains(docs, "url", "doc_id", block)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L, 5L, 6L), kept.toString)
  }

  test("bloom blocklist equals the exact form on the fixture, with a join-free plan") {
    import spark.implicits._
    val docs = Seq(
      (0L, "http://ads.tracker.example.com/x"),
      (1L, "http://tracker.example.com/y"),
      (2L, "http://example.com/z"),
      (3L, "http://news.example.org/a"),
      (4L, "http://example.org/b"),
      (5L, "http://clean.site.net/c"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "url")
    val block = Seq("tracker.example.com", "NEWS.example.org").toDF("domain")
    val exact = UrlOps.dropBlockedDomains(docs, "url", "doc_id", block)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomDf = UrlOps.dropBlockedDomainsBloom(docs, "url", block)
    val bloom = bloomDf.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloom === exact, s"bloom=$bloom exact=$exact")
    // the streaming-safe form is a pure scan predicate: no join, no
    // aggregation anywhere in the plan
    val plan = bloomDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Aggregate"), plan)
  }

  test("bloom blocklist bitset sizes from the list (UT1-scale safe)") {
    import spark.implicits._
    // 64 Kib floor for small lists (historical default preserved)
    assert(UrlOps.domainFilterBits(0) == (1 << 16))
    assert(UrlOps.domainFilterBits(100) == (1 << 16))
    // ~10 bits/key beyond the floor, rounded to whole 64-bit words —
    // a real UT1 list (millions of domains) no longer saturates an
    // 8 KiB bitset into blocking everything
    assert(UrlOps.domainFilterBits(3_000_000L) == 30_000_000)
    assert(UrlOps.domainFilterBits(3_000_001L) == 30_000_064)
    assert(UrlOps.domainFilterBits(3_000_000L) % 64 == 0)
    // capped at the 128 MiB broadcast ceiling
    assert(UrlOps.domainFilterBits(Long.MaxValue / 16) == (1 << 30))
    // the built array's length implies the probe-side size
    val block = Seq("tracker.example.com").toDF("domain")
    val words = UrlOps.buildDomainFilter(block)
    assert(words.length * 64 == (1 << 16))
  }

  test("blocklist filtering is a pure equi-join plan (no cartesian/BNLJ)") {
    import spark.implicits._
    val docs = Seq((0L, "http://a.b.c/x")).toDF("doc_id", "url")
    val block = Seq("b.c").toDF("domain")
    val plan = UrlOps.dropBlockedDomains(docs, "url", "doc_id", block)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

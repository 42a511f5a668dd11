package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-level curation — the CCNet/RefinedWeb FIRST stage: at
  * 100 TB of web crawl, URL-keyed exact dedup and per-domain caps are
  * the cheapest 30-50% volume cut and run BEFORE any content hashing
  * (a canonical-URL string is ~100 bytes against kilobytes of text, so
  * this pass shuffles ~1% of the corpus mass the content passes touch).
  *
  * Canonicalization is deterministic string surgery — pure codegen'd
  * scan expressions, no UDF, no network, and fully mirrorable in the
  * DuckDB oracle:
  *   - scheme and host lowercase; default ports (:80 http, :443 https)
  *     stripped; explicit non-default ports kept;
  *   - fragment stripped; trailing slashes stripped from the path;
  *   - tracking parameters dropped (utm_*, fbclid, gclid, msclkid,
  *     ref, mc_cid, mc_eid — the RefinedWeb-style allowlist inverse),
  *     remaining query parameters SORTED so parameter order never
  *     splits a canonical key.
  *
  * Scale shape: [[dedupByUrl]] is one map-side-combinable groupBy on
  * the canonical key plus an equi-join back (argmax by lexicographic
  * struct max — the [[BestDedup]] policy without the pair/CC stages,
  * because the key is exact); [[capPerDomain]] is a bounded-rank
  * window (WindowGroupLimit — each map task keeps at most k rows per
  * domain before the shuffle). No stage materializes anything wider
  * than (key, score, id).
  */
object UrlOps {

  /** Query parameters dropped by canonicalization. */
  val TrackingParams = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=|$)"

  /** Canonical form of `url` (see object doc for the rules). Malformed
    * URLs degrade gracefully: no "://" means scheme and host read as
    * empty and the value canonicalizes as a bare path — garbage in,
    * deterministic garbage out, never an error.
    */
  def canonicalize(url: Column): Column = {
    val u0 = regexp_replace(trim(url), "#.*$", "") // fragment off first
    val scheme = lower(regexp_extract(u0, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u0, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val rawQ = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(rawQ, "&"),
      p => !(p.rlike(TrackingParams) || p === ""))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Registered host of a CANONICAL url (no port, no credentials). */
  def domainOf(urlCanon: Column): Column =
    regexp_extract(urlCanon, "^[a-z0-9+.-]*://([^/:?]*)", 1)

  /** URL-keyed exact dedup, keep-best: one surviving row per distinct
    * canonical URL — the highest `scoreCol`, score ties broken to the
    * smallest `idCol` (deterministic under any partitioning). Returns
    * the surviving rows of `docs` unchanged plus their `url_canon`.
    */
  def dedupByUrl(docs: DataFrame, urlCol: String, scoreCol: String,
      idCol: String): DataFrame = {
    val keyed = docs.withColumn("url_canon", canonicalize(col(urlCol)))
    // rows without a URL cannot be URL-deduped — route them AROUND the
    // stage untouched. Left in, the null canonical key would never
    // match the semi join (null = null is never true) and every
    // null-URL document would silently vanish from the corpus.
    val withUrl = keyed.filter(col("url_canon").isNotNull)
    val winners = withUrl.groupBy(col("url_canon"))
      .agg(max(struct(col(scoreCol).as("s"), (-col(idCol)).as("ni"))).as("w"))
      .select(col("url_canon"), (-col("w.ni")).as(idCol))
    withUrl.join(winners, Seq("url_canon", idCol), "left_semi")
      .unionByName(keyed.filter(col("url_canon").isNull))
  }

  /** Per-domain document cap: keep at most `k` rows per registered
    * domain, the top-k by (`scoreCol` desc, `idCol` asc) — the
    * RefinedWeb "no single domain floods the corpus" rule. Bounded
    * rank ⇒ Spark executes the window with WindowGroupLimit (each map
    * task pre-prunes to k rows per domain before the shuffle).
    */
  /** UT1-style domain-blocklist filtering (the RefinedWeb adult/fraud
    * cut): drop every document whose host IS a blocked domain or is a
    * SUBDOMAIN of one. The host explodes into its domain SUFFIXES
    * (ads.t.example.com -> [ads.t.example.com, t.example.com,
    * example.com] — bounded by label count, ~3-6 rows/doc) so the
    * blocklist probe is a pure EQUI semi-join: no suffix/LIKE join, no
    * cartesian, and a multi-million-row UT1 list stays a shuffled (or
    * auto-broadcast, when small) hash join at 100 TB. Null-URL rows
    * pass through untouched (nothing to block on).
    */
  /** Domain-suffix set of a CANONICAL url's host, full host down to
    * the 2-label registrable tail (ads.t.example.com ->
    * [ads.t.example.com, t.example.com, example.com]) — bounded by
    * label count; the >= 2 guard keeps sequence() ascending on
    * 1-label hosts.
    */
  def domainSuffixes(urlCanon: Column): Column = {
    val labels = split(domainOf(urlCanon), "\\.")
    // right-to-left fold builds every suffix with `labels` referenced
    // exactly ONCE: the transform/slice formulation referenced the
    // label array inside its lambda, and lambda bodies re-evaluate
    // their captured expressions per invocation — with canonicalize
    // inlined upstream that meant the whole 6-regex chain ran once
    // per suffix per row (measured 3.5x on the bloom-blocklist row)
    // the drop-the-bare-TLD step lives INSIDE the finish lambda: `acc`
    // is a bound lambda variable (evaluated once), whereas a top-level
    // expression referencing the fold four times re-runs it four times
    // (higher-order functions sit outside codegen subexpression
    // elimination)
    aggregate(
      reverse(labels),
      struct(lit("").as("cur"), array().cast("array<string>").as("lst")),
      (acc, l) => {
        val cur = when(acc.getField("cur") === "", l)
          .otherwise(concat(l, lit("."), acc.getField("cur")))
        struct(cur.as("cur"),
          array_append(acc.getField("lst"), cur).as("lst"))
      },
      acc => {
        val lst = acc.getField("lst")
        // suffixes shortest-first; keep the bare TLD only when it IS
        // the whole host
        when(size(lst) > 1, slice(lst, lit(2), size(lst) - 1))
          .otherwise(lst)
      })
  }

  def dropBlockedDomains(docs: DataFrame, urlCol: String, idCol: String,
      blocklist: DataFrame, blockCol: String = "domain"): DataFrame = {
    val keyed =
      if (docs.columns.contains("url_canon")) docs
      else docs.withColumn("url_canon", canonicalize(col(urlCol)))
    val withUrl = keyed.filter(col("url_canon").isNotNull)
    val flagged = withUrl
      .select(col(idCol), explode(domainSuffixes(col("url_canon"))).as("__sfx"))
      .join(blocklist.select(lower(col(blockCol)).as("__sfx")),
        Seq("__sfx"), "left_semi")
      .select(col(idCol)).distinct()
    withUrl.join(flagged, Seq(idCol), "left_anti")
      .unionByName(keyed.filter(col("url_canon").isNull))
  }

  /** Streaming-safe blocklist: the domain list compiles to a broadcast
    * Bloom bitset ([[graft.operators.BloomDecontaminate]] machinery,
    * keys = [[graft.functions.TextAnalysis.polyHash]] of the
    * lowercased domain) and the probe is a PER-ROW SCAN PREDICATE over
    * the host's suffix set — zero joins, zero aggregation, zero
    * streaming state, so the ingest stream can apply it where the
    * exact equi-join form's distinct would need a state store. False
    * positives OVER-block at the standard Bloom rate; the exact join
    * stays the batch default. Null-URL rows pass through (nothing to
    * block on).
    *
    * `mBits = 0` (the default) sizes the bitset FROM THE LIST at ~10
    * bits/key (k=3 → ~1% FP), floored at the historical 64 Kib: a
    * fixed 8 KiB bitset saturates on anything like a real UT1 list
    * (millions of domains → FP rate → 1, the stateless predicate
    * silently dropping most clean documents — r14 advisor finding).
    * Probe-side sizing derives from the returned array
    * (`words.length * 64`), so build and probe cannot disagree.
    */
  def domainFilterBits(nKeys: Long): Int = {
    val want = math.max(1L << 16, 10L * math.max(nKeys, 0L))
    val capped = math.min(want, 1L << 30) // 128 MiB broadcast ceiling
    (((capped + 63) / 64) * 64).toInt
  }

  def buildDomainFilter(blocklist: DataFrame, blockCol: String = "domain",
      mBits: Int = 0, kHashes: Int = 3): Array[Long] = {
    val hashes = blocklist.select(
      graft.functions.TextAnalysis.polyHash(lower(col(blockCol))).as("__h"))
    val bits = if (mBits > 0) mBits else domainFilterBits(blocklist.count())
    BloomDecontaminate.buildFilterFromHashes(hashes, bits, kHashes)
  }

  /** True when any suffix of the canonical url's host probes into the
    * compiled filter — the stateless scan predicate. The bitset size
    * is implied by the array (`words.length * 64`).
    */
  def blockedByFilter(urlCanon: Column, words: Array[Long],
      kHashes: Int = 3): Column =
    exists(domainSuffixes(urlCanon), s =>
      BloomDecontaminate.mightContain(words,
        graft.functions.TextAnalysis.polyHash(s), words.length * 64, kHashes))

  def dropBlockedDomainsBloom(docs: DataFrame, urlCol: String,
      blocklist: DataFrame, blockCol: String = "domain",
      mBits: Int = 0, kHashes: Int = 3): DataFrame = {
    val words = buildDomainFilter(blocklist, blockCol, mBits, kHashes)
    val keyed =
      if (docs.columns.contains("url_canon")) docs
      else docs.withColumn("url_canon", canonicalize(col(urlCol)))
    keyed.filter(!coalesce(
      blockedByFilter(col("url_canon"), words, kHashes), lit(false)))
  }

  def capPerDomain(docs: DataFrame, urlCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, s"domain cap must be positive: $k")
    // reuse a canonical key computed by an upstream stage (dedupByUrl)
    // instead of re-running the six-regex canonicalization per row
    val keyed0 =
      if (docs.columns.contains("url_canon")) docs
      else docs.withColumn("url_canon", canonicalize(col(urlCol)))
    val keyed = keyed0.withColumn("domain", domainOf(col("url_canon")))
    // null-URL rows have no domain to cap by: pass them through rather
    // than pooling every URL-less document into one phantom "domain"
    // that the cap would then cut to k rows
    val nullSide = keyed.filter(col("url_canon").isNull)
    val w = Window.partitionBy(col("domain"))
      .orderBy(col(scoreCol).desc, col(idCol))
    keyed.filter(col("url_canon").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .unionByName(nullSide)
  }
}

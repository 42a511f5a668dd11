package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for LLM training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All are compositions of codegen'd built-ins (no UDFs): at 100 TB the
  * per-row work stays inside whole-stage codegen and the only cost is
  * the scan. Every function has a mechanical SQL translation (used by
  * the DuckDB oracles), so semantics are engine-checkable.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, single punctuation. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  /** Characters that count as punctuation for quality scoring. */
  val PunctClass = "[.,!?;:'\"()-]"
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, PunctClass, ""))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /** Tiny built-in stopword list (language-agnostic English core). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val sw = array(Stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  /** Mean token length (chars of non-space content / token count). */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") /
      greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Composite quality score in [0,1]-ish: rewards moderate length and
    * stopword presence, penalizes punctuation soup. Deterministic
    * arithmetic only, so thresholds are reproducible across engines.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(400.0), lit(1.0))
    val swScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(4.0), lit(1.0))
    round(lenScore * lit(0.4) + swScore * lit(0.4) + (lit(1.0) - punctPenalty) * lit(0.2), 6)
  }

  /** Stopword-vote language ID. Votes are exact token matches against
    * per-language marker sets; argmax with a fixed precedence order on
    * ties. (On synthetic corpora this is a determinism fixture; on real
    * text the marker sets are where a real model plugs in.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "was"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "es", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def langVote(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(text)
    val m = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(m, t)))
  }

  def langId(text: Column): Column = {
    val votes = LangMarkers.map { case (lang, markers) => lang -> langVote(text, markers) }
    // precedence = declaration order on ties; unknown when all zero
    val best = votes.map(_._2).reduce((a, b) => greatest(a, b))
    votes.foldRight(lit("unknown"): Column) { case ((lang, v), acc) =>
      when(v === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Char-n-gram language ID (the n-gram-heuristic variant of `langId`):
    * per-language character-gram profiles; a language's vote is the
    * total characters matched by its grams (occurrence count weighted
    * by gram length, computed as length-shrinkage under removal —
    * pure string arithmetic, so an engine mirror is exact). Argmax with
    * declaration-order precedence; 'unknown' when nothing matches.
    */
  val CharGramMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", "ing "),
    "fr" -> Seq(" le ", " les ", " des "),
    "es" -> Seq(" el ", " los ", " una "),
    "de" -> Seq(" der ", " die ", " und "))

  def charGramVote(text: Column, grams: Seq[String]): Column = {
    val lowered = lower(text)
    grams.map { g =>
      length(lowered) - length(call_function("replace", lowered, lit(g), lit("")))
    }.reduce(_ + _)
  }

  def langIdNgram(text: Column): Column = {
    val votes = CharGramMarkers.map { case (lang, grams) => lang -> charGramVote(text, grams) }
    val best = votes.map(_._2).reduce((a, b) => greatest(a, b))
    votes.foldRight(lit("unknown"): Column) { case ((lang, v), acc) =>
      when(v === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Polynomial rolling-hash fingerprint of the full text:
    * fold(acc = (acc * 31 + ascii(char)) mod 1e9+7). Stable across
    * engines and partitionings (it is a per-row scalar, not an agg).
    * Runs the codegen'd `StringPolyHash` kernel, pinned value-identical
    * to [[polyHashHof]] (the semantic/oracle reference).
    */
  val FingerprintMod = 1000000007L
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graftvec.TextHashExpr.stringPolyHash(text)

  /** Character-entropy gate for training corpora — the classic trap it
    * catches: low-entropy junk (aaaa…, base64-ish runs, template spam)
    * that length/stopword ratios miss. Everything is a per-row scan
    * expression with ZERO shuffles (no explode+groupBy histogram): the
    * per-character counts come from filter() over the char array, the
    * weighted log-sum is an exact integer fold in 1e-6 fixed point —
    * `entropySum = Σ cnt(c)·floor(1e6·ln cnt(c))` over distinct chars
    * — so cross-engine equality needs only ln on SMALL INTEGER
    * arguments (the TF-IDF determinism contract, one notch safer).
    *
    * Shannon entropy in nats is `ln L − entropySum/(1e6·L)`; the gate
    * below compares it to a threshold entirely in integers.
    */
  def charEntropySum(text: Column): Column =
    org.apache.spark.sql.graftvec.TextHashExpr.charEntropySum(text)

  /** The composable HOF definition of [[charEntropySum]] — the
    * semantic reference the codegen'd expression is pinned against
    * (HashEquivalenceSpec) and the shape the DuckDB oracle mirrors.
    */
  def charEntropySumHof(text: Column): Column = {
    // histogram via ONE sorted traversal: sort the chars (O(L log L)),
    // then a single aggregate() fold walks the runs with a
    // (sum, prev, runLen) struct accumulator, closing each run into
    // cnt·iln(cnt). The count-weighted sum is order-free integer
    // arithmetic, so engine collation cannot matter — any total order
    // groups equal chars adjacently, which is all the fold needs.
    //
    // The sorted array is referenced EXACTLY ONCE: HOFs are interpreted
    // (not whole-stage codegen), and a subexpression referenced inside
    // a lambda re-evaluates per ELEMENT — a first cut that did
    // element_at(sorted, i) in a filter lambda re-sorted the array L
    // times per row (O(L²·log L), a runaway bench entry); the same trap
    // as the original per-distinct-char rescan, one power worse.
    val iln: Column => Column = c => floor(lit(1e6) * log(c.cast("double"))).cast("long")
    def close(sum: Column, run: Column): Column =
      sum + when(run === 0L, lit(0L)).otherwise(run * iln(run))
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(
        array_sort(split(text, "")),
        struct(lit(0L).as("sum"), lit("").as("prev"), lit(0L).as("run")),
        (acc, c) => when(c === acc.getField("prev"),
            struct(acc.getField("sum").as("sum"),
              acc.getField("prev").as("prev"),
              (acc.getField("run") + 1).as("run")))
          .otherwise(struct(
            close(acc.getField("sum"), acc.getField("run")).as("sum"),
            c.as("prev"), lit(1L).as("run"))),
        acc => close(acc.getField("sum"), acc.getField("run"))))
  }

  /** True when char entropy ≥ `milliNats/1000` nats, decided in exact
    * integer arithmetic: H ≥ τ ⟺ L·(iln(L) − 1000·milliNats) ≥ entropySum.
    */
  def charEntropyGate(text: Column, milliNats: Int): Column = {
    val L = length(text).cast("long")
    val ilnL = floor(lit(1e6) * log(L.cast("double"))).cast("long")
    when(L === 0, lit(false)).otherwise(
      L * (ilnL - lit(1000L * milliNats)) >= charEntropySum(text))
  }

  /** PII-style redaction for training corpora: emails and long digit
    * runs replaced by typed tags. Patterns use explicit character
    * classes only (no \d/\w shorthands), so the Java-regex and
    * RE2-based engines agree byte-for-byte; Spark's regexp_replace is
    * replace-all by default, the DuckDB mirror passes the 'g' option.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val LongNumRe = "[0-9]{6,}"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      LongNumRe, "<NUM>")

  /** Full PII scrub (the BigCode/StarCoder-class pre-training stage):
    * emails, secret-looking 40+-char base64 runs, SSNs, IPv4
    * addresses, phone-shaped digit/punct runs, then residual 6+-digit
    * runs — each to a typed tag. REPLACEMENT ORDER IS LOAD-BEARING:
    * keys go before phones (a 40-char token contains 8+-digit runs a
    * phone pattern would shred mid-token), SSNs and IPs before phones
    * (both are phone-shaped), phones before the residual digit-run
    * cleanup. Same explicit-character-class discipline as [[redact]],
    * so Java regex and RE2 (DuckDB) agree byte-for-byte; per-row
    * scalar chain — zero shuffle, cost = the scan.
    */
  val SecretRe = "[A-Za-z0-9+/]{40,}"
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val k = regexp_replace(e, SecretRe, "<KEY>")
    val s = regexp_replace(k, SsnRe, "<SSN>")
    val ip = regexp_replace(s, Ipv4Re, "<IP>")
    val ph = regexp_replace(ip, PhoneRe, "<PHONE>")
    regexp_replace(ph, LongNumRe, "<NUM>")
  }

  /** Occurrences of a literal `tag` in `text` — exact integer length
    * arithmetic, identical on any engine. With a [[redactPii]]'d
    * column this counts the scrub's work product per type (the
    * datasheet metric a curation run reports), consistent with the
    * redaction by construction.
    */
  def tagCount(text: Column, tag: String): Column =
    ((length(text) - length(regexp_replace(text,
      java.util.regex.Pattern.quote(tag), ""))) / tag.length).cast("long")

  /** C0/DEL control characters except the whitespace ones a corpus
    * keeps (tab \x09, newline \x0A, carriage return \x0D).
    */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Drop non-whitespace control characters. */
  def stripControl(text: Column): Column = regexp_replace(text, ControlRe, "")

  /** Collapse runs of spaces/tabs to one space (newlines untouched —
    * line structure is load-bearing for the line-curation family).
    */
  def collapseSpaces(text: Column): Column = regexp_replace(text, "[ \\t]+", " ")

  /** The composed fix-the-bytes pass a web corpus runs before any
    * hash-keyed dedup: NFC normalization (codegen'd expression), control
    * strip, whitespace collapse. Per-row scalar — cost = the scan.
    */
  def fixText(text: Column): Column =
    collapseSpaces(stripControl(
      org.apache.spark.sql.graftvec.NormalizeExpr.nfc(text)))

  /** Word n-gram shingles (space-joined) of the token array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** The same polynomial rolling hash as `fingerprint`, applicable to any
    * string-valued (lambda) column — the engine-portable hash primitive
    * under MinHash and SimHash. Runs the codegen'd kernel; the HOF form
    * below is the pinned semantic reference (and the DuckDB-oracle
    * mirror), kept value-identical by HashEquivalenceSpec.
    */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graftvec.TextHashExpr.stringPolyHash(s)

  /** The composable HOF definition of [[polyHash]]/[[fingerprint]]:
    * `fold(acc = (acc*31 + ascii(char)) % 1e9+7)` over split("") — one
    * array element allocated per CHARACTER, so the kernel runs the hot
    * paths; this form defines the semantics.
    */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % FingerprintMod)
}

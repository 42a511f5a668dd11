package graft.dialect

/** Pre-parse dialect transpiler: rewrites the sqlite / Snowflake /
  * BigQuery-isms that appear in LLM-generated and benchmark-gold SQL
  * (the reference handles these with per-dialect LLM repair prompts,
  * `core/actor/generator/sql_debug.py:120-250`; here they are
  * deterministic rewrites applied before `spark.sql`).
  *
  * The rewriter is token-aware (string literals, quoted identifiers and
  * comments are never rewritten) but deliberately not a full parser:
  * anything it does not recognize passes through untouched for Spark's
  * parser to accept or reject, and the error feeds the repair loop.
  */
object Transpiler {

  /** A lexical region of the SQL text. */
  private sealed trait Region
  private case object Code extends Region
  private case object SingleQ extends Region
  private case object DoubleQ extends Region
  private case object Backtick extends Region
  private case object LineComment extends Region
  private case object BlockComment extends Region

  /** Walk `sql` and apply `f(code-char, depth)`-style rewriting only in
    * code regions. Returns (chars tagged with region, paren depth).
    */
  private def lex(sql: String): IndexedSeq[(Char, Region, Int)] = {
    val out = IndexedSeq.newBuilder[(Char, Region, Int)]
    var region: Region = Code
    var depth = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      region match {
        case Code =>
          if (c == '\'') region = SingleQ
          else if (c == '"') region = DoubleQ
          else if (c == '`') region = Backtick
          else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-')
            region = LineComment
          else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*')
            region = BlockComment
          else if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          out += ((c, if (c == '\'' || c == '"' || c == '`') region else Code, depth))
        case SingleQ =>
          out += ((c, SingleQ, depth))
          // Spark's default lexer honors BACKSLASH escapes inside
          // string literals ('Can\'t' is one literal) alongside the
          // ANSI '' doubling — real exemplar SQL carries both
          // (snowflake/example_285: 'Can\'t Lose Them')
          if (c == '\\' && i + 1 < sql.length) {
            out += ((sql.charAt(i + 1), SingleQ, depth)); i += 1
          }
          else if (c == '\'' && !(i + 1 < sql.length && sql.charAt(i + 1) == '\'')) region = Code
          else if (c == '\'') { out += ((sql.charAt(i + 1), SingleQ, depth)); i += 1 }
        case DoubleQ =>
          out += ((c, DoubleQ, depth))
          if (c == '\\' && i + 1 < sql.length) {
            out += ((sql.charAt(i + 1), DoubleQ, depth)); i += 1
          }
          else if (c == '"') region = Code
        case Backtick =>
          out += ((c, Backtick, depth))
          if (c == '`') region = Code
        case LineComment =>
          out += ((c, LineComment, depth))
          if (c == '\n') region = Code
        case BlockComment =>
          out += ((c, BlockComment, depth))
          if (c == '/' && i > 0 && sql.charAt(i - 1) == '*') region = Code
      }
      i += 1
    }
    out.result()
  }

  /** Find the first top-level (depth 0, code-region) occurrence of a
    * keyword (case-insensitive, word-bounded) at or after `from`.
    */
  /** THE word-bounded, case-insensitive, code-region token test every
    * lexical scan in this file shares: `kw` matches at `i` iff the
    * characters compare equal case-insensitively (per-position
    * regionMatches — NEVER a whole-string toUpperCase, whose length
    * can differ from the original, 'ß' → "SS", shifting every index
    * against the lex tags), both neighbors are non-word characters,
    * and position `i` is in the Code region. Depth conditions are the
    * caller's business.
    */
  private def wordTokenAt(sql: String,
      tagged: IndexedSeq[(Char, Region, Int)], i: Int, kw: String): Boolean =
    i >= 0 && i + kw.length <= sql.length &&
      sql.regionMatches(true, i, kw, 0, kw.length) &&
      tagged(i)._2 == Code &&
      (i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) && sql.charAt(i - 1) != '_')) && {
        val r = i + kw.length
        r >= sql.length || (!Character.isLetterOrDigit(sql.charAt(r)) && sql.charAt(r) != '_')
      }

  private def findTopLevelKeyword(sql: String, kw: String, from: Int = 0): Int = {
    val tagged = lex(sql)
    var i = math.max(from, 0)
    val last = sql.length - kw.length
    while (i <= last) {
      if (wordTokenAt(sql, tagged, i, kw) && tagged(i)._3 == 0) return i
      i = i + 1
    }
    -1
  }

  /** Clause-opening reserved words that can NEVER be a column name in
    * an un-quoted reference — used to reject false identifier captures
    * (e.g. the word after `* EXCLUDE` when the `*` was multiplication).
    */
  private val SqlClauseKeywords: Set[String] = Set(
    "FROM", "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "QUALIFY",
    "UNION", "INTERSECT", "EXCEPT", "JOIN", "INNER", "LEFT", "RIGHT",
    "FULL", "CROSS", "ON", "USING", "AS", "AND", "OR", "NOT", "WHEN",
    "THEN", "ELSE", "END", "OVER", "WINDOW", "FETCH", "OFFSET",
    // expression-tail words: `ORDER BY price * exclude DESC` captures
    // DESC, `a * exclude IS NOT NULL` captures IS — reserved too
    "DESC", "ASC", "NULLS", "IS", "IN", "LIKE", "ILIKE", "BETWEEN",
    "CASE", "SAMPLE", "TABLESAMPLE")

  /** Word-bounded, literal-safe token presence test (code region only). */
  private def containsToken(sql: String, tok: String): Boolean = {
    val tagged = lex(sql)
    var i = 0
    val last = sql.length - tok.length
    while (i <= last) {
      if (wordTokenAt(sql, tagged, i, tok)) return true
      i += 1
    }
    false
  }

  private def countToken(sql: String, tok: String): Int = {
    val tagged = lex(sql)
    var i = 0
    var n = 0
    val last = sql.length - tok.length
    while (i <= last) {
      if (wordTokenAt(sql, tagged, i, tok)) n += 1
      i += 1
    }
    n
  }

  /** Case-insensitive, literal-safe function-name / token replacement. */
  private def replaceToken(sql: String, from: String, to: String): String = {
    val tagged = lex(sql)
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (wordTokenAt(sql, tagged, i, from)) { sb.append(to); i += from.length }
      else { sb.append(sql.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Literal-safe regex replacement: matches that START inside a string
    * literal, quoted identifier, or comment are kept verbatim. The regex
    * passes below were plain-string rewrites before round 15 — a literal
    * containing `CAST(a AS TEXT)` or `strftime(...)` WAS rewritten inside
    * the quotes (the r14 verdict's latent literal-safety hole).
    */
  private def guarded(sql: String, re: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String = {
    lazy val tagged = lex(sql)
    re.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        if (tagged(m.start)._2 == Code) f(m) else m.matched))
  }

  /** Matching close paren for the open paren at `open`, honoring string
    * literals, quoted identifiers and comments via the lex region tags
    * (a ')' inside a '--' comment or quoted identifier never matches).
    */
  private def matchParen(sql: String,
      tagged: IndexedSeq[(Char, Region, Int)], open: Int): Int = {
    val d = tagged(open)._3
    var k = open + 1
    while (k < sql.length) {
      if (sql.charAt(k) == ')' && tagged(k)._2 == Code && tagged(k)._3 == d - 1)
        return k
      k += 1
    }
    -1
  }

  /** strftime('%Y', x) etc → date_format(x, 'yyyy'). Handles the common
    * single-directive formats the benchmarks use.
    */
  private val strftimeFormats = Map(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss",
    "%Y-%m-%d" -> "yyyy-MM-dd", "%Y-%m" -> "yyyy-MM")

  private val strftimeRe =
    """(?i)strftime\s*\(\s*'([^']*)'\s*,\s*([^()]*?)\s*\)""".r

  private def rewriteStrftime(sql: String): String =
    guarded(sql, strftimeRe) { m =>
      val fmt = m.group(1)
      val arg = m.group(2)
      strftimeFormats.get(fmt) match {
        case Some(sparkFmt) => s"date_format($arg, '$sparkFmt')"
        case None => m.matched
      }
    }

  /** QUALIFY (Snowflake/BigQuery/DuckDB) → subquery + WHERE filter.
    * `SELECT <list> FROM ... QUALIFY <cond> [ORDER BY ...] [LIMIT ...]`
    * becomes
    * `SELECT <original cols> FROM (SELECT <list>, <cond> AS __qualify__
    *  FROM ...) WHERE __qualify__ [ORDER BY ...] [LIMIT ...]`.
    */
  private def rewriteQualify(sql: String): String = {
    val qAt = findTopLevelKeyword(sql, "QUALIFY")
    if (qAt < 0) return sql
    val tailStartCandidates = Seq(
      findTopLevelKeyword(sql, "ORDER", qAt + 7),
      findTopLevelKeyword(sql, "LIMIT", qAt + 7)).filter(_ >= 0)
    val tailAt = if (tailStartCandidates.isEmpty) sql.length else tailStartCandidates.min
    val cond = sql.substring(qAt + "QUALIFY".length, tailAt).trim
    val head = sql.substring(0, qAt).trim
    val tail = sql.substring(tailAt)
    // splice the condition into the inner select list as a boolean column
    val selAt = findTopLevelKeyword(head, "SELECT")
    val fromAt = findTopLevelKeyword(head, "FROM", selAt + 6)
    if (selAt < 0 || fromAt < 0) return sql
    val selectList = head.substring(selAt + 6, fromAt).trim
    val rest = head.substring(fromAt)
    s"SELECT * EXCEPT (__qualify__) FROM (SELECT $selectList, ($cond) AS __qualify__ $rest) WHERE __qualify__ $tail".trim
  }

  /** Simple function/token mappings across the reference's dialect
    * envelope (sql_debug.py repair-prompt families).
    */
  private val tokenMap: Seq[(String, String)] = Seq(
    "GETDATE()" -> "current_timestamp()",
    "SYSDATE()" -> "current_timestamp()",
    "IIF" -> "IF",
    "LEN" -> "LENGTH",
    "ISNULL" -> "COALESCE", // T-SQL two-arg form; sqlite's 1-arg differs and passes through the parser error path
    "STRFTIME_HANDLED_SEPARATELY" -> "")

  /** GROUP_CONCAT(x [, sep]) → array_join(collect_list(x), sep|','). */
  private val groupConcatRe =
    """(?i)GROUP_CONCAT\s*\(\s*([^(),]+?)\s*(?:,\s*'([^']*)'\s*)?\)""".r

  private def rewriteGroupConcat(sql: String): String =
    guarded(sql, groupConcatRe) { m =>
      val sep = Option(m.group(2)).getOrElse(",")
      s"array_join(collect_list(${m.group(1)}), '$sep')"
    }

  /** CAST(x AS <alien type>) mappings (literal-guarded). */
  private val typeCastMaps: Seq[(scala.util.matching.Regex, String)] = Seq(
    "(?i)\\bAS\\s+TEXT\\b".r -> "AS STRING",
    "(?i)\\bAS\\s+REAL\\b".r -> "AS DOUBLE",
    "(?i)\\bAS\\s+INTEGER\\b".r -> "AS INT",
    "(?i)\\bAS\\s+NUMERIC\\b".r -> "AS DOUBLE")

  private def rewriteTypes(sql: String): String =
    typeCastMaps.foldLeft(sql) { case (acc, (re, to)) =>
      guarded(acc, re)(_ => to)
    }

  /** CHARINDEX(needle, haystack[, start]) → INSTR(haystack, needle) /
    * locate(needle, haystack, start): T-SQL's/Snowflake's argument
    * order is the REVERSE of Spark's instr — a bare rename would
    * silently return wrong positions. Balanced-paren rewrite (round
    * 15: was a word regex that could not split nested call args).
    */
  private def rewriteCharindex(sql: String): String =
    rewriteCall(sql, "CHARINDEX") {
      case Seq(a, b) => Some(s"INSTR($b, $a)")
      case Seq(a, b, st) => Some(s"locate($a, $b, $st)")
      case _ => None
    }

  /** sqlite date idioms:
    * DATE('now') → current_date(); DATETIME('now') → current_timestamp();
    * DATE('now', '±N day/month/year') → date_add/add_months arithmetic;
    * julianday(x) → days-since-epoch + 2440587.5 (so julianday
    * differences come out exactly as datediff).
    */
  private val dateNowModRe =
    """(?i)\b(DATE|DATETIME)\s*\(\s*'now'\s*(?:,\s*'([+-]?\d+)\s+(day|days|month|months|year|years)'\s*)?\)""".r

  private val juliandayRe = """(?i)\bjulianday\s*\(\s*([^()]*?)\s*\)""".r

  private def rewriteSqliteDates(sql: String): String = {
    val withNow = guarded(sql, dateNowModRe) { m =>
      val base = if (m.group(1).equalsIgnoreCase("DATE")) "current_date()" else "current_timestamp()"
      Option(m.group(2)) match {
        case None => base
        case Some(n) =>
          val amount = n.toInt
          m.group(3).toLowerCase match {
            case d if d.startsWith("day") => s"date_add($base, $amount)"
            case mo if mo.startsWith("month") => s"add_months($base, $amount)"
            case _ => s"add_months($base, ${amount * 12})"
          }
      }
    }
    guarded(withNow, juliandayRe)(m =>
      s"(CAST(datediff(${m.group(1)}, DATE'1970-01-01') AS DOUBLE) + 2440587.5)")
  }

  /** sqlite's double-quoted fallback: a double-quoted token is an
    * identifier when it RESOLVES to one and silently becomes a string
    * literal otherwise — benchmark gold SQL leans on both readings.
    * With a caller-provided identifier set (table/column names,
    * case-insensitive) the decision is exact; without one, structural
    * identifier positions (dot-qualified refs, and tokens right after
    * FROM / JOIN / AS / INTO / UPDATE / TABLE) stay identifiers and
    * everything else falls back to a literal. Identifiers come out
    * backtick-quoted, literals single-quoted with `''` escaping.
    */
  private def rewriteDoubleQuoted(sql: String, identifiers: Set[String]): String = {
    val known = identifiers.map(_.toLowerCase)
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { // copy single-quoted literals verbatim ('' and \' escapes)
        sb.append(c); i += 1
        var done = false
        while (i < n && !done) {
          sb.append(sql.charAt(i))
          if (sql.charAt(i) == '\\' && i + 1 < n) {
            sb.append(sql.charAt(i + 1)); i += 1
          } else if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 1 }
            else done = true
          }
          i += 1
        }
      } else if (c == '"') {
        val start = i
        i += 1
        val tok = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val d = sql.charAt(i)
          if (d == '"') {
            if (i + 1 < n && sql.charAt(i + 1) == '"') { tok.append('"'); i += 2 }
            else { closed = true; i += 1 }
          } else { tok.append(d); i += 1 }
        }
        val t = tok.toString
        val isIdent =
          known.contains(t.toLowerCase) ||
            (identifiers.isEmpty && identifierPosition(sql, start, i))
        if (isIdent) sb.append('`').append(t.replace("`", "``")).append('`')
        else sb.append('\'').append(t.replace("'", "''")).append('\'')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Find the first `--`/`#` comment marker in code position of a
    * SINGLE-line statement: (markerStart, textStart after padding).
    */
  private def firstCommentMarker(sql: String): Option[(Int, Int)] = {
    var i = 0
    val n = sql.length
    def skipQuoted(quote: Char): Unit = {
      i += 1
      var done = false
      while (i < n && !done) {
        if (sql.charAt(i) == '\\' && i + 1 < n && quote != '`') i += 1
        else if (sql.charAt(i) == quote) {
          if (quote != '`' && i + 1 < n && sql.charAt(i + 1) == quote) i += 1
          else done = true
        }
        i += 1
      }
    }
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') skipQuoted(c)
      else if ((c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') || c == '#') {
        var j = i + (if (c == '#') 1 else 2)
        while (j < n && sql.charAt(j) == ' ') j += 1
        return Some((i, j))
      } else i += 1
    }
    None
  }

  /** Candidate comment-END positions inside a comment's text (relative
    * to the segment, ascending; 0 excluded — a cut at 0 means the
    * whole "comment" was commented-out code and dropping it entirely
    * is the right heal). Each rule is a distinct flattening
    * fingerprint observed in the exemplar corpus:
    *  (a) `),` followed by 2+ spaces — a zero-indent CTE boundary the
    *      comment swallowed (big_query/example_137);
    *  (b) `, LATERAL` — a lateral join item resuming
    *      (snowflake/example_283, whose PROSE also cites "LATERAL
    *      FLATTEN", which is why parse-validation arbitrates);
    *  (c) a 2+-space run — the original newline+indentation
    *      (snowflake/example_10 `-- Align vector positions     GROUP BY`);
    *  (d) an UPPERCASE clause keyword — zero-indent code resuming
    *      (snowflake/example_295 `-- Join with the language table
    *      INNER JOIN ...`; prose says "Join", code says "JOIN", so
    *      the match is case-SENSITIVE);
    *  (e) `<tok> AS (` — a CTE definition resuming
    *      (snowflake/example_143 `WITH -- Studies that have MR
    *      volumes "mr_studies" AS (`).
    */
  private def commentCutCandidates(seg: String): Seq[Int] = {
    val cands = Seq.newBuilder[Int]
    """\),(?=\s\s)""".r.findFirstMatchIn(seg).foreach(cands += _.start)
    """,\s*(?:LATERAL)\b""".r.findFirstMatchIn(seg).foreach(cands += _.start)
    """  +""".r.findFirstMatchIn(seg).foreach(cands += _.start)
    """(?<![A-Za-z0-9_])(WITH|INNER|LEFT|RIGHT|FULL|CROSS|JOIN|WHERE|SELECT|FROM|GROUP|ORDER|HAVING|LIMIT|UNION|QUALIFY)(?![A-Za-z0-9_])"""
      .r.findFirstMatchIn(seg).foreach(cands += _.start)
    """(\S+)\s+AS\s*\(""".r.findFirstMatchIn(seg)
      .foreach(m => cands += m.start(1))
    cands.result().filter(_ > 0).distinct.sorted
  }

  /** Heal `--`/`#` line comments in statements that were FLATTENED to
    * one line, returning CANDIDATE healings (first = preferred). The
    * reference stores each exemplar's SQL as a single line
    * (files/reasoning_examples/system, the final `# [Sql]:` line), so
    * a line comment the author wrote on its own line now swallows the
    * rest of the statement — 66 of the corpus's 88 round-19 parse
    * failures were exactly this. A comment's true end is recovered
    * from flattening fingerprints (commentCutCandidates); because
    * prose can cite SQL ("... to GROUP BY clause", "LATERAL FLATTEN
    * expands..."), the fingerprints alone are ambiguous, so the
    * DIALECT ARMS try each candidate in order and keep the first
    * whose fully-transpiled output PARSES. Only single-line
    * statements produce variants: in multi-line SQL the newline
    * already ends the comment and normal semantics win. Safe
    * direction: a wrong cut yields residue that fails parse LOUDLY
    * (repair loop); parse-validation then moves to the next
    * candidate — a working statement is never silently changed.
    */
  private[dialect] def healVariants(sql: String, cap: Int = 24): Seq[String] = {
    if (sql.contains('\n') || (!sql.contains("--") && !sql.contains("#")))
      return Seq(sql)
    firstCommentMarker(sql) match {
      case None => Seq(sql)
      case Some((mStart, tStart)) =>
        val seg = sql.substring(tStart)
        val prefix = sql.substring(0, mStart)
        val cutVariants = commentCutCandidates(seg)
          .map(cut => prefix + " " + seg.substring(cut))
        val variants = (cutVariants :+ prefix.trim).distinct // last: drop all
        variants.iterator
          .flatMap(v => healVariants(v, cap)) // heal any LATER comment
          .take(cap).toSeq
    }
  }

  /** Single-choice heal (the preferred variant) — used by the generic
    * arm, which stays sessionless-lexical.
    */
  private[dialect] def healFlattenedComments(sql: String): String =
    healVariants(sql).head

  /** True iff Spark's Catalyst parser accepts the statement (parse
    * only — no session, no resolution).
    */
  private def parsesOk(s: String): Boolean =
    try {
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan(s)
      true
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Run `pipeline` over the comment-heal variants of `sql`, keeping
    * the first whose output parses; statements without comments (the
    * overwhelming norm) pay zero parse overhead.
    */
  private def healedThen(sql: String)(pipeline: String => String): String = {
    val vs = healVariants(sql)
    if (vs.lengthCompare(1) == 0) pipeline(vs.head)
    else {
      val outs = vs.iterator.map(pipeline)
      outs.find(parsesOk).getOrElse(pipeline(vs.head))
    }
  }

  /** Snowflake/BigQuery-strict double-quote handling: in Snowflake a
    * double-quoted token is ALWAYS an identifier (string literals are
    * single-quoted only), so — unlike the sqlite arm's known-set /
    * position heuristics — every `"x"` rewrites to a backtick-quoted
    * Spark identifier unconditionally. `""` inside quotes un-escapes
    * to a literal `"` in the name. Single-quoted literals are copied
    * verbatim so a quote character inside a string never starts a
    * region. Exemplar evidence: the reference's Spider2-class corpus
    * (files/reasoning_examples/system/snowflake/example_10.txt etc.)
    * is saturated with `t5."publication_number"` references.
    */
  private def rewriteQuotedIdentifiers(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        sb.append(c); i += 1
        var done = false
        while (i < n && !done) {
          sb.append(sql.charAt(i))
          if (sql.charAt(i) == '\\' && i + 1 < n) { // \' escape (Spark/Snowflake)
            sb.append(sql.charAt(i + 1)); i += 1
          } else if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 1 }
            else done = true
          }
          i += 1
        }
      } else if (c == '"') {
        i += 1
        val tok = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val d = sql.charAt(i)
          if (d == '"') {
            if (i + 1 < n && sql.charAt(i + 1) == '"') { tok.append('"'); i += 2 }
            else { closed = true; i += 1 }
          } else { tok.append(d); i += 1 }
        }
        sb.append('`').append(tok.toString.replace("`", "``")).append('`')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Structurally-identifier positions for the no-catalog fallback. */
  private def identifierPosition(sql: String, start: Int, end: Int): Boolean = {
    var b = start - 1
    while (b >= 0 && sql.charAt(b).isWhitespace) b -= 1
    var a = end
    while (a < sql.length && sql.charAt(a).isWhitespace) a += 1
    if (b >= 0 && sql.charAt(b) == '.') return true
    if (a < sql.length && sql.charAt(a) == '.') return true
    val kw = sql.substring(0, b + 1).reverse
      .takeWhile(ch => Character.isLetterOrDigit(ch) || ch == '_')
      .reverse.toUpperCase
    Set("FROM", "JOIN", "AS", "INTO", "UPDATE", "TABLE").contains(kw)
  }

  /** SQLite's bare non-grouped SELECT columns: `SELECT T1.title FROM
    * course AS T1 JOIN prereq AS T2 ON ... GROUP BY T2.course_id`
    * is legal SQLite (the bare column takes a value from an arbitrary
    * row of the group — in the reference's prompt pools always a
    * functionally-determined one, `core/actor/generator/
    * DINSQLGenerate.py:329,357`, `MACSQLGenerate.py:378`) but is
    * rejected by Spark's and DuckDB's analyzers. Rewrite each
    * select-list item that is a PLAIN column reference (identifier /
    * dotted path, optionally backticked segments) and is in NO group
    * key to `any_value(col) AS <name>` — SQLite's arbitrary-row pick,
    * with the output name the bare column would have had.
    *
    * Scope, deliberately bounded: only items that are provably simple
    * columns are wrapped (expressions, `*`, subqueries pass through to
    * the analyzer / repair loop); a select item matches a group key on
    * the full dotted text OR on the last segment (SQLite resolves
    * `dept_name` against `T1.dept_name` and vice versa through the
    * join's single namespace); an integer group key marks that select
    * ordinal as grouped. Applies to every SELECT block (any depth)
    * that has its own GROUP BY; wrapped items contain `(` so the pass
    * is idempotent.
    */
  private def rewriteBareGroupBy(sql: String): String = {
    val tagged = lex(sql)
    val n = sql.length
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def tokenAt(i: Int, kw: String): Boolean = wordTokenAt(sql, tagged, i, kw)
    // next occurrence of any keyword in `kws` at exactly depth d, in
    // code region, scanning [from, until); stops at a close paren
    // dropping below d (the enclosing scope ended)
    def findKw(kws: Seq[String], d: Int, from: Int, until: Int): Int = {
      var i = from
      while (i < until) {
        if (tagged(i)._3 == d && kws.exists(tokenAt(i, _))) return i
        if (sql.charAt(i) == ')' && tagged(i)._2 == Code && tagged(i)._3 < d)
          return -1
        i += 1
      }
      -1
    }
    def splitAtDepth(from: Int, until: Int, d: Int): Seq[(Int, Int)] = {
      val parts = Seq.newBuilder[(Int, Int)]
      var s = from
      var i = from
      while (i < until) {
        if (sql.charAt(i) == ',' && tagged(i)._2 == Code && tagged(i)._3 == d) {
          parts += ((s, i)); s = i + 1
        }
        i += 1
      }
      parts += ((s, until))
      parts.result()
    }
    val seg = "(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    val simpleCol = s"^$seg(?:\\s*\\.\\s*$seg)*$$".r
    val aliased = s"(?is)^($seg(?:\\s*\\.\\s*$seg)*)\\s+AS\\s+($seg)$$".r
    // general select-item alias shapes (the ORDER BY heal's output
    // names): explicit `... AS x` on ANY expression, and the bare
    // trailing-identifier alias `COUNT(*) n`
    val anyAlias = s"(?is)^(.*\\S)\\s+AS\\s+($seg)$$".r
    val bareAlias = s"(?is)^(.*[\\w`)'])\\s+($seg)$$".r
    // word-shaped literals/niladics are not columns — a wrap would
    // emit `AS NULL` (reserved) or change volatile-function semantics
    val literalWords = Set("null", "true", "false",
      "current_date", "current_timestamp", "current_time")
    def norm(e: String): String =
      e.replace("`", "").replaceAll("\\s*\\.\\s*", ".").trim.toLowerCase
    def lastSeg(e: String): String = {
      val t = e.trim
      // split on dots OUTSIDE backticks
      var depthTick = false
      var cut = -1
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (c == '`') depthTick = !depthTick
        else if (c == '.' && !depthTick) cut = i
        i += 1
      }
      t.substring(cut + 1).trim
    }
    // collected (start, end, replacement) item spans — item-level spans
    // never overlap (an item containing a nested SELECT has parens and
    // is never wrapped)
    val repl = Seq.newBuilder[(Int, Int, String)]
    var i = 0
    while (i < n) {
      if (tokenAt(i, "SELECT")) {
        val d = tagged(i)._3
        var listStart = i + "SELECT".length
        // skip DISTINCT / ALL
        while (listStart < n && sql.charAt(listStart).isWhitespace) listStart += 1
        if (tokenAt(listStart, "DISTINCT")) listStart += "DISTINCT".length
        else if (tokenAt(listStart, "ALL")) listStart += "ALL".length
        // end of this select block FIRST (depth drop below d, or a
        // set-op / end of string at depth d), scanned from the list
        // start — searching FROM before bounding the block would let a
        // FROM-less set-op arm (`SELECT a UNION SELECT b FROM t ...`)
        // adopt the NEXT arm's FROM and double-wrap its items
        var blockEnd = n
        var j = listStart
        var done = false
        while (j < n && !done) {
          if (sql.charAt(j) == ')' && tagged(j)._2 == Code && tagged(j)._3 < d) {
            blockEnd = j; done = true
          } else if (tagged(j)._3 == d &&
              (tokenAt(j, "UNION") || tokenAt(j, "INTERSECT") ||
                tokenAt(j, "EXCEPT"))) {
            blockEnd = j; done = true
          } else j += 1
        }
        val fromIdx = findKw(Seq("FROM"), d, listStart, blockEnd)
        if (fromIdx > 0) {
          val grpIdx = findKw(Seq("GROUP"), d, fromIdx, blockEnd)
          if (grpIdx > 0) {
            val byIdx = findKw(Seq("BY"), d, grpIdx + 5, blockEnd)
            if (byIdx > 0) {
              val grpEnd = {
                val k = findKw(Seq("HAVING", "ORDER", "LIMIT", "WINDOW",
                  "QUALIFY"), d, byIdx + 2, blockEnd)
                if (k > 0) k else blockEnd
              }
              val keys = splitAtDepth(byIdx + 2, grpEnd, d)
                .map { case (a, b) => sql.substring(a, b).trim }
                .filter(_.nonEmpty)
              val keyNorms = keys.map(norm).toSet
              val keyLastSegs = keys.filter(simpleCol.matches(_))
                .map(k => norm(lastSeg(k))).toSet
              val ordinals = keys.flatMap(k =>
                scala.util.Try(k.trim.toInt).toOption).toSet
              val items = splitAtDepth(listStart, fromIdx, d)
              items.zipWithIndex.foreach { case ((a0, b0), idx) =>
                var a = a0; var b = b0
                while (a < b && sql.charAt(a).isWhitespace) a += 1
                while (b > a && sql.charAt(b - 1).isWhitespace) b -= 1
                val item = sql.substring(a, b)
                val (expr, aliasOpt) = item match {
                  case aliased(e, al) => (e, Some(al))
                  case _ => (item, None)
                }
                val isSimple = simpleCol.matches(expr.trim) &&
                  !literalWords.contains(norm(expr))
                val grouped = !isSimple ||
                  ordinals.contains(idx + 1) ||
                  // GROUP BY <alias> (valid SQLite AND Spark's
                  // groupByAliases): the aliased item is grouped
                  aliasOpt.exists(a0 => keyNorms.contains(norm(a0))) || {
                    val ne = norm(expr)
                    keyNorms.contains(ne) || keyNorms.contains(norm(lastSeg(expr))) ||
                      keyLastSegs.contains(norm(lastSeg(expr)))
                  }
                if (isSimple && !grouped) {
                  val outName = aliasOpt.getOrElse {
                    val s0 = lastSeg(expr)
                    if (s0.startsWith("`")) s0
                    else if (s0.forall(isWordChar)) s0
                    else s"`${s0.replace("`", "``")}`"
                  }
                  repl += ((a, b, s"any_value(${expr.trim}) AS $outName"))
                }
              }
              // ORDER BY on a bare non-grouped column (SQLite sorts by
              // an arbitrary row of each group — the OpenSearch
              // style-aligner prompt shape, OpenSearchSQLGenerate.py:
              // 130): wrap with any_value UNLESS the name resolves
              // against the select list's OUTPUT columns, which Spark
              // (and SQLite) resolve first. Output names come from the
              // alias of ANY item — aggregates and expressions
              // included, `COUNT(*) AS n ... ORDER BY n` must stay
              // bare — plus last segments of unaliased simple columns.
              // Over-collecting is the safe direction: a sort ref
              // wrongly left bare fails loudly into the repair loop,
              // where a wrongly wrapped alias would break a WORKING
              // query.
              val ordIdx = findKw(Seq("ORDER"), d, grpEnd, blockEnd)
              if (ordIdx > 0) {
                val obyIdx = findKw(Seq("BY"), d, ordIdx + 5, blockEnd)
                if (obyIdx > 0) {
                  val outNames = items.flatMap { case (a0, b0) =>
                    val item = sql.substring(a0, b0).trim
                    item match {
                      case anyAlias(_, al) => Seq(norm(al))
                      case _ if simpleCol.matches(item) =>
                        Seq(norm(lastSeg(item)))
                      case bareAlias(_, al)
                          if !literalWords.contains(norm(al)) => Seq(norm(al))
                      case _ => Nil
                    }
                  }.toSet
                  val ordEnd = {
                    val k = findKw(Seq("LIMIT", "OFFSET"), d,
                      obyIdx + 2, blockEnd)
                    if (k > 0) k else blockEnd
                  }
                  val sortItem =
                    "(?is)^(.*?)((?:\\s+(?:ASC|DESC))?(?:\\s+NULLS\\s+(?:FIRST|LAST))?)$".r
                  splitAtDepth(obyIdx + 2, ordEnd, d).foreach { case (a0, b0) =>
                    var a = a0; var b = b0
                    while (a < b && sql.charAt(a).isWhitespace) a += 1
                    while (b > a && sql.charAt(b - 1).isWhitespace) b -= 1
                    sql.substring(a, b) match {
                      case sortItem(e0, _) =>
                        val expr = e0.trim
                        // a QUALIFIED ref (T1.b) can never resolve
                        // against an output alias in Spark, so output
                        // names only shield UNQUALIFIED refs — a
                        // qualified ref to a select item the heal just
                        // wrapped must wrap here too or the statement
                        // still fails to analyze. Tick-aware: a dot
                        // INSIDE a backticked alias (`a.b`) is not a
                        // qualifier, and lastSeg only splits on dots
                        // outside backticks
                        val unqualified = lastSeg(expr) == expr
                        val wrap = simpleCol.matches(expr) &&
                          !literalWords.contains(norm(expr)) &&
                          !(unqualified && outNames.contains(norm(expr))) && {
                            val ne = norm(expr)
                            !keyNorms.contains(ne) &&
                              !keyNorms.contains(norm(lastSeg(expr))) &&
                              !keyLastSegs.contains(norm(lastSeg(expr)))
                          }
                        if (wrap)
                          repl += ((a, a + e0.length, s"any_value($expr)"))
                      case _ => ()
                    }
                  }
                }
              }
            }
          }
        }
        i += "SELECT".length
      } else i += 1
    }
    val spans = repl.result().sortBy(_._1)
    if (spans.isEmpty) sql
    else {
      val sb = new StringBuilder
      var cur = 0
      spans.foreach { case (a, b, r) =>
        // defensive: an overlapping span (unforeseen block-boundary
        // corner) is skipped — the statement passes through to the
        // analyzer/repair loop instead of crashing the transpiler
        if (a >= cur) { sb.append(sql.substring(cur, a)).append(r); cur = b }
      }
      sb.append(sql.substring(cur, n))
      sb.toString
    }
  }

  // ---------------------------------------------------------------------
  // Balanced-paren call rewriting — DATEADD/DATE_DIFF/TO_CHAR arguments
  // routinely contain nested calls, which the word-regex rewrites above
  // cannot split. Args are rewritten depth-first, so nested calls of the
  // SAME function resolve before the outer one.
  // ---------------------------------------------------------------------

  /** Split `s` on top-level commas, using the lex region tags so a ','
    * inside a string literal, quoted identifier, or comment never splits
    * (the r14 advisor's rewriteCall finding).
    */
  private def splitArgs(s: String): Seq[String] = {
    val tagged = lex(s)
    val out = Seq.newBuilder[String]
    var start = 0
    var k = 0
    while (k < s.length) {
      if (s.charAt(k) == ',' && tagged(k)._2 == Code && tagged(k)._3 == 0) {
        out += s.substring(start, k); start = k + 1
      }
      k += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Rewrite every `name(args...)` call in code regions. `f` receives
    * the top-level args (already depth-first rewritten) and returns the
    * replacement, or None to keep the call as-is.
    */
  private def rewriteCall(sql: String, name: String)(
      f: Seq[String] => Option[String]): String = {
    val upper = sql.toUpperCase
    val target = name.toUpperCase
    val tagged = lex(sql)
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val wordAt = upper.startsWith(target, i) && tagged(i)._2 == Code &&
        (i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) &&
          sql.charAt(i - 1) != '_'))
      var j = i + target.length
      var callAt = wordAt
      if (callAt) {
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        callAt = j < sql.length && sql.charAt(j) == '('
      }
      if (!callAt) { sb.append(sql.charAt(i)); i += 1 }
      else {
        // close-paren scan via the lex region tags: a ')' inside a
        // comment or quoted identifier never closes the call
        val end = matchParen(sql, tagged, j)
        if (end < 0) { sb.append(sql.charAt(i)); i += 1 }
        else {
          val args = splitArgs(sql.substring(j + 1, end))
            .map(a => rewriteCall(a, name)(f))
          f(args) match {
            case Some(repl) => sb.append(repl)
            case None =>
              sb.append(sql.substring(i, j + 1)).append(args.mkString(", "))
                .append(')')
          }
          i = end + 1
        }
      }
    }
    sb.toString
  }

  /** Normalize a Snowflake/BigQuery date-part token (bare or quoted,
    * any of the documented abbreviations) to a canonical unit.
    */
  private def normUnit(u0: String): Option[String] = {
    val u = u0.trim.stripPrefix("'").stripSuffix("'").toLowerCase
    u match {
      case "y" | "yy" | "yyy" | "yyyy" | "yr" | "yrs" | "year" | "years" => Some("year")
      case "q" | "qtr" | "qtrs" | "quarter" | "quarters" => Some("quarter")
      case "mm" | "mon" | "mons" | "month" | "months" => Some("month")
      case "w" | "wk" | "weekofyear" | "woy" | "week" | "weeks" => Some("week")
      case "d" | "dd" | "day" | "days" | "dayofmonth" => Some("day")
      case "h" | "hh" | "hr" | "hrs" | "hour" | "hours" => Some("hour")
      case "mi" | "min" | "mins" | "minute" | "minutes" => Some("minute")
      case "s" | "ss" | "sec" | "secs" | "second" | "seconds" => Some("second")
      case _ => None
    }
  }

  /** BigQuery date parts are always FULL keywords (DAY, MONTH, ...) —
    * the Snowflake abbreviations ("d", "mm", "yy") are NOT valid there,
    * and accepting them in the unit-LAST / expr-first BigQuery forms
    * would misread a column named `d` as a date part.
    */
  /** BigQuery's bare WEEK date part is SUNDAY-start — Spark's WEEK is
    * Monday-start — so WEEK is excluded here and the trunc/diff arms
    * emit explicit Sunday-aligned arithmetic instead (a bare mapping
    * returns silently different values for any range spanning a
    * Sunday). `allowWeek` re-admits it for pure 7-day arithmetic
    * (DATE_ADD INTERVAL n WEEK), where the week-start convention is
    * irrelevant.
    */
  private def normUnitBq(u0: String, allowWeek: Boolean = false): Option[String] = {
    val u = u0.trim.stripPrefix("'").stripSuffix("'").toLowerCase
    if (Set("year", "quarter", "month", "day",
        "hour", "minute", "second").contains(u)) Some(u)
    else if (u == "week" && allowWeek) Some(u)
    else None
  }

  /** True when the (possibly quoted) unit token is WEEK. */
  private def isWeekUnit(u0: String): Boolean =
    u0.trim.stripPrefix("'").stripSuffix("'").equalsIgnoreCase("week")

  /** Spark SQL for `expr` advanced by `n` `unit`s when the input is
    * known to be a DATE (BigQuery DATE_ADD/DATE_SUB only accept DATE):
    * date_add/add_months return DATE, matching BigQuery exactly.
    */
  private def dateAddSqlDate(unit: String, n: String, e: String): String =
    unit match {
      case "day" => s"date_add($e, ($n))"
      case "week" => s"date_add($e, (($n) * 7))"
      case "month" => s"add_months($e, ($n))"
      case "quarter" => s"add_months($e, (($n) * 3))"
      case "year" => s"add_months($e, (($n) * 12))"
      case u => s"timestampadd(${u.toUpperCase}, ($n), $e)"
    }

  /** Spark SQL for `expr` advanced by `n` `unit`s when the input may be
    * (or is known to be) a TIMESTAMP — Snowflake DATEADD and BigQuery
    * TIMESTAMP_ADD/DATETIME_ADD preserve the time-of-day, which
    * date_add/add_months silently truncate (r14 advisor finding).
    * Month-grain units use `+ make_ym_interval`, which is fully
    * type-preserving in Spark (DATE stays DATE, TIMESTAMP keeps its
    * time-of-day, end-of-month clamps like add_months); day/sub-day
    * units use timestampadd, which promotes a DATE input to midnight
    * TIMESTAMP — values exact, only the rendered type widens.
    */
  private def dateAddSqlTs(unit: String, n: String, e: String): String =
    unit match {
      case "month" => s"($e + make_ym_interval(0, CAST(($n) AS INT)))"
      case "quarter" => s"($e + make_ym_interval(0, CAST(($n) * 3 AS INT)))"
      case "year" => s"($e + make_ym_interval(CAST(($n) AS INT), 0))"
      case u => s"timestampadd(${u.toUpperCase}, ($n), $e)"
    }

  /** Spark SQL for the Snowflake/BigQuery boundary-counting date diff
    * (`end - start` in crossed `unit` boundaries — NOT elapsed whole
    * units, which is what a bare months_between/timestampdiff returns:
    * DATEDIFF(month, Jan 31, Feb 1) is 1 in both warehouses).
    */
  private def dateDiffSql(unit: String, a: String, b: String): String =
    unit match {
      case "day" => s"datediff($b, $a)"
      case "week" =>
        s"(datediff(date_trunc('WEEK', $b), date_trunc('WEEK', $a)) DIV 7)"
      case "month" => s"((year($b) - year($a)) * 12 + (month($b) - month($a)))"
      case "quarter" => s"((year($b) - year($a)) * 4 + (quarter($b) - quarter($a)))"
      case "year" => s"(year($b) - year($a))"
      case u =>
        val uu = u.toUpperCase
        s"timestampdiff($uu, date_trunc('$uu', $a), date_trunc('$uu', $b))"
    }

  /** Sunday-start week truncation of a date/timestamp's DATE part:
    * shift +1 day, Monday-truncate, shift back. For a Sunday d this is
    * d itself; for any other day the most recent Sunday.
    */
  private def bqSundayTruncDate(e: String): String =
    s"date_sub(trunc(date_add($e, 1), 'WEEK'), 1)"

  /** BigQuery WEEK diff (Sunday boundaries crossed from a to b). */
  private def bqWeekDiffSql(a: String, b: String): String =
    s"(datediff(${bqSundayTruncDate(b)}, ${bqSundayTruncDate(a)}) DIV 7)"

  /** Sunday-start week truncation preserving the TIMESTAMP type
    * (BigQuery TIMESTAMP_TRUNC/DATETIME_TRUNC WEEK).
    */
  private def bqSundayTruncTs(e: String): String =
    s"timestampadd(DAY, -1, date_trunc('WEEK', timestampadd(DAY, 1, $e)))"

  /** The string inside a single-quoted literal arg, if it is one. */
  private def fmtLit(arg: String): Option[String] = {
    val t = arg.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      Some(t.substring(1, t.length - 1))
    else None
  }

  /** Snowflake TO_CHAR/TO_DATE format elements → Spark datetime
    * pattern. None when the format has an element we don't map (the
    * call then passes through for the repair loop).
    */
  private val snowFmtTokens: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy", "YY" -> "yy", "MON" -> "MMM", "MM" -> "MM",
    "DY" -> "EEE", "DD" -> "dd", "HH24" -> "HH", "HH12" -> "hh",
    "HH" -> "HH", "MI" -> "mm", "SS" -> "ss", "FF3" -> "SSS")

  private def snowFmtToSpark(fmt: String): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      snowFmtTokens.find { case (t, _) =>
        fmt.regionMatches(true, i, t, 0, t.length)
      } match {
        case Some((t, sp)) => sb.append(sp); i += t.length
        case None =>
          val c = fmt.charAt(i)
          if ("-/., :".indexOf(c) >= 0) { sb.append(c); i += 1 }
          else return None
      }
    }
    Some(sb.toString)
  }

  /** BigQuery %-style (strftime) format → Spark datetime pattern. */
  private val strfDirectives: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'H' -> "HH",
    'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'j' -> "DDD", 'e' -> "d",
    'A' -> "EEEE", 'a' -> "EEE", 'B' -> "MMMM", 'b' -> "MMM", '%' -> "%")

  private def strfToSpark(fmt: String): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        if (i + 1 >= fmt.length) return None
        strfDirectives.get(fmt.charAt(i + 1)) match {
          case Some(sp) => sb.append(sp); i += 2
          case None => return None
        }
      } else if ("-/., :".indexOf(c) >= 0) { sb.append(c); i += 1 }
      else return None
    }
    Some(sb.toString)
  }

  /** `lhs [NOT] ILIKE ANY ('a', 'b', ...)` → OR-expansion (Spark has
    * LIKE ANY but not ILIKE ANY).
    */
  private val ilikeAnyRe =
    """(?i)([A-Za-z0-9_."`]+)\s+(NOT\s+)?ILIKE\s+ANY\s*\(([^()]*)\)""".r

  private def rewriteIlikeAny(sql: String): String =
    guarded(sql, ilikeAnyRe) { m =>
      val lhs = m.group(1)
      val neg = Option(m.group(2)).isDefined
      val ors = splitArgs(m.group(3)).map(p => s"$lhs ILIKE $p").mkString(" OR ")
      if (neg) s"NOT ($ors)" else s"($ors)"
    }

  /** Snowflake `expr::TYPE` — Spark parses `::` natively, so only the
    * TYPE name needs mapping. `NUMBER(p,s)` keeps its precision
    * (NUMBER → DECIMAL, the `(p,s)` copies through); bare NUMBER maps
    * to Snowflake's documented default DECIMAL(38,0).
    */
  private def rewriteCastColons(sql: String, bare: Map[String, String],
      withArgs: Map[String, String]): String = {
    val tagged = lex(sql)
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == ':' && i + 1 < sql.length &&
          sql.charAt(i + 1) == ':' && tagged(i)._2 == Code) {
        var j = i + 2
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        val ts = j
        while (j < sql.length && (Character.isLetterOrDigit(sql.charAt(j)) ||
            sql.charAt(j) == '_')) j += 1
        val t = sql.substring(ts, j).toUpperCase
        var k = j
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        val parened = k < sql.length && sql.charAt(k) == '('
        val mapped =
          if (parened) withArgs.getOrElse(t, sql.substring(ts, j))
          else bare.getOrElse(t, sql.substring(ts, j))
        sb.append("::").append(mapped)
        i = j
      } else { sb.append(sql.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private val SnowflakeBareTypes: Map[String, String] = Map(
    "NUMBER" -> "DECIMAL(38,0)", "INT" -> "BIGINT", "INTEGER" -> "BIGINT",
    "SMALLINT" -> "BIGINT", "TINYINT" -> "BIGINT", "BYTEINT" -> "BIGINT",
    "FLOAT" -> "DOUBLE", "FLOAT4" -> "DOUBLE", "FLOAT8" -> "DOUBLE",
    "REAL" -> "DOUBLE",
    "VARCHAR" -> "STRING", "CHAR" -> "STRING", "TEXT" -> "STRING",
    "TIMESTAMP_NTZ" -> "TIMESTAMP", "TIMESTAMP_LTZ" -> "TIMESTAMP",
    "TIMESTAMP_TZ" -> "TIMESTAMP", "VARIANT" -> "STRING")

  private val SnowflakeParenTypes: Map[String, String] = Map(
    "NUMBER" -> "DECIMAL", "VARCHAR" -> "VARCHAR", "CHAR" -> "CHAR")

  // ---------------------------------------------------------------------
  // FROM-clause array expansion — BigQuery UNNEST and Snowflake LATERAL
  // FLATTEN become Spark LATERAL VIEW [POS]EXPLODE. These are the
  // arrays/structs idioms the reference's Spider2 repair prompts call
  // out (core/actor/generator/sql_debug.py:145,184). NVL / NVL2 /
  // DECODE (NULL-matching) / SPLIT_PART / LISTAGG ... WITHIN GROUP /
  // 2-arg REGEXP_SUBSTR are native Spark 4 functions with matching
  // semantics and deliberately pass through untouched.
  // ---------------------------------------------------------------------

  /** Next identifier-ish token at/after `at` (skips whitespace);
    * returns (token, endExclusive). Backtick-quoted tokens come back
    * with their quotes.
    */
  private def readWord(sql: String, at: Int): (String, Int) = {
    var p = at
    while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
    if (p < sql.length && sql.charAt(p) == '`') {
      val close = sql.indexOf('`', p + 1)
      if (close < 0) ("", p) else (sql.substring(p, close + 1), close + 1)
    } else {
      val s0 = p
      while (p < sql.length && (Character.isLetterOrDigit(sql.charAt(p)) ||
          sql.charAt(p) == '_')) p += 1
      (sql.substring(s0, p), p)
    }
  }

  /** Keywords that terminate an alias position. */
  private val aliasStops = Set("", "WHERE", "GROUP", "ORDER", "ON",
    "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "JOIN", "LIMIT", "UNION",
    "HAVING", "QUALIFY", "WITH", "LATERAL", "WINDOW", "EXCEPT",
    "INTERSECT", "USING", "SELECT", "FROM", "UNNEST", "OFFSET", "AND",
    "OR", "NOT")

  /** Parse `[AS] alias` at `at`; (aliasOpt, endExclusive). */
  private def readAlias(sql: String, at: Int): (Option[String], Int) = {
    val (w1, e1) = readWord(sql, at)
    if (w1.equalsIgnoreCase("AS")) {
      val (w2, e2) = readWord(sql, e1)
      if (w2.nonEmpty) (Some(w2), e2) else (None, at)
    } else if (w1.nonEmpty && !aliasStops.contains(w1.toUpperCase))
      (Some(w1), e1)
    else (None, at)
  }

  /** Scan backwards from `before` (exclusive) for the FROM-clause
    * connector introducing a joined item: (startIndex, isLeftJoin) for
    * `,` / `[CROSS|INNER] JOIN` / `LEFT [OUTER] JOIN`, or (-1, false)
    * when the item is not join-connected.
    */
  private def connectorBefore(sql: String, before: Int): (Int, Boolean) = {
    var b = before - 1
    while (b >= 0 && sql.charAt(b).isWhitespace) b -= 1
    if (b < 0) (-1, false)
    else if (sql.charAt(b) == ',') (b, false)
    else {
      def wordEndingAt(e: Int): (String, Int) = {
        var s0 = e
        while (s0 >= 0 && (Character.isLetterOrDigit(sql.charAt(s0)) ||
            sql.charAt(s0) == '_')) s0 -= 1
        (sql.substring(s0 + 1, e + 1).toUpperCase, s0 + 1)
      }
      val (w1, s1) = wordEndingAt(b)
      if (w1 != "JOIN") (-1, false)
      else {
        var b2 = s1 - 1
        while (b2 >= 0 && sql.charAt(b2).isWhitespace) b2 -= 1
        if (b2 < 0) (s1, false)
        else {
          val (w2, s2) = wordEndingAt(b2)
          w2 match {
            case "CROSS" | "INNER" => (s2, false)
            case "LEFT" => (s2, true)
            case "OUTER" =>
              var b3 = s2 - 1
              while (b3 >= 0 && sql.charAt(b3).isWhitespace) b3 -= 1
              if (b3 >= 0) {
                val (w3, s3) = wordEndingAt(b3)
                if (w3 == "LEFT") (s3, true) else (s1, false)
              } else (s1, false)
            case _ => (s1, false) // bare JOIN acts as CROSS for a generator
          }
        }
      }
    }
  }

  private val inUnnestRe =
    """(?i)([A-Za-z0-9_."`]+)\s+(NOT\s+)?IN\s+UNNEST\s*\(""".r

  /** BigQuery `x [NOT] IN UNNEST(arr)` → array_contains(arr, x). */
  private def rewriteInUnnest(sql: String): String = {
    val tagged = lex(sql)
    inUnnestRe.findAllMatchIn(sql).find(m => tagged(m.start)._2 == Code) match {
      case None => sql
      case Some(m) =>
        val close = matchParen(sql, tagged, m.end - 1)
        if (close < 0) sql
        else {
          val arr = sql.substring(m.end, close).trim
          val call = s"array_contains($arr, ${m.group(1)})"
          val repl = if (Option(m.group(2)).isDefined) s"NOT $call" else call
          rewriteInUnnest(sql.substring(0, m.start) + repl + sql.substring(close + 1))
        }
    }
  }

  /** BigQuery `FROM t [, | CROSS JOIN | LEFT JOIN] UNNEST(arr) [AS] x
    * [WITH OFFSET [AS] o] [ON TRUE]` → `LATERAL VIEW [OUTER]
    * EXPLODE|POSEXPLODE(arr) AS [o,] x` (WITH OFFSET and posexplode's
    * position column are both 0-based). One rewrite per pass, recursing
    * until no connected UNNEST remains; an UNNEST we cannot shape (no
    * alias or no connector) passes through for the repair loop.
    */
  private def rewriteFromUnnest(sql: String): String = {
    val tagged = lex(sql)
    val upper = sql.toUpperCase
    var i = 0
    var rewritten: Option[String] = None
    while (rewritten.isEmpty && i >= 0 && i < sql.length) {
      i = upper.indexOf("UNNEST", i)
      if (i >= 0) {
        val leftOk = i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) &&
          sql.charAt(i - 1) != '_')
        var j = i + 6
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (tagged(i)._2 == Code && leftOk && j < sql.length &&
            sql.charAt(j) == '(') {
          val (connStart, isLeft) = connectorBefore(sql, i)
          val close = if (connStart >= 0) matchParen(sql, tagged, j) else -1
          if (close >= 0) {
            val arr = sql.substring(j + 1, close).trim
            val (aliasOpt, aEnd) = readAlias(sql, close + 1)
            aliasOpt.foreach { alias =>
              var end = aEnd
              var offsetAlias: Option[String] = None
              val (w1, e1) = readWord(sql, end)
              if (w1.equalsIgnoreCase("WITH")) {
                val (w2, e2) = readWord(sql, e1)
                if (w2.equalsIgnoreCase("OFFSET")) {
                  end = e2
                  val (oa, oe) = readAlias(sql, e2)
                  offsetAlias = oa.orElse(Some("`offset`"))
                  if (oa.isDefined) end = oe
                }
              }
              var ok = true
              if (isLeft) { // LEFT JOIN UNNEST ... ON TRUE
                val (ow, oe) = readWord(sql, end)
                val (tw, te) = readWord(sql, oe)
                if (ow.equalsIgnoreCase("ON") && tw.equalsIgnoreCase("TRUE")) end = te
                else ok = false
              }
              if (ok) {
                // comma-LATERAL generator form (same reason as the
                // FLATTEN pass): `LATERAL VIEW` must follow the whole
                // join chain, so `... UNNEST(x) AS i JOIN y ON ...`
                // (big_query/example_155) could never parse that way
                val sfx = if (isLeft) "_OUTER" else ""
                val lat = offsetAlias match {
                  case Some(o) => s", LATERAL POSEXPLODE$sfx($arr) AS ($o, $alias)"
                  case None => s", LATERAL EXPLODE$sfx($arr) AS ($alias)"
                }
                val prefix = sql.substring(0, connStart)
                  .reverse.dropWhile(_.isWhitespace).reverse
                rewritten = Some(prefix + lat + sql.substring(end))
              }
            }
          }
        }
        if (rewritten.isEmpty) i += 1
      }
    }
    rewritten.map(rewriteFromUnnest).getOrElse(sql)
  }

  /** Start index of the primary expression ending just before `at`:
    * a dotted identifier chain (backticked parts allowed) or a
    * call/paren group with optional function name. Used by the
    * SAFE_OFFSET subscript rewrite, which must wrap its BASE in
    * `get(base, idx)`.
    */
  private def baseExprStart(sql: String,
      tagged: IndexedSeq[(Char, Region, Int)], at: Int): Int = {
    var b = at - 1
    while (b >= 0 && sql.charAt(b).isWhitespace) b -= 1
    if (b < 0) -1
    else if (sql.charAt(b) == ')') {
      // matching '(' records depth d+1 where this ')' records d
      val d = tagged(b)._3
      var k = b - 1
      while (k >= 0 && !(sql.charAt(k) == '(' && tagged(k)._2 == Code &&
          tagged(k)._3 == d + 1)) k -= 1
      if (k < 0) -1
      else {
        var s0 = k - 1
        while (s0 >= 0 && sql.charAt(s0).isWhitespace) s0 -= 1
        if (s0 >= 0 && (Character.isLetterOrDigit(sql.charAt(s0)) ||
            sql.charAt(s0) == '_')) {
          while (s0 >= 0 && (Character.isLetterOrDigit(sql.charAt(s0)) ||
              sql.charAt(s0) == '_')) s0 -= 1
          s0 + 1
        } else k
      }
    } else if (Character.isLetterOrDigit(sql.charAt(b)) ||
        sql.charAt(b) == '_' || sql.charAt(b) == '`') {
      var k = b
      var cont = true
      while (cont && k >= 0) {
        if (sql.charAt(k) == '`') {
          var q = k - 1
          while (q >= 0 && sql.charAt(q) != '`') q -= 1
          if (q < 0) return -1
          k = q - 1
        } else {
          while (k >= 0 && (Character.isLetterOrDigit(sql.charAt(k)) ||
              sql.charAt(k) == '_')) k -= 1
        }
        if (k >= 0 && sql.charAt(k) == '.') k -= 1 else cont = false
      }
      k + 1
    } else -1
  }

  /** BigQuery array subscripts: `x[OFFSET(n)]` (0-based, error on
    * out-of-bounds — matches Spark's ANSI `x[n]` exactly, so the
    * wrapper just drops), `x[ORDINAL(n)]` (1-based → `[n-1]`), and
    * the SAFE_ variants (NULL on out-of-bounds → Spark `get(x, n)`,
    * which needs the base expression scanned backwards). Exemplar
    * evidence: big_query/example_88 `...[SAFE_OFFSET(0)]`.
    */
  private def rewriteArraySubscripts(sql: String): String = {
    val tagged = lex(sql)
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '[' && tagged(i)._2 == Code) {
        var j = i + 1
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        val ws = j
        while (j < sql.length && (sql.charAt(j).isLetter ||
            sql.charAt(j) == '_')) j += 1
        val word = sql.substring(ws, j).toUpperCase
        if (Set("OFFSET", "ORDINAL", "SAFE_OFFSET", "SAFE_ORDINAL")(word)) {
          var k = j
          while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
          if (k < sql.length && sql.charAt(k) == '(') {
            val close = matchParen(sql, tagged, k)
            if (close > 0) {
              var m = close + 1
              while (m < sql.length && sql.charAt(m).isWhitespace) m += 1
              if (m < sql.length && sql.charAt(m) == ']') {
                val n = sql.substring(k + 1, close).trim
                val zeroIdx =
                  if (word.endsWith("ORDINAL")) s"($n) - 1" else s"($n)"
                if (word.startsWith("SAFE_")) {
                  val bStart = baseExprStart(sql, tagged, i)
                  if (bStart >= 0) {
                    val base = sql.substring(bStart, i).trim
                    return rewriteArraySubscripts(sql.substring(0, bStart) +
                      s"get($base, $zeroIdx)" + sql.substring(m + 1))
                  }
                } else
                  return rewriteArraySubscripts(sql.substring(0, i) +
                    s"[$zeroIdx]" + sql.substring(m + 1))
              }
            }
          }
        }
      }
      i += 1
    }
    sql
  }

  /** Snowflake `[,|CROSS JOIN|LEFT JOIN] [LATERAL] FLATTEN(input =>
    * arr) [AS] f` (and the `TABLE(FLATTEN(...))` spelling) →
    * `LATERAL VIEW [OUTER] POSEXPLODE(arr) f AS index, value` — the
    * `f.index`/`f.value` projections Spider2-snow gold SQL leans on
    * resolve against the posexplode output columns. `OUTER => TRUE`
    * maps to LATERAL VIEW OUTER; PATH/RECURSIVE/MODE args pass through
    * for the repair loop.
    */
  private def rewriteFlatten(sql: String): String = {
    val tagged = lex(sql)
    val upper = sql.toUpperCase
    var i = 0
    var rewritten: Option[String] = None
    while (rewritten.isEmpty && i >= 0 && i < sql.length) {
      i = upper.indexOf("FLATTEN", i)
      if (i >= 0) {
        val leftOk = i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) &&
          sql.charAt(i - 1) != '_')
        var j = i + 7
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (tagged(i)._2 == Code && leftOk && j < sql.length &&
            sql.charAt(j) == '(')
          rewritten = flattenAt(sql, tagged, i, j)
        if (rewritten.isEmpty) i += 1
      }
    }
    rewritten.map(rewriteFlatten).getOrElse(sql)
  }

  private val flattenArgRe = """(?is)^([A-Za-z_]+)\s*=>\s*(.+)$""".r

  private def flattenAt(sql: String,
      tagged: IndexedSeq[(Char, Region, Int)], i: Int, j: Int): Option[String] = {
    def wordBefore(e0: Int): (String, Int) = { // (word, startIdx) ending before e0
      var b = e0 - 1
      while (b >= 0 && sql.charAt(b).isWhitespace) b -= 1
      var s0 = b
      while (s0 >= 0 && (Character.isLetterOrDigit(sql.charAt(s0)) ||
          sql.charAt(s0) == '_')) s0 -= 1
      if (b < 0) ("", 0) else (sql.substring(s0 + 1, b + 1), s0 + 1)
    }
    // optional TABLE( wrapper
    var segStart = i
    var wrapped = false
    var b = i - 1
    while (b >= 0 && sql.charAt(b).isWhitespace) b -= 1
    if (b >= 0 && sql.charAt(b) == '(') {
      val (tw, ts) = wordBefore(b)
      if (!tw.equalsIgnoreCase("TABLE")) return None
      wrapped = true; segStart = ts
    }
    // optional LATERAL keyword
    val (lw, ls) = wordBefore(segStart)
    if (lw.equalsIgnoreCase("LATERAL")) segStart = ls
    val (connStart, isLeft) = connectorBefore(sql, segStart)
    if (connStart < 0) return None
    val close = matchParen(sql, tagged, j)
    if (close < 0) return None
    var end = close + 1
    if (wrapped) { // the TABLE wrapper's own ')'
      var k = end
      while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
      if (k >= sql.length || sql.charAt(k) != ')') return None
      end = k + 1
    }
    val args = splitArgs(sql.substring(j + 1, close))
    var input: Option[String] = None
    var outer = false
    var unsupported = false
    args.foreach {
      case flattenArgRe(k, v) => k.toLowerCase match {
        case "input" => input = Some(v.trim)
        case "outer" => outer = v.trim.equalsIgnoreCase("true")
        case _ => unsupported = true // PATH / RECURSIVE / MODE
      }
      case pos if input.isEmpty => input = Some(pos)
      case _ => unsupported = true
    }
    if (unsupported) return None
    input.flatMap { arr =>
      val (aliasOpt, aEnd) = readAlias(sql, end)
      var fin = if (aliasOpt.isDefined) aEnd else end
      var shapeOk = true
      if (isLeft) { // LEFT JOIN ... FLATTEN ... ON TRUE
        val (ow, oe) = readWord(sql, fin)
        val (tw, te) = readWord(sql, oe)
        if (ow.equalsIgnoreCase("ON") && tw.equalsIgnoreCase("TRUE")) fin = te
        else shapeOk = false
      }
      if (!shapeOk) None
      else {
        // comma-LATERAL generator form, NOT `LATERAL VIEW`: Spark's
        // grammar puts LATERAL VIEW after the whole join chain, so a
        // statement that JOINs another relation AFTER the flatten
        // (exemplar corpus: snowflake/example_11,119 — `LATERAL
        // FLATTEN(...) f LEFT JOIN crossover ON f.value...`) could
        // never parse in that form. `FROM t, LATERAL POSEXPLODE(e)
        // AS f(index, value) JOIN u ON ...` parses and keeps lateral
        // correlation; OUTER flattens (and LEFT JOIN ... ON TRUE
        // connectors) map to POSEXPLODE_OUTER, which keeps the row
        // with NULLs exactly like Snowflake's OUTER => TRUE.
        val fn = if (outer || isLeft) "POSEXPLODE_OUTER" else "POSEXPLODE"
        val aliasSeg = aliasOpt.map(a => s" AS $a(index, value)")
          .getOrElse(" AS (index, value)")
        val prefix = sql.substring(0, connStart)
          .reverse.dropWhile(_.isWhitespace).reverse
        Some(prefix + s", LATERAL $fn($arr)$aliasSeg" + sql.substring(fin))
      }
    }
  }

  // ---------------------------------------------------------------------
  // Regex-function families with positional/occurrence/group arguments.
  // ---------------------------------------------------------------------

  /** Count capturing groups in a regex literal (`(` not `(?`). */
  private def captureGroups(p: String): Int = {
    var i = 0; var n = 0
    while (i < p.length) {
      val ch = p.charAt(i)
      if (ch == '\\') i += 2
      else {
        if (ch == '(' && !(i + 1 < p.length && p.charAt(i + 1) == '?')) n += 1
        i += 1
      }
    }
    n
  }

  /** Snowflake regex params (c/i/m/s; 'e' handled by callers) as an
    * inline-flag prefix. None for params we don't support.
    */
  private def regexParamPrefix(params: String): Option[String] =
    if (!params.forall(c => "cimse".indexOf(c) >= 0)) None
    else {
      // Snowflake reads parameters left-to-right with later ones
      // overriding earlier: 'ic' is case-SENSITIVE (the trailing c
      // wins over the i); m/s/e are independent presence toggles
      val i = if (params.lastIndexOf('i') > params.lastIndexOf('c')) "i" else ""
      val flags = i + "ms".filter(params.contains(_))
      Some(if (flags.isEmpty) "" else s"(?$flags)")
    }

  private def prefixPattern(p: String, prefix: String): String =
    if (prefix.isEmpty) p
    else fmtLit(p) match {
      case Some(lit) => s"'$prefix$lit'"
      case None => s"concat('$prefix', $p)"
    }

  /** Subject shifted to `pos` (1-based), eliding the no-op substr. */
  private def subjFrom(e: String, pos: String): String =
    if (pos.trim == "1") e else s"substr($e, $pos)"

  /** REGEXP_INSTR(subject, pattern[, position]) — Snowflake AND
    * BigQuery: 1-based position of the first match, 0 when none.
    * Composed as the length of the prefix LEFT OVER after
    * regexp_replace strips everything from the first match to the end
    * (`(?:p)[\s\S]*$` — `[\s\S]`, not a (?s) flag, so nothing leaks
    * into the user pattern's own dots, and a newline before the match
    * never truncates the consumed tail). regexp_replace rather than a
    * prefix-group regexp_extract because the BigQuery arm REWRITES
    * 3-arg REGEXP_EXTRACT (its third argument is a position, Spark's
    * a group index) — an extract-based emission would be re-matched
    * and corrupted on re-transpile. Literal patterns only; the
    * position form counts in the ORIGINAL subject. Occurrence/params/
    * group forms → repair loop.
    */
  private def rewriteRegexpInstr(sql: String): String =
    rewriteCall(sql, "REGEXP_INSTR") {
      // NULL subject propagates (both warehouses return NULL; a bare
      // IF would read the NULL guard as false and answer 0). The
      // existence test stays regexp_count — an `RLIKE 'lit'` operator
      // emission would be re-anchored by the Snowflake infix pass on
      // re-transpile and silently turn into a full-match test.
      case Seq(s0, p) => fmtLit(p).map { lit =>
        val strip = s"'(?:$lit)[\\\\s\\\\S]*$$'"
        s"(CASE WHEN ($s0) IS NULL THEN CAST(NULL AS INT) " +
          s"WHEN regexp_count($s0, '$lit') > 0 " +
          s"THEN length(regexp_replace($s0, $strip, '')) + 1 ELSE 0 END)"
      }
      // position: POSITIVE INTEGER LITERALS only (the warehouses RAISE
      // on a non-positive position where substr would silently count
      // from the end — the STRTOK precedent), bounded by the subject
      // length so an empty-matching pattern past the end answers 0,
      // not the position
      case Seq(s0, p, pos)
          if pos.trim.matches("\\+?\\d+") &&
            pos.trim.stripPrefix("+").toLong >= 1 =>
        fmtLit(p).map { lit =>
          val strip = s"'(?:$lit)[\\\\s\\\\S]*$$'"
          val sub = subjFrom(s0, pos)
          s"(CASE WHEN ($s0) IS NULL THEN CAST(NULL AS INT) " +
            s"WHEN ($pos) <= length($s0) AND regexp_count($sub, '$lit') > 0 " +
            s"THEN ($pos) - 1 + length(regexp_replace($sub, $strip, '')) + 1 " +
            "ELSE 0 END)"
        }
      case _ => None
    }

  /** Warehouse SPLIT takes a LITERAL delimiter; Spark's split takes a
    * REGEX — `SPLIT(s, '.')` silently splits on every character. When
    * the delimiter is a literal, regex metachars are escaped into the
    * emitted literal (`'.'` → `'\\.'`, which Spark's escaped-string
    * parser reads as the regex `\.`). A literal already free of
    * metachars is left untouched (the rewrite would be the identity),
    * and one containing a backslash passes through for the repair loop
    * (it is either already escaped — rewriting again would
    * double-escape and break idempotence — or genuinely exotic).
    */
  private val regexMeta = ".[](){}^$|?*+\\"

  private def splitDelimiter(d: String): Option[String] =
    fmtLit(d).filter(l => !l.contains("\\")).flatMap { lit =>
      if (!lit.exists(regexMeta.contains(_))) None // plain: already correct
      else Some("'" + lit.flatMap {
        case c if regexMeta.contains(c) => s"\\\\$c"
        case '\'' => "''"
        case c => c.toString
      } + "'")
    }

  /** Sort-aware array collection for the warehouses' ordered
    * ARRAY_AGG (Spark's array_agg accepts no ordering; its LISTAGG
    * does natively). Single ORDER BY key only; DISTINCT composes only
    * when ordering by the collected expression itself.
    */
  private def sortAwareCollect(x: String, ob0: String,
      distinct: Boolean): Option[String] = {
    val obRe = """(?is)^(.+?)(\s+ASC|\s+DESC)?$""".r
    val (ob, desc) = ob0.trim match {
      case obRe(k, dir) =>
        (k.trim, dir != null && dir.trim.equalsIgnoreCase("DESC"))
      case other => (other, false)
    }
    if (splitArgs(ob).size > 1) None // multi-key → repair loop
    else {
      val sorted =
        if (ob.equalsIgnoreCase(x))
          Some(if (distinct) s"array_sort(collect_set($x))"
          else s"array_sort(collect_list($x))")
        else if (distinct) None
        else Some(s"transform(array_sort(collect_list(" +
          s"named_struct('s', $ob, 'v', $x))), __s -> __s.v)")
      sorted.map(s0 => if (desc) s"reverse($s0)" else s0)
    }
  }

  /** Snowflake `ARRAY_AGG([DISTINCT] x) WITHIN GROUP (ORDER BY k)` →
    * sort-aware collect (the WITHIN GROUP clause trails the call, so
    * this is a structural scan, not a call rewrite).
    */
  /** First index (0-based, NULL when absent) of `elem` in `arr` as a
    * fold — the emission shared by the Snowflake ARRAY_POSITION and
    * ARRAY_CONTAINS arms. It carries neither function's token, so
    * neither arm can re-match the other's output on re-transpile (the
    * arms take REVERSED arguments vs Spark; a re-match would silently
    * swap them back). `nullSafe` compares with <=> — ARRAY_POSITION
    * finds NULL elements; ARRAY_CONTAINS uses = so NULL elements never
    * match, like the array_position call it emitted before batch 8.
    */
  private def arrayIndexFold(arr: String, elem: String,
      nullSafe: Boolean): String = {
    val cmp = if (nullSafe) "<=>" else "="
    // ($elem) parenthesized: a low-precedence element like `a OR b`
    // would otherwise reassociate as `(__gx = a) OR b`
    s"aggregate($arr, named_struct('i', 0, 'p', CAST(NULL AS INT)), " +
      "(__ga, __gx) -> named_struct('i', __ga.i + 1, " +
      s"'p', coalesce(__ga.p, IF(__gx $cmp ($elem), __ga.i, CAST(NULL AS INT)))), " +
      "__ga -> __ga.p)"
  }

  /** After a single SPLIT_TO_TABLE → POSEXPLODE rewrite, shift every
    * alias-qualified INDEX reference by +1: Snowflake's SPLIT_TO_TABLE
    * INDEX column is 1-based where the posexplode index is 0-based
    * (VALUE — the overwhelmingly-consumed column — matches exactly).
    * Returns None — the caller then leaves the statement untranspiled
    * for the repair loop — when the lateral has no alias or any INDEX
    * reference is NOT alias-qualified: a bare INDEX cannot be told
    * apart from another relation's column at the string level, and a
    * half-shifted statement would be silently off-by-one.
    */
  private def splitIndexShift(sql: String): Option[String] = {
    val tagged = lex(sql)
    val upper = sql.toUpperCase
    // anchor on the POSEXPLODE CALL the flatten pass just emitted —
    // word-boundary + code-region + paren checks, scanning past any
    // earlier hit inside a literal or a UDF name like my_posexplode
    var at = upper.indexOf("POSEXPLODE")
    var aliasFound: Option[String] = None
    while (aliasFound.isEmpty && at >= 0) {
      val leftOk = at == 0 || (!Character.isLetterOrDigit(sql.charAt(at - 1)) &&
        sql.charAt(at - 1) != '_')
      if (leftOk && tagged(at)._2 == Code) {
        var j = at + "POSEXPLODE".length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          val close = matchParen(sql, tagged, j)
          if (close >= 0) {
            val (aliasOpt, _) = readAlias(sql, close + 1)
            aliasFound = aliasOpt.map(_.trim)
              .filter(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
          }
        }
      }
      if (aliasFound.isEmpty) at = upper.indexOf("POSEXPLODE", at + 1)
    }
    aliasFound.flatMap { alias =>
      val re = ("(?i)\\b" + java.util.regex.Pattern.quote(alias) +
        "\\s*\\.\\s*INDEX\\b").r
      val qualified = re.findAllMatchIn(sql)
        .count(m => tagged(m.start)._2 == Code)
      // every INDEX token must be either one of the qualified
      // references or the single `AS index` this pass emitted
      if (qualified == 0 || countToken(sql, "INDEX") != qualified + 1) None
      else Some(guarded(sql, re) { m =>
        // a BARE select item (`SELECT s.index,` / `, s.index FROM`)
        // keeps Snowflake's output column name via an explicit alias;
        // a reference embedded in an expression shifts in place (its
        // enclosing item names itself)
        var b = m.start - 1
        while (b >= 0 && sql.charAt(b).isWhitespace) b -= 1
        val beforeOk = b >= 0 && (sql.charAt(b) == ',' ||
          (b >= 5 && upper.startsWith("SELECT", b - 5) &&
            (b == 5 || !Character.isLetterOrDigit(sql.charAt(b - 6)))))
        var e = m.end
        while (e < sql.length && sql.charAt(e).isWhitespace) e += 1
        val afterOk = e >= sql.length || sql.charAt(e) == ',' ||
          (upper.startsWith("FROM", e) &&
            (e + 4 >= sql.length || !Character.isLetterOrDigit(sql.charAt(e + 4))))
        if (beforeOk && afterOk) s"($alias.index + 1) AS index"
        else s"($alias.index + 1)"
      })
    }
  }

  /** RATIO_TO_REPORT(x) OVER (w) → (CAST(x AS DOUBLE) / sum(x) OVER
    * (w)). The OVER clause sits OUTSIDE the call, so this is a scan
    * (like the WITHIN GROUP pass below), not a rewriteCall arm. The
    * output carries no RATIO_TO_REPORT token — idempotent by
    * construction. A call with no OVER clause is not valid Snowflake
    * and passes through to the repair loop.
    */
  private def rewriteRatioToReport(sql: String): String = {
    val tagged = lex(sql)
    val upper = sql.toUpperCase
    val target = "RATIO_TO_REPORT"
    var i = upper.indexOf(target)
    while (i >= 0) {
      val leftOk = i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) &&
        sql.charAt(i - 1) != '_')
      if (leftOk && tagged(i)._2 == Code) {
        var j = i + target.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          val close = matchParen(sql, tagged, j)
          if (close >= 0) {
            var k = close + 1
            while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
            val overAt = upper.startsWith("OVER", k) &&
              (k + 4 >= sql.length ||
                (!Character.isLetterOrDigit(sql.charAt(k + 4)) &&
                  sql.charAt(k + 4) != '_'))
            if (overAt) {
              var p = k + 4
              while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
              if (p < sql.length && sql.charAt(p) == '(') {
                val wclose = matchParen(sql, tagged, p)
                if (wclose >= 0) {
                  val expr = sql.substring(j + 1, close).trim
                  val win = sql.substring(p, wclose + 1)
                  return rewriteRatioToReport(sql.substring(0, i) +
                    s"(CAST($expr AS DOUBLE) / sum($expr) OVER $win)" +
                    sql.substring(wclose + 1))
                }
              }
            }
          }
        }
      }
      i = upper.indexOf(target, i + 1)
    }
    sql
  }

  private def rewriteArrayAggWithinGroup(sql: String): String = {
    val tagged = lex(sql)
    val upper = sql.toUpperCase
    var i = 0
    var rewritten: Option[String] = None
    while (rewritten.isEmpty && i >= 0 && i < sql.length) {
      i = upper.indexOf("ARRAY_AGG", i)
      if (i >= 0) {
        val leftOk = i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) &&
          sql.charAt(i - 1) != '_')
        var j = i + 9
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (tagged(i)._2 == Code && leftOk && j < sql.length &&
            sql.charAt(j) == '(') {
          val close = matchParen(sql, tagged, j)
          if (close >= 0) {
            val (w1, e1) = readWord(sql, close + 1)
            val (w2, e2) = readWord(sql, e1)
            if (w1.equalsIgnoreCase("WITHIN") && w2.equalsIgnoreCase("GROUP")) {
              var k = e2
              while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
              if (k < sql.length && sql.charAt(k) == '(') {
                val gclose = matchParen(sql, tagged, k)
                val inner = if (gclose >= 0)
                  sql.substring(k + 1, gclose).trim else ""
                val obRe = """(?is)^ORDER\s+BY\s+(.+)$""".r
                inner match {
                  case obRe(ob) =>
                    val rawArg = sql.substring(j + 1, close).trim
                    val distinct = rawArg.toUpperCase.startsWith("DISTINCT ")
                    val x = if (distinct) rawArg.substring(9).trim else rawArg
                    sortAwareCollect(x, ob, distinct).foreach { repl =>
                      rewritten = Some(
                        sql.substring(0, i) + repl + sql.substring(gclose + 1))
                    }
                  case _ => ()
                }
              }
            }
          }
        }
        if (rewritten.isEmpty) i += 1
      }
    }
    rewritten.map(rewriteArrayAggWithinGroup).getOrElse(sql)
  }

  /** TIMESTAMPADD-style add that stays a FIXPOINT under re-transpile
    * (the output's own `timestampadd` re-matches the arm, so no parens
    * may accumulate): day/sub-day args pass through verbatim,
    * month-grain routes to the type-preserving interval form.
    */
  private def tsAddFixpoint(unit: String, n: String, e: String): String =
    unit match {
      case "month" | "quarter" | "year" => dateAddSqlTs(unit, n, e)
      case u => s"timestampadd(${u.toUpperCase}, $n, $e)"
    }

  /** Reads a Snowflake variant path starting at the ':' at `at`:
    * `:elem(.elem | :elem | [idx])*`. Returns the JSONPath body (dots
    * between elements, `[n]` indices appended) and the end position —
    * ("", at) when no valid path starts here. Whitespace is allowed
    * after the FIRST colon only; continuations must be adjacent so a
    * trailing `.alias` or new clause never gets swallowed.
    */
  private def readVariantPath(sql: String, at: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = at
    var first = true
    var done = false
    while (!done) {
      i += 1 // past the ':' or '.' separator
      if (first) { while (i < sql.length && sql.charAt(i).isWhitespace) i += 1 }
      val s0 = i
      // quoted key segments: Snowflake `:"key"` arrives here as
      // :`key` (rewriteQuotedIdentifiers runs first), and the corpus's
      // Spider2-lite statements carry the :'key' literal spelling
      // (sqlite/example_287: `PARSE_JSON(DEPARTURE.city):'en'`). A
      // non-simple key emits JSONPath bracket syntax.
      val quote = if (i < sql.length &&
        (sql.charAt(i) == '`' || sql.charAt(i) == '\'')) sql.charAt(i) else ' '
      val key: String =
        if (quote != ' ') {
          val close = sql.indexOf(quote, i + 1)
          if (close < 0) return ("", at)
          i = close + 1
          sql.substring(s0 + 1, close)
        } else if (i < sql.length &&
            (Character.isLetter(sql.charAt(i)) || sql.charAt(i) == '_')) {
          while (i < sql.length && (Character.isLetterOrDigit(sql.charAt(i)) ||
              sql.charAt(i) == '_')) i += 1
          sql.substring(s0, i)
        } else return ("", at)
      if (key.isEmpty) return ("", at)
      if (key.matches("[A-Za-z_][A-Za-z0-9_]*")) {
        if (sb.nonEmpty) sb.append('.')
        sb.append(key)
      } else sb.append("['").append(key.replace("'", "\\'")).append("']")
      first = false
      // optional [n] array indices, digits only
      var brkFail = false
      while (!brkFail && i < sql.length && sql.charAt(i) == '[') {
        val c2 = sql.indexOf(']', i)
        val idx = if (c2 > 0) sql.substring(i + 1, c2).trim else ""
        if (c2 > 0 && idx.nonEmpty && idx.forall(_.isDigit)) {
          sb.append('[').append(idx).append(']'); i = c2 + 1
        } else brkFail = true
      }
      if (brkFail) return ("", at)
      // adjacent continuation: '.' or a single ':' (never '::')
      val cont = i < sql.length && (sql.charAt(i) == '.' ||
        (sql.charAt(i) == ':' && (i + 1 >= sql.length || sql.charAt(i + 1) != ':')))
      if (!cont) done = true
    }
    (sb.toString, i)
  }

  /** Reads an optional `::TYPE` cast at `at`, mapping the Snowflake
    * type to the Spark type string `variant_get` accepts. Returns
    * (None, at) when absent or unmappable.
    */
  private def readCastType(sql: String, at: Int): (Option[String], Int) = {
    var i = at
    while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
    if (i + 1 >= sql.length || sql.charAt(i) != ':' || sql.charAt(i + 1) != ':')
      return (None, at)
    i += 2
    while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
    val s0 = i
    while (i < sql.length && (Character.isLetterOrDigit(sql.charAt(i)) ||
        sql.charAt(i) == '_')) i += 1
    if (i == s0) return (None, at)
    val word = sql.substring(s0, i).toUpperCase
    var k = i
    while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
    if (k < sql.length && sql.charAt(k) == '(') {
      val close = sql.indexOf(')', k) // type args never nest parens
      if (close < 0) (None, at)
      else (Some((SnowflakeParenTypes.getOrElse(word, word) +
        sql.substring(k, close + 1)).toLowerCase), close + 1)
    } else (Some(SnowflakeBareTypes.getOrElse(word, word).toLowerCase), i)
  }

  /** `[TRY_]PARSE_JSON(expr):path[::TYPE]` → `variant_get([try_]
    * parse_json(expr), '$.path'[, 'type'])` — the JSON-TEXT variant
    * access shape real Spider2-snow exports carry (VARIANT columns
    * arrive as JSON strings, so the struct-typed `:`-path rewrite
    * below never fires on them). A trailing `::TYPE` folds into
    * variant_get's type argument; a bare `[TRY_]PARSE_JSON(x)` with no
    * path passes through (Spark 4 has native parse_json /
    * try_parse_json). Fixpoint: the output has no `:path` left.
    */
  private def rewriteParseJsonPaths(sql: String): String = {
    val upper = sql.toUpperCase
    val tagged = lex(sql)
    var i = 0
    while (i < sql.length) {
      val isTry = upper.startsWith("TRY_PARSE_JSON", i)
      val hit = isTry || upper.startsWith("PARSE_JSON", i)
      val nameLen = if (isTry) "TRY_PARSE_JSON".length else "PARSE_JSON".length
      if (hit && tagged(i)._2 == Code &&
          (i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) &&
            sql.charAt(i - 1) != '_'))) {
        var j = i + nameLen
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          val close = matchParen(sql, tagged, j)
          if (close > 0) {
            var k = close + 1
            while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
            if (k < sql.length && sql.charAt(k) == ':' &&
                (k + 1 >= sql.length || sql.charAt(k + 1) != ':')) {
              val (path, pEnd) = readVariantPath(sql, k)
              if (path.nonEmpty) {
                val fn = if (isTry) "try_parse_json" else "parse_json"
                val inner = sql.substring(j + 1, close)
                val (typeArg, tEnd) = readCastType(sql, pEnd)
                val repl = typeArg match {
                  case Some(t) => s"variant_get($fn($inner), '$$.$path', '$t')"
                  case None => s"variant_get($fn($inner), '$$.$path')"
                }
                return rewriteParseJsonPaths(
                  sql.substring(0, i) + repl +
                    sql.substring(if (typeArg.isDefined) tEnd else pEnd))
              }
            }
          }
        }
      }
      i += 1
    }
    sql
  }

  /** Snowflake single-colon VARIANT path access (`f.value:name`,
    * `v:a:b`) → dot field access. The `(?!:)` guard keeps `::` casts
    * out (a cast's first colon is followed by a colon; its second is
    * never preceded by an identifier char), and the loop resolves
    * deeper paths one hop per pass.
    */
  private val variantPathRe =
    """([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\s*:(?!:)\s*([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)""".r

  private def rewriteVariantPaths(sql: String): String = {
    val once = guarded(sql, variantPathRe)(m => s"${m.group(1)}.${m.group(2)}")
    if (once == sql) sql else rewriteVariantPaths(once)
  }

  /** Snowflake dialect arm (reference repair-prompt inventory:
    * `core/actor/generator/sql_debug.py:120-250`; executor surface
    * `core/db_connect.py:49-136`): DATEADD/DATEDIFF unit-first forms
    * with boundary-counting semantics (TIMESTAMPADD/DIFF + TIMEADD/DIFF
    * aliases included — Spark's native timestampdiff counts elapsed
    * units, not boundaries), time-of-day-preserving adds,
    * TO_CHAR/TO_DATE/TO_TIMESTAMP format mapping (+ TRY_ and
    * DOUBLE/BOOLEAN/DECIMAL conversion families), `::` cast types,
    * IFF, ILIKE ANY, LATERAL FLATTEN / TABLE(FLATTEN) → LATERAL VIEW
    * POSEXPLODE, single-colon VARIANT paths (struct-typed) AND the
    * JSON-text forms (PARSE_JSON/TRY_PARSE_JSON paths → variant_get,
    * GET_PATH, JSON_EXTRACT_PATH_TEXT, OBJECT_AGG → sorted map),
    * ordered ARRAY_AGG WITHIN
    * GROUP, GET/ARRAY_SLICE/OBJECT_CONSTRUCT, extended REGEXP_SUBSTR
    * argument forms, DATE_PART/MONTHNAME/DAYNAME, literal-delimiter
    * SPLIT, reversed-argument ARRAY_CONTAINS, SAMPLE (n) row sampling
    * — then the shared pipeline (QUALIFY, GROUP_CONCAT, type casts).
    * LISTAGG/NVL/NVL2/DECODE/SPLIT_PART pass through as native
    * Spark 4 functions with matching semantics. Idempotent.
    */
  def transpileSnowflake(sql: String): String = {
    // FIRST: cut post-statement prose, then run the arm body over the
    // comment-heal variants, keeping the first that parses.
    val pre = truncateAtStatementEnd(sql.trim.stripSuffix(";"))
      .trim.stripSuffix(";")
    healedThen(pre)(snowflakeBody)
  }

  private def snowflakeBody(sql0: String): String = {
    // rewrite double-quoted tokens (always identifiers in Snowflake)
    // to backticks so every later lexical pass sees Spark identifier
    // syntax instead of what Spark would lex as a string.
    var out = rewriteQuotedIdentifiers(sql0)
    // SPLIT_TO_TABLE(s, d) is FLATTEN over a split — rewrite into the
    // FLATTEN form BEFORE the flatten pass so one machinery handles
    // TABLE(...)/LATERAL/comma connectors and aliases for both. The
    // emitted SPLIT then flows through the literal-delimiter escape
    // pass further down. Snowflake's INDEX column is 1-based where the
    // POSEXPLODE index is 0-based (VALUE — the overwhelmingly-consumed
    // column — matches exactly). A statement that consumes INDEX gets
    // the 1-based shift via splitIndexShift when that is provably
    // safe: exactly one SPLIT_TO_TABLE, no other FLATTEN (whose INDEX
    // is 0-based and must NOT shift), and every INDEX reference
    // alias-qualified to the lateral. Anything else is left
    // UNTRANSPILED — the repair loop gets a loud failure instead of
    // silently off-by-one results.
    val splitToFlatten = (s: String) => rewriteCall(s, "SPLIT_TO_TABLE") {
      case Seq(s0, d) => Some(s"FLATTEN(input => SPLIT($s0, $d))")
      case _ => None
    }
    if (!containsToken(out, "INDEX")) out = splitToFlatten(out)
    else if (countToken(out, "SPLIT_TO_TABLE") == 1 &&
        !containsToken(out, "FLATTEN")) {
      val tmp = splitToFlatten(out)
      if (tmp != out) {
        val flat = rewriteFlatten(tmp)
        if (flat != tmp) splitIndexShift(flat).foreach(v => out = v)
      }
    }
    out = rewriteFlatten(out)
    out = rewriteArrayAggWithinGroup(out)
    // JSON-text VARIANT family (Spider2-snow exports carry VARIANT as
    // JSON strings): PARSE_JSON(x):p::T → variant_get, GET_PATH,
    // JSON_EXTRACT_PATH_TEXT, OBJECT_AGG. Runs before the cast-colon
    // and struct-path passes so the raw forms are still visible.
    out = rewriteParseJsonPaths(out)
    out = rewriteCall(out, "GET_PATH") {
      case Seq(v, p) => fmtLit(p).map { path =>
        val vt = v.trim
        // already-variant args (an inner PARSE_JSON / variant_get CALL)
        // pass straight in; anything else is assumed JSON text and
        // wrapped. The '(' is required: a bare prefix test would
        // misclassify a COLUMN named e.g. parse_json_raw as a variant
        // expression and pass it unwrapped into variant_get.
        val variantCall =
          "(?is)^(?:TRY_)?(?:PARSE_JSON|VARIANT_GET)\\s*\\(.*".r
        val base =
          if (variantCall.matches(vt)) vt else s"parse_json($vt)"
        s"variant_get($base, '$$.$path')"
      }
      case _ => None
    }
    out = rewriteCall(out, "JSON_EXTRACT_PATH_TEXT") {
      case Seq(j, p) => fmtLit(p).map(path => s"get_json_object($j, '$$.$path')")
      case _ => None
    }
    // OBJECT_AGG(k, v) → deterministic sorted map (Snowflake serializes
    // OBJECT keys lexicographically); TO_JSON over it is Spark-native.
    // Snowflake OMITS pairs whose key or value is NULL — Spark's
    // map_from_entries THROWS on a NULL key — so null pairs are
    // filtered out before the map is built. Remaining divergence: the
    // result is a MAP, so only serialization-shaped consumers
    // (TO_JSON) match; OBJECT path access on it would not transpile.
    out = rewriteCall(out, "OBJECT_AGG") {
      case Seq(k, v) =>
        Some("map_from_entries(filter(array_sort(collect_list(" +
          s"named_struct('k', $k, 'v', $v))), " +
          "e -> e.k IS NOT NULL AND e.v IS NOT NULL))")
      case _ => None
    }
    out = replaceToken(out, "TO_VARCHAR", "TO_CHAR") // alias, same forms
    // DATEADD's input type is unknown at the string level; the
    // timestamp-preserving forms never truncate a time-of-day
    // (Snowflake DATEADD preserves the input's type and time)
    out = rewriteCall(out, "DATEADD") {
      case Seq(u, n, e) => normUnit(u).map(dateAddSqlTs(_, n, e))
      case _ => None
    }
    out = rewriteCall(out, "DATEDIFF") {
      case Seq(u, a, b) => normUnit(u).map(dateDiffSql(_, a, b))
      case _ => None
    }
    // TIMESTAMPDIFF/TIMEDIFF are Snowflake ALIASES of DATEDIFF with
    // its boundary-counting semantics — Spark's native timestampdiff
    // counts elapsed whole units (Jan 31 → Feb 1 is 0 months in Spark,
    // 1 in Snowflake), so a pass-through would be silently wrong
    Seq("TIMESTAMPDIFF", "TIMEDIFF").foreach { name =>
      out = rewriteCall(out, name) {
        case Seq(u, a, b) => normUnit(u).flatMap { unit =>
          // fixpoint guard: the DATEDIFF arm's sub-day output is itself
          // a timestampdiff over date_trunc'd args — already
          // boundary-aligned, re-wrapping would stack truncations
          val pre = s"date_trunc('${unit.toUpperCase}',"
          if (a.startsWith(pre) && b.startsWith(pre)) None
          else Some(dateDiffSql(unit, a, b))
        }
        case _ => None
      }
    }
    // TIMESTAMPADD/TIMEADD alias DATEADD; the fixpoint form keeps the
    // re-matching day-grain output stable under re-transpile
    Seq("TIMESTAMPADD", "TIMEADD").foreach { name =>
      out = rewriteCall(out, name) {
        case Seq(u, n, e) => normUnit(u).map(tsAddFixpoint(_, n, e))
        case _ => None
      }
    }
    // DATE_PART with a BARE unit token (Spark's date_part wants a
    // string literal); already-quoted units normalize the same way
    out = rewriteCall(out, "DATE_PART") {
      case Seq(u, e) => normUnit(u).map(unit =>
        s"date_part('${unit.toUpperCase}', $e)")
      case _ => None
    }
    out = rewriteCall(out, "MONTHNAME") {
      case Seq(e) => Some(s"date_format($e, 'MMM')")
      case _ => None
    }
    out = rewriteCall(out, "DAYNAME") {
      case Seq(e) => Some(s"date_format($e, 'EEE')")
      case _ => None
    }
    // Snowflake ARRAY_CONTAINS(value, array) — the REVERSE of Spark's
    // argument order. Emitted via the shared index fold (see
    // arrayIndexFold): before batch 8 this emitted array_position,
    // which the new ARRAY_POSITION arm would re-match on re-transpile
    // and swap back. NULL value or NULL array → NULL (as before);
    // NULL elements never match (= comparison, like array_position).
    out = rewriteCall(out, "ARRAY_CONTAINS") {
      case Seq(v, arr) => Some(s"(CASE WHEN ($arr) IS NULL OR ($v) IS NULL " +
        "THEN CAST(NULL AS BOOLEAN) ELSE " +
        s"${arrayIndexFold(arr, v, nullSafe = false)} IS NOT NULL END)")
      case _ => None
    }
    out = rewriteCall(out, "SPLIT") {
      case Seq(s0, d) => splitDelimiter(d).map(esc => s"split($s0, $esc)")
      case _ => None
    }
    out = rewriteCall(out, "TO_CHAR") {
      case Seq(e) => Some(s"CAST($e AS STRING)")
      case Seq(e, f) =>
        fmtLit(f).flatMap(snowFmtToSpark).map(sf => s"date_format($e, '$sf')")
      case _ => None
    }
    out = rewriteCall(out, "TO_DATE") {
      case Seq(e, f) =>
        fmtLit(f).flatMap(snowFmtToSpark).map(sf => s"to_date($e, '$sf')")
      case _ => None // 1-arg to_date is already Spark
    }
    // TO_TIMESTAMP_NTZ/LTZ/TZ collapse onto TO_TIMESTAMP before its
    // arm runs: graft sessions pin UTC, where the flavors coincide
    // for OFFSET-FREE input (the Spider2-snow shape). Documented
    // divergences, not silent claims: (a) a non-UTC session shifts
    // LTZ/TZ where NTZ would not; (b) an offset-BEARING string
    // ('... 07:30:00-08:00') diverges even in UTC — Snowflake's NTZ
    // keeps the wallclock (strips the offset) while Spark's
    // to_timestamp honors it. TRY_ forms ride the same collapse onto
    // TRY_TO_TIMESTAMP.
    Seq("TO_TIMESTAMP_NTZ", "TO_TIMESTAMP_LTZ", "TO_TIMESTAMP_TZ")
      .foreach(n => out = replaceToken(out, n, "TO_TIMESTAMP"))
    Seq("TRY_TO_TIMESTAMP_NTZ", "TRY_TO_TIMESTAMP_LTZ",
      "TRY_TO_TIMESTAMP_TZ")
      .foreach(n => out = replaceToken(out, n, "TRY_TO_TIMESTAMP"))
    // STRTOK(s[, delimSET[, part]]): every CHARACTER of the delimiter
    // is a separator and EMPTY tokens are skipped (split_part counts
    // them) — so tokens are the maximal NON-delimiter runs:
    // regexp_extract_all over a negated character class +
    // try_element_at (NULL past the last token, like Snowflake).
    // Deliberately NOT a split(): the emitted literal would be
    // re-escaped by the literal-delimiter SPLIT pass below. Literal
    // delimiters only; defaults: delim ' ', part 1.
    out = rewriteCall(out, "STRTOK") {
      def tok(s0: String, chars: String, part: String): String = {
        val cls = chars.flatMap {
          case c if "[]^\\-&".contains(c) => s"\\\\$c"
          case '\'' => "''"
          case c => c.toString
        }
        s"try_element_at(regexp_extract_all($s0, '[^$cls]+', 0), CAST($part AS INT))"
      }
      // empty delimiter would emit the INVALID regex '[^]+' (Snowflake
      // returns the whole string as one token), and a backslash in the
      // delimiter set cannot survive the double unescape (SQL literal
      // then regex — the splitDelimiter convention): both pass through
      // for the repair loop
      def usable(d: String): Option[String] =
        fmtLit(d).filter(l => l.nonEmpty && !l.contains("\\"))
      // part must be a POSITIVE integer literal: try_element_at counts
      // a negative part from the END of the array where Snowflake
      // RAISES on part < 1 — a non-positive or non-literal part passes
      // through so the repair loop gets a loud failure instead of a
      // silent wrong value
      def positivePart(p: String): Option[String] = {
        val t = p.trim
        if (t.matches("\\+?\\d+") && t.dropWhile(_ == '+').dropWhile(_ == '0').nonEmpty)
          Some(t)
        else None
      }
      val arms: Seq[String] => Option[String] = {
        case Seq(s0) => Some(tok(s0, " ", "1"))
        case Seq(s0, d) => usable(d).map(tok(s0, _, "1"))
        case Seq(s0, d, p) => for {
          cls <- usable(d)
          pp <- positivePart(p)
        } yield tok(s0, cls, pp)
        case _ => None
      }
      arms
    }
    out = rewriteCall(out, "TO_TIMESTAMP") {
      case Seq(e, f) =>
        fmtLit(f).flatMap(snowFmtToSpark).map(sf => s"to_timestamp($e, '$sf')")
      case _ => None
    }
    // error-tolerant conversions: 1-arg TRY_TO_DATE/TRY_TO_TIMESTAMP
    // are native Spark; format-bearing forms map the format elements
    out = rewriteCall(out, "TRY_TO_DATE") {
      case Seq(e, f) =>
        fmtLit(f).flatMap(snowFmtToSpark).map(sf => s"try_to_date($e, '$sf')")
      case _ => None
    }
    out = rewriteCall(out, "TRY_TO_TIMESTAMP") {
      case Seq(e, f) =>
        fmtLit(f).flatMap(snowFmtToSpark).map(sf => s"try_to_timestamp($e, '$sf')")
      case _ => None
    }
    // TO_DECIMAL/TO_NUMERIC alias TO_NUMBER's forms exactly
    out = replaceToken(out, "TO_DECIMAL", "TO_NUMBER")
    out = replaceToken(out, "TO_NUMERIC", "TO_NUMBER")
    out = replaceToken(out, "TRY_TO_DECIMAL", "TRY_TO_NUMBER")
    out = replaceToken(out, "TRY_TO_NUMERIC", "TRY_TO_NUMBER")
    out = rewriteCall(out, "TO_NUMBER") {
      case Seq(e) => Some(s"CAST($e AS DECIMAL(38,0))")
      case Seq(e, p, sc) => Some(s"CAST($e AS DECIMAL($p,$sc))")
      case _ => None
    }
    out = rewriteCall(out, "TRY_TO_NUMBER") {
      case Seq(e) => Some(s"TRY_CAST($e AS DECIMAL(38,0))")
      case Seq(e, p, sc) => Some(s"TRY_CAST($e AS DECIMAL($p,$sc))")
      case _ => None
    }
    out = rewriteCall(out, "TO_DOUBLE") {
      case Seq(e) => Some(s"CAST($e AS DOUBLE)")
      case _ => None
    }
    out = rewriteCall(out, "TRY_TO_DOUBLE") {
      case Seq(e) => Some(s"TRY_CAST($e AS DOUBLE)")
      case _ => None
    }
    // Spark's boolean cast accepts the same y/n/t/f/0/1 token set
    out = rewriteCall(out, "TO_BOOLEAN") {
      case Seq(e) => Some(s"CAST($e AS BOOLEAN)")
      case _ => None
    }
    out = rewriteCall(out, "TRY_TO_BOOLEAN") {
      case Seq(e) => Some(s"TRY_CAST($e AS BOOLEAN)")
      case _ => None
    }
    out = rewriteCall(out, "ZEROIFNULL") {
      case Seq(e) => Some(s"COALESCE($e, 0)")
      case _ => None
    }
    out = rewriteCall(out, "NULLIFZERO") {
      case Seq(e) => Some(s"NULLIF($e, 0)")
      case _ => None
    }
    // REGEXP_SUBSTR_ALL(subject, pattern[, position[, occurrence...]]):
    // every match as an array — regexp_extract_all with group 0 (the
    // full match, Snowflake's default without the 'e' param); the
    // position form slices the subject first, like REGEXP_SUBSTR's.
    out = rewriteCall(out, "REGEXP_SUBSTR_ALL") {
      case Seq(e, p) => Some(s"regexp_extract_all($e, $p, 0)")
      case Seq(e, p, pos) =>
        Some(s"regexp_extract_all(${subjFrom(e, pos)}, $p, 0)")
      case _ => None
    }
    // REGEXP_SUBSTR(subject, pattern[, position[, occurrence[, params
    // [, group]]]]): the 2-arg form is native Spark (NULL on no match,
    // like Snowflake); extended forms compose substr + regexp_extract_all
    // + try_element_at (NULL when the occurrence is absent)
    out = rewriteCall(out, "REGEXP_SUBSTR") {
      case Seq(_, _) => None
      case Seq(e, p, pos) => Some(s"regexp_substr(${subjFrom(e, pos)}, $p)")
      case Seq(e, p, pos, occ) =>
        Some(s"try_element_at(regexp_extract_all(${subjFrom(e, pos)}, $p, 0), CAST($occ AS INT))")
      case Seq(e, p, pos, occ, params) =>
        fmtLit(params).flatMap(ps => regexParamPrefix(ps).map { pre =>
          val g = if (ps.contains('e')) 1 else 0
          s"try_element_at(regexp_extract_all(${subjFrom(e, pos)}, ${prefixPattern(p, pre)}, $g), CAST($occ AS INT))"
        })
      case Seq(e, p, pos, occ, params, grp) =>
        fmtLit(params).flatMap(ps => regexParamPrefix(ps).map { pre =>
          s"try_element_at(regexp_extract_all(${subjFrom(e, pos)}, ${prefixPattern(p, pre)}, CAST($grp AS INT)), CAST($occ AS INT))"
        })
      case _ => None
    }
    // semi-structured access: GET is 0-based like Spark's [] (arrays),
    // and [] also serves object/map keys
    out = rewriteCall(out, "GET") {
      case Seq(v, k) => Some(s"$v[$k]")
      case _ => None
    }
    // ARRAY_SLICE(arr, from, to): 0-based from, exclusive to → Spark's
    // 1-based (start, length). Negative literal indices (count from
    // the end) pass through for the repair loop.
    out = rewriteCall(out, "ARRAY_SLICE") {
      case Seq(arr, f, t)
          if !f.trim.startsWith("-") && !t.trim.startsWith("-") =>
        Some(s"slice($arr, ($f) + 1, ($t) - ($f))")
      case _ => None
    }
    // OBJECT_CONSTRUCT(_KEEP_NULL) with literal keys → named_struct.
    // Semantics caveat: Snowflake's plain OBJECT_CONSTRUCT DROPS pairs
    // whose value is NULL while named_struct keeps them, so the mapping
    // is exact only for OBJECT_CONSTRUCT_KEEP_NULL. For the plain
    // spelling we still map when no value argument is a literal NULL
    // (the statically-divergent case goes to the repair loop); values
    // that are NULL only at runtime remain a documented divergence —
    // the struct then carries a null field Snowflake would omit.
    def objectConstructArm(name: String, keepNull: Boolean): Unit =
      out = rewriteCall(out, name) { args =>
        val keysLiteral = args.size >= 2 && args.size % 2 == 0 &&
          args.grouped(2).forall(p => fmtLit(p.head).isDefined)
        val noLiteralNullValue = keepNull ||
          args.grouped(2).forall(p => !p(1).trim.equalsIgnoreCase("NULL"))
        if (keysLiteral && noLiteralNullValue)
          Some(s"named_struct(${args.mkString(", ")})")
        else None
      }
    objectConstructArm("OBJECT_CONSTRUCT_KEEP_NULL", keepNull = true)
    objectConstructArm("OBJECT_CONSTRUCT", keepNull = false)
    out = replaceToken(out, "ARRAY_CAT", "CONCAT")
    out = replaceToken(out, "ARRAY_TO_STRING", "ARRAY_JOIN")
    // ---- batch 8 ----------------------------------------------------
    // ARRAY_POSITION(elem, arr): element-FIRST (the reverse of Spark's
    // argument order, like ARRAY_CONTAINS above), 0-based, NULL when
    // absent — and it finds NULL elements (<=>), which Spark's
    // array_position cannot. Shares the fold emission with
    // ARRAY_CONTAINS, so neither arm's output re-matches either arm.
    out = rewriteCall(out, "ARRAY_POSITION") {
      case Seq(e, arr) => Some(arrayIndexFold(arr, e, nullSafe = true))
      case _ => None
    }
    // bit functions → operators; the shift pair maps onto
    // shiftleft/shiftright (different names — cannot re-match)
    out = rewriteCall(out, "BITAND") {
      case Seq(a, b) => Some(s"(($a) & ($b))"); case _ => None
    }
    out = rewriteCall(out, "BITOR") {
      case Seq(a, b) => Some(s"(($a) | ($b))"); case _ => None
    }
    out = rewriteCall(out, "BITXOR") {
      case Seq(a, b) => Some(s"(($a) ^ ($b))"); case _ => None
    }
    out = rewriteCall(out, "BITNOT") {
      case Seq(a) => Some(s"(~($a))"); case _ => None
    }
    out = rewriteCall(out, "BITSHIFTLEFT") {
      case Seq(a, n) => Some(s"shiftleft($a, $n)"); case _ => None
    }
    out = rewriteCall(out, "BITSHIFTRIGHT") {
      case Seq(a, n) => Some(s"shiftright($a, $n)"); case _ => None
    }
    // EDITDISTANCE → levenshtein; the 3-arg bound CLAMPS in Snowflake
    // (the maximum is returned when the true distance exceeds it) where
    // Spark's 3-arg levenshtein returns -1 — least() over the full
    // distance keeps the clamp exact. Literal non-negative bounds only;
    // a variable or negative bound goes to the repair loop.
    out = rewriteCall(out, "EDITDISTANCE") {
      case Seq(a, b) => Some(s"levenshtein($a, $b)")
      case Seq(a, b, m) if m.trim.matches("\\d+") =>
        Some(s"least(levenshtein($a, $b), $m)")
      case _ => None
    }
    out = rewriteCall(out, "SQUARE") {
      case Seq(e) => Some(s"power($e, 2)"); case _ => None
    }
    // ISO day/week/year family — unambiguous under any WEEK_START
    // session value: weekday() is Monday=0, weekofyear() is ISO, and
    // the ISO year is the year of the Thursday of the date's ISO week.
    // Plain YEAROFWEEK rides the same mapping: under the DEFAULT
    // session (WEEK_OF_YEAR_POLICY=0, WEEK_START=0) Snowflake's
    // YEAROFWEEK is exactly the ISO year; a session pinning
    // POLICY=1 (Jan-1-anchored weeks) would diverge — documented, not
    // detectable at the string level.
    out = rewriteCall(out, "DAYOFWEEKISO") {
      case Seq(e) => Some(s"(weekday($e) + 1)"); case _ => None
    }
    out = rewriteCall(out, "WEEKISO") {
      case Seq(e) => Some(s"weekofyear($e)"); case _ => None
    }
    Seq("YEAROFWEEKISO", "YEAROFWEEK").foreach { n =>
      out = rewriteCall(out, n) {
        case Seq(e) => Some(s"year(date_add(CAST($e AS DATE), 3 - weekday($e)))")
        case _ => None
      }
    }
    // 2-arg LAST_DAY(d, part): 1-arg (month) is native Spark; year and
    // quarter snap to calendar ends; week is the ISO week's Sunday
    // (default WEEK_START=0 is ISO-like Monday-start weeks)
    out = rewriteCall(out, "LAST_DAY") {
      case Seq(e, u) => normUnit(u).flatMap {
        case "month" => Some(s"last_day($e)")
        case "year" => Some(s"make_date(year($e), 12, 31)")
        case "quarter" =>
          Some(s"date_sub(add_months(CAST(date_trunc('QUARTER', $e) AS DATE), 3), 1)")
        case "week" => Some(s"date_add(CAST($e AS DATE), 6 - weekday($e))")
        case _ => None
      }
      case _ => None
    }
    // REGEXP_COUNT(s, pat[, pos[, params]]): the 2-arg form is native
    // Spark; position slices the subject first (like REGEXP_SUBSTR's),
    // params map to inline flags
    out = rewriteCall(out, "REGEXP_COUNT") {
      case Seq(_, _) => None
      case Seq(e, p, pos) => Some(s"regexp_count(${subjFrom(e, pos)}, $p)")
      case Seq(e, p, pos, params) =>
        fmtLit(params).flatMap(ps => regexParamPrefix(ps).map(pre =>
          s"regexp_count(${subjFrom(e, pos)}, ${prefixPattern(p, pre)})"))
      case _ => None
    }
    // INSERT(base, pos, len, repl) → overlay (the DML keyword never has
    // a 4-argument call shape, so the name cannot collide)
    out = rewriteCall(out, "INSERT") {
      case Seq(s0, p, l, r) => Some(s"overlay($s0, $r, $p, $l)")
      case _ => None
    }
    // RATIO_TO_REPORT(x) OVER (w) → x / sum(x) OVER (w). Divergence
    // kept, not hidden: an all-zero window errors in Snowflake
    // (division by zero) where Spark yields NULL.
    out = rewriteRatioToReport(out)
    // ---- batch 9 ----------------------------------------------------
    // ---- batch 10 ---------------------------------------------------
    // ARRAY_FLATTEN → (flatten(...)) — PARENTHESIZED so a re-transpile
    // cannot misread a comma-preceded select item `, flatten(a)` as a
    // lateral FLATTEN join (flattenAt rejects a paren wrapper whose
    // preceding word is not TABLE). ARRAY_INTERSECTION →
    // array_intersect with a DOCUMENTED divergence: Snowflake keeps
    // duplicate elements by multiset multiplicity where Spark's
    // array_intersect returns distinct elements — exact whenever
    // either input is duplicate-free (the overwhelming Spider2 shape).
    out = rewriteCall(out, "ARRAY_FLATTEN") {
      case Seq(a) => Some(s"(flatten($a))")
      case _ => None
    }
    out = rewriteCall(out, "ARRAY_INTERSECTION") {
      case Seq(a, b) => Some(s"array_intersect($a, $b)")
      case _ => None
    }
    // REGEXP_REPLACE extended forms: Snowflake's default replacement
    // is '' (Spark requires 3 args); position keeps the WHOLE string
    // and starts matching at pos — exactly Spark's own 4-arg contract,
    // so that form passes through native. occurrence 0 (replace ALL,
    // the Snowflake default) composes with params → inline flags; a
    // SPECIFIC occurrence is not expressible as one regexp_replace —
    // repair loop.
    out = rewriteCall(out, "REGEXP_REPLACE") {
      case Seq(s0, p) => Some(s"regexp_replace($s0, $p, '')")
      case Seq(s0, p, r, pos, occ) if occ.trim == "0" =>
        Some(s"regexp_replace($s0, $p, $r, $pos)")
      case Seq(s0, p, r, pos, occ, params) if occ.trim == "0" =>
        fmtLit(params).flatMap(ps => regexParamPrefix(ps).map(pre =>
          s"regexp_replace($s0, ${prefixPattern(p, pre)}, $r, $pos)"))
      case _ => None
    }
    // ---- batch 11 ---------------------------------------------------
    out = rewriteRegexpInstr(out)
    // REGEXP_LIKE / RLIKE function forms: Snowflake implicitly anchors
    // the pattern at BOTH ends (entire-subject match) where Spark's
    // regexp_like/RLIKE is a partial-match contains — a pass-through
    // silently matched substrings (and Spark EXECUTES the 2-arg form
    // natively, so it never even reached the repair loop). Emitted as
    // the RLIKE OPERATOR — no following paren, so no arm re-matches —
    // with \A(?:...)\z anchors: Java's '$' matches BEFORE a trailing
    // newline and the 'm' param would relocate '^'/'$' to every line
    // boundary, where \A/\z pin the whole subject regardless of
    // flags. Non-literal patterns anchor through concat.
    Seq("REGEXP_LIKE", "RLIKE").foreach { name =>
      out = rewriteCall(out, name) {
        case Seq(s0, p) => Some(fmtLit(p) match {
          case Some(lit) => s"(($s0) RLIKE '\\\\A(?:$lit)\\\\z')"
          case None => s"(($s0) RLIKE concat('\\\\A(?:', $p, ')\\\\z'))"
        })
        case Seq(s0, p, params) =>
          fmtLit(params).flatMap(regexParamPrefix).map { pre =>
            fmtLit(p) match {
              case Some(lit) => s"(($s0) RLIKE '$pre\\\\A(?:$lit)\\\\z')"
              case None =>
                s"(($s0) RLIKE concat('$pre\\\\A(?:', $p, ')\\\\z'))"
            }
          }
        case _ => None
      }
    }
    // Snowflake's INFIX regexp predicates carry the same
    // entire-subject anchoring: `s [NOT] RLIKE 'p'` / `s [NOT] REGEXP
    // 'p'` re-anchor onto \A(?:p)\z (literal patterns; the guard
    // skips an already-anchored pattern, keeping the pass — and every
    // function-arm emission above — idempotent)
    out = guarded(out,
      """(?i)\b(NOT\s+)?(RLIKE|REGEXP)\s+'((?:[^']|'')*)'""".r) { m =>
      val not = Option(m.group(1)).getOrElse("")
      val lit = m.group(3)
      // already carries the \A(?:...)\z shape in the RAW SQL text —
      // `\\A` on disk, since Spark's literal parser consumes one
      // backslash level — (our own emissions, with or without a flags
      // prefix) → leave; a user pattern with a bare inline-flags
      // prefix still anchors, (?i) is valid inside the group
      if (lit.contains("\\\\A(?:") && lit.endsWith(")\\\\z")) m.matched
      else s"${not}RLIKE '\\\\A(?:$lit)\\\\z'"
    }
    // TRUNC(expr, part) — Snowflake's expr-FIRST date_trunc spelling.
    // Only recognized DATE parts rewrite, and a BARE (unquoted) part
    // must be a FULL unit word: TRUNC doubles as numeric truncation,
    // so a bare abbreviation like `d` or `mm` could equally be a SCALE
    // COLUMN — quoted literals and full words are unambiguous, the
    // rest (including every numeric scale) pass through to the repair
    // loop. Type divergence documented: Snowflake TRUNC keeps the
    // input type (DATE stays DATE) where Spark's date_trunc always
    // returns TIMESTAMP.
    out = rewriteCall(out, "TRUNC") {
      case Seq(e, u) =>
        val uu = u.trim
        val fullWords = Set("year", "years", "quarter", "quarters",
          "month", "months", "week", "weeks", "day", "days",
          "hour", "hours", "minute", "minutes", "second", "seconds")
        if (uu.startsWith("'") || fullWords.contains(uu.toLowerCase))
          normUnit(u).map(unit => s"date_trunc('${unit.toUpperCase}', $e)")
        else None
      case _ => None
    }
    // FROM t SAMPLE (10) — Snowflake's percent row sampling → Spark's
    // TABLESAMPLE. Digit-only bodies only (a call named sample keeps
    // its arguments); BERNOULLI/ROW spellings are the same default.
    // Snowflake star-minus: `* EXCLUDE (a, b)` / `* EXCLUDE a` →
    // Spark's `* EXCEPT (...)` (parens required in Spark)
    out = guarded(out, """(?i)\*\s*EXCLUDE\s*\(""".r)(_ => "* EXCEPT (")
    // The bare-identifier form must not fire on a MULTIPLICATION by a
    // column literally named `exclude` (SELECT price * exclude FROM t):
    // there the "identifier" the regex grabs is the next clause keyword,
    // so reserved words are rejected and the match passes through.
    out = guarded(out,
      """(?i)\*\s*EXCLUDE\s+([A-Za-z_][A-Za-z0-9_]*)""".r)(m =>
      if (SqlClauseKeywords.contains(m.group(1).toUpperCase)) m.matched
      else s"* EXCEPT (${m.group(1)})")
    // The fixed-size form SAMPLE (n ROWS) maps first — Spark's
    // TABLESAMPLE (n ROWS) is the same contract (exactly n rows,
    // arbitrary choice).
    out = guarded(out,
      """(?i)\b(?:SAMPLE|TABLESAMPLE)\s+(?:BERNOULLI\s*|ROW\s*)?\(\s*(\d+)\s+ROWS?\s*\)""".r)(
      m => s"TABLESAMPLE (${m.group(1)} ROWS)")
    out = guarded(out,
      """(?i)\b(?:SAMPLE|TABLESAMPLE)\s+(?:BERNOULLI\s*|ROW\s*)?\(\s*(\d+(?:\.\d+)?)\s*\)""".r)(
      m => s"TABLESAMPLE (${m.group(1)} PERCENT)")
    out = rewriteIlikeAny(out)
    out = rewriteCastColons(out, SnowflakeBareTypes, SnowflakeParenTypes)
    // CAST(x AS NUMBER[(p,s)]) — same mapping as the `::` form (the
    // exemplar corpus carries it spelled out, snowflake/example_208).
    // The BARE form requires the CAST's closing paren right after:
    // `COUNT(*) AS number` is an ALIAS named number
    // (snowflake/example_246) and must not become a type.
    out = guarded(out, """(?i)\bAS\s+NUMBER\s*\(""".r)(_ => "AS DECIMAL(")
    out = guarded(out, """(?i)\bAS\s+NUMBER\s*(?=\))""".r)(_ => "AS DECIMAL(38,0)")
    out = rewriteVariantPaths(out)
    out = replaceToken(out, "IFF", "IF")
    // DATE_TRUNC('part', expr) is part-first in Snowflake, same as
    // Spark — passes through natively
    transpile(out)
  }

  /** `INTERVAL n unit` (BigQuery DATE_ADD/DATE_SUB second arg). */
  private val intervalRe = """(?i)^INTERVAL\s+(.+?)\s+([A-Za-z]+)$""".r

  private def parseInterval(arg: String): Option[(String, String)] =
    arg.trim match {
      // week re-admitted: INTERVAL n WEEK is pure 7-day arithmetic,
      // no week-start convention involved
      case intervalRe(n, u) => normUnitBq(u, allowWeek = true).map(unit => (n, unit))
      case _ => None
    }

  /** BigQuery `\`project.dataset.table\`` quotes the whole dotted path
    * in ONE backtick pair; Spark needs each segment quoted.
    */
  private def rewriteBacktickPaths(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '`') {
        val close = sql.indexOf('`', i + 1)
        if (close < 0) { sb.append(sql.substring(i)); i = sql.length }
        else {
          val inner = sql.substring(i + 1, close)
          if (inner.contains('.') && inner.matches("[A-Za-z0-9_.\\-]+"))
            sb.append(inner.split('.').map(s => s"`$s`").mkString("."))
          else sb.append('`').append(inner).append('`')
          i = close + 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val bqTypeCasts: Seq[(scala.util.matching.Regex, String)] = Seq(
    "(?i)\\bAS\\s+FLOAT64\\b".r -> "AS DOUBLE",
    "(?i)\\bAS\\s+INT64\\b".r -> "AS BIGINT",
    "(?i)\\bAS\\s+NUMERIC\\b".r -> "AS DECIMAL(38,9)",
    "(?i)\\bAS\\s+BIGNUMERIC\\b".r -> "AS DECIMAL(38,18)",
    "(?i)\\bAS\\s+BOOL\\b".r -> "AS BOOLEAN",
    "(?i)\\bAS\\s+BYTES\\b".r -> "AS BINARY")

  // literal-guarded like typeCastMaps: a string literal containing
  // 'CAST(x AS INT64)' must NOT be rewritten inside the quotes
  private def rewriteBqTypes(sql: String): String =
    bqTypeCasts.foldLeft(sql) { case (acc, (re, to)) =>
      guarded(acc, re)(_ => to)
    }

  /** BigQuery dialect arm (same reference inventory): backtick path
    * identifiers, FROM-clause UNNEST (WITH OFFSET, LEFT JOIN ... ON
    * TRUE, `x IN UNNEST`), SAFE_DIVIDE/SAFE_CAST → try_*,
    * DATE_DIFF/DATE_ADD argument order (unit LAST; INTERVAL literal)
    * with time-of-day-preserving TIMESTAMP_/DATETIME_ adds and
    * explicitly Sunday-aligned bare-WEEK trunc/diff, FORMAT_DATE/
    * FORMAT_DATETIME/PARSE_* %-formats, FLOAT64/INT64/NUMERIC casts,
    * COUNTIF, REGEXP_CONTAINS, group-aware REGEXP_EXTRACT/
    * REGEXP_EXTRACT_ALL, STRING_AGG/ARRAY_AGG with in-call ORDER BY,
    * UNIX_DATE pair, DIV, literal-delimiter SPLIT, array-function
    * renames, TABLESAMPLE SYSTEM, JSON functions over JSON-text
    * columns (JSON_VALUE/JSON_EXTRACT_SCALAR → get_json_object,
    * JSON_EXTRACT/JSON_QUERY → to_json(variant_get(try_parse_json)),
    * TO_JSON_STRING), the SAFE. function prefix, printf-style FORMAT,
    * GENERATE_DATE_ARRAY → date sequence(), value-first LOG →
    * ln-division, OFFSET/ORDINAL/SAFE_* array access,
    * CONTAINS_SUBSTR — then the shared pipeline.
    * Idempotent.
    *
    * NOTE: BigQuery NUMERIC is DECIMAL(38,9); a bare rename to
    * Spark's default DECIMAL(10,0) would silently truncate.
    */
  def transpileBigQuery(sql: String): String = {
    val pre = truncateAtStatementEnd(sql.trim.stripSuffix(";"))
      .trim.stripSuffix(";")
    healedThen(pre)(bigQueryBody)
  }

  private def bigQueryBody(sql0: String): String = {
    var out = sql0
    out = rewriteBacktickPaths(out)
    // Unquoted dash-ed project heads (`FROM bigquery-public-data.x.y`)
    // are legal BigQuery table paths but lex as subtraction in Spark.
    // Quote ONLY a dashed head in table position (directly after
    // FROM/JOIN), never bare dashed tokens elsewhere — `a.price-b.qty`
    // arithmetic must stay arithmetic. Exemplar evidence:
    // files/reasoning_examples/system/big_query (134× unquoted
    // bigquery-public-data., plus firebase-public-project. etc.).
    out = guarded(out,
      """(?i)\b(FROM|JOIN)(\s+)([A-Za-z_][A-Za-z0-9_]*(?:-[A-Za-z0-9_]+)+)(?=\.)""".r)(
      m => s"${m.group(1)}${m.group(2)}`${m.group(3)}`")
    // the `SAFE.` FUNCTION PREFIX is BigQuery's general NULL-on-error
    // spelling: normalize `SAFE.FN(` to `SAFE_FN(` FIRST — before any
    // function map runs, so a dotted SAFE.PARSE_DATE cannot be
    // half-rewritten by the PARSE_DATE arm (a '.' passes the word
    // boundary where a '_' does not). Known SAFE_ forms then map to
    // try_*; an unknown SAFE_X survives to the repair loop (dropping
    // the prefix outright would silently change error semantics).
    out = guarded(out, """(?i)\bSAFE\.([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r)(
      m => s"SAFE_${m.group(1)}(")
    out = rewriteInUnnest(out)
    out = rewriteFromUnnest(out)
    def diffArm(name: String): Unit =
      out = rewriteCall(out, name) {
        case Seq(e, s0, u) if isWeekUnit(u) =>
          // BigQuery's bare WEEK is Sunday-start (Spark's is Monday):
          // count Sunday boundaries crossed, explicitly aligned
          Some(bqWeekDiffSql(s0, e))
        case Seq(e, s0, u) => normUnitBq(u).map(dateDiffSql(_, s0, e))
        case _ => None
      }
    diffArm("DATE_DIFF"); diffArm("TIMESTAMP_DIFF"); diffArm("DATETIME_DIFF")
    // DATE_ADD/DATE_SUB accept only DATE in BigQuery → date-typed
    // arithmetic; TIMESTAMP_/DATETIME_ preserve time-of-day via the
    // timestamp-preserving forms (a date_add here would silently
    // truncate the clock — r14 advisor finding)
    def addArm(name: String, sign: String, ts: Boolean): Unit =
      out = rewriteCall(out, name) {
        case Seq(e, iv) =>
          parseInterval(iv).map { case (n, u) =>
            if (ts) dateAddSqlTs(u, s"$sign($n)", e)
            else dateAddSqlDate(u, s"$sign($n)", e)
          }
        case _ => None // Spark's own 2-arg date_add(date, days) passes through
      }
    addArm("DATE_ADD", "", ts = false); addArm("DATE_SUB", "-", ts = false)
    addArm("TIMESTAMP_ADD", "", ts = true); addArm("TIMESTAMP_SUB", "-", ts = true)
    addArm("DATETIME_ADD", "", ts = true); addArm("DATETIME_SUB", "-", ts = true)
    out = rewriteCall(out, "FORMAT_DATE") {
      case Seq(f, e) =>
        fmtLit(f).flatMap(strfToSpark).map(sf => s"date_format($e, '$sf')")
      case _ => None
    }
    out = rewriteCall(out, "FORMAT_TIMESTAMP") {
      case Seq(f, e) =>
        fmtLit(f).flatMap(strfToSpark).map(sf => s"date_format($e, '$sf')")
      case _ => None
    }
    out = rewriteCall(out, "FORMAT_DATETIME") {
      case Seq(f, e) =>
        fmtLit(f).flatMap(strfToSpark).map(sf => s"date_format($e, '$sf')")
      case _ => None
    }
    out = rewriteCall(out, "PARSE_DATE") {
      case Seq(f, e) =>
        fmtLit(f).flatMap(strfToSpark).map(sf => s"to_date($e, '$sf')")
      case _ => None
    }
    Seq("PARSE_TIMESTAMP", "PARSE_DATETIME").foreach { name =>
      out = rewriteCall(out, name) {
        case Seq(f, e) =>
          fmtLit(f).flatMap(strfToSpark).map(sf => s"to_timestamp($e, '$sf')")
        case _ => None
      }
    }
    // days-since-epoch pair (UNIX_DATE / DATE_FROM_UNIX_DATE)
    out = rewriteCall(out, "UNIX_DATE") {
      case Seq(e) => Some(s"datediff($e, DATE'1970-01-01')")
      case _ => None
    }
    out = rewriteCall(out, "DATE_FROM_UNIX_DATE") {
      case Seq(n) => Some(s"date_add(DATE'1970-01-01', ($n))")
      case _ => None
    }
    // BigQuery DIV(a, b) integer division → Spark's infix DIV
    out = rewriteCall(out, "DIV") {
      case Seq(a, b) => Some(s"(($a) DIV ($b))")
      case _ => None
    }
    out = rewriteCall(out, "SPLIT") {
      case Seq(s0) => Some(s"split($s0, ',')") // BigQuery default delimiter
      case Seq(s0, d) => splitDelimiter(d).map(esc => s"split($s0, $esc)")
      case _ => None
    }
    // BigQuery's trunc family is expr-first (unit LAST, unquoted) —
    // the reverse of Spark's date_trunc('UNIT', ts); DATE_TRUNC
    // returns DATE, so it maps to trunc(date, fmt)
    out = rewriteCall(out, "DATE_TRUNC") {
      case Seq(e, u) if isWeekUnit(u) => Some(bqSundayTruncDate(e))
      case Seq(e, u) => normUnitBq(u).map(unit => s"trunc($e, '${unit.toUpperCase}')")
      case _ => None
    }
    def truncArm(name: String): Unit =
      out = rewriteCall(out, name) {
        case Seq(e, u) if isWeekUnit(u) => Some(bqSundayTruncTs(e))
        case Seq(e, u) =>
          normUnitBq(u).map(unit => s"date_trunc('${unit.toUpperCase}', $e)")
        case _ => None
      }
    truncArm("TIMESTAMP_TRUNC"); truncArm("DATETIME_TRUNC")
    // REGEXP_EXTRACT / its REGEXP_SUBSTR synonym: BigQuery returns the
    // single capturing group when the pattern has one, else the full
    // match, NULL on no match; position/occurrence args compose
    // substr + regexp_extract_all + try_element_at
    def bqExtract(name: String): Unit =
      out = rewriteCall(out, name) {
        case Seq(e, p) =>
          // no nullif on the single-group form: BigQuery returns ''
          // (not NULL) for a legitimately empty capture, and the 3-/4-
          // arg forms below already return '' — wrapping only this
          // arity in nullif made identical patterns arity-dependent
          fmtLit(p).map(captureGroups).flatMap {
            case 0 => Some(s"regexp_substr($e, $p)")
            case 1 => Some(s"try_element_at(regexp_extract_all($e, $p, 1), 1)")
            case _ => None
          }
        case Seq(e, p, pos) =>
          fmtLit(p).map(captureGroups).collect { case g @ (0 | 1) =>
            s"try_element_at(regexp_extract_all(${subjFrom(e, pos)}, $p, $g), 1)"
          }
        case Seq(e, p, pos, occ) =>
          fmtLit(p).map(captureGroups).collect { case g @ (0 | 1) =>
            s"try_element_at(regexp_extract_all(${subjFrom(e, pos)}, $p, $g), CAST($occ AS INT))"
          }
        case _ => None
      }
    bqExtract("REGEXP_EXTRACT"); bqExtract("REGEXP_SUBSTR")
    out = rewriteCall(out, "REGEXP_EXTRACT_ALL") {
      case Seq(e, p) =>
        fmtLit(p).map(captureGroups).collect { case g @ (0 | 1) =>
          s"regexp_extract_all($e, $p, $g)"
        }
      case _ => None
    }
    // JSON family over JSON-text columns. JSON_VALUE/JSON_EXTRACT_SCALAR
    // return the unquoted scalar (get_json_object; the non-scalar edge —
    // BigQuery returns NULL where get_json_object returns the JSON —
    // is documented divergence, and it applies to BOTH argument forms:
    // the 1-arg JSON_VALUE(j) → get_json_object(j, '$') returns the
    // whole document text for a non-scalar j where BigQuery returns
    // NULL, exactly like a 2-arg path landing on an object/array).
    // JSON_QUERY/JSON_EXTRACT return JSON
    // text, quotes included: to_json over a variant_get probe.
    Seq("JSON_EXTRACT_SCALAR", "JSON_VALUE").foreach { name =>
      out = rewriteCall(out, name) {
        case Seq(j) => Some(s"get_json_object($j, '$$')")
        case Seq(j, p) if fmtLit(p).isDefined => Some(s"get_json_object($j, $p)")
        case _ => None
      }
    }
    // Array forms FIRST (their names embed the scalar names, but
    // rewriteCall's name(-paren boundary keeps them distinct): each
    // element comes back as JSON text, exactly BigQuery's ARRAY<JSON>
    // serialization (strings keep their quotes). try_cast nulls the
    // non-array case like BigQuery does.
    Seq("JSON_EXTRACT_ARRAY", "JSON_QUERY_ARRAY").foreach { name =>
      out = rewriteCall(out, name) {
        case Seq(j) => Some("transform(try_cast(variant_get(" +
          s"try_parse_json($j), '$$') AS array<variant>), x -> to_json(x))")
        case Seq(j, p) if fmtLit(p).isDefined =>
          Some("transform(try_cast(variant_get(" +
            s"try_parse_json($j), $p) AS array<variant>), x -> to_json(x))")
        case _ => None
      }
    }
    Seq("JSON_EXTRACT", "JSON_QUERY").foreach { name =>
      out = rewriteCall(out, name) {
        case Seq(j, p) if fmtLit(p).isDefined =>
          Some(s"to_json(variant_get(try_parse_json($j), $p))")
        case _ => None
      }
    }
    out = rewriteCall(out, "TO_JSON_STRING") {
      case Seq(e) => Some(s"to_json($e)")
      case _ => None
    }
    // BigQuery ARRAY_AGG(x ORDER BY k): the ordering sits INSIDE the
    // call; Spark's array_agg takes none → sort-aware collect. An
    // `IGNORE NULLS` modifier (big_query/example_88) strips before the
    // ORDER split; the ordered emission re-filters NULL values after
    // the transform (the sort key rode along in a non-null struct),
    // while the plain form needs nothing — Spark's collect_list
    // already skips NULLs. (BigQuery ERRORS on null elements without
    // IGNORE NULLS where Spark drops them — error-vs-drop only,
    // never a silent wrong value.)
    out = rewriteCall(out, "ARRAY_AGG") { args =>
      if (args.size != 1) None
      else {
        var a = args.head
        var ignoreNulls = false
        val ig = findTopLevelKeyword(a, "IGNORE")
        if (ig >= 0) {
          val byAt = findTopLevelKeyword(a, "NULLS", ig + 6)
          if (byAt == ig + 7 || (byAt > 0 &&
              a.substring(ig + 6, byAt).trim.isEmpty)) {
            ignoreNulls = true
            a = (a.substring(0, ig) + a.substring(byAt + 5)).trim
          }
        }
        val p = findTopLevelKeyword(a, "ORDER")
        if (p < 0) {
          if (ignoreNulls) Some(s"array_agg($a)") else None
        } else {
          val byAt = findTopLevelKeyword(a, "BY", p + 5)
          if (byAt < 0 || findTopLevelKeyword(a, "LIMIT") >= 0) None
          else {
            val rawArg = a.substring(0, p).trim
            val distinct = rawArg.toUpperCase.startsWith("DISTINCT ")
            val x = if (distinct) rawArg.substring(9).trim else rawArg
            sortAwareCollect(x, a.substring(byAt + 2).trim, distinct)
              .map(s0 => if (ignoreNulls)
                s"filter($s0, __iv -> __iv IS NOT NULL)" else s0)
          }
        }
      }
    }
    out = rewriteArraySubscripts(out)
    // STRING_AGG(x[, sep] ORDER BY k) → WITHIN GROUP form (Spark's
    // string_agg/listagg take the ordering outside the argument list)
    out = rewriteCall(out, "STRING_AGG") { args =>
      val idx = args.indexWhere(a => findTopLevelKeyword(a, "ORDER") >= 0)
      if (idx < 0) None
      else {
        val a = args(idx)
        val p = findTopLevelKeyword(a, "ORDER")
        val byAt = findTopLevelKeyword(a, "BY", p + 5)
        if (byAt < 0 || findTopLevelKeyword(a, "LIMIT") >= 0) None
        else {
          val head = a.substring(0, p).trim
          val ob = a.substring(p).trim
          val newArgs = args.take(idx) ++
            (if (head.nonEmpty) Seq(head) else Nil) ++ args.drop(idx + 1)
          Some(s"string_agg(${newArgs.mkString(", ")}) WITHIN GROUP ($ob)")
        }
      }
    }
    out = replaceToken(out, "SAFE_DIVIDE", "TRY_DIVIDE")
    out = replaceToken(out, "SAFE_ADD", "TRY_ADD")
    out = replaceToken(out, "SAFE_SUBTRACT", "TRY_SUBTRACT")
    out = replaceToken(out, "SAFE_MULTIPLY", "TRY_MULTIPLY")
    out = replaceToken(out, "SAFE_CAST", "TRY_CAST")
    // printf-style FORMAT → format_string (literal format only: FORMAT
    // with date parts etc. goes to the repair loop)
    out = rewriteCall(out, "FORMAT") {
      case args @ (fmt +: _) if fmtLit(fmt).exists(_.contains("%")) =>
        Some(s"format_string(${args.mkString(", ")})")
      case _ => None
    }
    // GENERATE_DATE_ARRAY(start, end[, INTERVAL n unit]) → sequence
    // over dates (Spark sequence steps dates by interval; default 1 day)
    out = rewriteCall(out, "GENERATE_DATE_ARRAY") {
      case Seq(a, b) => Some(s"sequence(CAST($a AS DATE), CAST($b AS DATE))")
      case Seq(a, b, iv) if parseInterval(iv).isDefined =>
        val (nIv, unit) = parseInterval(iv).get
        Some(s"sequence(CAST($a AS DATE), CAST($b AS DATE), INTERVAL $nIv ${unit.toUpperCase})")
      case _ => None
    }
    out = replaceToken(out, "COUNTIF", "COUNT_IF")
    out = replaceToken(out, "REGEXP_CONTAINS", "REGEXP_LIKE")
    out = replaceToken(out, "STARTS_WITH", "STARTSWITH")
    out = replaceToken(out, "ENDS_WITH", "ENDSWITH")
    out = replaceToken(out, "ARRAY_LENGTH", "ARRAY_SIZE")
    out = replaceToken(out, "ARRAY_CONCAT", "CONCAT")
    out = replaceToken(out, "ARRAY_REVERSE", "REVERSE")
    out = replaceToken(out, "ARRAY_TO_STRING", "ARRAY_JOIN")
    out = replaceToken(out, "GENERATE_ARRAY", "SEQUENCE")
    out = replaceToken(out, "LOGICAL_AND", "BOOL_AND")
    out = replaceToken(out, "LOGICAL_OR", "BOOL_OR")
    // BigQuery LOG(x, base) is VALUE-FIRST; Spark's log(base, x) is
    // base-first — a pass-through would silently compute the wrong
    // logarithm. Emitted as ln(x)/ln(base) (Spark's own Logarithm is
    // exactly this division) so the output cannot re-match this arm —
    // `log(b, x)` would swap again on every re-transpile. 1-arg LOG
    // (natural log) matches Spark and passes through.
    out = rewriteCall(out, "LOG") {
      case Seq(x, b) => Some(s"(ln($x) / ln($b))")
      case _ => None
    }
    // array element access ([OFFSET]/[ORDINAL]/SAFE_ forms) is handled
    // by rewriteArraySubscripts (lexical, call-shaped bases included —
    // the exemplar corpus carries `transform(...)[SAFE_OFFSET(0)]`,
    // big_query/example_88, which a regex base could never capture)
    // CONTAINS_SUBSTR: case-insensitive containment (BigQuery also
    // NFKC-normalizes — divergence only on exotic codepoints)
    out = rewriteCall(out, "CONTAINS_SUBSTR") {
      case Seq(a, b) => Some(s"(instr(lower($a), lower($b)) > 0)")
      case _ => None
    }
    // ---- batch 8 ----------------------------------------------------
    // STRPOS(string, substring) — same contract as instr (1-based,
    // 0 when absent, NULL in → NULL out)
    out = rewriteCall(out, "STRPOS") {
      case Seq(a, b) => Some(s"instr($a, $b)"); case _ => None
    }
    // TO_HEX over a digest call: BigQuery's MD5/SHA* return BYTES, so
    // the canonical TO_HEX(MD5(x)) spelling collapses onto Spark's
    // hex-STRING digests (lowercase hex on both sides). A TO_HEX over
    // anything else keeps BYTES semantics Spark cannot see at the
    // string level — repair loop.
    out = rewriteCall(out, "TO_HEX") {
      case Seq(inner) =>
        val t = inner.trim
        "(?is)^(MD5|SHA1|SHA256|SHA512)\\s*\\(".r.findPrefixMatchOf(t)
          .flatMap { pm =>
            val tg = lex(t)
            val open = pm.end - 1
            val close = matchParen(t, tg, open)
            if (close != t.length - 1) None // not a single whole call
            else {
              val arg = t.substring(open + 1, close)
              pm.group(1).toUpperCase match {
                case "MD5" => Some(s"md5($arg)")
                case "SHA1" => Some(s"sha1($arg)")
                case "SHA256" => Some(s"sha2($arg, 256)")
                case _ => Some(s"sha2($arg, 512)")
              }
            }
          }
      case _ => None
    }
    // BigQuery LEAST/GREATEST return NULL when ANY argument is NULL —
    // Spark's skip NULLs (and so return the non-null extreme). The
    // arguments ride in ONE array literal (a transform over a
    // singleton array-of-array gives the lambda a binding for it), so
    // each argument appears — and is evaluated — exactly once: a CASE
    // with a per-argument IS NULL chain would duplicate every argument
    // and grow 2^depth on nested LEAST(GREATEST(...)) clamps. The
    // emission carries neither function's token, so the wrap cannot
    // re-apply on re-transpile; array_min/array_max equal the natives
    // on the all-non-null branch.
    def nullPropagatingExtreme(name: String, arrFn: String): Unit =
      out = rewriteCall(out, name) {
        case args if args.size >= 2 =>
          Some(s"element_at(transform(array(array(${args.mkString(", ")})), " +
            "__ga -> IF(forall(__ga, __gx -> __gx IS NOT NULL), " +
            s"$arrFn(__ga), NULL)), 1)")
        case _ => None
      }
    nullPropagatingExtreme("LEAST", "array_min")
    nullPropagatingExtreme("GREATEST", "array_max")
    // JSON_EXTRACT_STRING_ARRAY / JSON_VALUE_ARRAY: scalar elements as
    // UNQUOTED strings (numbers as their decimal text); a non-scalar
    // element NULLs out (TRY_CAST) rather than carrying JSON text —
    // the string-cast sibling of the JSON_EXTRACT_ARRAY arm above
    Seq("JSON_EXTRACT_STRING_ARRAY", "JSON_VALUE_ARRAY").foreach { name =>
      // Spark's variant→string cast STRINGIFIES objects/arrays (JSON
      // text) where BigQuery's scalar extraction nulls them — guard on
      // schema_of_variant's OBJECT</ARRAY< prefixes
      val elem = "__gx -> CASE WHEN schema_of_variant(__gx) LIKE 'OBJECT%' " +
        "OR schema_of_variant(__gx) LIKE 'ARRAY%' THEN CAST(NULL AS STRING) " +
        "ELSE TRY_CAST(__gx AS string) END"
      out = rewriteCall(out, name) {
        case Seq(j) => Some("transform(try_cast(variant_get(" +
          s"try_parse_json($j), '$$') AS array<variant>), $elem)")
        case Seq(j, p) if fmtLit(p).isDefined =>
          Some("transform(try_cast(variant_get(" +
            s"try_parse_json($j), $p) AS array<variant>), $elem)")
        case _ => None
      }
    }
    // IEEE_DIVIDE(a, b): BigQuery returns IEEE Infinity/NaN on a zero
    // divisor where Spark's `/` yields NULL. NULL arguments stay NULL;
    // a NaN numerator stays NaN (tested BEFORE the sign tests — Spark
    // orders NaN greater than every value, so `NaN > 0` is true and
    // would otherwise read as Infinity). The negative-ZERO divisor
    // corner keeps the positive sign here (BigQuery: -Infinity) — a
    // documented divergence, not a silent claim; 0/0 is NaN on both.
    out = rewriteCall(out, "IEEE_DIVIDE") {
      case Seq(a, b) => Some(
        s"(CASE WHEN ($a) IS NULL OR ($b) IS NULL THEN CAST(NULL AS DOUBLE) " +
          s"WHEN CAST($b AS DOUBLE) = 0.0D THEN " +
          s"CASE WHEN isnan(CAST($a AS DOUBLE)) THEN CAST('NaN' AS DOUBLE) " +
          s"WHEN CAST($a AS DOUBLE) > 0.0D THEN CAST('Infinity' AS DOUBLE) " +
          s"WHEN CAST($a AS DOUBLE) < 0.0D THEN CAST('-Infinity' AS DOUBLE) " +
          "ELSE CAST('NaN' AS DOUBLE) END " +
          s"ELSE CAST($a AS DOUBLE) / CAST($b AS DOUBLE) END)")
      case _ => None
    }
    // REGEXP_INSTR — same contract as Snowflake's (shared helper)
    out = rewriteRegexpInstr(out)
    // GENERATE_TIMESTAMP_ARRAY(start, end, INTERVAL n unit) → sequence
    // (the timestamp sibling of GENERATE_DATE_ARRAY above; the step is
    // REQUIRED in BigQuery)
    out = rewriteCall(out, "GENERATE_TIMESTAMP_ARRAY") {
      case Seq(a, b, iv) if parseInterval(iv).isDefined =>
        val (nIv, unit) = parseInterval(iv).get
        Some(s"sequence(CAST($a AS TIMESTAMP), CAST($b AS TIMESTAMP), " +
          s"INTERVAL $nIv ${unit.toUpperCase})")
      case _ => None
    }
    // JSON scalar accessors INT64/FLOAT64/BOOL (+ the LAX_ family
    // below, which nulls instead of erroring): the argument is
    // JSON text here (the JSON_QUERY/JSON_EXTRACT arms above emit
    // to_json output), so parse back to a variant and cast. STRING's
    // strict form is deliberately NOT mapped — it shares its name with
    // the timestamp formatter STRING(ts[, tz]), indistinguishable at
    // the string level; LAX_STRING is JSON-only and safe. Documented
    // error-path divergence on the STRICT forms: BigQuery ERRORS on a
    // type mismatch (INT64 of a json string) where Spark's variant
    // cast coerces numeric strings and throws only on non-numeric —
    // laxer, never silently different on inputs BigQuery accepts.
    Seq(("INT64", "BIGINT"), ("FLOAT64", "DOUBLE"), ("BOOL", "BOOLEAN"))
      .foreach { case (fn, t) =>
        out = rewriteCall(out, fn) {
          case Seq(j) => Some(s"CAST(try_parse_json($j) AS $t)")
          case _ => None
        }
      }
    // LAX_ conversion sets, not a bare TRY_CAST: LAX returns NULL —
    // never an error and never a stringified composite — outside each
    // accessor's set. schema_of_variant guards route objects/arrays
    // (and for BOOL, numbers) to NULL where a variant cast would
    // stringify, truncate, or read a number as a boolean; LAX_INT64
    // rounds half-away-from-zero like BigQuery via the double route
    // (which also converts numeric strings and booleans). One binding
    // of the parsed variant via the singleton-transform trick (the
    // LEAST/GREATEST pattern above), so the input parses once.
    def laxArm(fn: String)(body: String => String): Unit =
      out = rewriteCall(out, fn) {
        case Seq(j) =>
          Some(s"element_at(transform(array(try_parse_json($j)), " +
            s"__gv -> ${body("__gv")}), 1)")
        case _ => None
      }
    def scalarGuard(v: String, t: String, conv: String): String =
      s"CASE WHEN schema_of_variant($v) LIKE 'OBJECT%' " +
        s"OR schema_of_variant($v) LIKE 'ARRAY%' THEN CAST(NULL AS $t) " +
        s"ELSE $conv END"
    laxArm("LAX_STRING")(v =>
      scalarGuard(v, "STRING", s"TRY_CAST($v AS STRING)"))
    laxArm("LAX_FLOAT64")(v =>
      scalarGuard(v, "DOUBLE", s"TRY_CAST($v AS DOUBLE)"))
    laxArm("LAX_INT64")(v => scalarGuard(v, "BIGINT",
      // integer-schema variants cast DIRECTLY — the double route would
      // silently corrupt values above 2^53 that BigQuery returns
      // exactly; everything else (fractions, numeric strings,
      // booleans) takes the rounding double route
      s"CASE WHEN schema_of_variant($v) IN " +
        "('TINYINT', 'SMALLINT', 'INT', 'BIGINT') " +
        s"THEN TRY_CAST($v AS BIGINT) " +
        s"ELSE TRY_CAST(round(TRY_CAST($v AS DOUBLE)) AS BIGINT) END"))
    laxArm("LAX_BOOL")(v =>
      s"CASE WHEN schema_of_variant($v) LIKE 'BOOLEAN%' " +
        s"THEN TRY_CAST($v AS BOOLEAN) " +
        s"WHEN schema_of_variant($v) = 'STRING' THEN " +
        s"CASE lower(TRY_CAST($v AS STRING)) WHEN 'true' THEN true " +
        "WHEN 'false' THEN false ELSE CAST(NULL AS BOOLEAN) END " +
        "ELSE CAST(NULL AS BOOLEAN) END")
    // civil constructors: DATE(y, m, d) and the 6-argument DATETIME —
    // the 1-arg conversion forms are native Spark casts already
    out = rewriteCall(out, "DATE") {
      case Seq(y, mo, d) => Some(s"make_date($y, $mo, $d)")
      case _ => None
    }
    out = rewriteCall(out, "DATETIME") {
      case Seq(y, mo, d, h, mi, s0) =>
        Some(s"make_timestamp($y, $mo, $d, $h, $mi, $s0)")
      case _ => None
    }
    // TABLESAMPLE SYSTEM (10 PERCENT) → Spark's TABLESAMPLE
    out = guarded(out, "(?i)\\bTABLESAMPLE\\s+SYSTEM\\b".r)(_ => "TABLESAMPLE")
    out = replaceToken(out, "CURRENT_DATETIME", "CURRENT_TIMESTAMP")
    out = rewriteBqTypes(out)
    transpile(out)
  }

  /** sqlite-strict variant: sqlite's LIKE is ASCII-case-insensitive by
    * default, Spark's is case-sensitive — a silent row-set difference
    * on every text predicate. Word-bounded LIKE → ILIKE (NOT ILIKE is
    * valid Spark, and the 'I' prefix keeps an existing ILIKE token out
    * of the rewriter's word boundary). Double-quoted tokens resolve via
    * `rewriteDoubleQuoted` FIRST (so literal-ized ones are then opaque
    * to every later rewrite); integer-division semantics need the
    * analyzed plan and live in `SqliteExec.sql`.
    */
  def transpileSqlite(sql: String): String = transpileSqlite(sql, Set.empty)

  def transpileSqlite(sql: String, identifiers: Set[String]): String =
    healedThen(truncateAtStatementEnd(sql)) { s =>
      replaceToken(
        transpile(rewriteBareGroupBy(rewriteDoubleQuoted(s, identifiers))),
        "LIKE", "ILIKE")
    }

  /** Dialect name → rewrite (the reference Engine.dialect values the
    * executors target, `core/db_connect.py:49-136`). sqlite's
    * integer-division semantics additionally need the analyzed plan —
    * callers with a session route "sqlite" through `SqliteExec.sql`;
    * this lexical arm is the sessionless fallback.
    */
  def forDialect(dialect: String): String => String =
    dialect.toLowerCase match {
      // "big_query" is the reference's own db_type spelling
      // (core/db_connect.py:139-147)
      case "snowflake" | "snow"            => transpileSnowflake
      case "bigquery" | "bq" | "big_query" => transpileBigQuery
      case "sqlite"             => transpileSqlite(_: String)
      case _                    => transpile
    }

  /** Cut everything after the first top-level statement terminator:
    * several exemplar `# [Sql]:` lines carry post-statement prose
    * (big_query/example_60: `... LIMIT 1;   2. **Schema Compliance**:
    * ...`). A lone trailing `;` is left for the normal stripSuffix.
    */
  private def truncateAtStatementEnd(sql: String): String = {
    val tagged = lex(sql)
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == ';' && tagged(i)._2 == Code)
        return if (sql.substring(i + 1).trim.nonEmpty) sql.substring(0, i)
          else sql
      i += 1
    }
    sql
  }

  /** Trailing commas BigQuery/Snowflake accept but Spark does not:
    * a select-list comma directly before FROM (big_query/example_24)
    * and a dangling comma after the last CTE before the main SELECT
    * (snowflake/example_291). Neither shape is ever valid Spark, so
    * the rewrite can only fix.
    */
  private def rewriteTrailingCommas(sql: String): String = {
    val a = guarded(sql, """,\s*(?=(?i:FROM)\b)""".r)(_ => " ")
    guarded(a, """\)\s*,\s*(?=(?i:SELECT)\b)""".r)(_ => ") ")
  }

  /** A single ORPHAN close-paren at the very end of the statement
    * (snowflake/example_288 ends `... LIMIT 1 )` with 40 opens / 41
    * closes): dropped iff the rest of the statement is internally
    * balanced — i.e. depth only dips negative AT the final char.
    */
  private def healTrailingParen(sql: String): String = {
    val t = sql.trim
    if (t.isEmpty || t.last != ')') return sql
    val tagged = lex(t)
    if (tagged.last._3 != -1) return sql
    var i = 0
    while (i < tagged.length - 1) {
      if (tagged(i)._3 < 0) return sql
      i += 1
    }
    t.substring(0, t.length - 1).trim
  }

  /** ANSI `FETCH {FIRST|NEXT} n {ROW|ROWS} ONLY` → LIMIT n (Spark has
    * no FETCH clause; Spider2-lite statements in the reference's
    * sqlite exemplar pool carry it — sqlite/example_301).
    */
  private def rewriteFetchFirst(sql: String): String =
    guarded(sql,
      """(?i)\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY\b""".r)(
      m => s"LIMIT ${m.group(1)}")

  /** `USING ('col1', 'col2')` — quoted column names inside USING are
    * accepted by Snowflake/DuckDB but not Spark; strip to identifiers
    * (sqlite/example_296: `USING ('category_id')`). Only fires when
    * every element is quoted-identifier-shaped, so a genuine function
    * call named USING is untouched.
    */
  private def rewriteUsingQuoted(sql: String): String =
    guarded(sql, """(?i)\bUSING\s*\(\s*('[^')]+'(?:\s*,\s*'[^')]+')*)\s*\)""".r) {
      m =>
        val cols = m.group(1).split(",").map(_.trim.stripPrefix("'")
          .stripSuffix("'"))
        val ids = cols.map(c =>
          if (c.matches("[A-Za-z_][A-Za-z0-9_]*")) c
          else "`" + c.replace("`", "``") + "`")
        s"USING (${ids.mkString(", ")})"
    }

  /** `AS 'alias text'` → backtick alias: sqlite tolerates single-quoted
    * aliases (sqlite/example_101: `AS 'number of product being
    * viewed'`); `AS` followed directly by a string literal is never
    * valid Spark, so the rewrite can only fix.
    */
  private def rewriteQuotedAlias(sql: String): String =
    guarded(sql, """(?i)\bAS\s+'((?:[^']|'')+)'""".r)(
      m => "AS `" + m.group(1).replace("''", "'").replace("`", "``") + "`")

  /** Full rewrite pipeline. Idempotent. */
  def transpile(sql: String): String = {
    var out = truncateAtStatementEnd(sql).trim.stripSuffix(";")
    out = rewriteTrailingCommas(out)
    out = healTrailingParen(out)
    out = rewriteFetchFirst(out)
    out = rewriteUsingQuoted(out)
    out = rewriteQuotedAlias(out)
    // Spider2-lite pools mix dialects: the sqlite exemplar dir carries
    // Snowflake-style JSON-text paths (PARSE_JSON(x):'en' —
    // sqlite/example_287); the pass no-ops without the token.
    if (containsToken(out, "PARSE_JSON")) out = rewriteParseJsonPaths(out)
    // ... and DuckDB-style DATEDIFF('unit', a, b) (sqlite/example_296)
    // — QUOTED literal unit only (a bare first arg could be a column
    // of a 3-arg UDF), boundary-counting like DuckDB/Snowflake.
    out = rewriteCall(out, "DATEDIFF") {
      case Seq(u, a, b) if u.trim.startsWith("'") =>
        normUnit(u).map(dateDiffSql(_, a, b))
      case _ => None
    }
    // ... and single-quoted table aliases (sqlite/example_303:
    // `FROM RENTAL 're' JOIN STAFF 'st'`)
    out = guarded(out,
      """(?i)\b(FROM|JOIN)(\s+)([A-Za-z_][A-Za-z0-9_.`]*)(\s+)'([A-Za-z_][A-Za-z0-9_]*)'""".r)(
      m => s"${m.group(1)}${m.group(2)}${m.group(3)}${m.group(4)}`${m.group(5)}`")
    out = rewriteQualify(out)
    out = rewriteStrftime(out)
    out = rewriteSqliteDates(out)
    out = rewriteCharindex(out)
    out = rewriteGroupConcat(out)
    out = rewriteTypes(out)
    tokenMap.foreach { case (from, to) =>
      if (to.nonEmpty) out = replaceToken(out, from, to)
    }
    out
  }
}

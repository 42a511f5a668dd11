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
          if (c == '\'' && !(i + 1 < sql.length && sql.charAt(i + 1) == '\'')) region = Code
          else if (c == '\'') { out += ((sql.charAt(i + 1), SingleQ, depth)); i += 1 }
        case DoubleQ =>
          out += ((c, DoubleQ, depth))
          if (c == '"') region = Code
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
  private def findTopLevelKeyword(sql: String, kw: String, from: Int = 0): Int = {
    val tagged = lex(sql)
    val upper = sql.toUpperCase
    var i = math.max(from, 0)
    while (i >= 0) {
      i = upper.indexOf(kw.toUpperCase, i)
      if (i < 0) return -1
      val inCode = tagged(i)._2 == Code && tagged(i)._3 == 0
      val leftOk = i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1)) && sql.charAt(i - 1) != '_'
      val r = i + kw.length
      val rightOk = r >= sql.length || !Character.isLetterOrDigit(sql.charAt(r)) && sql.charAt(r) != '_'
      if (inCode && leftOk && rightOk) return i
      i = i + 1
    }
    -1
  }

  /** Case-insensitive, literal-safe function-name / token replacement. */
  private def replaceToken(sql: String, from: String, to: String): String = {
    val tagged = lex(sql)
    val upper = sql.toUpperCase
    val target = from.toUpperCase
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = upper.startsWith(target, i)
      val inCode = tagged(i)._2 == Code
      val leftOk = i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) && sql.charAt(i - 1) != '_')
      val r = i + target.length
      val rightOk = r >= sql.length || (!Character.isLetterOrDigit(sql.charAt(r)) && sql.charAt(r) != '_')
      if (at && inCode && leftOk && rightOk) { sb.append(to); i += target.length }
      else { sb.append(sql.charAt(i)); i += 1 }
    }
    sb.toString
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
    strftimeRe.replaceAllIn(sql, m => {
      val fmt = m.group(1)
      val arg = m.group(2)
      strftimeFormats.get(fmt) match {
        case Some(sparkFmt) =>
          java.util.regex.Matcher.quoteReplacement(s"date_format($arg, '$sparkFmt')")
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
    })

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
    groupConcatRe.replaceAllIn(sql, m => {
      val sep = Option(m.group(2)).getOrElse(",")
      java.util.regex.Matcher.quoteReplacement(
        s"array_join(collect_list(${m.group(1)}), '$sep')")
    })

  /** CAST(x AS <alien type>) mappings. */
  private def rewriteTypes(sql: String): String =
    sql.replaceAll("(?i)\\bAS\\s+TEXT\\b", "AS STRING")
      .replaceAll("(?i)\\bAS\\s+REAL\\b", "AS DOUBLE")
      .replaceAll("(?i)\\bAS\\s+INTEGER\\b", "AS INT")
      .replaceAll("(?i)\\bAS\\s+NUMERIC\\b", "AS DOUBLE")

  /** CHARINDEX(needle, haystack) → INSTR(haystack, needle): T-SQL's
    * argument order is the REVERSE of Spark's instr — a bare rename
    * would silently return wrong positions.
    */
  private val charindexRe =
    """(?i)\bCHARINDEX\s*\(\s*([^(),]+?)\s*,\s*([^(),]+?)\s*\)""".r

  private def rewriteCharindex(sql: String): String =
    charindexRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"INSTR(${m.group(2)}, ${m.group(1)})"))

  /** sqlite date idioms:
    * DATE('now') → current_date(); DATETIME('now') → current_timestamp();
    * DATE('now', '±N day/month/year') → date_add/add_months arithmetic;
    * julianday(x) → days-since-epoch + 2440587.5 (so julianday
    * differences come out exactly as datediff).
    */
  private val dateNowModRe =
    """(?i)\b(DATE|DATETIME)\s*\(\s*'now'\s*(?:,\s*'([+-]?\d+)\s+(day|days|month|months|year|years)'\s*)?\)""".r

  private def rewriteSqliteDates(sql: String): String = {
    val withNow = dateNowModRe.replaceAllIn(sql, m => {
      val base = if (m.group(1).equalsIgnoreCase("DATE")) "current_date()" else "current_timestamp()"
      val repl = Option(m.group(2)) match {
        case None => base
        case Some(n) =>
          val amount = n.toInt
          m.group(3).toLowerCase match {
            case d if d.startsWith("day") => s"date_add($base, $amount)"
            case mo if mo.startsWith("month") => s"add_months($base, $amount)"
            case _ => s"add_months($base, ${amount * 12})"
          }
      }
      java.util.regex.Matcher.quoteReplacement(repl)
    })
    """(?i)\bjulianday\s*\(\s*([^()]*?)\s*\)""".r.replaceAllIn(withNow, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"(CAST(datediff(${m.group(1)}, DATE'1970-01-01') AS DOUBLE) + 2440587.5)"))
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
      if (c == '\'') { // copy single-quoted literals verbatim ('' escape)
        sb.append(c); i += 1
        var done = false
        while (i < n && !done) {
          sb.append(sql.charAt(i))
          if (sql.charAt(i) == '\'') {
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
    replaceToken(transpile(rewriteDoubleQuoted(sql, identifiers)), "LIKE", "ILIKE")

  /** Full rewrite pipeline. Idempotent. */
  def transpile(sql: String): String = {
    var out = sql.trim.stripSuffix(";")
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

package graft.text

/** SQL-text utilities (reference `core/utils.py:225-234`,
  * `DAILSQLGenerate.py:30-200`): cleaning, normalization, skeleton
  * extraction, token-set Jaccard. Pure driver-side string work — these
  * feed few-shot selection and prompt construction, never a Spark plan.
  */
object SqlText {

  /** Strip markdown fences / "sql" tags / escaped newlines from LLM
    * output (`sql_clean`, `core/utils.py:225-234`).
    */
  def clean(rawSql: String): String =
    // strip the FENCE TAG only — deleting every "sql" substring would
    // mangle identifiers and literals ("mysql", sql_text, …)
    rawSql
      .replace("\\n", " ")
      .replace("\n", " ")
      .replace("```sql", "")
      .replace("```", "")
      .trim
      .replaceAll("(?i)^sql\\b\\s*", "") // bare leading tag some LLMs emit
      .trim

  /** Token-set Jaccard over whitespace tokens
    * (`jaccard_similarity`, `DAILSQLGenerate.py:30-34`).
    */
  def jaccard(s1: String, s2: String): Double = {
    val a = s1.split("\\s+").filter(_.nonEmpty).toSet
    val b = s2.split("\\s+").filter(_.nonEmpty).toSet
    if (a.isEmpty && b.isEmpty) 0.0
    else (a & b).size.toDouble / (a | b).size
  }

  /** Tokenize SQL preserving quoted strings as single tokens and
    * splitting punctuation (the reference leans on sql_metadata's
    * tokenizer; this is a self-contained equivalent).
    */
  def tokenize(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val s = sql
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val end = s.indexOf('\'', i + 1)
        val stop = if (end == -1) s.length - 1 else end
        out += s.substring(i, stop + 1)
        i = stop + 1
      } else if (c.isLetterOrDigit || c == '_' || c == '.') {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
          s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        out += s.substring(start, i)
      } else if ("<>!=".contains(c) && i + 1 < s.length && s.charAt(i + 1) == '=') {
        out += s.substring(i, i + 2); i += 2
      } else {
        out += c.toString; i += 1
      }
    }
    out.toSeq
  }

  /** Normalize SQL text (`sql_normalization`, `DAILSQLGenerate.py:36-137`):
    * trim + drop trailing semicolon, double→single quotes, lowercase
    * outside string literals, single-space tokens, add ASC to bare
    * ORDER BY, drop `AS alias` clauses and resolve `tN`-style alias
    * references back to table names.
    */
  def normalize(sql: String): String = {
    var s = sql.trim
    if (s.endsWith(";")) s = s.dropRight(1)
    s = s.replace('"', '\'')
    // lowercase outside single-quoted literals
    val sb = new StringBuilder
    var inQ = false
    s.foreach { c =>
      sb.append(if (inQ) c else c.toLower)
      if (c == '\'') inQ = !inQ
    }
    var toks = tokenize(sb.toString)

    // collect aliases: FROM/JOIN <table> [as] <alias>
    val aliases = scala.collection.mutable.Map[String, String]()
    toks.sliding(3).foreach {
      case Seq(kw, table, alias)
        if (kw == "from" || kw == "join") &&
          alias.matches("[a-z_][a-z0-9_]*") &&
          !SqlKeywords.contains(alias) =>
        aliases(alias) = table
      case _ =>
    }
    toks.sliding(2).zipWithIndex.foreach { case (pair, i) => pair match {
      case Seq(a, alias) if a == "as" && i > 0 &&
        alias.matches("[a-z_][a-z0-9_]*") =>
        // "<name> as <alias>" — the aliased thing must itself be an
        // identifier: "count ( * ) as cnt" must NOT record ")" as the
        // target or every later cnt reference is rewritten to ")"
        if (i - 1 >= 0 && !SqlKeywords.contains(toks(i - 1)) &&
            toks(i - 1).matches("[a-z_][a-z0-9_.]*"))
          aliases(alias) = toks(i - 1)
      case _ =>
    }}
    // drop "as alias" pairs, rewrite alias refs and alias.col
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var skipNext = false
    toks.indices.foreach { i =>
      val t = toks(i)
      if (skipNext) skipNext = false
      else if (t == "as" && i + 1 < toks.length && aliases.contains(toks(i + 1))) skipNext = true
      else if (aliases.contains(t) && i > 0 && aliases(t) == toks(i - 1)) () // "table alias"
      else if (aliases.contains(t)) out += aliases(t)
      else if (t.contains(".")) {
        val parts = t.split("\\.", -1).map(p => aliases.getOrElse(p, p))
        out += parts.mkString(".")
      } else out += t
    }
    var res = out.mkString(" ")
    // add asc to a bare order by — word-boundary check, or tokens like
    // "ascii" would suppress the append
    if (res.contains("order by") &&
        !res.substring(res.indexOf("order by")).matches(".*\\b(asc|desc)\\b.*"))
      res = res + " asc"
    res.replaceAll("\\s+", " ").trim
  }

  private val SqlKeywords = Set(
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "join", "inner", "left", "right", "full", "outer", "on", "as", "and",
    "or", "not", "in", "exists", "union", "intersect", "except", "distinct",
    "asc", "desc", "case", "when", "then", "else", "end", "between", "like")

  /** SQL skeleton (`sql2skeleton`, `DAILSQLGenerate.py:139-200`):
    * normalize, replace schema identifiers / literals / numbers with
    * `_`, then collapse join/where/select chains.
    */
  def skeleton(sql: String, tables: Set[String], columns: Set[String]): String = {
    val tabs = tables.map(_.toLowerCase)
    val cols = columns.map(_.toLowerCase) + "*"
    val tabCols = for (t <- tabs; c <- cols) yield s"$t.$c"
    val toks = tokenize(normalize(sql)).map { t =>
      if (tabs(t) || cols(t) || tabCols(t)) "_"
      else if (t.startsWith("'") && t.endsWith("'")) "_"
      else if (t.matches("-?\\d+(\\.\\d+)?")) "_"
      else t
    }
    var s = toks.mkString(" ")
    s = s.replace("on _ = _ and _ = _", "on _ = _")
      .replace("on _ = _ or _ = _", "on _ = _")
      .replace(" on _ = _", "")
    s = s.replaceAll("_ (?:join _ ?)+", "_ ")
    while (s.contains("_ , _")) s = s.replace("_ , _", "_")
    Seq("=", "!=", ">", ">=", "<", "<=").foreach { op =>
      while (s.contains(s"_ $op _")) s = s.replace(s"_ $op _", "_")
    }
    while (s.contains("where _ and _") || s.contains("where _ or _"))
      s = s.replace("where _ and _", "where _").replace("where _ or _", "where _")
    s = s.replaceAll("\\s+", " ").trim
    // anything after ORDER BY collapses to _
    val parts = s.split(" ").toArray
    (2 until parts.length).foreach { i =>
      if (parts(i - 2) == "order" && parts(i - 1) == "by" && parts(i) != "_")
        parts(i) = "_"
    }
    parts.mkString(" ")
  }

  /** Tolerant list extraction from LLM output
    * (`parse_list_from_str`, `core/utils.py:18-27`): find the first
    * [...] block, split on commas outside quotes, strip quotes.
    */
  def parseList(raw: String): Seq[String] = {
    val start = raw.indexOf('[')
    val end = raw.lastIndexOf(']')
    if (start == -1 || end <= start) return Nil
    val body = raw.substring(start + 1, end)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var q = ' '
    body.foreach { c =>
      if (inQ) { if (c == q) inQ = false else cur.append(c) }
      else if (c == '\'' || c == '"') { inQ = true; q = c }
      else if (c == ',') { out += cur.toString.trim; cur.clear() }
      else cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  /** Tolerant key-value extraction from LLM "JSON-ish" output
    * (`parse_json_from_str` analog): string-valued pairs only.
    */
  def parseJsonish(raw: String): Map[String, String] = {
    val pat = """["']([^"']+)["']\s*:\s*["']([^"']*)["']""".r
    pat.findAllMatchIn(raw).map(m => m.group(1) -> m.group(2)).toMap
  }
}

package graft.queries

/** Shared DuckDB mirror of [[graft.operators.RepetitionRules]] — ONE
  * definition of the unit hashing, counting, and fraction arithmetic,
  * consumed by both the standalone `q_repetition_rules` oracle and the
  * composed pipeline oracle (which gates on it mid-chain). n-gram
  * identity is the polynomial combination of per-token fingerprints
  * (base 1000003 mod 1e9+7 — pure integer arithmetic on both engines),
  * exactly the Spark side's hash; unit strings are never built.
  */
private[queries] object RepetitionOracles {

  val B = 1000003L
  val P = 1000000007L

  /** (canonical fraction column, Gopher threshold in micro units). */
  val Checks: Seq[(String, Long)] = Seq(
    "dup_line_frac_micro" -> 300000L,
    "dup_line_char_frac_micro" -> 200000L,
    "top2gram_char_frac_micro" -> 200000L,
    "top3gram_char_frac_micro" -> 180000L,
    "top4gram_char_frac_micro" -> 160000L,
    "dup5gram_char_frac_micro" -> 150000L,
    "dup10gram_char_frac_micro" -> 100000L)

  private val Ns = Seq(2, 3, 4, 5, 10)

  /** CTE chain over source relation `src` (must expose doc_id, text):
    * `${p}tk` (token lists), `${p}th` (per-token hash/len with leads),
    * `${p}units` (one hashed unit per occurrence), `${p}cnts`,
    * `${p}pk`, and `${p}f` (one row per doc with the canonical
    * fraction columns). Ends WITHOUT a trailing comma.
    */
  def ctes(src: String, p: String): String = {
    val maxN = Ns.max
    val leads = (1 until maxN).flatMap(j => Seq(
      s"lead(h0, $j) OVER (PARTITION BY doc_id ORDER BY pos) AS h$j",
      s"lead(tl, $j) OVER (PARTITION BY doc_id ORDER BY pos) AS tl$j"))
      .mkString(",\n|         ")
    def ng(n: Int) = {
      val h = (1 until n).foldLeft("h0")((acc, j) => s"(($acc) * $B + h$j) % $P")
      val len = (("tl" +: (1 until n).map(j => s"tl$j")).mkString(" + ")) +
        s" + ${n - 1}"
      s"""SELECT doc_id, '${n}gram' AS kind, $h AS h, $len AS ulen
         |FROM ${p}th WHERE h${n - 1} IS NOT NULL""".stripMargin
    }
    val fracs = Seq(
      ("dup_line_frac_micro", "line", "dup_units", "units"),
      ("dup_line_char_frac_micro", "line", "dup_chars", "chars"),
      ("top2gram_char_frac_micro", "2gram", "top_chars", "chars"),
      ("top3gram_char_frac_micro", "3gram", "top_chars", "chars"),
      ("top4gram_char_frac_micro", "4gram", "top_chars", "chars"),
      ("dup5gram_char_frac_micro", "5gram", "dup_chars", "chars"),
      ("dup10gram_char_frac_micro", "10gram", "dup_chars", "chars"))
      .map { case (out, kind, num, den) =>
        val n = s"MAX(CASE WHEN kind = '$kind' THEN $num END)"
        val d = s"MAX(CASE WHEN kind = '$kind' THEN $den END)"
        s"    CAST(CASE WHEN COALESCE($d, 0) > 0 THEN ($n * 1000000) // $d ELSE 0 END AS BIGINT) AS $out"
      }
      .mkString(",\n|")
    s"""${p}tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                             t2 -> length(t2) > 0) AS t
       |  FROM $src),
       |${p}tp AS (
       |  SELECT doc_id, u.p AS pos, u.tok AS tok
       |  FROM (SELECT doc_id, unnest(list_transform(t,
       |          (x, i) -> struct_pack(p := i, tok := x))) AS u
       |        FROM ${p}tk)),
       |${p}th AS (
       |  SELECT doc_id, pos,
       |         ${DedupOracles.polyHash("tok")} AS h0,
       |         CAST(length(tok) AS BIGINT) AS tl,
       |         $leads
       |  FROM ${p}tp),
       |${p}units AS (
       |  SELECT doc_id, 'line' AS kind, ${DedupOracles.polyHash("u")} AS h,
       |         CAST(length(u) AS BIGINT) AS ulen
       |  FROM (SELECT doc_id, unnest(list_filter(list_transform(
       |          string_split(text, chr(10)), l -> trim(l)),
       |          l -> l <> '')) AS u
       |        FROM $src)
       |${Ns.map(n => s"  UNION ALL ${ng(n)}").mkString("\n|")}),
       |${p}cnts AS (
       |  SELECT doc_id, kind, h, CAST(COUNT(*) AS BIGINT) AS cnt,
       |         CAST(MAX(ulen) AS BIGINT) AS ulen,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id, kind
       |           ORDER BY COUNT(*) DESC, h ASC) AS rn
       |  FROM ${p}units GROUP BY doc_id, kind, h),
       |${p}pk AS (
       |  SELECT doc_id, kind,
       |         SUM(cnt) AS units, SUM(cnt * ulen) AS chars,
       |         COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS dup_units,
       |         COALESCE(SUM(cnt * ulen) FILTER (cnt > 1), 0) AS dup_chars,
       |         MAX(CASE WHEN rn = 1 THEN cnt * ulen END) AS top_chars
       |  FROM ${p}cnts GROUP BY doc_id, kind),
       |${p}f AS (
       |  SELECT doc_id,
       |$fracs
       |  FROM ${p}pk GROUP BY doc_id)""".stripMargin
  }

  /** The pass condition over `${fAlias}` (a row of `${p}f`, possibly
    * NULL from a left join) and `${tkAlias}.t` (the token list) — the
    * 50-word floor OR every fraction at-or-below threshold.
    */
  def passCond(fAlias: String, tkAlias: String): String = {
    val all = Checks
      .map { case (c, t) => s"COALESCE($fAlias.$c, 0) <= $t" }
      .mkString(" AND ")
    s"(len($tkAlias.t) < 50 OR ($all))"
  }
}

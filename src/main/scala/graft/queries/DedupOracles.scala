package graft.queries

import graft.operators.TextDedup

/** Shared DuckDB oracle fragments mirroring the engine's text-hash
  * arithmetic (polynomial rolling hash mod 1e9+7, 3-gram shingles,
  * distinct-shingle Jaccard) — used by the dedup oracles and by any
  * composed pipeline whose oracle needs the same stages over a
  * different source relation.
  */
object DedupOracles {

  val P: Long = TextDedup.P

  /** Rolling polynomial hash of a string column named `sh`. */
  val polyHashSh: String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split(sh, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, c) -> (a * 31 + c) % $P)""".stripMargin

  /** Rolling polynomial hash of an arbitrary string expression. */
  def polyHash(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, c) -> (a * 31 + c) % $P)""".stripMargin

  /** CTE chain `toks → shl → s → sizes` computing distinct 3-gram
    * shingle hashes and per-doc shingle counts over `from` (a relation
    * with doc_id + text columns). Mirrors ShingleHashes + array_distinct.
    */
  def base(from: String): String = baseSfx(from, "")

  /** [[base]] with every CTE name suffixed (`toks$sfx` … `sizes$sfx`)
    * so one query can shingle several relations (a composed pipeline's
    * successive stages) without name collisions.
    */
  def baseSfx(from: String, sfx: String): String =
    s"""toks$sfx AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                             t -> length(t) > 0) AS tk
       |  FROM $from),
       |shl$sfx AS (
       |  SELECT doc_id,
       |         unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
       |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
       |  FROM toks$sfx),
       |s$sfx AS (SELECT DISTINCT doc_id, $polyHashSh AS h FROM shl$sfx),
       |sizes$sfx AS (SELECT doc_id, count(*) AS n FROM s$sfx GROUP BY doc_id)""".stripMargin

  /** CTE chain `toks$sfx → shl$sfx → s$sfx` computing distinct
    * n-gram shingle hashes over `from` for arbitrary n, with a name
    * suffix so two corpora (training vs eval) can coexist in one query.
    */
  def baseN(from: String, n: Int, sfx: String): String = {
    val terms = (0 until n).map(k => s"tk[i+$k]").mkString(", ")
    s"""toks$sfx AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                             t -> length(t) > 0) AS tk
       |  FROM $from),
       |shl$sfx AS (
       |  SELECT doc_id,
       |         unnest(list_transform(generate_series(1, greatest(len(tk) - ${n - 1}, 0)),
       |           i -> concat_ws(' ', $terms))) AS sh
       |  FROM toks$sfx),
       |s$sfx AS (SELECT DISTINCT doc_id, $polyHashSh AS h FROM shl$sfx)""".stripMargin
  }

  /** CTE chain `hs → sig → bnd` mirroring the MinHash signature and
    * 31-chain band folds (columns band0..band{bands-1}), on top of
    * `base`. Shared by the batch pair dedup and the streaming
    * suppressor's batch oracle.
    */
  def minhashBandCtes(h: Int = 16, bands: Int = 4, seed: Long = 42L): String =
    minhashBandCtesSfx(h, bands, seed, "")

  /** [[minhashBandCtes]] over the `sfx`-suffixed shingle chain, CTE
    * names suffixed to match.
    */
  def minhashBandCtesSfx(h: Int, bands: Int, seed: Long, sfx: String): String = {
    val coeffs = TextDedup.minhashCoeffs(h, seed)
    val mins = coeffs.zipWithIndex.map { case ((a, b), k) =>
      s"list_min(list_transform(hl, x -> ($a * x + $b) % $P)) AS m$k"
    }.mkString(",\n    ")
    val r = h / bands
    val bandExprs = (0 until bands).map { j =>
      val terms = (0 until r).map(k => s"m${j * r + k}")
      terms.tail.foldLeft(terms.head)((acc, t) => s"($acc * 31 + $t)") + s" AS band$j"
    }.mkString(",\n    ")
    s"""hs$sfx AS (
       |  SELECT doc_id, list(h) AS hl
       |  FROM s$sfx GROUP BY doc_id),
       |sig$sfx AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM hs$sfx),
       |bnd$sfx AS (
       |  SELECT doc_id,
       |    $bandExprs
       |  FROM sig$sfx)""".stripMargin
  }

  /** CTE chain `inter → j` computing exact distinct-shingle Jaccard for
    * every co-shingled (id1 < id2) pair, on top of `base`.
    */
  val interJac: String = interJacSfx("")

  /** [[interJac]] over the `sfx`-suffixed shingle chain. */
  def interJacSfx(sfx: String): String =
    s"""inter$sfx AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
      |  FROM s$sfx a JOIN s$sfx b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |j$sfx AS (
      |  SELECT id1, id2,
      |         CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
      |  FROM inter$sfx
      |  JOIN sizes$sfx sa ON sa.doc_id = id1
      |  JOIN sizes$sfx sb ON sb.doc_id = id2)""".stripMargin
}

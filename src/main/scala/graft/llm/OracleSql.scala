package graft.llm

/** Shared DuckDB oracle fragments for the text/dedup catalogs — one source
  * of truth for the normalization, token-hash, and simhash formulas so the
  * oracles can never drift from each other.
  */
object OracleSql {

  /** Normalized text ('g' flag: replace ALL, like Spark). */
  val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  val docTokens =
    s"SELECT doc_id, text, $norm AS nt, string_split($norm, ' ') AS w FROM documents"

  /** 60-bit md5-derived token hash (mirror of TextOps.hash60). */
  def h60(x: String): String =
    s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"

  private val simhashVotes = (0 until 60)
    .map(j => s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS v$j")
    .mkString(",\n    ")
  private val simhashBits = (0 until 60)
    .map(j => s"(CASE WHEN v$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END)")
    .mkString(" + ")

  /** CTE chain `t, tok, h, v, simhash` ending in
    * `simhash(doc_id, fp_simhash)` (mirror of TextOps.simHashAgg).
    */
  val simhashCtes: String =
    s"""t AS ($docTokens),
       |tok AS (SELECT doc_id, unnest(w) AS tok FROM t),
       |h AS (SELECT doc_id, ${h60("tok")} AS h FROM tok),
       |v AS (SELECT doc_id,
       |    $simhashVotes
       |  FROM h GROUP BY doc_id),
       |simhash AS (SELECT doc_id, $simhashBits AS fp_simhash FROM v)""".stripMargin

  /** CTE fragment `tt, sh`: normalized token split + distinct word-trigram
    * shingle lists over `source` — the ONE spelling of the tokenize/shingle
    * pipeline every shingle-consuming oracle builds on (mirror of
    * [[Dedup.shingleRows]]; a drift here would desynchronize every dedup
    * oracle at once, which is why it exists exactly once). `extraCols`
    * carries additional columns (e.g. `source`) through both CTEs.
    */
  def shingleCtesFrom(source: String, extraCols: Seq[String] = Nil): String = {
    val extra = extraCols.map(c => s"$c, ").mkString
    s"""tt AS (SELECT doc_id, ${extra}string_split($norm, ' ') AS w FROM $source),
       |sh AS (SELECT doc_id, $extra
       |  list_distinct([w[i] || '|' || w[i+1] || '|' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
       |  FROM tt WHERE len(w) >= 3)""".stripMargin
  }

  /** CTE chain `tt, sh, pairs` ending in brute-force all-pairs n-gram
    * Jaccard `pairs(id_a, id_b, jaccard)` over `source` (oracle only — the
    * engine uses banded LSH).
    */
  def jaccardPairsCtesFrom(source: String): String =
    s"""${shingleCtesFrom(source)},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(a.s || b.s)) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)""".stripMargin

  val jaccardPairsCtes: String = jaccardPairsCtesFrom("documents")

  /** CTE chain `tt, sh, cpairs` ending in brute-force all-ORDERED-pairs
    * directional containment `cpairs(id_a, id_b, containment)` where
    * containment = |Sa ∩ Sb| / |Sa| (oracle only — the engine uses the
    * prefix-filtered inverted-index join).
    */
  val containmentPairsCtes: String =
    s"""${shingleCtesFrom("documents")},
       |cpairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) AS containment
       |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)""".stripMargin
}

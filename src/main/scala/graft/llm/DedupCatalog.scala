package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Tables}

/** Driver-contract registrations for near-duplicate detection over
  * `documents`.
  *
  * The Spark side is the scale-safe banded MinHash-LSH pipeline (candidates
  * from band buckets, exact n-gram-Jaccard verification inside buckets); the
  * oracle recomputes the *verified* output brute-force over all pairs in
  * DuckDB — feasible at the sf0.01 gate, and an exact match as long as LSH
  * misses nothing at the threshold (miss probability (1-s^4)^16 < 2e-4 at
  * s = 0.8; the seeded near-dups sit at s ≈ 0.97 where it vanishes).
  */
object DedupCatalog extends Catalog {

  val JaccardThreshold = 0.8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "near_dup_pairs" -> ((s, d) =>
      Dedup.nearDupPairs(Tables(s, d).documents, "doc_id", "text", JaccardThreshold)
        .orderBy("id_a", "id_b")),

    "near_dup_dedup" -> ((s, d) =>
      Dedup.dropNearDups(Tables(s, d).documents, "doc_id", "text", JaccardThreshold)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),
  )

  /** Brute-force shingle sets + all-pairs Jaccard (oracle only — the engine
    * never does this).
    */
  private val pairsSql =
    s"""t AS (SELECT doc_id,
       |  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
       |  FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct([w[i] || '|' || w[i+1] || '|' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
       |  FROM t WHERE len(w) >= 3),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(a.s || b.s)) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "near_dup_pairs" ->
      s"""WITH $pairsSql
         |SELECT id_a, id_b, jaccard FROM pairs
         |WHERE jaccard >= $JaccardThreshold
         |ORDER BY id_a, id_b""".stripMargin,

    "near_dup_dedup" ->
      s"""WITH $pairsSql
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id_b FROM pairs WHERE jaccard >= $JaccardThreshold)
         |ORDER BY doc_id""".stripMargin,
  )
}

package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Tables}

/** Driver-contract registrations for the PII tier (Pii.*).
  *
  * The synthetic documents carry no natural PII, so both engines first
  * augment the text IDENTICALLY and deterministically: docs whose id is
  * not divisible by 3 get a suffix containing an email, an IPv4, a phone
  * number, and an SSN-shaped string derived from the doc id. The ops are
  * then exercised on text where hit counts vary per row and a third of
  * the corpus is clean.
  */
object PiiCatalog extends Catalog {

  private[graft] def augmented(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % 3 =!= 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 10."), (col("doc_id") % 200).cast("string"),
          lit(".0.7 call 555-123-4567 ssn 987-65-4320")))
        .otherwise(col("text")))

  private val augSql =
    """aug AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 <> 0 THEN text || ' contact user' ||
      |      CAST(doc_id AS VARCHAR) || '@example.com or 10.' ||
      |      CAST(doc_id % 200 AS VARCHAR) ||
      |      '.0.7 call 555-123-4567 ssn 987-65-4320'
      |    ELSE text END AS text
      |  FROM documents
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-doc PII hit counts: a narrow zero-shuffle projection
    "pii_scan" -> ((s, d) =>
      Pii.scan(augmented(Tables(s, d).documents))
        .select(col("doc_id"),
          col("n_email").cast("long").as("n_email"),
          col("n_ssn").cast("long").as("n_ssn"),
          col("n_phone").cast("long").as("n_phone"),
          col("n_ipv4").cast("long").as("n_ipv4"),
          col("has_pii"))
        .orderBy("doc_id")),

    // redaction proven by exact content hash: every span replaced, the
    // rest of the text untouched
    "pii_redacted" -> ((s, d) => {
      val red = Pii.redact(col("text"))
      augmented(Tables(s, d).documents)
        .select(col("doc_id"),
          length(red).cast("long").as("red_len"),
          md5(red).as("red_md5"))
        .orderBy("doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "pii_scan" ->
      s"""WITH $augSql
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Pii.EmailRe}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '${Pii.SsnRe}')) AS BIGINT) AS n_ssn,
         |  CAST(len(regexp_extract_all(text, '${Pii.PhoneRe}')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(text, '${Pii.Ipv4Re}')) AS BIGINT) AS n_ipv4,
         |  len(regexp_extract_all(text, '${Pii.EmailRe}')) +
         |    len(regexp_extract_all(text, '${Pii.SsnRe}')) +
         |    len(regexp_extract_all(text, '${Pii.PhoneRe}')) +
         |    len(regexp_extract_all(text, '${Pii.Ipv4Re}')) > 0 AS has_pii
         |FROM aug ORDER BY doc_id""".stripMargin,

    "pii_redacted" ->
      s"""WITH $augSql, red AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(text,
         |      '${Pii.EmailRe}', '<EMAIL>', 'g'),
         |      '${Pii.SsnRe}', '<SSN>', 'g'),
         |      '${Pii.PhoneRe}', '<PHONE>', 'g'),
         |      '${Pii.Ipv4Re}', '<IP>', 'g') AS t
         |  FROM aug
         |)
         |SELECT doc_id, CAST(length(t) AS BIGINT) AS red_len,
         |  md5(t) AS red_md5
         |FROM red ORDER BY doc_id""".stripMargin,
  )
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance pass every training-data
  * pipeline runs before a corpus ships.
  *
  * All four detectors are narrow per-row regex projections (codegen'd
  * `regexp_count` / `regexp_replace`): zero shuffles, perfectly
  * partition-parallel, so the pass scales linearly with corpus bytes —
  * at 100 TB it is scan-bound, exactly like the quality and language
  * passes it composes with.
  *
  * The patterns avoid constructs whose semantics differ between regex
  * engines (no backreferences, no lookaround): character classes, bounded
  * quantifiers, and word boundaries behave identically in Java regex
  * (Spark) and RE2 (DuckDB oracle), and both engines replace
  * non-overlapping leftmost matches, so scan counts and redacted text are
  * bit-reproducible across engines.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII hit counts and an overall flag. */
  def scan(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumn("n_email", regexp_count(t, lit(EmailRe)))
      .withColumn("n_ssn", regexp_count(t, lit(SsnRe)))
      .withColumn("n_phone", regexp_count(t, lit(PhoneRe)))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Re)))
      .withColumn("has_pii",
        col("n_email") + col("n_ssn") + col("n_phone") + col("n_ipv4") > 0)
  }

  /** Replace every detected span with a type token. Order matters and is
    * part of the contract: emails first (their local part may contain
    * digit runs a later pattern could half-match), then SSN before phone
    * (both are dash-digit shapes; each is boundary-anchored so neither
    * matches inside the other, but a fixed order keeps the output
    * well-defined if the pattern set ever grows).
    */
  def redact(text: Column): Column = {
    val steps = Seq(
      EmailRe -> "<EMAIL>", SsnRe -> "<SSN>",
      PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")
    steps.foldLeft(text) { case (c, (re, token)) =>
      regexp_replace(c, re, token)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.llm.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scanOne(text: String): (Long, Long, Long, Long, Boolean) =
    Pii.scan(Seq(text).toDF("text"))
      .select($"n_email".cast("long"), $"n_ssn".cast("long"),
        $"n_phone".cast("long"), $"n_ipv4".cast("long"), $"has_pii")
      .as[(Long, Long, Long, Long, Boolean)].head()

  test("scan counts every occurrence of each PII type") {
    assert(scanOne("a@b.com then c.d@e.org, ip 1.2.3.4 call 555-123-4567") ===
      (2L, 0L, 1L, 1L, true))
    assert(scanOne("nothing sensitive here") === (0L, 0L, 0L, 0L, false))
  }

  test("SSN and phone shapes do not match inside each other") {
    assert(scanOne("ssn 123-45-6789") === (0L, 1L, 0L, 0L, true))
    assert(scanOne("tel 123-456-7890") === (0L, 0L, 1L, 0L, true))
    // word boundary: an extra leading digit defeats both patterns
    assert(scanOne("id 1123-45-6789 and 1123-456-7890") ===
      (0L, 0L, 0L, 0L, false))
  }

  test("redact replaces all spans with type tokens and is idempotent") {
    def red(s: String) =
      Seq(s).toDF("text").select(Pii.redact($"text").as("t")).as[String].head()
    val out = red("mail a@b.com twice a@b.com ip 10.0.0.1 ssn 123-45-6789")
    assert(out === "mail <EMAIL> twice <EMAIL> ip <IP> ssn <SSN>")
    assert(red(out) === out)
  }

  test("scan is a zero-shuffle projection") {
    val plan = Pii.scan(Seq("x").toDF("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}

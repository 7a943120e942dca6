package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.shopping.Enrich

/** Row-level semantics of the 11 enrichment derivations (SURVEY §2.4). */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, ts: String, user: Long, typ: String, value: Double, k: Int) =
    (id, Timestamp.valueOf(ts), user, typ, value, s"""{"k": $k}""")

  private lazy val enriched = Enrich.enrich(
    Seq(
      row(1, "2024-01-15 10:00:00", 10, "purchase", 300.0, 9), // winter VIP premium
      row(2, "2024-04-01 10:00:00", 3, "click", 160.0, 8),     // spring premium-user high
      row(3, "2024-07-01 10:00:00", 6, "view", 60.0, 7),       // summer regular medium
      row(4, "2024-10-01 10:00:00", 9, "error", 10.0, 0),      // autumn new low anomaly
      row(5, "2024-12-01 10:00:00", 20, "purchase", 301.0, 4), // amount anomaly
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
    processedTime = col("ts"))
    .collect().map(r => r.getAs[Long]("event_id") -> r).toMap

  test("amount_category tiers at the declared cut points") {
    assert(enriched(1).getAs[String]("amount_category") === "Premium")
    assert(enriched(2).getAs[String]("amount_category") === "High")
    assert(enriched(3).getAs[String]("amount_category") === "Medium")
    assert(enriched(4).getAs[String]("amount_category") === "Low")
  }

  test("customer_segment keys on the customer id") {
    assert(enriched(1).getAs[String]("customer_segment") === "VIP")      // 10 % 10 = 0
    assert(enriched(2).getAs[String]("customer_segment") === "Premium")  // 3
    assert(enriched(3).getAs[String]("customer_segment") === "Regular")  // 6
    assert(enriched(4).getAs[String]("customer_segment") === "New")      // 9
  }

  test("final amount applies the tier discount exactly") {
    assert(enriched(1).getAs[Double]("final_amount_usd") === 255.0)  // 300 * 0.85
    assert(enriched(2).getAs[Double]("final_amount_usd") === 152.0)  // 160 * 0.95
    assert(enriched(3).getAs[Double]("final_amount_usd") === 60.0)   // no discount
  }

  test("is_anomaly: amount above 300 or an error event") {
    assert(!enriched(1).getAs[Boolean]("is_anomaly"), "300 is not > 300")
    assert(enriched(4).getAs[Boolean]("is_anomaly"), "error event")
    assert(enriched(5).getAs[Boolean]("is_anomaly"), "301 > 300")
  }

  test("season follows the event month") {
    assert(enriched(1).getAs[String]("season_type") === "Winter")
    assert(enriched(2).getAs[String]("season_type") === "Spring")
    assert(enriched(3).getAs[String]("season_type") === "Summer")
    assert(enriched(4).getAs[String]("season_type") === "Autumn")
    assert(enriched(5).getAs[String]("season_type") === "Winter")
  }

  test("satisfaction from the rating proxy (k % 5 + 1)") {
    assert(enriched(1).getAs[String]("satisfaction_level") === "Very Satisfied") // 9%5+1=5
    assert(enriched(2).getAs[String]("satisfaction_level") === "Satisfied")      // 4
    assert(enriched(3).getAs[String]("satisfaction_level") === "Neutral")        // 3
    assert(enriched(4).getAs[String]("satisfaction_level") === "Dissatisfied")   // 0%5+1=1
  }

  test("profit and clv scale off the discounted amount") {
    assert(enriched(1).getAs[Double]("estimated_profit_usd") === 76.5)   // 255 * 0.30
    assert(enriched(1).getAs[Double]("estimated_clv") === 6120.0)        // 255 * 24
  }

  test("all 11 derived columns exist and are non-null") {
    val cols = Seq("processed_time", "final_amount_usd", "amount_category",
      "customer_segment", "satisfaction_level", "is_anomaly", "estimated_clv",
      "frequency_category", "estimated_profit_usd", "season_type", "loyalty_score")
    enriched.values.foreach { r =>
      cols.foreach(c => assert(!r.isNullAt(r.fieldIndex(c)), s"$c is null"))
    }
  }
}

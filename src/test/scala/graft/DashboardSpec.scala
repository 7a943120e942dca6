package graft

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.shopping.Dashboard

/** The dashboard facade: fetchers, TTL caching, degrade-to-empty. */
class DashboardSpec extends SparkSpec {

  private lazy val dash = new Dashboard(spark, sf)

  test("latestOrders serves the newest enriched records, bounded") {
    val rows = dash.fetchPage(dash.latestOrders(50), 50)
    assert(rows.length === 50)
    val times = rows.map(_.getAs[java.sql.Timestamp]("processed_time").getTime)
    assert(times === times.sorted.reverse, "newest first")
    assert(rows.head.schema.fieldNames.contains("customer_segment"))
  }

  test("view fetchers return the analytic views") {
    assert(dash.agePreferences().columns.toSeq ===
      Seq("age_bucket", "orders", "avg_spend", "avg_rating", "top_category"))
    assert(dash.locationPreferences().count() > 0)
    assert(dash.ageGenderCategory(10).count() === 10)
    assert(dash.metrics().columns.contains("anomaly_rate_pct"))
    assert(dash.hourlyActivity().count() > 0)
    assert(dash.eventTypes().count() === 5)
  }

  test("analysis-tab fetchers serve the anomaly and VIP breakdowns") {
    assert(dash.anomalyByCategory().columns.toSeq ===
      Seq("category", "n_anomalies", "total_amount"))
    assert(dash.anomalyByLocation().count() <= 15)
    assert(dash.anomalyHistogram().columns.toSeq === Seq("bin", "n", "lo"))
    assert(dash.categorySatisfactionPivot().columns.toSeq ===
      Seq("category", "Very Satisfied", "Satisfied", "Neutral", "Dissatisfied"))
    assert(dash.vipCategoryBreakdown().columns.contains("avg_clv"))
  }

  test("ttl caching reuses the same plan within the window") {
    val d1 = dash.agePreferences()
    val d2 = dash.agePreferences()
    // same underlying cached DataFrame instance feeds both calls
    assert(d1.queryExecution.logical.sameResult(d2.queryExecution.logical))
  }

  test("orEmpty degrades a failing query to an empty typed frame") {
    val schema = StructType(Seq(StructField("x", StringType)))
    val out = dash.orEmpty(schema)(sys.error("boom"))
    assert(out.schema === schema && out.count() === 0)
  }
}

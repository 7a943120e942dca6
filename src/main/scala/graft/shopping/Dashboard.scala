package graft.shopping

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.engine.{Tables, TtlCache}
import graft.ops.{Relational, Serving}

/** The reference dashboard's backend surface (streamlit_app.py entry
  * points EP1/EP2, SURVEY §3), as one session-scoped facade: every fetcher
  * the UI calls per refresh, backed by the engine instead of a warehouse +
  * client-side pandas.
  *
  * Caching mirrors the reference's `@st.cache_data` TTLs (10 s for the live
  * feed, 30 s for views, streamlit_app.py:159,218-269); `fetchPage` is the
  * serving-edge materialization (the only driver-side collect in the
  * library, bounded by `limit`). Failed queries degrade to an empty frame
  * like the reference's warning path (streamlit_app.py:195-216).
  */
final class Dashboard(spark: SparkSession, dataDir: String,
                      ordersTtlMs: Long = 10000, viewsTtlMs: Long = 30000,
                      clock: () => Long = () => System.currentTimeMillis()) {

  private val t = Tables(spark, dataDir)

  private def cached(ttl: Long)(build: => DataFrame) =
    new TtlCache(() => build, ttl, clock)

  private val enrichedOrders = cached(ordersTtlMs) {
    Enrich.enrich(t.events, processedTime = col("ts"))
  }
  private val agePrefs = cached(viewsTtlMs)(Views.agePreferences(t))
  private val genderPrefs = cached(viewsTtlMs)(Views.genderPreferences(t))
  private val locationPrefs = cached(viewsTtlMs)(Views.locationPreferences(t))
  private val ageGenderCat = cached(viewsTtlMs)(Views.ageGenderCategory(t))

  /** EP1: the live feed — newest `limit` enriched orders. */
  def latestOrders(limit: Int = 1000): DataFrame =
    Serving.topN(enrichedOrders.get(),
      Seq(col("processed_time").desc, col("event_id").desc), limit)

  /** EP2: the four analytic views, TTL-cached like the reference. */
  def agePreferences(): DataFrame = agePrefs.get().orderBy("age_bucket")
  def genderPreferences(): DataFrame = genderPrefs.get().orderBy("gender")
  def locationPreferences(): DataFrame = locationPrefs.get().orderBy(desc("orders"), col("location"))
  def ageGenderCategory(limit: Int = 50): DataFrame =
    Serving.topN(ageGenderCat.get(), Seq(col("orders").desc,
      col("age_bucket"), col("gender"), col("category")), limit)

  /** The metric tiles (streamlit_app.py:333-352). */
  def metrics(): DataFrame = EnrichCatalog.enrichedMetrics(t)

  /** Hourly activity chart (streamlit_app.py:374-379). */
  def hourlyActivity(): DataFrame =
    Relational.timeBucketAgg(enrichedOrders.get(), col("ts"), "hour",
      Seq(count(lit(1)).as("n"), Relational.moneySum(col("value")).as("revenue")))

  /** The analysis tabs (streamlit_app.py:680-894). */
  def segmentRevenue(): DataFrame = EnrichCatalog.segmentRevenue(t)
  def satisfactionPivot(): DataFrame = EnrichCatalog.satisfactionPivot(t)
  def anomalyHourly(): DataFrame = EnrichCatalog.anomalyHourly(t)
  def anomalyByCategory(): DataFrame = EnrichCatalog.anomalyByCategory(t)
  def anomalyByLocation(): DataFrame = EnrichCatalog.anomalyByLocation(t)
  def anomalyHistogram(): DataFrame = EnrichCatalog.anomalyHistogram(t)
  def categorySatisfactionPivot(): DataFrame = EnrichCatalog.categorySatisfactionPivot(t)
  def vipCategoryBreakdown(): DataFrame = EnrichCatalog.vipCategoryBreakdown(t)

  /** Distribution tiles (streamlit_app.py:426-462,727,950-966). */
  def topCategoriesByVolume(limit: Int = 10): DataFrame =
    Serving.topN(Relational.valueCounts(enrichedOrders.get(), "event_type"),
      Seq(col("n").desc, col("event_type")), limit)
  def topCategoriesByRevenue(): DataFrame = EnrichCatalog.categoryRevenueTop10(t)
  def amountHistogram(): DataFrame = EnrichCatalog.amountHistogram(t)
  def amountCategoryCounts(): DataFrame = EnrichCatalog.amountCategoryCounts(t)
  def frequencyCategoryCounts(): DataFrame = EnrichCatalog.frequencyCategoryCounts(t)
  def vipLoyaltyCounts(): DataFrame = EnrichCatalog.vipLoyaltyCounts(t)

  /** Filter-widget domains (streamlit_app.py:984,990). */
  def eventTypes(): DataFrame = Serving.distinctValues(enrichedOrders.get(), "event_type")
  def segments(): DataFrame = Serving.distinctValues(enrichedOrders.get(), "customer_segment")

  /** Serving-edge materialization: the bounded driver-side fetch that hands
    * rows to a UI (the reference's `.to_dataframe()` hop).
    */
  def fetchPage(df: DataFrame, limit: Int = 100): Seq[Row] =
    df.limit(limit).collect().toSeq

  /** Degrade-to-empty error path: a failing query yields an empty frame of
    * the declared schema (plus a driver-side warning), never an exception
    * to the UI.
    */
  def orEmpty(schema: StructType)(build: => DataFrame): DataFrame =
    try build catch {
      case e: Throwable =>
        System.err.println(s"[dashboard] query failed, serving empty: ${e.getMessage}")
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }

  /** Drop all caches (the reference's manual invalidation, streamlit_app.py:313). */
  def invalidate(): Unit =
    Seq(enrichedOrders, agePrefs, genderPrefs, locationPrefs, ageGenderCat)
      .foreach(_.invalidate())
}

package graft.shopping

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The streaming-consumer enrichment stage (SURVEY.md §2.4): the 11 derived
  * columns the reference's off-repo "Consumer Spark" job appends to every
  * order record (semantics recovered from their consumers,
  * streamlit_app.py:334-350,685-686,727,751,891,950-966).
  *
  * Every derivation is a stateless projection (`when/otherwise` + decimal
  * arithmetic) over one input row, so:
  *  - the SAME `enrich` call serves batch and Structured Streaming (a
  *    narrow map stage — no shuffle, no state store, scales linearly with
  *    input splits at any data size);
  *  - whole-stage codegen keeps the 11 columns in one generated function —
  *    no UDFs, no Python boundary;
  *  - thresholds are declared constants, mirrored verbatim in
  *    [[EnrichCatalog]]'s oracle SQL (SURVEY.md §7.6 item 4).
  *
  * Role mapping onto the `events` stream table (TESTDATA.md):
  * `value` plays `purchase_amount_usd`, `user_id` the customer key,
  * `ts` the order timestamp, and `props.$.k` seeds the review rating.
  *
  * Money columns accumulate exactly: the discount/margin/CLV factors are
  * decimal literals applied to a DECIMAL(18,2) cast, so the derived amounts
  * are exact decimals (identical across partitionings and engines) before
  * the final double cast.
  */
object Enrich {

  // -- declared enrichment constants (mirrored in EnrichCatalog.sql) --------
  val PremiumMin   = 250.0 // amount_category: Premium >= 250 > High >= 150 > Medium >= 50 > Low
  val HighMin      = 150.0
  val MediumMin    = 50.0
  val AnomalyAmount = 300.0           // is_anomaly: amount above this, or an error event
  val DiscountPremium = "0.85"        // final_amount: 15% off Premium-tier amounts
  val DiscountHigh    = "0.95"        // 5% off High-tier amounts
  val ProfitMargin    = "0.30"        // estimated_profit = 30% of final amount
  val ClvFactor       = "24"          // estimated_clv = 24x the final amount

  private def dec(c: Column): Column = Relational.moneyDec(c)

  /** review-rating proxy: props JSON field k, folded to 1..5. */
  def rating(props: Column): Column =
    (get_json_object(props, "$.k").cast("long") % 5 + 1).cast("int")

  /** Exact decimal final amount (pre-double-cast) — tier discount applied. */
  private def finalAmountDec(value: Column): Column =
    dec(value) * when(value >= PremiumMin, expr(s"CAST($DiscountPremium AS DECIMAL(3,2))"))
      .when(value >= HighMin, expr(s"CAST($DiscountHigh AS DECIMAL(3,2))"))
      .otherwise(expr("CAST(1.00 AS DECIMAL(3,2))"))

  /** Adds the 11 derived columns to an events-shaped input
    * (`event_id, ts, user_id, event_type, value, props`).
    *
    * @param processedTime ingest-time column; `current_timestamp()` in the
    *   live stream, a deterministic column (e.g. the event time) when the
    *   output must be oracle-comparable.
    */
  def enrich(df: DataFrame, processedTime: Column = current_timestamp()): DataFrame = {
    val fin = finalAmountDec(col("value"))
    df
      .withColumn("processed_time", processedTime)
      .withColumn("final_amount_usd", fin.cast("double"))
      .withColumn("amount_category",
        when(col("value") >= PremiumMin, "Premium")
          .when(col("value") >= HighMin, "High")
          .when(col("value") >= MediumMin, "Medium")
          .otherwise("Low"))
      // customer-level attributes are keyed on the customer id so every
      // record of one customer agrees (stateless — SURVEY §2.4 note)
      .withColumn("customer_segment",
        when(pmod(col("user_id"), lit(10)) === 0, "VIP")
          .when(pmod(col("user_id"), lit(10)) <= 3, "Premium")
          .when(pmod(col("user_id"), lit(10)) <= 7, "Regular")
          .otherwise("New"))
      // rating is hoisted into its own projection: referenced from three CASE
      // branches, inlining it would parse the props JSON 3x per row (branches
      // defeat common-subexpression elimination). CollapseProject keeps the
      // non-cheap multi-referenced alias un-inlined, so it's one parse/row.
      .withColumn("__rating", rating(col("props")))
      .withColumn("satisfaction_level",
        when(col("__rating") >= 5, "Very Satisfied")
          .when(col("__rating") === 4, "Satisfied")
          .when(col("__rating") === 3, "Neutral")
          .otherwise("Dissatisfied"))
      .drop("__rating")
      .withColumn("is_anomaly",
        col("value") > AnomalyAmount || col("event_type") === "error")
      .withColumn("estimated_clv", (fin * expr(s"CAST($ClvFactor AS DECIMAL(2,0))")).cast("double"))
      .withColumn("frequency_category",
        when(pmod(col("user_id"), lit(7)) <= 1, "Rare")
          .when(pmod(col("user_id"), lit(7)) <= 4, "Occasional")
          .when(pmod(col("user_id"), lit(7)) === 5, "Frequent")
          .otherwise("Very Frequent"))
      .withColumn("estimated_profit_usd",
        (fin * expr(s"CAST($ProfitMargin AS DECIMAL(3,2))")).cast("double"))
      .withColumn("season_type",
        when(month(col("ts")).isin(12, 1, 2), "Winter")
          .when(month(col("ts")).isin(3, 4, 5), "Spring")
          .when(month(col("ts")).isin(6, 7, 8), "Summer")
          .otherwise("Autumn"))
      .withColumn("loyalty_score", pmod(col("user_id") * 31 + 7, lit(101)).cast("int"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables
import graft.shopping.Views

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB-runnable SQL in
  * `oracleSql` unless the operator is not SQL-expressible. Column names are
  * aliased identically on both sides; all outputs are deterministically
  * ordered and floats rounded to 4 decimals (SURVEY.md §7.6).
  */
object SparkEntry {

  /** Flagship: v_age_preferences analog — CASE bucketing, two aggregates,
    * top-1-per-group window, left join (the reference's hard core in one
    * query, bigquery_views.sql:2-43).
    */
  def entry(spark: SparkSession): DataFrame =
    Views.agePreferences(Tables(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_age_preferences"    -> ((s, d) => Views.agePreferences(Tables(s, d))),
    "v_gender_preferences" -> ((s, d) => Views.genderPreferences(Tables(s, d))),
    "v_location_preferences" -> ((s, d) => Views.locationPreferences(Tables(s, d))),
    "v_age_gender_category" -> ((s, d) => Views.ageGenderCategory(Tables(s, d))),
  )

  private def withBase(sql: String): String =
    s"WITH base AS (\n${Views.baseSql}\n)\n$sql"

  def oracleSql: Map[String, String] = Map(
    "v_age_preferences" -> withBase(
      """, stats AS (
        |  SELECT age_bucket, count(*) AS orders,
        |         round(avg(amount), 4) AS avg_spend,
        |         round(avg(rating), 4) AS avg_rating
        |  FROM base GROUP BY age_bucket
        |), top AS (
        |  SELECT age_bucket, category, count(*) AS category_count
        |  FROM base GROUP BY age_bucket, category
        |  QUALIFY row_number() OVER (PARTITION BY age_bucket
        |    ORDER BY category_count DESC, category ASC) = 1
        |)
        |SELECT s.age_bucket, s.orders, s.avg_spend, s.avg_rating,
        |       t.category AS top_category
        |FROM stats s LEFT JOIN top t USING (age_bucket)
        |ORDER BY s.age_bucket""".stripMargin),
    "v_gender_preferences" -> withBase(
      """, stats AS (
        |  SELECT gender, count(*) AS orders,
        |         round(avg(amount), 4) AS avg_spend,
        |         round(avg(rating), 4) AS avg_rating
        |  FROM base GROUP BY gender
        |), top AS (
        |  SELECT gender, category, count(*) AS category_count
        |  FROM base GROUP BY gender, category
        |  QUALIFY row_number() OVER (PARTITION BY gender
        |    ORDER BY category_count DESC, category ASC) = 1
        |)
        |SELECT s.gender, s.orders, s.avg_spend, s.avg_rating,
        |       t.category AS top_category
        |FROM stats s LEFT JOIN top t USING (gender)
        |ORDER BY s.gender""".stripMargin),
    "v_location_preferences" -> withBase(
      """, stats AS (
        |  SELECT location, count(*) AS orders,
        |         round(avg(amount), 4) AS avg_spend
        |  FROM base GROUP BY location
        |), top3 AS (
        |  SELECT location, category, count(*) AS category_count
        |  FROM base GROUP BY location, category
        |  QUALIFY row_number() OVER (PARTITION BY location
        |    ORDER BY category_count DESC, category ASC) <= 3
        |)
        |SELECT s.location, s.orders, s.avg_spend,
        |       array_agg(t.category ORDER BY t.category_count DESC, t.category ASC)
        |         AS top_categories
        |FROM stats s LEFT JOIN top3 t USING (location)
        |GROUP BY s.location, s.orders, s.avg_spend
        |ORDER BY s.location""".stripMargin),
    "v_age_gender_category" -> withBase(
      """SELECT age_bucket, gender, category, count(*) AS orders,
        |       round(avg(amount), 4) AS avg_spend
        |FROM base
        |GROUP BY age_bucket, gender, category
        |ORDER BY age_bucket, gender, category""".stripMargin),
  )
}

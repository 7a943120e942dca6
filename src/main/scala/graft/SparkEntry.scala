package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{Catalog, Tables}
import graft.shopping.{Views, ViewsCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are the union of every module [[graft.engine.Catalog]];
  * each catalog owns both sides of its contract so the Spark plan and the
  * DuckDB oracle can never drift apart (the round-1 hash fail came from a
  * duplicated, stale inline oracle). Column names are aliased identically on
  * both sides; outputs are deterministically ordered; money aggregates use
  * decimal-exact accumulation (Relational.moneySum / Catalog.moneySumSql).
  */
object SparkEntry {

  private val catalogs: Seq[Catalog] = Seq(
    ViewsCatalog,
    graft.ops.OpsCatalog,
    graft.ops.TpchCatalog,
    graft.ops.ServingCatalog,
    graft.ops.TemporalCatalog,
    graft.ops.CdcCatalog,
    graft.shopping.EnrichCatalog,
    graft.llm.TextCatalog,
    graft.llm.PiiCatalog,
    graft.llm.DedupCatalog,
    graft.llm.SimilarityCatalog,
    graft.llm.CorpusCatalog,
    graft.llm.MultimodalCatalog,
    graft.streaming.StreamingCatalog,
  )

  /** Flagship: v_age_preferences analog — CASE bucketing, two aggregates,
    * top-1-per-group window, left join (the reference's hard core in one
    * query, bigquery_views.sql:2-43).
    */
  def entry(spark: SparkSession): DataFrame =
    Views.agePreferences(Tables(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = catalogs.flatMap(_.queries)
    require(all.size == all.map(_._1).distinct.size, "duplicate query name across catalogs")
    all.toMap
  }

  def oracleSql: Map[String, String] = catalogs.flatMap(_.oracleSql).toMap
}

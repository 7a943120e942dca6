package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy loaders for the driver testdata tables (TESTDATA.md).
  *
  * Each accessor is a fresh parquet scan: Catalyst prunes columns and pushes
  * predicates into the scan per-query, so sharing a cached DataFrame here
  * would only hurt (it would pin the widest schema). At cluster scale these
  * reads are distributed parquet scans; nothing here collects to the driver.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as nanos-since-epoch longs and convert
    * with integer division (a double round-trip would lose precision above
    * 2^53 ns); micros truncation matches DuckDB's ns→µs read.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

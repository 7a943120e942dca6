package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries with their DuckDB oracles.
  * SparkEntry aggregates all catalogs.
  */
trait Catalog {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable ANSI SQL per query name. Queries absent here get the
    * driver's weaker rows-only check (only for non-SQL-expressible ops).
    */
  def oracleSql: Map[String, String]
}

object Catalog {
  /** Exact, summation-order-independent money sum for the oracle compare:
    * the testdata money columns carry 2 decimals, so DECIMAL(18,2)
    * accumulation is exact in both Spark and DuckDB and the final DOUBLE
    * cast is deterministic. Mirror of Relational.moneySum.
    */
  def moneySumSql(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  def moneyAvgSql(c: String): String =
    s"round(${moneySumSql(c)} / count(*), 4)"

  /** The TPC-H revenue term `price · (1 − discount)` in small-precision
    * decimals ((12,2)×(4,2)→(17,4): no precision loss on either engine, so
    * sums are exact rationals and final DOUBLE casts agree bit-for-bit).
    * ONE definition shared by every catalog — mirror of
    * [[graft.ops.Relational.revenueDec]]; changing either side desyncs the
    * oracle contract, so they live next to the other money helpers.
    */
  val revenueSql: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
}

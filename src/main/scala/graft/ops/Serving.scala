package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The serving-edge query surface (SURVEY §2.3): the relational ops the
  * reference's dashboard runs client-side in pandas on every refresh,
  * re-expressed as pushdown-friendly DataFrame combinators so they execute
  * IN the engine (scan-local filters, TakeOrderedAndProject for top-N)
  * instead of on a fetched window.
  *
  * Scale notes: `topN` compiles to TakeOrderedAndProjectExec — per-partition
  * heaps + a driver merge of n rows, never a global sort. Filters are plain
  * `Filter` nodes Catalyst pushes into the parquet scan (PushedFilters), so
  * a 100 TB scan with a selective filter reads only matching row groups.
  */
object Serving {

  /** ORDER BY ... LIMIT n — the reference's most-executed query
    * (streamlit_app.py:188-189). Pass explicit tie-break columns.
    */
  def topN(df: DataFrame, order: Seq[Column], n: Int): DataFrame =
    df.orderBy(order: _*).limit(n)

  /** Equality filter (streamlit_app.py:349). */
  def whereEq(df: DataFrame, c: String, v: Any): DataFrame =
    df.filter(col(c) === lit(v))

  /** Conjunction of predicates (streamlit_app.py:685-686 VIP & Premium). */
  def whereAll(df: DataFrame, preds: Seq[Column]): DataFrame =
    preds.foldLeft(df)(_ filter _)

  /** IN-list filter (streamlit_app.py:998-1001 multiselect widgets). */
  def whereIn(df: DataFrame, c: String, values: Seq[Any]): DataFrame =
    df.filter(col(c).isin(values: _*))

  /** Distinct values of one column, sorted — filter-widget domains
    * (streamlit_app.py:984,990).
    */
  def distinctValues(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).distinct().orderBy(col(c))

  /** Project the desired display columns that actually exist (the
    * reference's defensive `[c for c in wanted if c in df.columns]`,
    * streamlit_app.py:1004-1011), newest-first, first `limit` rows.
    */
  def displayPage(df: DataFrame, wanted: Seq[String], order: Seq[Column], limit: Int): DataFrame = {
    val have = df.columns.toSet
    topN(df.select(wanted.filter(have).map(col): _*), order, limit)
  }
}

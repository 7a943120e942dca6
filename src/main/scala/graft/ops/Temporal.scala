package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operator set lacks: as-of and range joins.
  *
  * The reference keeps its event feed and its order analytics in separate
  * tabs (streamlit_app.py:160-216 vs :319-379); correlating the two streams
  * ("which page view led to this purchase", "which errors followed this
  * click") is the natural next query a user of that dashboard asks, and at
  * 100 TB neither can be a sort-merge inequality join — Spark would fall
  * back to a broadcast-nested-loop or cartesian range scan.
  *
  * Both builders stay in the declarative API so Catalyst keeps pushdown and
  * AQE freedom; neither materializes a per-key group or collects anything.
  */
object Temporal {

  /** As-of join: each left row gains the payload of the single right row
    * with the greatest `rightTs` strictly below the left row's `leftTs`,
    * matching on `key` (DuckDB `ASOF JOIN`, kdb `aj`, pandas `merge_asof`).
    *
    * Implementation is the scalable union-tag trick, not an inequality
    * join: tag both sides, hash-partition once on the key, and run one
    * ordered window pass where `last(payload, ignoreNulls)` carries the
    * most recent right payload forward into each left row. Cost is ONE
    * shuffle + one sort — the same bill as any window aggregate —
    * independent of how many right rows precede each left row (a range
    * join would pair each left row with all of them before pruning).
    *
    * Strictness: left rows sort BEFORE right rows at an identical
    * timestamp (`__side` 0 vs 1), so an exactly-simultaneous right row is
    * not visible — `leftTs > rightTs`, matching DuckDB's `ON l.ts > r.ts`.
    * Right-side timestamp ties resolve deterministically by `tieBreak`
    * (the row with the greatest value wins).
    *
    * Skew note: partitioning is by `key` alone, so one pathologically hot
    * key serializes into one task. For hot-key data, pre-split by a coarse
    * time bucket carrying the previous bucket's tail as seed rows; not
    * needed for per-user event streams where key cardinality >> cores.
    *
    * @param payload right-side columns to attach, emitted as
    *                `prefix+name`; all-null when no right row precedes.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String], tieBreak: String,
               prefix: String = "asof_"): DataFrame = {
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(1).as("__side"),
      struct((payload :+ tieBreak).distinct.map(col): _*).as("__p"))
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      struct(left.columns.map(col): _*).as("__l"))
    val u = r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .unionByName(l)
    // Left rows carry null __p, which last(ignoreNulls) skips, so the value
    // carried into a left row is always the latest preceding RIGHT payload.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__p").getField(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__l.*") +: payload.map(p => col("__m").getField(p).as(prefix + p)): _*)
  }

  /** Range (interval) join: pairs (l, r) sharing `key` with
    * `rightTs` in (`leftTs`, `leftTs` + `windowSec`].
    *
    * A naive plan is an equi-join on `key` + a time filter — every same-key
    * pair materializes before pruning, O(per-key-count²) per key. Instead
    * both sides get a coarse time bucket of `windowSec` seconds; a right
    * row in the window lies in the left row's bucket or the next one, so
    * exploding the LEFT side into those two buckets and equi-joining on
    * (key, bucket) bounds the pre-filter pairs to same-4h-bucket rows.
    * Each true pair matches exactly one exploded copy (the right row's own
    * bucket), so no post-join dedup is needed. Survives 100× because join
    * width tracks the window, not the key's history length.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String, windowSec: Long,
                prefix: String = "r_"): DataFrame = {
    def bucket(ts: Column): Column = floor(unix_timestamp(ts) / windowSec)
    val l = left.withColumn("__b", explode(array(bucket(col(leftTs)), bucket(col(leftTs)) + 1)))
    val r = right
      .select(col(key).as("__rk") +: bucket(col(rightTs)).as("__b")
        +: right.columns.filter(_ != key).map(c => col(c).as(prefix + c)): _*)
    l.join(r, l("__b") === r("__b") && col(key) === col("__rk"))
      .filter(col(prefix + rightTs) > col(leftTs) &&
        col(prefix + rightTs) <= col(leftTs) + expr(s"INTERVAL $windowSec SECOND"))
      .drop("__b", "__rk")
  }
}

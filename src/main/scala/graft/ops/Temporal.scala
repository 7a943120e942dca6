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
    * nearest in time, matching on `key` (DuckDB `ASOF JOIN`, kdb `aj`,
    * pandas `merge_asof` — including its `direction` and `tolerance`
    * parameters).
    *
    * Directions (all strict — an exactly-simultaneous right row never
    * matches, pandas `allow_exact_matches=False`):
    *  - `backward` (default): greatest `rightTs` strictly below `leftTs`;
    *    right-side timestamp ties resolve to the GREATEST `tieBreak`.
    *  - `forward`: smallest `rightTs` strictly above `leftTs`; ties
    *    resolve to the SMALLEST `tieBreak` (mirror-symmetric).
    *  - `nearest`: whichever of the two is closer in time; an exact
    *    distance tie prefers backward (pandas behavior).
    *
    * `toleranceSec` bounds the match: a candidate farther than this many
    * seconds (exact integer microsecond comparison) yields null payload,
    * like pandas `tolerance`.
    *
    * Implementation is the scalable union-tag trick, not an inequality
    * join: tag both sides, hash-partition once on the key, and run one
    * ordered window pass per direction where `last(payload, ignoreNulls)`
    * carries the nearest right payload into each left row. Cost is ONE
    * shuffle + one sort per direction needed (two sorts for `nearest`,
    * same single exchange) — the same bill as any window aggregate —
    * independent of how many right rows precede each left row (a range
    * join would pair each left row with all of them before pruning).
    *
    * Strictness mechanics: in traversal order, left rows sort BEFORE
    * right rows at an identical timestamp (`__side` 0 vs 1), so a
    * simultaneous right row is never in a left row's frame.
    *
    * Skew note: partitioning is by `key` alone, so one pathologically hot
    * key serializes into one task. For hot-key data, pre-split by a coarse
    * time bucket carrying the previous bucket's tail as seed rows; not
    * needed for per-user event streams where key cardinality >> cores.
    *
    * @param payload right-side columns to attach, emitted as
    *                `prefix+name`; all-null when no right row matches.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String], tieBreak: String,
               prefix: String = "asof_",
               direction: String = "backward",
               toleranceSec: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(1).as("__side"),
      struct(((payload :+ tieBreak).distinct.map(col))
        :+ col(rightTs).as("__rt"): _*).as("__p"))
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      struct(left.columns.map(col): _*).as("__l"))
    val u = r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .unionByName(l)
    // Left rows carry null __p, which last(ignoreNulls) skips, so the value
    // carried into a left row is always the nearest RIGHT payload in the
    // traversal direction. Backward walks time ascending; forward walks it
    // descending (so "preceding" rows are the future ones), with the
    // tie-break mirrored so the last same-ts right row traversed is the
    // smallest tieBreak.
    val tb = col("__p").getField(tieBreak)
    def carried(w: org.apache.spark.sql.expressions.WindowSpec) =
      last(col("__p"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val back = carried(Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, tb.asc))
    val fwd = carried(Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__side").asc, tb.desc))
    def gapUs(m: Column): Column =
      abs(unix_micros(col("__t")) - unix_micros(m.getField("__rt")))
    val matched = direction match {
      case "backward" => u.withColumn("__m", back)
      case "forward"  => u.withColumn("__m", fwd)
      case "nearest"  =>
        // distance compare in exact integer microseconds; equidistant
        // candidates prefer backward (pandas)
        u.withColumn("__mb", back).withColumn("__mf", fwd)
          .withColumn("__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(gapUs(col("__mb")) <= gapUs(col("__mf")), col("__mb"))
              .otherwise(col("__mf")))
    }
    val bounded = toleranceSec match {
      case Some(tol) =>
        matched.withColumn("__m",
          when(gapUs(col("__m")) <= tol * 1000000L, col("__m")))
      case None => matched
    }
    bounded.filter(col("__side") === 0)
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

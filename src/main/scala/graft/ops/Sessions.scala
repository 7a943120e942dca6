package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-level behavior analytics over the event stream: event-grained
  * sessionization and the ordered view→click→purchase conversion funnel.
  *
  * [[graft.streaming.Streams.userSessions]] aggregates WHOLE sessions with
  * `session_window` (the streaming-capable shape); the funnel instead needs
  * each event labeled with its session, which `session_window` cannot emit
  * — so the batch tier derives the same session fusion rule (a gap `< gap`
  * fuses, `>= gap` breaks) as a gaps-and-islands window over the per-user
  * event order. Both analyses of one session set therefore agree by
  * construction with the streaming aggregate's windows.
  */
object Sessions {

  /** Label every event with its per-user session ordinal: a new session
    * starts when the gap since the user's previous event reaches `gap`.
    * One shuffle (hash on `user_id`) + one sort — the window carries both
    * the lag and the running break-sum.
    */
  def sessionized(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__brk",
        when(col("ts") - lag(col("ts"), 1).over(byUser) >= expr(s"INTERVAL $gap"),
          1).otherwise(0))
      .withColumn("session_id",
        sum(col("__brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** Ordered conversion funnel: classify every session by how far the user
    * progressed through view → click → purchase IN THAT ORDER — a click
    * only counts after a view in the same session, a purchase only after
    * such a click (strictly later in the (ts, event_id) event order).
    * Returns one row per funnel stage with the session count and its share
    * of all sessions.
    *
    * Shape: the ordering constraint is running conditional counts over the
    * within-session event order (frame ends one row BEFORE current, so
    * "after" is strict), then one per-session aggregate and one tiny
    * per-stage aggregate. Two shuffles total (user, then user×session —
    * the session id does not exist before the first window pass); no
    * self-joins, no per-stage rescans, state bounded per partition by the
    * window frame.
    */
  def sessionFunnel(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val w = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ts"), col("event_id"))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    def countBefore(cond: Column): Column = count(when(cond, lit(1))).over(before)
    val flagged = sessionized(events, gap)
      .withColumn("__click_ok",
        col("event_type") === "click" &&
          countBefore(col("event_type") === "view") > 0)
      .withColumn("__purchase_ok",
        col("event_type") === "purchase" && countBefore(col("__click_ok")) > 0)
    val staged = flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("has_view"),
        max(when(col("__click_ok"), 1).otherwise(0)).as("has_click"),
        max(when(col("__purchase_ok"), 1).otherwise(0)).as("has_purchase"))
      .select(
        when(col("has_purchase") === 1, "3_converted")
          .when(col("has_click") === 1, "2_clicked")
          .when(col("has_view") === 1, "1_viewed")
          .otherwise("0_no_view").as("funnel_stage"))
    staged.groupBy("funnel_stage")
      .agg(count(lit(1)).as("n_sessions"))
      // the share window runs over the 4 stage rows — serving-edge size
      .withColumn("pct_sessions",
        round(col("n_sessions").cast("double")
          / sum(col("n_sessions")).over(Window.partitionBy()), 4))
      .orderBy("funnel_stage")
  }

  /** Cohort-retention matrix: users are cohorted by the `unit` ("day" or
    * "week") of their FIRST event; each cell counts the cohort's users
    * active `offset` periods later, with the rate against the cohort's own
    * size. The standard product-analytics retention triangle, fully
    * relational: a per-user min aggregate, a distinct (user, period)
    * activity set, one join, one count-distinct matrix — no windows over
    * the fact table, every shuffle keyed on user or (cohort, offset).
    * Offsets are exact integers (both sides are unit-truncated timestamps,
    * so the day difference is a multiple of the unit's days).
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts", unit: String = "day"): DataFrame = {
    val unitDays = unit match {
      case "day" => 1; case "week" => 7
      case u => throw new IllegalArgumentException(s"unit day|week: $u")
    }
    val first = events.groupBy(col(userCol))
      .agg(date_trunc(unit, min(col(tsCol))).as("cohort"))
    val active = events
      .select(col(userCol), date_trunc(unit, col(tsCol)).as("period"))
      .distinct()
    val matrix = active.join(first, Seq(userCol))
      .withColumn("offset",
        (datediff(col("period"), col("cohort")) / unitDays).cast("long"))
      .groupBy("cohort", "offset")
      .agg(countDistinct(col(userCol)).as("n_active"))
    val sizes = matrix.filter(col("offset") === 0)
      .select(col("cohort"), col("n_active").as("cohort_size"))
    matrix.join(sizes, Seq("cohort"))
      .select(Relational.tsStr(col("cohort")).as("cohort"),
        col("offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
  }

  /** Per-user event-type transition matrix (first-order Markov estimate):
    * every consecutive (prev → next) event-type pair in each user's
    * (ts, event_id) event order, counted globally, with the conditional
    * transition probability out of each source type. One shuffle (hash on
    * `user_id`) feeds the lag window; the aggregate and the per-source
    * normalizing window both run over the ~|types|² pair space — bounded
    * by the type vocabulary, not the corpus. The probability divides two
    * exact longs, so it is bit-reproducible.
    */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .where(col("prev_type").isNotNull)
    pairs.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("prev_type")).cast("double"))
  }
}

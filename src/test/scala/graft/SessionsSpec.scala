package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Sessions

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, user_id, ts, event_type) — five sessions across three users
  private lazy val events = Seq(
    // user 1, session 0: the full ordered funnel
    (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
    (2L, 1L, ts("2024-01-01 10:05:00"), "click"),
    (3L, 1L, ts("2024-01-01 10:10:00"), "purchase"),
    // user 1, session 1 (30 min gap): click BEFORE view — order violated,
    // so the session only reaches the view stage
    (4L, 1L, ts("2024-01-01 11:00:00"), "click"),
    (5L, 1L, ts("2024-01-01 11:05:00"), "view"),
    // user 2, one session: purchase with no view at all
    (6L, 2L, ts("2024-01-01 10:00:00"), "purchase"),
    // user 3, session 0: view → click but never purchases...
    (7L, 3L, ts("2024-01-01 10:00:00"), "view"),
    (8L, 3L, ts("2024-01-01 10:10:00"), "click"),
    // ...and the purchase lands in a NEW session, where it doesn't count
    (9L, 3L, ts("2024-01-01 11:00:00"), "purchase"),
  ).toDF("event_id", "user_id", "ts", "event_type")

  test("sessionized breaks on gaps >= the threshold") {
    val sids = Sessions.sessionized(events)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(sids === Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1,
      6L -> 0, 7L -> 0, 8L -> 0, 9L -> 1))
  }

  test("sessionFunnel classifies stages in view→click→purchase order") {
    val out = Sessions.sessionFunnel(events)
      .select("funnel_stage", "n_sessions", "pct_sessions")
      .as[(String, Long, Double)].collect().toList
    assert(out === List(
      ("0_no_view", 2L, 0.4),    // user 2, and user 3's orphan purchase
      ("1_viewed", 1L, 0.2),     // user 1 session 1: click preceded the view
      ("2_clicked", 1L, 0.2),    // user 3 session 0: no purchase followed
      ("3_converted", 1L, 0.2))) // user 1 session 0
  }

  test("a click at the same timestamp as an earlier-id view still counts") {
    val tied = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:00:00"), "click"),
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessions.sessionFunnel(tied)
      .select("funnel_stage").as[String].collect().toList
    assert(out === List("2_clicked"),
      "within-session order is (ts, event_id), not strict ts")
  }

  test("transitions counts consecutive pairs per user with row probabilities") {
    val out = Sessions.transitions(events)
      .select("prev_type", "event_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSet
    // user 1: view→click, click→purchase, purchase→click, click→view
    // user 2: (single event, no pair)
    // user 3: view→click, click→purchase
    assert(out === Set(
      ("view", "click", 2L, 1.0),
      ("click", "purchase", 2L, 2.0 / 3),
      ("click", "view", 1L, 1.0 / 3),
      ("purchase", "click", 1L, 1.0)))
    // probabilities out of each source type sum to 1
    val sums = Sessions.transitions(events).groupBy("prev_type")
      .agg(sum("p")).as[(String, Double)].collect()
    sums.foreach { case (t, s) => assert(math.abs(s - 1.0) < 1e-12, t) }
  }

  test("time_to_purchase counts only purchases at-or-after the first view, exact micros") {
    def ev(id: Long, u: Long, t: String, typ: String) =
      (id, Timestamp.valueOf(t), u, typ, 10.0, "{}")
    val df = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "purchase"), // BEFORE first view: excluded
      ev(2, 1, "2024-01-01 11:00:00", "view"),     // first view
      ev(3, 1, "2024-01-01 11:30:00", "purchase"), // converts in 1800 s
      ev(4, 1, "2024-01-01 12:00:00", "purchase"), // later: not the first
      ev(5, 2, "2024-01-01 09:00:00", "view"),     // never purchases
      ev(6, 3, "2024-01-01 08:00:00", "purchase")  // never views
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val firstView = df.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
    val firstPurchase = df.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts") >= col("first_view"))
      .groupBy(col("user_id"), col("first_view"))
      .agg(min(col("ts")).as("first_purchase"))
    val got = firstPurchase.select(col("user_id"),
        (unix_micros(col("first_purchase")) - unix_micros(col("first_view")))
          .as("dur_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1800L * 1000000L),
      "only user 1 converts; pre-view purchase ignored; duration exact")
  }

  test("gaps-and-islands sessions agree with session_window on real data") {
    val ev = Tables(spark, sf).events
    val funnelTotal = Sessions.sessionFunnel(ev)
      .agg(sum("n_sessions")).as[Long].head()
    val windowTotal = graft.streaming.Streams.userSessions(ev, "30 minutes").count()
    assert(funnelTotal === windowTotal,
      "both sessionizations must fuse the same event sets")
  }
}

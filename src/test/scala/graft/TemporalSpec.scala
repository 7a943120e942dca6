package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val lefts = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for user 20
    (4L, 30L, ts("2024-01-01 09:00:00")), // user with no right rows at all
  ).toDF("id", "user_id", "t")

  private lazy val rights = Seq(
    (101L, 10L, ts("2024-01-01 09:30:00")),
    (102L, 10L, ts("2024-01-01 11:00:00")),
    (103L, 10L, ts("2024-01-01 12:00:00")), // simultaneous with left 2: excluded (strict)
    (104L, 20L, ts("2024-01-01 09:30:00")),
  ).toDF("rid", "user_id", "t")

  test("asofJoin picks the latest strictly-earlier right row per key") {
    val out = Temporal.asofJoin(lefts, rights, "user_id", "t", "t",
        payload = Seq("rid"), tieBreak = "rid")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> None))
  }

  test("asofJoin right-side timestamp ties resolve to the greatest tieBreak") {
    val tied = rights.union(Seq((99L, 10L, ts("2024-01-01 09:30:00"))).toDF)
    val out = Temporal.asofJoin(lefts, tied, "user_id", "t", "t",
        payload = Seq("rid"), tieBreak = "rid")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(101L), "101 > 99 at the tied timestamp")
  }

  test("asofJoin forward picks the earliest strictly-later right row") {
    val out = Temporal.asofJoin(lefts, rights, "user_id", "t", "t",
        payload = Seq("rid"), tieBreak = "rid", direction = "forward")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    // left 2 @12:00: right 103 is simultaneous — strict, so no match
    assert(out === Map(1L -> Some(102L), 2L -> None, 3L -> Some(104L), 4L -> None))
  }

  test("asofJoin forward ties resolve to the smallest tieBreak") {
    val tied = rights.union(Seq((98L, 10L, ts("2024-01-01 11:00:00"))).toDF)
    val out = Temporal.asofJoin(lefts, tied, "user_id", "t", "t",
        payload = Seq("rid"), tieBreak = "rid", direction = "forward")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(98L), "98 < 102 at the tied timestamp")
  }

  test("asofJoin nearest picks the closer side; equidistant prefers backward") {
    val l = lefts.union(Seq((5L, 40L, ts("2024-01-01 10:00:00"))).toDF)
    val r = rights.union(Seq(
      (301L, 40L, ts("2024-01-01 09:30:00")),
      (302L, 40L, ts("2024-01-01 10:30:00"))).toDF)
    val out = Temporal.asofJoin(l, r, "user_id", "t", "t",
        payload = Seq("rid"), tieBreak = "rid", direction = "nearest")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      1L -> Some(101L), // 30 min back beats 60 min forward
      2L -> Some(102L), // only a backward candidate (103 simultaneous)
      3L -> Some(104L), // only a forward candidate
      4L -> None,
      5L -> Some(301L))) // exactly equidistant: backward wins
  }

  test("asofJoin tolerance nulls matches beyond the gap") {
    val out = Temporal.asofJoin(lefts, rights, "user_id", "t", "t",
        payload = Seq("rid"), tieBreak = "rid",
        toleranceSec = Some(1800L))
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    // left 1's match is exactly 30 min old (inclusive bound); left 2's is
    // 60 min old and masked
    assert(out === Map(1L -> Some(101L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("asofJoin is partitioning-independent") {
    def run(l: org.apache.spark.sql.DataFrame) =
      Temporal.asofJoin(l, rights, "user_id", "t", "t", Seq("rid"), "rid")
        .select("id", "asof_rid").as[(Long, Option[Long])].collect().toSet
    assert(run(lefts) === run(lefts.repartition(7)))
  }

  test("rangeJoin equals the naive inequality join on real data") {
    val ev = Tables(spark, sf).events
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val w = 4 * 3600L
    val bucketed = Temporal.rangeJoin(clicks, errors, "user_id", "ts", "ts", w)
      .select(col("event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    val naive = clicks.as("c").join(errors.as("e"),
        $"c.user_id" === $"e.user_id" && $"e.ts" > $"c.ts" &&
          $"e.ts" <= $"c.ts" + expr(s"INTERVAL $w SECOND"))
      .select($"c.event_id", $"e.event_id").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(bucketed.nonEmpty, "fixture must exercise the window")
  }

  test("rangeJoin window boundary is right-inclusive, left-exclusive") {
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("id", "user_id", "t")
    val r = Seq(
      (201L, 10L, ts("2024-01-01 10:00:00")), // == left ts: excluded
      (202L, 10L, ts("2024-01-01 11:00:00")), // == left ts + window: included
      (203L, 10L, ts("2024-01-01 11:00:01")), // just past: excluded
    ).toDF("rid", "user_id", "t")
    val out = Temporal.rangeJoin(l, r, "user_id", "t", "t", 3600L)
      .select("r_rid").as[Long].collect().toSet
    assert(out === Set(202L))
  }
}

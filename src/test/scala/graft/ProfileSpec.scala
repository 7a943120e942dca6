package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Option("aa"), Option(2.5), Option(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (2L, Option("bbb"), Option(7.5), Option(Timestamp.valueOf("2024-06-01 12:00:00"))),
    (2L, None, None, None),
  ).toDF("id", "s", "v", "t")

  test("profile computes per-column stats in one pass") {
    val p = Profile.profile(df, Seq("id", "s", "v", "t"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) === 3 && id.getLong(2) === 0 && id.getLong(3) === 2)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 2.0)
    val s = p("s")
    assert(s.getLong(2) === 1, "one null string")
    assert(s.getLong(6) === 2 && s.getLong(7) === 3, "length bounds")
    assert(s.isNullAt(4) && s.isNullAt(8), "no numeric/ts bounds for strings")
    val t = p("t")
    assert(t.getString(8) === "2024-01-01 00:00:00")
    assert(t.getString(9) === "2024-06-01 12:00:00")
  }

  test("profile is a single aggregate job (one scan, no joins)") {
    val plan = Profile.profile(df, Seq("id", "s", "v", "t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
  }

  test("runChecks reports violations per named check") {
    val m = Profile.runChecks(Seq(
      "no_dup_ids" -> df.groupBy("id").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1),
      "v_below_5" -> df.filter(col("v") > 5),
    )).collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(m("no_dup_ids") === ((1L, false)), "id 2 duplicates")
    assert(m("v_below_5") === ((1L, false)), "7.5 violates")
  }
}

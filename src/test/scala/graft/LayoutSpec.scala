package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Layout, Tables}

/** Write-time layout → read-time pruning. */
class LayoutSpec extends SparkSpec {

  test("directory partitioning prunes non-matching partitions at scan") {
    val dir = Files.createTempDirectory("graft-layout-part").toString
    Layout.writePartitionedBy(Tables(spark, sf).events, dir, "event_type")
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "filter classified as partition filter")
    assert(q.count() === Tables(spark, sf).events
      .filter(col("event_type") === "purchase").count())
    // only the matching directory exists to be scanned
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.contains("event_type=purchase") && dirs.length === 5)
  }

  test("dynamic partition pruning engages when the dim decides the partitions") {
    val dir = Files.createTempDirectory("graft-layout-dpp").toString
    Layout.writePartitionedBy(
      Tables(spark, sf).events.withColumn("event_day", to_date(col("ts"))),
      dir, "event_day")
    // the dim must carry a SELECTIVE FILTER for the PartitionPruning rule
    // to consider it (an aggregate/limit alone does not qualify)
    val topDays = Tables(spark, sf).events
      .filter(col("event_type") === "error" && col("value") > 200)
      .select(to_date(col("ts")).as("event_day")).distinct()
    val q = spark.read.parquet(dir)
      .join(broadcast(topDays), Seq("event_day"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan pruned by a runtime subquery, got:\n${plan.take(2000)}")
    // correctness: the pruned join sees exactly the qualifying days
    val wantDays = topDays.collect().map(_.getDate(0).toString).toSet
    val gotDays = q.select("event_day").distinct().collect()
      .map(_.getDate(0).toString).toSet
    assert(gotDays === wantDays)
  }

  test("range-sorted files push range predicates into the scan") {
    val dir = Files.createTempDirectory("graft-layout-sort").toString
    Layout.writeRangeSorted(Tables(spark, sf).lineitem, dir, "l_extendedprice")
    val q = spark.read.parquet(dir).filter(col("l_extendedprice") > 90000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_extendedprice), GreaterThan(l_extendedprice,90000.0)]"))
    assert(q.count() === Tables(spark, sf).lineitem
      .filter(col("l_extendedprice") > 90000.0).count())
  }

  test("compaction rewrites many small files into few, row-identical") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    Tables(spark, sf).events.repartition(32).write.parquet(s"$tmp/small")
    Layout.compact(spark, s"$tmp/small", s"$tmp/big", 2)
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(s"$tmp/small") === 32 && files(s"$tmp/big") === 2)
    assert(spark.read.parquet(s"$tmp/big").orderBy("event_id").collect().toSeq ===
      Tables(spark, sf).events.orderBy("event_id").collect().toSeq)
  }

  test("zOrderKey interleaves bits (Morton order)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L),
        (3L, 5L), (7L, 7L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zOrderKey(col("a"), col("b"), 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference Morton codes: a bits at even positions, b bits at odd
    assert(got((0L, 0L)) === 0L && got((1L, 0L)) === 1L && got((0L, 1L)) === 2L)
    assert(got((1L, 1L)) === 3L && got((2L, 0L)) === 4L && got((0L, 2L)) === 8L)
    assert(got((3L, 5L)) === (1L + 2L + 4L + 32L)) // a=011→1,4; b=101→2,32
    assert(got((7L, 7L)) === 63L)
  }

  test("z-ordered files push both dimensions' range predicates into the scan") {
    val dir = Files.createTempDirectory("graft-layout-zorder").toString
    Layout.writeZOrdered(Tables(spark, sf).events, dir,
      col("user_id"), floor(col("value")), bits = 11)
    val q = spark.read.parquet(dir)
      .filter(col("user_id").between(100L, 199L) && col("value").between(100.0, 200.0))
    // read the scan's own metadata: the plan's toString truncates the
    // PushedFilters list at spark.sql.maxMetadataStringLength
    val pushed = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(user_id,100)") &&
      pushed.contains("GreaterThanOrEqual(value,100.0)"),
      s"both range predicates must reach the parquet scan: $pushed")
    assert(q.count() === Tables(spark, sf).events
      .filter(col("user_id").between(100L, 199L) && col("value").between(100.0, 200.0))
      .count())
  }

  test("composed layout: DPP and z-order pushdown engage in ONE plan") {
    // the zorder_dpp_scan gate shape: hive-partition by day, z-order
    // within each day on (user_id, floor(value)); read via a runtime dim
    // join + a conjunctive range box. The same plan must show (a) the
    // fact scan pruned by a dynamicpruning subquery and (b) both range
    // predicates pushed to parquet.
    val dir = Files.createTempDirectory("graft-layout-zdpp").toString
    Layout.writePartitionedZOrdered(
      Tables(spark, sf).events
        .withColumn("event_day", to_date(col("ts")))
        .select("event_id", "user_id", "event_type", "value", "event_day"),
      dir, "event_day", col("user_id"), floor(col("value")), bits = 11)
    val errorDays = Tables(spark, sf).events
      .filter(col("event_type") === "error" && col("value") > 200)
      .select(to_date(col("ts")).as("event_day")).distinct()
    val q = spark.read.parquet(dir)
      .filter(col("user_id").between(100L, 199L) && col("value").between(100.0, 200.0))
      .join(broadcast(errorDays), Seq("event_day"))
    val plan = q.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      s"fact scan pruned by a runtime subquery, got:\n${plan.toString.take(2000)}")
    // the join makes this plan adaptive, and collect() does not descend
    // into AdaptiveSparkPlanExec — read the scans off the pre-AQE
    // physical plan (pushdown is decided at planning, not at runtime)
    val pushed = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(user_id,100)") &&
      pushed.contains("GreaterThanOrEqual(value,100.0)"),
      s"both range predicates must reach the parquet scan: $pushed")
    val expected = Tables(spark, sf).events
      .withColumn("event_day", to_date(col("ts")))
      .join(errorDays, Seq("event_day"))
      .filter(col("user_id").between(100L, 199L) && col("value").between(100.0, 200.0))
      .count()
    assert(q.count() === expected)
  }
}

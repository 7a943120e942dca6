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

  test("range-sorted files push range predicates into the scan") {
    val dir = Files.createTempDirectory("graft-layout-sort").toString
    Layout.writeRangeSorted(Tables(spark, sf).lineitem, dir, "l_extendedprice")
    val q = spark.read.parquet(dir).filter(col("l_extendedprice") > 90000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_extendedprice), GreaterThan(l_extendedprice,90000.0)]"))
    assert(q.count() === Tables(spark, sf).lineitem
      .filter(col("l_extendedprice") > 90000.0).count())
  }
}

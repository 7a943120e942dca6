package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Co-located joins via bucketed tables — the 100 TB shape for repeated
  * large-large joins: both sides pre-hash-partitioned on the join key into
  * the same bucket count, so the join plans with ZERO shuffle exchanges.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans without a shuffle exchange") {
    val t = Tables(spark, sf)
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    // a previous JVM's warehouse dirs survive DROP TABLE (in-memory catalog)
    Seq("orders_bkt", "customer_bkt").foreach { n =>
      val dir = new java.io.File(s"spark-warehouse/$n")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    t.orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    t.customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bkt")

    // disable auto-broadcast so the join strategy decision is about
    // partitioning, as it would be for two large tables
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val shufflesBeforeAgg = "ShuffleExchange|Exchange hashpartitioning".r
        .findAllIn(plan.split("HashAggregate").head).length
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // the join itself consumes bucket partitioning: the only exchange in
      // the whole plan is the one for the post-join aggregation
      val totalExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(totalExchanges <= 1,
        s"bucketed join must not shuffle its inputs; plan:\n$plan")
      assert(shufflesBeforeAgg === 0)
      // and it still computes the right thing
      val n = joined.agg(sum("n")).head.getLong(0)
      assert(n === t.orders.join(t.customer,
        col("o_custkey") === col("c_custkey")).count())
    }
  }

  private def withConf(kv: (String, String))(body: => Unit): Unit = {
    val (k, v) = kv
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }
}

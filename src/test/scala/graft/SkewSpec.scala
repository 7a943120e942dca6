package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Proves the declared skew mitigation for the within-cell pair search
  * actually engages: with the AQE skew thresholds scaled to test size, a
  * degenerate cell's shuffle partition is split by OptimizeSkewedJoin.
  * (The thresholds are the ONLY thing scaled down — the plan mechanics
  * are identical at 256 MB partitions on a cluster.)
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val skewConfs = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")

  private def withConfs[A](confs: Map[String, String])(body: => A): A = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the degenerate cell in the pair-search join") {
    withConfs(skewConfs) {
      // one cell holds ~98% of the vectors — the cellNearDupPairs worst case
      val rnd = new scala.util.Random(3)
      val rows = (0 until 3000).map(i => (i.toLong, Seq.fill(4)(rnd.nextFloat()), 0)) ++
        (0 until 60).map(i => (10000L + i, Seq.fill(4)(rnd.nextFloat()), 1 + i % 3))
      val df = rows.toDF("vec_id", "embedding", "cell").repartition(4)
      val pairs = Similarity.cellNearDupPairs(df, "vec_id", "embedding", "cell", 2.0)
      // threshold 2.0: zero surviving pairs, but the join runs in full;
      // collect() executes THIS frame's plan so its adaptive plan finalizes
      assert(pairs.collect().isEmpty)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "adaptive plan finalized")
      assert(plan.toLowerCase.contains("skewed"),
        s"expected a skew-split AQEShuffleRead in:\n${plan.take(4000)}")
    }
  }

  test("saltedJoin equals the plain join on a pathologically hot key") {
    // 5000 of 5060 fact rows share ONE key; results must be identical to
    // the plain join, and the hot key's rows must actually spread over
    // multiple salt buckets (the whole point)
    val fact = ((0 until 5000).map(i => (1L, i.toLong)) ++
      (0 until 60).map(i => (2L + i % 3, 10000L + i))).toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (9L, "unmatched"))
      .toDF("dk", "label")
    val salted = graft.ops.Relational
      .saltedJoin(fact, dim, "k", "dk", col("row_id"), 8)
      .select("k", "row_id", "dk", "label")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "row_id", "dk", "label")
    assert(salted.collect().sortBy(r => (r.getLong(0), r.getLong(1))).toSeq ===
      plain.collect().sortBy(r => (r.getLong(0), r.getLong(1))).toSeq)
    val spread = fact.filter(col("k") === 1L)
      .select(pmod(hash(col("row_id")), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 4, s"hot key spread over only $spread of 8 salt buckets")
  }

  test("prefixCounts: exact on a wide value domain, every window keyed, buckets spread") {
    // 20k distinct-value tie blocks with skewed counts — the shape where the
    // old unkeyed running-count window was a single-partition sort
    val rnd = new scala.util.Random(7)
    val blocks = (0 until 20000)
      .map(i => (i.toLong * 17 + rnd.nextInt(5), 1L + rnd.nextInt(9)))
      .distinct.toDF("v", "cnt")
    val pc = graft.ops.Relational
      .prefixCounts(blocks, "v", Seq("cnt"), buckets = 8, totals = true)
    val got = pc.select("v", "cnt", "cnt_less", "cnt_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // brute-force oracle
    val rows = blocks.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = rows.map(_._2).sum
    var run = 0L
    val want = rows.map { case (v, c) => val r = (v, c, run, total); run += c; r }
    assert(got.toSeq === want.toSeq)
    // plan shape: with AQE off the physical tree is directly traversable —
    // every Window must carry a partition spec (the whole point of the op)
    withConfs(Map("spark.sql.adaptive.enabled" -> "false")) {
      val p = graft.ops.Relational
        .prefixCounts(blocks, "v", Seq("cnt"), buckets = 8)
      p.collect()
      val wins = p.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "expected at least one Window node")
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unkeyed window survived: $w"))
    }
    // the quantile bucketing actually spreads the domain (same deterministic
    // percentile call the operator makes)
    val bounds = blocks.agg(percentile_approx(col("v").cast("double"),
      array((1 until 8).map(i => lit(i / 8.0)): _*), lit(10000))).head
      .getSeq[Double](0)
    val spread = blocks.select(col("v").cast("double")).collect()
      .map(r => bounds.count(_ < r.getDouble(0))).distinct.length
    assert(spread >= 6, s"only $spread of 8 buckets populated")
  }

  test("containment hot branch spreads an over-cap shingle's bucket across salts") {
    // per-bucket candidate count in the hot branch is |prefix entries for
    // the shingle| × |per-(shingle,salt) index entries| — with the prefix
    // side fixed, bounding the salt bucket bounds the candidates one task
    // sees. Pin the saltOf contract on a df-80 hot shingle at salts=4:
    // every salt bucket is used and none holds more than half the df
    // (i.e. the single 80-entry bucket the unguarded join would build is
    // genuinely split).
    val ids = (1L to 80L).toDF("id_b")
    val spread = ids.select(graft.llm.Dedup.saltOf(col("id_b"), 4).as("salt"))
      .groupBy("salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(spread.keySet === Set(0, 1, 2, 3), s"all 4 salt buckets used: $spread")
    assert(spread.values.max <= 40, s"no salt bucket holds > half the df: $spread")
  }

  test("salted ops refuse inputs that already carry the reserved __salt column") {
    val tainted = Seq((1L, 0)).toDF("k", "__salt")
    val clean = Seq((1L, "x")).toDF("dk", "label")
    intercept[IllegalArgumentException] {
      graft.ops.Relational.saltedJoin(tainted, clean, "k", "dk", col("k"), 4)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Relational.saltedAgg(tainted, Seq("k"), col("k"), 4,
        Seq(count(lit(1)).as("pc")), Seq(sum(col("pc")).as("n")))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, Serving}

/** Property-style checks for the generic operator library (SURVEY §5). */
class RelationalPropsSpec extends SparkSpec {
  import spark.implicits._

  private val cuts = Seq(0.0, 10.0, 100.0)
  private val labels = Seq("neg", "small", "mid", "big")

  test("bucketize is total and non-overlapping") {
    val vals = Seq(-1e9, -1.0, -0.0001, 0.0, 5.0, 9.999, 10.0, 50.0, 99.99, 100.0, 1e9)
    val df = vals.toDF("v").select(col("v"), Relational.bucketize(col("v"), cuts, labels).as("b"))
    val rows = df.collect()
    assert(rows.forall(!_.isNullAt(1)), "every value gets exactly one bucket")
    val byVal = rows.map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(byVal(-1.0) === "neg" && byVal(0.0) === "small" &&
      byVal(9.999) === "small" && byVal(10.0) === "mid" &&
      byVal(100.0) === "big", "cuts are right-exclusive upper bounds")
  }

  test("bucketizeBetween matches the exclusive chain on contiguous integer ranges") {
    // BETWEEN 1 AND 9 / 10 AND 19 / ... over integers is the same partition
    // as right-exclusive cuts at 10, 20 with a below-range fallback
    val vals = Seq(1L, 9L, 10L, 19L, 20L, 25L)
    val df = vals.toDF("v").select(col("v"),
      Relational.bucketizeBetween(col("v"),
        Seq((1L, 9L, "lo"), (10L, 19L, "mid")), "hi").as("b"))
    val byVal = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byVal === Map(1L -> "lo", 9L -> "lo", 10L -> "mid", 19L -> "mid",
      20L -> "hi", 25L -> "hi"), "bounds are inclusive on both ends")
  }

  test("topKPerGroup returns at most k rows per group, the top-ranked ones") {
    val df = Seq(("a", "x", 5L), ("a", "y", 9L), ("a", "z", 1L),
      ("b", "x", 2L), ("b", "y", 2L)).toDF("g", "c", "n")
    val top2 = Relational.topKPerGroup(df, Seq("g"), Seq(col("n").desc, col("c").asc), 2)
      .collect().groupBy(_.getString(0))
    assert(top2("a").map(_.getString(1)).toSet === Set("y", "x"))
    // tie on n=2 broken by c asc, deterministic
    assert(top2("b").map(_.getString(1)).toSet === Set("x", "y"))
    assert(top2.values.forall(_.length <= 2))
  }

  test("pivotSum row sums equal the unpivoted 2-key aggregate") {
    val df = Tables_lineitem()
    val pivoted = Relational.pivotSum(df, "l_returnflag", "l_linestatus", Seq("F", "O"), "l_quantity")
    val rowSums = pivoted.select(col("l_returnflag"), (col("F") + col("O")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = df.groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rowSums.keySet === direct.keySet)
    rowSums.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }

  private def Tables_lineitem() = graft.engine.Tables(spark, sf).lineitem

  test("histogram bin counts sum to the row count and lo = bin * width") {
    val df = Tables_lineitem()
    val h = Relational.histogram(df, col("l_extendedprice"), 5000.0).collect()
    assert(h.map(_.getLong(1)).sum === df.count())
    h.foreach(r => assert(r.getDouble(2) === r.getLong(0) * 5000.0))
  }

  test("chiSquare matches the hand-computed statistic, zero cells included") {
    import graft.ops.Relational
    // balanced 2x2 with e=15 everywhere: chi2 = 4 * 25/15 = 20/3, dof 1
    val rows = Seq.fill(10)(("A", "X")) ++ Seq.fill(20)(("A", "Y")) ++
      Seq.fill(20)(("B", "X")) ++ Seq.fill(10)(("B", "Y"))
    val r = Relational.chiSquare(rows.toDF("a", "b"), "a", "b").collect().head
    assert(r.getAs[Long]("n") === 60 && r.getAs[Long]("n_cells") === 4)
    assert(r.getAs[Long]("dof") === 1)
    assert(math.abs(r.getAs[Double]("chi2") - 20.0 / 3) < 1e-7)
    assert(math.abs(r.getAs[Double]("cramers_v") - math.sqrt(20.0 / 3 / 60)) < 1e-7)
    // perfect association with two OBSERVED-ZERO cells: they must still
    // contribute (chi2 = n, V = 1)
    val diag = (Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("B", "Y"))).toDF("a", "b")
    val d = Relational.chiSquare(diag, "a", "b").collect().head
    assert(d.getAs[Long]("n_cells") === 4, "zero cells in the grid")
    assert(math.abs(d.getAs[Double]("chi2") - 20.0) < 1e-6)
    assert(math.abs(d.getAs[Double]("cramers_v") - 1.0) < 1e-7)
  }

  test("welchTTest matches the hand-computed statistic") {
    import graft.ops.Relational
    // a = {1,2,3,4,5} (mean 3, var 2.5), b = {2,4,6,8} (mean 5, var 20/3)
    val rows = Seq(1L, 2L, 3L, 4L, 5L).map((true, _)) ++
      Seq(2L, 4L, 6L, 8L).map((false, _))
    val r = Relational.welchTTest(rows.toDF("f", "x"), col("f"), col("x"))
      .collect().head
    assert(r.getAs[Long]("n_a") === 5 && r.getAs[Long]("n_b") === 4)
    assert(math.abs(r.getAs[Double]("mean_a") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_b") - 20.0 / 3) < 1e-12)
    val se2 = 2.5 / 5 + 20.0 / 3 / 4
    assert(math.abs(r.getAs[Double]("t_stat") - (3.0 - 5.0) / math.sqrt(se2)) < 1e-12)
    val dof = se2 * se2 / (math.pow(2.5 / 5, 2) / 4 + math.pow(20.0 / 3 / 4, 2) / 3)
    assert(math.abs(r.getAs[Double]("dof") - dof) < 1e-9)
    // a degenerate side (n=1) must yield t = 0 / dof = 0, not NaN
    val d = Relational.welchTTest(
      Seq((true, 7L), (false, 1L), (false, 2L)).toDF("f", "x"),
      col("f"), col("x")).collect().head
    assert(d.getAs[Double]("t_stat") === 0.0 && d.getAs[Double]("dof") === 0.0)
  }

  test("mannWhitney matches the hand-computed statistic, ties exact") {
    import graft.ops.Relational
    // a = {1,2,4}, b = {2,3}: ranks (1, 2.5, 5 | 2.5, 4) → U_a = 2.5
    val rows = Seq(1L, 2L, 4L).map((true, _)) ++ Seq(2L, 3L).map((false, _))
    val r = Relational.mannWhitney(rows.toDF("f", "x"), col("f"), col("x"))
      .collect().head
    assert(r.getAs[Long]("n_a") === 3 && r.getAs[Long]("n_b") === 2)
    assert(math.abs(r.getAs[Double]("u_stat") - 2.5) < 1e-12)
    // z = (2U − n_a·n_b) / (2·√VarU) with the tie-corrected variance
    val varU = 3.0 * 2.0 / 12.0 * (6.0 - 6.0 / 20.0)
    assert(math.abs(r.getAs[Double]("z_stat")
      - (5.0 - 6.0) / (2.0 * math.sqrt(varU))) < 1e-12)
    // all values tied → VarU = 0 → z = 0, and U = n_a·n_b/2 exactly
    val t = Relational.mannWhitney(
      Seq((true, 5L), (true, 5L), (false, 5L)).toDF("f", "x"),
      col("f"), col("x")).collect().head
    assert(t.getAs[Double]("u_stat") === 1.0 && t.getAs[Double]("z_stat") === 0.0)
  }

  test("ksTest is exact on separated and interleaved samples") {
    import graft.ops.Relational
    // fully separated samples → D = 1
    val sep = (Seq(1L, 2L).map((true, _)) ++ Seq(3L, 4L).map((false, _)))
      .toDF("f", "x")
    assert(Relational.ksTest(sep, col("f"), col("x"))
      .collect().head.getAs[Double]("d_stat") === 1.0)
    // interleaved a = {1,3}, b = {2,4} → D = 1/2 (exact integer max)
    val mix = (Seq(1L, 3L).map((true, _)) ++ Seq(2L, 4L).map((false, _)))
      .toDF("f", "x")
    val m = Relational.ksTest(mix, col("f"), col("x")).collect().head
    assert(m.getAs[Long]("n_a") === 2 && m.getAs[Long]("n_b") === 2)
    assert(m.getAs[Double]("d_stat") === 0.5)
    // one empty side degrades to 0, not NaN
    val e = Relational.ksTest(Seq((true, 1L), (true, 2L)).toDF("f", "x"),
      col("f"), col("x")).collect().head
    assert(e.getAs[Double]("d_stat") === 0.0)
  }

  test("giniIndex matches hand-computed concentration, ties exact") {
    import graft.ops.Relational
    // x = {1,2,3,4}: G = 2*30/(4*10) - 5/4 = 0.25
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("k", "v")
    val r = Relational.giniIndex(df, "k", col("v")).collect().head
    assert(r.getAs[Long]("n") === 4 && r.getAs[Long]("total") === 10)
    assert(math.abs(r.getAs[Double]("gini") - 0.25) < 1e-12)
    // perfectly equal totals (ties collapse into one block) → G = 0
    val eq = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("k", "v")
    val g0 = Relational.giniIndex(eq, "k", col("v")).collect().head
    assert(g0.getAs[Double]("gini") === 0.0)
    // multi-row keys aggregate before ranking: {1:1+2, 2:3} = {3,3} → G = 0
    val agg = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("k", "v")
    assert(Relational.giniIndex(agg, "k", col("v"))
      .collect().head.getAs[Double]("gini") === 0.0)
  }

  test("spearman is ±1 on monotone data and handles ties") {
    import graft.ops.Relational
    val up = Seq((1L, 10L), (2L, 40L), (3L, 90L)).toDF("x", "y")
    assert(math.abs(Relational.spearman(up, "x", "y")
      .collect().head.getAs[Double]("spearman_rho") - 1.0) < 1e-12)
    val down = Seq((1L, 90L), (2L, 40L), (3L, 10L)).toDF("x", "y")
    assert(math.abs(Relational.spearman(down, "x", "y")
      .collect().head.getAs[Double]("spearman_rho") + 1.0) < 1e-12)
    // tie in x: avg ranks (1.5, 1.5, 3) vs (1, 2, 3) → rho = sqrt(3)/2
    val tied = Seq((5L, 10L), (5L, 20L), (9L, 30L)).toDF("x", "y")
    assert(math.abs(Relational.spearman(tied, "x", "y")
      .collect().head.getAs[Double]("spearman_rho") - math.sqrt(3.0) / 2) < 1e-12)
  }

  test("basketAffinity computes exact support/confidence/lift") {
    import graft.ops.Relational
    // baskets 1:{A,B,C} (A dup collapses), 2:{A,B}, 3:{B}
    val df = Seq((1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (3L, "B")).toDF("o", "i")
    val r = Relational.basketAffinity(df, col("o"), col("i"))
      .orderBy("item_a", "item_b").collect()
    assert(r.map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq ===
      Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)))
    val ab = r(0)
    assert(math.abs(ab.getAs[Double]("support") - 2.0 / 3) < 1e-15)
    assert(ab.getAs[Double]("confidence") === 1.0)
    assert(ab.getAs[Double]("lift") === 1.0) // 2·3/(2·3)
    val ac = r(1)
    assert(ac.getAs[Double]("lift") === 1.5) // 1·3/(2·1)
  }

  test("fuzzyJoinBlocked matches only within blocks, exact distance") {
    import graft.ops.Relational
    val df = Seq(
      (1L, 10L, "alpha"), (1L, 11L, "alphb"),  // dist 1, same block
      (1L, 12L, "omega"),                      // too far from both
      (2L, 13L, "alpha")                       // dist 0 to id 10 but blocked
    ).toDF("k", "id", "s")
    val r = Relational.fuzzyJoinBlocked(df, col("k"), col("id"), col("s"), 1)
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("id_a") === 10L &&
      r.head.getAs[Long]("id_b") === 11L && r.head.getAs[Long]("dist") === 1L)
  }

  test("fuzzyPairsDist1 equals the blocked brute force at maxDist 1") {
    import graft.ops.Relational
    // covers all three dist-1 shapes: substitution, indel, equal strings —
    // plus a >1 pair that must be excluded and a cross-block near-pair
    val df = Seq(
      (1L, 1L, "abcd"), (1L, 2L, "abed"),  // substitution
      (1L, 3L, "abc"),                     // deletion of id 1
      (1L, 4L, "abcd"),                    // equal to id 1
      (1L, 5L, "azzd"),                    // dist 2 from id 1
      (2L, 6L, "abcd")                     // equal but different block
    ).toDF("k", "id", "s")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("dist"))
    val fast = Relational.fuzzyPairsDist1(df, col("k"), col("id"), col("s"))
      .collect().map(key).toSet
    val brute = Relational.fuzzyJoinBlocked(df, col("k"), col("id"), col("s"), 1)
      .collect().map(key).toSet
    assert(fast === brute)
    assert(fast === Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 0L),
      (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  test("rrfFuse ranks deterministically and sums at most two addends") {
    import graft.ops.Relational
    val a = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("id", "score")
    val b = Seq((2L, 9L), (4L, 8L)).toDF("id", "score")
    val r = Relational.rrfFuse(a, b, "id", 60, 10, 10).collect()
    // id 2: rank 2 in a, rank 1 in b → 1/62 + 1/61 (the max) and 2 lists
    assert(r.head.getAs[Long]("id") === 2L)
    assert(r.head.getAs[Long]("n_lists") === 2L)
    assert(r.head.getAs[Double]("rrf_score") === 1.0 / 62 + 1.0 / 61)
    // singles keep their 1/(60+r); topN bound caps the candidate set
    val m = r.map(x => x.getAs[Long]("id") -> x.getAs[Double]("rrf_score")).toMap
    assert(m(1L) === 1.0 / 61 && m(4L) === 1.0 / 62)
    assert(Relational.rrfFuse(a, b, "id", 60, 1, 10).count() === 2)
  }

  test("countIf equals filter().count") {
    val df = graft.engine.Tables(spark, sf).events
    val a = df.agg(Relational.countIf(col("value") > 100)).head.getLong(0)
    assert(a === df.filter(col("value") > 100).count())
  }

  test("rank statistics are partitioning-invariant (tie-block arithmetic)") {
    import graft.ops.Relational
    val ev = graft.engine.Tables(spark, sf).events
      .withColumn("cents", (col("value").cast("decimal(18,2)") * 100).cast("long"))
    val flag = col("user_id") % 10 === 0
    def run(df: org.apache.spark.sql.DataFrame) = (
      Relational.mannWhitney(df, flag, col("cents")).collect().head.toSeq,
      Relational.ksTest(df, flag, col("cents")).collect().head.toSeq)
    val one = run(ev.coalesce(1))
    val many = run(ev.repartition(13))
    assert(one === many, "bit-identical across partitionings")
  }

  test("moneySum is partitioning-invariant (decimal accumulation)") {
    val df = Tables_lineitem()
    val one = df.coalesce(1).agg(Relational.moneySum(col("l_extendedprice"))).head.getDouble(0)
    val many = df.repartition(13).agg(Relational.moneySum(col("l_extendedprice"))).head.getDouble(0)
    assert(one === many, "bit-identical across partitionings")
  }

  test("bucketize with no cuts is the constant label") {
    val out = Seq(1.0, -5.0).toDF("v")
      .select(Relational.bucketize(col("v"), Nil, Seq("only")).as("b"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("only", "only"))
  }

  test("whereEq filters to the exact key") {
    val df = graft.engine.Tables(spark, sf).events
    val n = Serving.whereEq(df, "event_type", "purchase").count()
    assert(n === df.filter(col("event_type") === "purchase").count() && n > 0)
  }

  test("approxDistinct within 5% of exact; approxQuantiles bracket the median") {
    val df = graft.engine.Tables(spark, sf).lineitem
    val exact = df.select(col("l_orderkey")).distinct().count().toDouble
    val approx = df.agg(Relational.approxDistinct(col("l_orderkey"))).head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
    val qs = df.agg(Relational.approxQuantiles(col("l_extendedprice"), Seq(0.1, 0.5, 0.9)))
      .head.getSeq[Double](0)
    assert(qs.length === 3 && qs(0) <= qs(1) && qs(1) <= qs(2))
  }

  test("slidingDistinctHll within 5% of the exact rolling distinct, every day covered") {
    val e = graft.engine.Tables(spark, sf).events
      .select(to_date(col("ts")).as("event_day"), col("user_id"))
    val approx = Relational
      .slidingDistinctHll(e, col("event_day"), col("user_id"), 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = e.select(explode(sequence(col("event_day"),
        date_add(col("event_day"), 6))).as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (day, n) =>
      assert(math.abs(approx(day) - n).toDouble / n < 0.05,
        s"$day: hll ${approx(day)} vs exact $n")
    }
  }

  test("exactQuantilesGlobal equals the sorted nearest-rank selection, ties included") {
    val rnd = new scala.util.Random(11)
    // heavy ties on purpose: values drawn from a small domain
    val xs = Seq.fill(5000)(rnd.nextInt(40).toLong * 7)
    val df = xs.map(Tuple1(_)).toDF("x")
    val got = Relational
      .exactQuantilesGlobal(df, col("x"), Seq(100, 500, 900, 990))
      .collect().head
    val sorted = xs.sorted
    def wantP(p: Int): Long = sorted((p * xs.length + 999) / 1000 - 1)
    assert(got.getAs[Long]("n") === xs.length.toLong)
    Seq(100, 500, 900, 990).foreach { p =>
      assert(got.getAs[Long](s"p$p") === wantP(p), s"p$p mismatch")
    }
  }

  test("equidepthHistogram: mass-balanced buckets, tie blocks never split, exact vs brute") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(4000)(rnd.nextInt(500).toLong)
    val df = xs.map(Tuple1(_)).toDF("x")
    val got = Relational.equidepthHistogram(df, col("x"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // brute force: same bucket rule over the sorted distinct blocks
    val blocks = xs.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = xs.length.toLong
    var less = 0L
    val want = blocks.map { case (v, cnt) =>
      val b = less * 8 / n; less += cnt; (b, v, cnt)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, vs) =>
      (b, vs.map(_._2).min, vs.map(_._2).max,
        vs.map(_._3).sum, vs.size.toLong)
    }
    assert(got.toSeq === want)
    assert(got.map(_._4).sum === n, "bucket masses sum to the row count")
    assert(got.map(_._1).toSeq === got.map(_._1).sorted.toSeq)
  }

  test("saltedAgg equals the direct aggregate") {
    val df = graft.engine.Tables(spark, sf).lineitem
    val direct = df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), Relational.moneySum(col("l_extendedprice")).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Relational.saltedAgg(df, Seq("l_returnflag"),
        spreadBy = col("l_orderkey"), saltBuckets = 8,
        partials = Seq(count(lit(1)).as("pn"),
          sum(Relational.moneyDec(col("l_extendedprice"))).as("pt")),
        finals = Seq(sum(col("pn")).as("n"), sum(col("pt")).cast("double").as("total")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted === direct, "two-phase salted aggregation is exact")
  }

  test("TtlCache rebuilds only after expiry") {
    var now = 0L
    var builds = 0
    val cache = new graft.engine.TtlCache(
      () => { builds += 1; Seq(builds).toDF("b") }, ttlMillis = 100, clock = () => now)
    cache.get(); cache.get()
    assert(builds === 1, "fresh within TTL")
    now = 150
    cache.get()
    assert(builds === 2, "rebuilt after expiry")
    assert(cache.isFresh)
  }

  test("exact percentiles follow the nearest-rank definition per group") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 40L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("b", 5L, 7L)
    ).toDF("g", "id", "v")
    val got = Relational.exactPercentiles(df, Seq("g"), "v", "id",
        Seq(0.25, 0.5, 0.75, 0.9, 1.0))
      .orderBy("g").collect()
    // group a sorted: 10 20 30 40; ranks ceil(p·4) = 1,2,3,4,4
    assert(got(0).getLong(1) === 10L && got(0).getLong(2) === 20L &&
      got(0).getLong(3) === 30L && got(0).getLong(4) === 40L &&
      got(0).getLong(5) === 40L)
    // singleton group: every percentile is the single value
    assert((1 to 5).forall(i => got(1).getLong(i) === 7L))
  }

  test("MAD is outlier-immune: a huge value moves the mean but not the spread") {
    val df = ((1 to 9).map(i => ("a", i.toLong, i.toDouble)) :+ (("a", 10L, 1000.0)))
      .toDF("g", "id", "v")
    val r = Relational.madStats(df, Seq("g"), "v", "id").collect().head
    // 10 rows: median = rank-5 value = 5.0; |v-5| sorted has rank-5 = 2.0
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 5.0 && r.getDouble(3) === 2.0)
  }

  test("winsorized stats clip outliers at the group's own percentile cuts") {
    val df = ((1 to 19).map(i => ("a", i.toLong, i.toDouble)) :+ (("a", 20L, 1000.0)))
      .toDF("g", "id", "v")
    val r = Relational.winsorizedStats(df, Seq("g"), "v", "id", 0.05, 0.95)
      .collect().head
    // nearest-rank cuts over 20 rows: p50‰ → rank 1 (1.0), p950‰ → rank 19 (19.0)
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 19.0)
    // winsorized mean clamps the 1000.0 outlier to 19.0: (190 + 19) / 20
    assert(r.getDouble(4) === 10.45)
    assert(r.getDouble(5) === 59.5, "raw mean keeps the outlier")
  }

  test("regressionByGroup: exact fit on linear data, degenerate guards") {
    val df = Seq(
      ("a", 1L, 12L), ("a", 2L, 14L), ("a", 3L, 16L), ("a", 4L, 18L),
      ("b", 5L, 7L), ("b", 6L, 7L),   // y constant: r = 0, slope 0
      ("c", 9L, 1L), ("c", 9L, 5L),   // x constant: r = 0, slope 0
    ).toDF("g", "x", "y")
    val m = Relational.regressionByGroup(df, Seq("g"), "x", "y")
      .select($"g", $"n", $"r", $"slope", $"intercept")
      .as[(String, Long, Double, Double, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(m("a") === ((4L, 1.0, 2.0, 10.0)), "y = 2x + 10 exactly")
    assert(m("b") === ((2L, 0.0, 0.0, 7.0)))
    assert(m("c")._2 === 0.0 && m("c")._3 === 0.0)
    assert(m("c")._4 === 3.0, "slope-0 intercept degrades to mean(y)")
  }

  test("zscoreByGroup: exact moments, zero-variance guard, rank ties") {
    val df = Seq(
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 4L), ("a", 4L, 10L),
      ("b", 5L, 7L), ("b", 6L, 7L),
    ).toDF("g", "id", "x")
    val out = Relational.zscoreByGroup(df, "g", "x", "id")
      .select($"id", $"z", $"pr").as[(Long, Double, Double)]
      .collect().map { case (id, z, p) => id -> ((z, p)) }.toMap
    // group a: sx=20 sxx=136 n=4 -> mean 5, var 136/4-25=9, sd 3
    assert(out(1L) === ((-1.0, 0.0)))
    assert(math.abs(out(2L)._1 - (-1.0 / 3.0)) < 1e-12 && out(2L)._2 === 1.0 / 3.0)
    assert(out(3L)._2 === 2.0 / 3.0, "tie on x=4 broken by id")
    assert(math.abs(out(4L)._1 - 5.0 / 3.0) < 1e-12 && out(4L)._2 === 1.0)
    // zero-variance group: z = 0, not NaN
    assert(out(5L)._1 === 0.0 && out(6L)._1 === 0.0)
  }
}

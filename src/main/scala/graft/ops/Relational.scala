package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operator builders — the engine's reusable surface.
  *
  * Every builder is a pure `DataFrame => DataFrame` (or `Column => Column`)
  * combinator over the declarative API, so Catalyst keeps full optimization
  * freedom (pushdown, pruning, partial aggregation, AQE join selection).
  * Nothing here collects to the driver or fixes a physical strategy.
  *
  * Reference semantics being generalized (see SURVEY.md §2):
  *  - CASE bucketing        bigquery_views.sql:5-12
  *  - top-k per group       bigquery_views.sql:34,63,91 (QUALIFY ROW_NUMBER)
  *  - ordered array agg     bigquery_views.sql:97
  *  - pivot / crosstab      streamlit_app.py:645-651,882-888
  *  - histogram binning     streamlit_app.py:455-462
  *  - value_counts          streamlit_app.py:426,727,907
  *  - hourly time bucket    streamlit_app.py:374-379
  */
object Relational {

  /** CASE-chain bucketing: `cuts` are right-exclusive upper bounds; a value
    * below cuts(i) (and not below any earlier cut) gets labels(i); values
    * >= last cut get labels.last. labels.length == cuts.length + 1.
    * Mirrors bigquery_views.sql:5-12 (age → '18-24' … '65+').
    */
  def bucketize(c: Column, cuts: Seq[Double], labels: Seq[String]): Column = {
    require(labels.length == cuts.length + 1, "labels must be cuts+1")
    cuts.zip(labels).foldRight(lit(labels.last): Column) {
      case ((cut, label), acc) => when(c < lit(cut), lit(label)).otherwise(acc)
    }
  }

  /** Inclusive-range CASE bucketing spelled with BETWEEN — the reference's
    * literal predicate form (`age BETWEEN 25 AND 34`,
    * bigquery_views.sql:6-10). Same totality argument as [[bucketize]]'s
    * right-exclusive chain for integer-valued columns; this variant exists
    * so the operator surface carries the inclusive spelling 1:1. Values
    * matching no range get `fallback` (the reference's ELSE '65+').
    */
  def bucketizeBetween(c: Column, ranges: Seq[(Long, Long, String)],
                       fallback: String): Column =
    ranges.foldRight(lit(fallback): Column) {
      case ((lo, hi, label), acc) =>
        when(c.between(lit(lo), lit(hi)), lit(label)).otherwise(acc)
    }

  /** Top-k rows per group, ranked by `order` (add explicit tie-break columns
    * for determinism). Emulates BigQuery QUALIFY ROW_NUMBER() <= k.
    * One shuffle on `keys`; Spark >= 3.5 inserts WindowGroupLimit so each
    * partition keeps only k rows before the final sort — scales to
    * high-cardinality keys without materializing full groups.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** ARRAY_AGG(value ORDER BY rankBy DESC, value ASC) — deterministic ordered
    * array aggregation (bigquery_views.sql:97) without a custom UDAF:
    * collect structs, sort the completed array, project the payload.
    * collect_list is partial-aggregated map-side; the sort runs on the final
    * (small, <= group cardinality) arrays only.
    */
  def orderedArrayAggDesc(rankBy: Column, value: Column): Column =
    transform(
      sort_array(collect_list(
        // null payloads (e.g. the unmatched side of an outer join) must not
        // become a struct-of-nulls array element: collect_list skips nulls,
        // so a when(...) with no otherwise drops them.
        when(value.isNotNull && rankBy.isNotNull,
          struct((-rankBy).as("r"), value.as("v"))))),
      x => x.getField("v"))

  /** value_counts: group-count sorted descending with a deterministic
    * tie-break on the key (streamlit_app.py:426 et al.).
    */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(c).asc)

  /** Fixed-width histogram over `c`: bin i covers [i*width, (i+1)*width).
    * floor(col/width) keeps the whole computation in one hash aggregate
    * (streamlit_app.py:455-462 nbins histograms).
    */
  def histogram(df: DataFrame, c: Column, width: Double): DataFrame =
    df.groupBy(floor(c / lit(width)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bin") * width)
      .orderBy("bin")

  /** pivot_table(index=rowKey, columns=pivotKey, values=..., aggfunc=sum,
    * fill_value=0) with EXPLICIT pivot values (required for deterministic
    * output schema and for streaming/foreachBatch use) —
    * streamlit_app.py:645-651.
    */
  def pivotSum(df: DataFrame, rowKey: String, pivotKey: String,
               values: Seq[String], valueCol: String): DataFrame =
    df.groupBy(col(rowKey))
      .pivot(pivotKey, values)
      .sum(valueCol)
      .na.fill(0)
      .orderBy(rowKey)

  /** Tumbling time bucket: truncate ts to `unit` ('hour', 'day', ...) and
    * aggregate. Batch analog of groupBy(window(ts, "1 hour")) —
    * streamlit_app.py:374-379.
    */
  def timeBucketAgg(df: DataFrame, ts: Column, unit: String, aggs: Seq[Column]): DataFrame =
    df.groupBy(date_trunc(unit, ts).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("bucket")

  /** count_if — boolean-count aggregate (streamlit_app.py:347 is_anomaly.sum()). */
  def countIf(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  /** Skew-safe two-phase aggregate: hot keys are spread over `saltBuckets`
    * partial groups (random-free: salt = hash of a spread column mod N, so
    * the result is deterministic), partially aggregated, then combined.
    * `partials` must be decomposable (sum/count-as-sum/min/max); the second
    * phase re-aggregates them with `finals` over the real keys. Use when a
    * groupBy key's biggest group exceeds an executor's aggregate state
    * (AQE rebalances shuffle *reads*, not partial-agg state).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], spreadBy: Column, saltBuckets: Int,
                partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__salt"),
      "input already has a __salt column — rename it before saltedAgg")
    val salted = df.withColumn("__salt", pmod(hash(spreadBy), lit(saltBuckets)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Skew-safe equi-join, the join-side complement of [[saltedAgg]]: the
    * fact side's rows spread over `saltBuckets` sub-keys (deterministic
    * hash of `spreadBy`, a high-cardinality disambiguator) and the
    * dimension side replicates once per bucket, so a hot join key lands on
    * `saltBuckets` reducers instead of one. Results ≡ the plain inner
    * join under any partitioning — salting must be invisible, which is
    * what the oracle asserts. Use when a shuffled join's key histogram is
    * too skewed for AQE's split threshold (replication factor is the
    * price: dim side × saltBuckets).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, spreadBy: Column, saltBuckets: Int): DataFrame = {
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column — rename it before saltedJoin")
    val f = fact.withColumn("__salt", pmod(hash(spreadBy), lit(saltBuckets)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }

  /** Sketch-based distinct count (HyperLogLog++): the 100 TB substitute for
    * exact countDistinct — fixed-size state, partial-aggregated map-side,
    * no distinct shuffle. `rsd` is the target relative standard deviation.
    * Not oracle-comparable (approximate by design); accuracy is
    * property-tested instead.
    */
  def approxDistinct(c: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(c, rsd)

  /** Sketch-based quantiles: fixed-size state per group vs a full sort.
    * `accuracy` trades state size for error (1/accuracy relative rank
    * error).
    */
  def approxQuantiles(c: Column, probs: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c, array(probs.map(lit): _*), lit(accuracy))

  /** Sliding-window approximate distinct via MERGEABLE HLL sketches — the
    * scale path for rolling-active-style metrics. The exact formulation
    * replicates every raw row `window`× (explode over the window days) so
    * the per-day countDistinct sees each contributing row: a ×7/×30 row
    * multiplier on the FACT table. Here the fact table is reduced FIRST to
    * one DataSketches HLL sketch per day (map-side partial aggregation,
    * fixed sketch size, one shuffle at day cardinality), and only the
    * ≤|days| sketch rows are replicated and union-merged per window —
    * the replication factor applies to the day domain, not the corpus.
    * Output: `(day, approx_active)` with the union sketch's estimate
    * (lgConfigK 12 ≈ 1.6% rsd; bounds gate-checked by
    * `rolling_active_hll_bounds`).
    */
  def slidingDistinctHll(df: DataFrame, day: Column, id: Column,
                         window: Int): DataFrame =
    df.groupBy(day.as("day"))
      .agg(hll_sketch_agg(id).as("__sk"))
      .select(explode(sequence(col("day"), date_add(col("day"), window - 1)))
        .as("day"), col("__sk"))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("approx_active"))

  /** Exact per-group discrete percentiles: for each probability p, the value
    * at row ceil(p·n) of the group's (value, tieBreak)-sorted order — the
    * classic "nearest-rank" definition, fully deterministic and
    * engine-portable (rank arithmetic runs in millesimal integers, so there
    * is no float-boundary disagreement with the SQL oracle, unlike
    * interpolating quantile_cont variants). One window pass per group plus
    * one aggregate; the window partitions by the group key, so the sort is
    * per-group, never global. The exact complement of [[approxQuantiles]]:
    * use this when groups fit a partition's sort budget, the sketch when
    * they don't.
    */
  def exactPercentiles(df: DataFrame, keys: Seq[String], valueCol: String,
                       tieBreak: String, ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol), col(tieBreak))
    val cw = Window.partitionBy(keys.map(col): _*)
    val ranked = df.select((keys :+ valueCol :+ tieBreak).map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
    val aggs = ps.map { p =>
      val pm = (p * 1000).round // ceil(p·n) = floor((pm·n + 999) / 1000)
      val target = floor((lit(pm) * col("__n") + lit(999L)) / lit(1000.0))
      max(when(col("__rn") === target, col(valueCol))).as(s"p${pm}")
    }
    ranked.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Median absolute deviation per group — the robust spread companion to
    * [[winsorizedStats]]' robust mean: MAD = median(|v − median(v)|),
    * immune to the outliers that inflate a standard deviation. Two
    * [[exactPercentiles]] passes (group-local sorts, no global shuffle);
    * the deviation is a single IEEE subtraction per row, so the result is
    * engine-exact like the percentiles themselves.
    */
  def madStats(df: DataFrame, keys: Seq[String], valueCol: String,
               tieBreak: String): DataFrame = {
    val med = exactPercentiles(df, keys, valueCol, tieBreak, Seq(0.5))
      .withColumnRenamed("p500", "median")
    val dev = df.join(broadcast(med), keys)
      .withColumn("__dev", abs(col(valueCol) - col("median")))
    val mad = exactPercentiles(dev, keys, "__dev", tieBreak, Seq(0.5))
      .withColumnRenamed("p500", "mad")
    val n = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    n.join(med, keys).join(mad, keys)
      .select((keys.map(col) :+ col("n") :+ col("median") :+ col("mad")): _*)
  }

  /** Winsorized (outlier-clipped) summary per group: values are clamped to
    * the group's [pLo, pHi] nearest-rank percentiles before aggregating —
    * the robust mean for heavy-tailed metrics, where a handful of extreme
    * rows would otherwise own the average. Cut points come from
    * [[exactPercentiles]]; the clamped mean accumulates in DECIMAL so the
    * result is partitioning-invariant (clamping preserves the 2-decimal
    * money grid — both bounds are existing values). Two exchanges total:
    * the percentile window and the final aggregate; the cut-point frame is
    * group-cardinality and broadcasts.
    */
  def winsorizedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                      tieBreak: String, pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, s"pLo < pHi required: $pLo, $pHi")
    val lo = s"p${(pLo * 1000).round}"
    val hi = s"p${(pHi * 1000).round}"
    val cuts = exactPercentiles(df, keys, valueCol, tieBreak, Seq(pLo, pHi))
      .withColumnRenamed(lo, "lo_cut").withColumnRenamed(hi, "hi_cut")
    val clamped = least(greatest(col(valueCol), col("lo_cut")), col("hi_cut"))
    df.join(broadcast(cuts), keys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(col("lo_cut")).as("lo_cut"), // constant within the group
        min(col("hi_cut")).as("hi_cut"),
        round((sum(moneyDec(clamped)).cast("double") / count(lit(1))), 4)
          .as("winsorized_mean"),
        round((sum(moneyDec(col(valueCol))).cast("double") / count(lit(1))), 4)
          .as("raw_mean"))
  }

  /** Per-group z-score and percentile rank over an INTEGER-quantized
    * value: the engine-exact normalization pass (score calibration before
    * corpus mixing). Moments accumulate as DECIMAL(38,0) sums of the
    * integer values — partial aggregation stays exact in any partitioning
    * and any corpus size — and only the final per-group scalars drop to
    * IEEE doubles, so z is bit-reproducible (the caller quantizes, e.g.
    * micro-units; per-row squares must stay inside long: |x| ≤ ~3e9).
    * Zero-variance groups get z = 0 (not NaN — NaN would poison every
    * downstream comparison). percent_rank breaks value ties by `tieBreak`
    * for a total order. Cost: one aggregate + one window, both keyed on
    * `group` (one exchange, reused), and a broadcast of the group stats.
    */
  def zscoreByGroup(df: DataFrame, group: String, x: String,
                    tieBreak: String): DataFrame = {
    val stats = df.groupBy(group).agg(
      count(lit(1)).as("__n"),
      sum(col(x).cast("decimal(38,0)")).cast("double").as("__sx"),
      sum((col(x) * col(x)).cast("decimal(38,0)")).cast("double").as("__sxx"))
    val mean = col("__sx") / col("__n")
    val variance = col("__sxx") / col("__n") - mean * mean
    df.join(broadcast(stats), Seq(group))
      .withColumn("z",
        when(variance <= 0, 0.0).otherwise((col(x) - mean) / sqrt(variance)))
      .withColumn("pr", percent_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(group).orderBy(col(x), col(tieBreak))))
      .drop("__n", "__sx", "__sxx")
  }

  /** Chi-square test of independence over two categorical columns,
    * engine-exact: observed counts come from one hash aggregate; the full
    * level grid (including observed-zero cells, which still contribute to
    * the statistic) is the broadcast cross of the two tiny level sets;
    * expected counts and each cell's (o−e)²/e term are IEEE doubles in a
    * declared order, then every term is floor-quantized to nanos and
    * summed EXACTLY as longs — the sum is partitioning-invariant, unlike a
    * raw double sum over the cells. Output: one row with n, cell/level
    * counts, dof, chi2, and Cramér's V.
    */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df.groupBy(col(a), col(b)).agg(count(lit(1)).as("n"))
    val la = df.select(col(a)).distinct()
    val lb = df.select(col(b)).distinct()
    val grid = la.join(broadcast(lb)) // tiny level-set cross, by design
      .join(cells, Seq(a, b), "left")
      .select(col(a), col(b), coalesce(col("n"), lit(0L)).as("n"))
    val ra = grid.groupBy(col(a)).agg(sum(col("n")).as("ra"))
    val cb = grid.groupBy(col(b)).agg(sum(col("n")).as("cb"))
    val tot = grid.agg(sum(col("n")).as("tot"),
      countDistinct(col(a)).as("na"), countDistinct(col(b)).as("nb"))
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("tot").cast("double")
    val term = (col("n").cast("double") - col("e")) *
      (col("n").cast("double") - col("e")) / col("e")
    grid
      .join(broadcast(ra), Seq(a)).join(broadcast(cb), Seq(b))
      .join(broadcast(tot))
      .withColumn("e", e)
      .withColumn("term_nano", floor(term * 1e9).cast("long"))
      .agg(max(col("tot")).as("n"),
        count(lit(1)).as("n_cells"),
        max(col("na")).as("n_levels_a"), max(col("nb")).as("n_levels_b"),
        max((col("na") - 1) * (col("nb") - 1)).as("dof"),
        (sum(col("term_nano")).cast("double") / 1e9).as("chi2"))
      .withColumn("cramers_v",
        sqrt(col("chi2") / (col("n").cast("double") *
          least(col("n_levels_a") - 1, col("n_levels_b") - 1).cast("double"))))
  }

  /** Welch's unequal-variance t-test between the two halves of a boolean
    * split, engine-exact: per-side counts and first/second moments of the
    * INTEGER-quantized value accumulate in ONE conditional hash aggregate
    * as DECIMAL(38,0) (exact in any partitioning); the means, unbiased
    * variances, t statistic, and Welch–Satterthwaite degrees of freedom
    * are IEEE doubles derived from those exact scalars in a declared
    * operation order, so the result is bit-reproducible. Degenerate
    * inputs (a side with < 2 rows, zero pooled standard error) get
    * t = 0 / dof = 0 rather than NaN. Cost: ONE aggregate, no join.
    * The caller quantizes (e.g. cents); per-row squares must fit a long.
    */
  def welchTTest(df: DataFrame, flag: Column, x: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def mom(p: Column, s: String) = Seq(
      count(when(p, lit(1))).as(s"n_$s"),
      sum(when(p, dec(x))).cast("double").as(s"__sx_$s"),
      sum(when(p, dec(x * x))).cast("double").as(s"__sxx_$s"))
    val m = mom(flag, "a") ++ mom(!flag, "b")
    def mean(s: String) = col(s"__sx_$s") / col(s"n_$s")
    def variance(s: String) =
      (col(s"__sxx_$s") - col(s"__sx_$s") * col(s"__sx_$s") / col(s"n_$s")) /
        (col(s"n_$s") - 1)
    val va = col("var_a") / col("n_a")
    val vb = col("var_b") / col("n_b")
    val se2 = va + vb
    val degenerate = col("n_a") < 2 || col("n_b") < 2
    df.agg(m.head, m.tail: _*)
      .withColumn("mean_a", mean("a")).withColumn("mean_b", mean("b"))
      .withColumn("var_a", when(col("n_a") < 2, 0.0).otherwise(variance("a")))
      .withColumn("var_b", when(col("n_b") < 2, 0.0).otherwise(variance("b")))
      .withColumn("t_stat", when(degenerate || se2 <= 0, 0.0)
        .otherwise((col("mean_a") - col("mean_b")) / sqrt(se2)))
      .withColumn("dof", when(degenerate || se2 <= 0, 0.0)
        .otherwise(se2 * se2 /
          (va * va / (col("n_a") - 1) + vb * vb / (col("n_b") - 1))))
      .drop("__sx_a", "__sxx_a", "__sx_b", "__sxx_b")
  }

  /** Distributed exclusive prefix counts — the scale-safe replacement for
    * an unkeyed running-count window over a tie-block frame. For blocks
    * `(v, cnt…)` it appends, per count column c, `${c}_less` = Σ c over all
    * blocks with v strictly smaller, without ever funneling the frame
    * through one partition:
    *  1. each block gets a bucket id = how many of B−1 approximate value
    *     quantiles it exceeds. ANY v-monotone assignment is correct — the
    *     quantiles only buy balance, so the approximation (and the lossy
    *     double cast inside it) affects speed, never the answer;
    *  2. the ≤B per-bucket subtotals get their exclusive prefix (and grand
    *     total, when `totals`) via a broadcast triangular self-join — no
    *     window at all on the tiny frame;
    *  3. a bucket-PARTITIONED window adds the local exclusive running sum
    *     to the broadcast bucket offset.
    * All count arithmetic stays in longs, so the result equals the unkeyed
    * window's under any partitioning. With `totals = true` also appends
    * `${c}_total` (the grand sum, same broadcast — saves consumers a second
    * pass over the input). This is the standard distributed-rank
    * construction; at 100× the widest per-bucket frame is |blocks|/B and
    * B scales with the cluster, so no stage sees the whole value domain.
    *
    * Recompute discipline (the curated_corpus idiom): the block frame feeds
    * a diamond — quantile bounds, bucket subtotals ×2 (triangular-join
    * sides), and the main pass — and column pruning specializes each
    * branch's canonical plan, so exchange reuse cannot dedupe the upstream
    * aggregate (it would run ~5×, re-scanning the INPUT each time). A
    * `localCheckpoint` pins the already-aggregated block frame (the small
    * side — distinct values, not rows) so every branch reads the
    * materialized blocks instead of re-running their lineage.
    *
    * `buckets` must be a power of two (> 1): the bucket assignment is an
    * unrolled binary search whose probe-index bound (k + step ≤ B − 1)
    * only holds for B = 2^m. Callers with another B should round up.
    */
  def prefixCounts(blocks: DataFrame, v: String, cnts: Seq[String],
                   buckets: Int = 64, totals: Boolean = false): DataFrame = {
    require(buckets > 1 && Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two (binary-search index bound): $buckets")
    val blk = blocks.localCheckpoint()
    val qs = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val bounds = blk.agg(
      percentile_approx(col(v).cast("double"), array(qs: _*), lit(10000))
        .as("__bounds"))
    // bucket id = |{bounds strictly below v}|, via an UNROLLED BINARY
    // SEARCH over the sorted bounds array (log2(B) codegen'd comparisons
    // per block) — the aggregate() HOF this replaces is CodegenFallback,
    // i.e. B-1 interpreted boxed compares per block, and it measured ~1.7 s
    // per pass over the 583k price blocks at sf0.1 (×2: the assignment
    // runs in both the subtotal and main branches). Duplicate bounds are
    // handled exactly like the linear count (step taken only when
    // v strictly exceeds the probe); with B = 2^m the probe index
    // k + step never exceeds B-1, which is what the power-of-two
    // requirement above guarantees.
    val vd = col(v).cast("double")
    val steps = Iterator.iterate(buckets / 2)(_ / 2).takeWhile(_ >= 1).toSeq
    val bk = steps.foldLeft(lit(0)) { (k, step) =>
      k + when(vd > element_at(col("__bounds"), k + lit(step)), lit(step))
        .otherwise(lit(0))
    }
    val withB = blk.crossJoin(broadcast(bounds))
      .withColumn("__bk", bk)
      .drop("__bounds")
    val subAggs = cnts.map(c => sum(col(c)).as(s"__t_$c"))
    val sub = withB.groupBy(col("__bk")).agg(subAggs.head, subAggs.tail: _*)
    val r = sub.select(col("__bk").as("__rbk") +:
      cnts.map(c => col(s"__t_$c").as(s"__rt_$c")): _*)
    val offAggs = cnts.map(c => sum(when(col("__rbk") < col("__bk"),
        col(s"__rt_$c")).otherwise(lit(0L))).as(s"__off_$c")) ++
      (if (totals) cnts.map(c => sum(col(s"__rt_$c")).as(s"${c}_total"))
       else Seq.empty)
    val offsets = sub.select(col("__bk")).join(broadcast(r), lit(true), "left")
      .groupBy(col("__bk")).agg(offAggs.head, offAggs.tail: _*)
    val inW = Window.partitionBy(col("__bk")).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, -1)
    cnts.foldLeft(withB.join(broadcast(offsets), Seq("__bk"))) { (d, c) =>
      d.withColumn(s"${c}_less",
        col(s"__off_$c") + coalesce(sum(col(c)).over(inW), lit(0L)))
    }.drop("__bk" +: cnts.map(c => s"__off_$c"): _*)
  }

  /** GLOBAL exact nearest-rank quantiles WITHOUT a global sort — the
    * distributed-selection complement of [[exactPercentiles]] (whose
    * per-group window sort is fine when groups fit a partition, not for a
    * whole-corpus rank). Probabilities arrive as millesimal integers
    * (p50 → 500), the target rank is ceil(n·p/1000) in exact integer
    * arithmetic, and the answer for each p is the tie block whose
    * exclusive/inclusive running counts bracket that rank:
    * cnt_less·1000 < n·p ≤ (cnt_less+cnt)·1000. Running counts and n come
    * from one [[prefixCounts]] pass, so the whole computation is tie-block
    * aggregation + the prefix sum + ONE final aggregate — no row-scale
    * sort anywhere, same answers as sorting. Output: one row
    * `(n, p<millesimal>…)`.
    */
  def exactQuantilesGlobal(df: DataFrame, c: Column,
                           probsMil: Seq[Int]): DataFrame = {
    require(probsMil.forall(p => p > 0 && p <= 1000), "millesimal in (0,1000]")
    val blocks = df.select(c.as("v")).groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
    val pc = prefixCounts(blocks, "v", Seq("cnt"), totals = true)
    val aggs = probsMil.map { p =>
      max(when(col("cnt_less") * 1000 < col("cnt_total") * p &&
        col("cnt_total") * p <= (col("cnt_less") + col("cnt")) * 1000,
        col("v"))).as(s"p$p")
    }
    pc.agg(max(col("cnt_total")).as("n"), aggs: _*)
  }

  /** Equi-depth (equal-frequency) histogram without a global sort: each
    * distinct-value tie block lands in bucket ⌊cnt_less·k/n⌋ — the bucket
    * of its FIRST row's exclusive rank (tie blocks are never split, the
    * standard equi-depth convention), with ranks from the same
    * [[prefixCounts]] machinery. Deterministic integer arithmetic end to
    * end; buckets carry (lo, hi, n_rows, n_values). The equi-WIDTH
    * [[histogram]] bins the value domain; this bins the mass — the shape
    * profilers want on skewed distributions, at any row scale.
    */
  def equidepthHistogram(df: DataFrame, c: Column, k: Int): DataFrame = {
    require(k > 0, "need at least one bucket")
    val blocks = df.select(c.as("v")).groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
    // integer `div`, not `/`: the float quotient could misplace a boundary
    // block once cnt_less·k leaves the double-exact range
    prefixCounts(blocks, "v", Seq("cnt"), totals = true)
      .groupBy(expr(s"cnt_less * $k div cnt_total").as("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_values"))
      .orderBy("bucket")
  }

  /** Gini concentration index over per-key totals of an INTEGER-quantized
    * value (e.g. how concentrated revenue is across users), engine-exact
    * and transcendental-free: G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the
    * ascending spend order. The rank sum is computed WITHOUT a full-row
    * global sort: per-key totals collapse into distinct-value tie blocks
    * (cnt, exclusive cnt_less from the [[prefixCounts]] distributed prefix
    * sum — distinct per-key spend totals approach one block per key, so an
    * unkeyed window here would be a single-partition sort at scale), and
    * each block contributes its arithmetic-series rank sum exactly in
    * longs (block math fits long for n < ~2e9 keys). The two grand totals
    * accumulate as DECIMAL(38,0); the final division is a declared-order
    * IEEE expression, so the index is bit-reproducible.
    */
  def giniIndex(df: DataFrame, key: String, x: Column): DataFrame = {
    val spend = df.groupBy(col(key))
      .agg(sum(x.cast("decimal(38,0)")).cast("long").as("s"))
    val blocks = spend.groupBy(col("s")).agg(count(lit(1)).as("cnt"))
    val rankSum = (col("cnt") * col("cnt_less") +
      expr("cnt * (cnt + 1) div 2")).cast("decimal(20,0)")
    val a = prefixCounts(blocks, "s", Seq("cnt"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("s").cast("decimal(38,0)") * col("cnt")).as("__sx"),
        sum(col("s").cast("decimal(18,0)") * rankSum).as("__swx"))
    a.select(col("n"), col("__sx").cast("long").as("total"),
        (lit(2.0) * col("__swx").cast("double") /
          (col("n").cast("double") * col("__sx").cast("double")) -
          (col("n").cast("double") + lit(1.0)) / col("n").cast("double"))
          .as("gini"))
  }

  /** Spearman rank correlation between two INTEGER-quantized columns,
    * engine-exact and transcendental-free: each column's average-tie rank
    * is carried DOUBLED (2·avgrank = 2·cnt_less + cnt + 1 — an exact
    * integer even on ties), computed from distinct-value tie blocks with
    * the exclusive counts from the [[prefixCounts]] distributed prefix sum
    * (no unkeyed window, so a wide value domain never funnels one
    * partition); Pearson on the doubled ranks (scale-invariant, so it IS
    * Spearman's ρ) reuses [[regressionByGroup]]'s exact DECIMAL moments.
    * Cost: two tiny block frames joined back (hash joins on the value),
    * one aggregate. Output: one row `(n, spearman_rho)`.
    */
  def spearman(df: DataFrame, x: String, y: String): DataFrame = {
    def doubledRanks(c: String) = {
      val blocks = df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      prefixCounts(blocks, c, Seq("cnt"))
        .select(col(c), (col("cnt_less") * 2 + col("cnt") + 1).as(s"__r2_$c"))
    }
    val ranked = df.select(col(x), col(y))
      .join(doubledRanks(x), Seq(x)).join(doubledRanks(y), Seq(y))
    regressionByGroup(ranked, Seq.empty, s"__r2_$x", s"__r2_$y")
      .select(col("n"), col("r").as("spearman_rho"))
  }

  /** Mann–Whitney U rank-sum test between the two halves of a boolean
    * split, engine-exact through the rank arithmetic: distinct-value tie
    * blocks carry DOUBLED average ranks (2·r̄ = 2·cnt_less + cnt + 1, an
    * exact integer even on ties), so the doubled rank sum S₂ = Σ cntₐ·2r̄,
    * the doubled statistic 2U = S₂ − nₐ(nₐ+1), and the tie-correction sum
    * Σ(t³−t) all accumulate as DECIMAL — partitioning-invariant. The
    * exclusive running counts come from the [[prefixCounts]] distributed
    * prefix sum (no unkeyed window anywhere, so a wide value domain never
    * funnels one partition). The normal-approximation z uses
    * the tie-corrected variance Var U = nₐn_b/12·((n+1) − Σ(t³−t)/(n(n−1)))
    * and is derived from the exact scalars in a declared IEEE order;
    * a degenerate split (all values tied, or an empty side) gets z = 0.
    * Output: one row `(n_a, n_b, u_stat, z_stat)`.
    */
  def mannWhitney(df: DataFrame, flag: Column, x: Column): DataFrame = {
    val blocks = df.select(x.as("v"), flag.as("fl"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), count(when(col("fl"), lit(1))).as("cnt_a"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val m = prefixCounts(blocks, "v", Seq("cnt"))
      .agg(sum(col("cnt_a")).as("n_a"), sum(col("cnt")).as("n"),
        sum(dec(col("cnt_a")) * (col("cnt_less") * 2 + col("cnt") + 1)).as("__s2"),
        sum(dec(col("cnt")) * col("cnt") * col("cnt") - col("cnt")).as("__ties"))
      .withColumn("n_b", col("n") - col("n_a"))
    def d(c: Column) = c.cast("double")
    val u2 = col("__s2") - dec(col("n_a")) * (col("n_a") + 1)
    val varU = d(col("n_a")) * d(col("n_b")) / 12.0 *
      ((d(col("n")) + 1.0) - d(col("__ties")) / (d(col("n")) * (d(col("n")) - 1.0)))
    m.withColumn("__u2", u2)
      .withColumn("u_stat", d(col("__u2")) / 2.0)
      .withColumn("__var", when(col("n") < 2, 0.0).otherwise(varU))
      .withColumn("z_stat", when(col("__var") <= 0, 0.0)
        .otherwise((d(col("__u2")) - d(col("n_a")) * d(col("n_b"))) /
          (lit(2.0) * sqrt(col("__var")))))
      .select(col("n_a"), col("n_b"), col("u_stat"), col("z_stat"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the two halves of a
    * boolean split, transcendental-free and engine-exact up to the single
    * final division: with per-side running counts cₐ, c_b over the
    * distinct-value tie blocks, D = maxᵥ |cₐ(v)·n_b − c_b(v)·nₐ| / (nₐ·n_b),
    * where the numerator max is exact arithmetic. Running counts AND side
    * totals both come from one [[prefixCounts]] pass (`totals = true` —
    * the grand sums ride the same broadcast bucket-offset frame), so there
    * is no unkeyed window and no second scan of the input.
    * Empty sides get d_stat = 0. Output: one row `(n_a, n_b, d_stat)`.
    */
  def ksTest(df: DataFrame, flag: Column, x: Column): DataFrame = {
    val blocks = df.select(x.as("v"), flag.as("fl"))
      .groupBy(col("v"))
      .agg(count(when(col("fl"), lit(1))).as("cnt_a"),
        count(when(!col("fl"), lit(1))).as("cnt_b"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    prefixCounts(blocks, "v", Seq("cnt_a", "cnt_b"), totals = true)
      .withColumn("ca", col("cnt_a_less") + col("cnt_a"))
      .withColumn("cb", col("cnt_b_less") + col("cnt_b"))
      .withColumn("n_a", col("cnt_a_total"))
      .withColumn("n_b", col("cnt_b_total"))
      .groupBy(col("n_a"), col("n_b"))
      // DECIMAL, not long: ca·n_b reaches n_a·n_b, which wraps past 2^63
      // around ~3e9 rows per side — exactly the scale the docs claim
      .agg(max(abs(dec(col("ca")) * col("n_b") - dec(col("cb")) * col("n_a")))
        .as("__dn"))
      .withColumn("d_stat", when(col("n_a") === 0 || col("n_b") === 0, 0.0)
        .otherwise(col("__dn").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))))
      .select(col("n_a"), col("n_b"), col("d_stat"))
  }

  /** Market-basket pairwise affinity — support / confidence / lift over the
    * distinct items of each basket. Never all-pairs across baskets: the
    * self-join is keyed on the basket id, so candidate volume is
    * Σ per-basket |items|² (bounded by basket width, not corpus size — the
    * same blocking argument as the LSH tier). All counts are exact longs;
    * the three ratios are single IEEE divisions in declared order
    * (support = pairs/baskets, confidence = pairs/n_a,
    * lift = pairs·baskets/(n_a·n_b)); the 1-row basket count rides a
    * broadcast cross join (stays in the plan, no driver action). Output:
    * `(item_a, item_b, n_pair, n_a, n_b, support, confidence, lift)` with
    * item_a < item_b.
    */
  def basketAffinity(df: DataFrame, basket: Column, item: Column): DataFrame = {
    // Recompute discipline (the curation_funnel lesson): a shared deduped
    // (basket, item) frame CANNOT feed all four consumers — column pruning
    // specializes each branch's logical plan, the canonical forms diverge,
    // and exchange reuse stops applying, so the expensive upstream (e.g. a
    // fact⋈dim join feeding the baskets) would run 4×. Instead:
    //  - the two self-join sides share ONE deduped frame pinned to a
    //    basket-keyed repartition — their subtrees canonicalize identically
    //    (alias-only difference), so AQE materializes the stage once and
    //    the join pays no extra exchange;
    //  - the basket count and per-item counts aggregate the RAW input with
    //    inline countDistinct (identical values — dedup is subsumed by the
    //    distinct aggregate). When `df` is itself a join (the brand_affinity
    //    site), each re-runs the column-pruned join prefix — pruned to one
    //    and two columns respectively, far cheaper than the full-width
    //    deduped frame, but still a join execution each; accept a
    //    (basket, item)-projected cached input if that recompute ever
    //    dominates.
    val bi = df.select(basket.as("b"), item.as("i")).distinct()
      .repartition(col("b"))
    val nb = df.select(basket.as("b"))
      .agg(countDistinct(col("b")).as("n_baskets"))
    val ic = df.select(basket.as("b"), item.as("i"))
      .groupBy(col("i")).agg(countDistinct(col("b")).as("n_i"))
    val pairs = bi.select(col("b"), col("i").as("ia"))
      .join(bi.select(col("b"), col("i").as("ib")), "b")
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia").as("item_a"), col("ib").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
    def d(c: Column) = c.cast("double")
    pairs
      .join(ic.select(col("i").as("item_a"), col("n_i").as("n_a")), "item_a")
      .join(ic.select(col("i").as("item_b"), col("n_i").as("n_b")), "item_b")
      .crossJoin(broadcast(nb))
      .withColumn("support", d(col("n_pair")) / d(col("n_baskets")))
      .withColumn("confidence", d(col("n_pair")) / d(col("n_a")))
      .withColumn("lift", d(col("n_pair")) * d(col("n_baskets")) /
        (d(col("n_a")) * d(col("n_b"))))
      .select("item_a", "item_b", "n_pair", "n_a", "n_b",
        "support", "confidence", "lift")
  }

  /** Blocked fuzzy-match join (entity resolution): candidate pairs are
    * generated only WITHIN equal blocking keys — the same bounded-blocking
    * argument as the LSH tier, never all-pairs — ordered `id_a < id_b` for
    * a canonical pair set, and kept when `levenshtein(s_a, s_b) <= maxDist`.
    * Edit distance is the exact integer built-in (codegen'd), so the result
    * is engine-exact; both join sides canonicalize to the same subplan, so
    * the input materializes once under exchange reuse. At scale the block
    * key bounds the quadratic term — pick one with bounded fan-in (brand,
    * nation, name prefix), exactly like an LSH band key.
    */
  def fuzzyJoinBlocked(df: DataFrame, blockKey: Column, id: Column,
                       s: Column, maxDist: Int): DataFrame = {
    val l = df.select(blockKey.as("k"), id.as("id_a"), s.as("s_a"))
    val r = df.select(blockKey.as("k"), id.as("id_b"), s.as("s_b"))
    l.join(r, Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "s_a", "s_b", "dist")
  }

  /** Edit-distance-≤1 fuzzy self-match via single-deletion neighborhood
    * blocking (FastSS): every string is indexed under itself plus each of
    * its one-character-deleted forms, and any two strings within edit
    * distance 1 provably share a variant (equal → themselves; substitution
    * at i → both delete i; indel → the shorter IS a deletion form of the
    * longer). Candidate volume is therefore O(n·len) — LINEAR in rows,
    * unlike [[fuzzyJoinBlocked]]'s per-block quadratic, which degenerates
    * when a block key has unbounded fan-in. Candidates are a superset and
    * the exact `levenshtein` verify prunes them — the same
    * block-then-verify contract as the LSH dedup tier, so results are
    * identical to the brute force (RelationalPropsSpec pins this). The
    * variant HOF is interpreted but runs once per ROW (not per pair) and is
    * dwarfed by the join it eliminates. Same output shape as
    * [[fuzzyJoinBlocked]].
    */
  def fuzzyPairsDist1(df: DataFrame, blockKey: Column, id: Column,
                      s: Column): DataFrame = {
    val variants = df.select(blockKey.as("k"), id.as("id"), s.as("s"))
      .withColumn("v", explode(expr(
        "array_union(array(s), transform(sequence(1, length(s)), " +
          "i -> concat(substring(s, 1, i-1), substring(s, i+1, length(s)))))")))
    variants.as("l").join(variants.as("r"), Seq("k", "v"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.s").as("s_a"), col("r.s").as("s_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Reciprocal-rank fusion of two (id, score) rankings: each side is
    * bounded to its top-`topN` FIRST (TakeOrderedAndProject — the global
    * sort never materializes), ranked by `(score desc, id)` so ties are
    * deterministic, and fused as Σ 1/(k+rank). Each id contributes at most
    * two addends, and IEEE addition is commutative, so the fused double is
    * partitioning-invariant without any quantization. Output: the top
    * `keep` rows of `(id, n_lists, rrf_score)` by `(rrf_score desc, id)`.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, id: String, k: Int, topN: Int,
              keep: Int): DataFrame = {
    def ranked(df: DataFrame) = {
      val w = Window.orderBy(col("score").desc, col(id))
      df.select(col(id), col("score")).orderBy(col("score").desc, col(id))
        .limit(topN)
        .select(col(id), (lit(1.0) / (lit(k) + row_number().over(w))).as("c"))
    }
    ranked(a).unionAll(ranked(b))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_lists"), sum(col("c")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(id))
      .limit(keep)
  }

  /** Per-group Pearson correlation and least-squares fit over two
    * INTEGER-quantized columns, engine-exact: the five moment sums
    * accumulate as DECIMAL(38,0) (exact in any partitioning); the final
    * r / slope / intercept are IEEE doubles derived from those scalars in
    * a declared operation order, so results are bit-reproducible. The
    * caller quantizes (e.g. cents); per-row products must stay inside
    * long. Degenerate groups (zero variance in either column) get r = 0
    * and slope = 0 rather than NaN. Cost: ONE hash aggregate.
    */
  def regressionByGroup(df: DataFrame, keys: Seq[String], x: String,
                        y: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    // products multiply as DECIMAL (two ≤19-digit longs fit 38,0 exactly):
    // a long·long product wraps past 2^63 once |x| exceeds ~3e9, and the
    // inputs here are caller-supplied unbounded quantities (counts, cents)
    val g = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(dec(col(x))).cast("double").as("__sx"),
      sum(dec(col(y))).cast("double").as("__sy"),
      sum(dec(col(x)) * dec(col(x))).cast("double").as("__sxx"),
      sum(dec(col(y)) * dec(col(y))).cast("double").as("__syy"),
      sum(dec(col(x)) * dec(col(y))).cast("double").as("__sxy"))
    val dx = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val dy = col("n") * col("__syy") - col("__sy") * col("__sy")
    val cv = col("n") * col("__sxy") - col("__sx") * col("__sy")
    g.withColumn("r", when(dx * dy <= 0, 0.0).otherwise(cv / sqrt(dx * dy)))
      .withColumn("slope", when(dx === 0, 0.0).otherwise(cv / dx))
      .withColumn("intercept", (col("__sy") - col("slope") * col("__sx")) / col("n"))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
  }

  /** Exact, summation-order-independent sum for 2-decimal money columns:
    * DECIMAL(18,2) accumulation is exact (no float reassociation error), so
    * the result is identical across any partitioning/parallelism AND matches
    * the DuckDB oracle bit-for-bit after the DOUBLE cast. Overflow-safe to
    * 10^16 dollars. SQL mirror: Catalog.moneySumSql.
    */
  def moneySum(c: Column): Column = sum(moneyDec(c)).cast("double")

  /** DECIMAL(18,2) cast for exact money accumulation — partial sums of this
    * type re-aggregate exactly (decimal addition is associative), so a
    * two-stage rollup equals the flat sum bit-for-bit.
    */
  def moneyDec(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2))

  /** Deterministic average of a money column (see moneySum). */
  def moneyAvg(c: Column): Column = round(moneySum(c) / count(lit(1)), 4)

  /** `1 ± x` as exact DECIMAL(4,2) factors (discount/tax multipliers). */
  def oneMinusDec(c: Column): Column =
    lit(java.math.BigDecimal.ONE).cast("decimal(4,2)") - c.cast("decimal(4,2)")
  def onePlusDec(c: Column): Column =
    lit(java.math.BigDecimal.ONE).cast("decimal(4,2)") + c.cast("decimal(4,2)")

  /** The TPC-H revenue term `price · (1 − discount)`, exact decimal
    * ((12,2)×(4,2)→(17,4)) — Column mirror of
    * [[graft.engine.Catalog.revenueSql]].
    */
  def revenueDec(price: Column, discount: Column): Column =
    price.cast("decimal(12,2)") * oneMinusDec(discount)

  /** Timestamps leave the engine as formatted strings at the oracle
    * boundary: Spark writes tz-adjusted parquet timestamps while DuckDB
    * yields naive ones — strings sidestep the dtype mismatch.
    */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}

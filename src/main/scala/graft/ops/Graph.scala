package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over co-occurrence (market-basket) structure: edge
  * induction from grouped item sets and exact, degree-ordered triangle
  * counting.
  *
  * Scale design: the edge self-join is keyed on the GROUP (order) id, so
  * pair volume is Σ(group_size choose 2) — bounded by the largest basket,
  * never all-pairs over items. Triangle enumeration orients every edge
  * from its (degree, id)-smaller endpoint, which caps oriented out-degree
  * at O(√m) on any graph (the classic compact-forward bound), so wedge
  * volume is O(m^1.5) worst case and far less on real degree-skewed
  * graphs. All joins are hash-partitioned equi-joins; nothing collects.
  */
object Graph {

  /** Undirected co-occurrence edges from a `(group, item)` relation:
    * `(src, dst, n_groups)` with `src < dst`, one row per item pair that
    * shares at least `minSupport` distinct groups. The distinct() collapses
    * repeated items within a group first (a part twice in one order is one
    * basket membership), keeping the self-join per-group volume minimal.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        minSupport: Long): DataFrame = {
    val gp = df.select(col(groupCol).as("g"), col(itemCol).as("item")).distinct()
    gp.as("x").join(gp.as("y"),
        col("x.g") === col("y.g") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("src"), col("y.item").as("dst"))
      .agg(count(lit(1)).as("n_groups"))
      .filter(col("n_groups") >= minSupport)
  }

  /** Exact per-vertex triangle counts over an undirected `(src, dst)` edge
    * list (src < dst, no duplicates): `(v, n_triangles)` for every vertex
    * in at least one triangle.
    *
    * Enumeration: orient each edge toward its (degree, id)-larger endpoint;
    * in that acyclic orientation every triangle a→b→c (with a→c) appears as
    * exactly ONE wedge-plus-closing-edge, so the count needs no /3 or /6
    * correction and the per-vertex totals are exact. The per-vertex result
    * is independent of enumeration order, which is why the SQL oracle can
    * replay it with the simpler id-ordered enumeration and match.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val fwd = col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst"))
    val oriented = e
      .join(deg.select(col("v").as("src"), col("deg").as("ds")), Seq("src"))
      .join(deg.select(col("v").as("dst"), col("deg").as("dd")), Seq("dst"))
      .select(when(fwd, col("src")).otherwise(col("dst")).as("u"),
        when(fwd, col("dst")).otherwise(col("src")).as("v"))
      .localCheckpoint(false)
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .join(oriented.as("e3"), col("a") === col("e3.u") && col("c") === col("e3.v"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
  }

  /** Exact fixed-iteration PageRank over an undirected `(src, dst)` edge
    * list: `(v, rank_scaled)` where `rank_scaled` is the rank numerator at
    * the integer `scale` (rank ≈ rank_scaled / scale / n after
    * normalization — left unnormalized so every value is a plain BIGINT).
    *
    * Every iteration is pure 64-bit integer arithmetic with FLOOR division
    * (`div`): contrib(u→v) = r(u) div deg(u); r'(v) = (15·scale) div 100 +
    * (85·Σ contrib(·→v)) div 100. That makes the fixpoint trajectory
    * bit-replayable by any engine with integer division — the DuckDB
    * oracle chains one CTE per iteration and matches exactly. Undirected
    * edges mean no dangling mass (every vertex has degree ≥ 1, and every
    * vertex receives in-flow), so no dangling redistribution term.
    *
    * Scale shape: the directed edge+degree frame builds once and is
    * checkpointed; each iteration is one hash join on the source vertex
    * plus one hash aggregate on the destination — 2 exchanges per round,
    * rank-frame rows = |V|, join rows = 2|E|. Overflow bound: Σ ranks
    * ≈ |V|·scale, so a max-degree hub sees ≤ 85·|V|·scale before the div —
    * with the default scale 10⁹ that holds |V| < 10⁸ safely inside int64
    * (enforced below).
    */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters in [1,20]: $iters")
    // pin BOTH control frames: `deg` is read three ways (the ed join, the
    // overflow bound, the rank init) and `dir` twice — without the pins the
    // upstream edge frame (often an expensive pair-induction join) would
    // recompute per use (measured 3x the edge build inside one query)
    val dir = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(false)
    val deg = dir.groupBy("u").agg(count(lit(1)).as("d")).localCheckpoint(false)
    val ed = dir.join(deg, Seq("u")).localCheckpoint(false)
    val nV = deg.count()
    require(BigInt(85) * nV * scale <= BigInt(Long.MaxValue),
      s"pageRank overflow bound exceeded: 85 * $nV vertices * scale $scale > 2^63-1; use a coarser scale")
    val base = 15L * scale / 100L
    var rank = deg.select(col("u").as("rv"), lit(scale).as("r"))
    // per-round checkpoint even though the rank chain is linear: one
    // iters-deep mega-plan measured ~2.5x SLOWER than five small plans
    // (AQE re-optimizes the whole tree at every stage boundary and the
    // codegen units balloon) — the checkpoint keeps each round's plan
    // constant-size, which is what matters when iterating
    for (_ <- 1 to iters) {
      rank = ed.join(rank, col("u") === col("rv"))
        .groupBy(col("v").as("nv"))
        .agg(sum(expr("r div d")).as("flow"))
        .select(col("nv").as("rv"), (lit(base) + expr(s"(85 * flow) div 100")).as("r"))
        .localCheckpoint(false)
    }
    rank.select(col("rv").as("v"), col("r").as("rank_scaled"))
  }

  /** Connected components over an undirected `(src, dst)` edge list:
    * `(v, component)` for every vertex in the edge set, labelled with the
    * minimum vertex id reachable from it. Rides the alternating
    * large-star/small-star fixpoint (O(log² n) rounds, every round two
    * join+aggregate passes — no diameter-bounded propagation), the same
    * kernel the near-dup cluster tier uses.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // pin the edge frame: it feeds BOTH the star-contraction loop and the
    // vertex side below — unpinned, an expensive upstream pair induction
    // would compute twice (measured as the whole query's dominant cost)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val roots = graft.llm.Dedup.ccAlternatingWithRounds(
      e.select(col("src").as("id_a"), col("dst").as("id_b")), 30)._1
    e.select(explode(array(col("src"), col("dst"))).as("v")).distinct()
      .join(roots.withColumnRenamed("node", "v"), Seq("v"), "left")
      .select(col("v"), coalesce(col("root"), col("v")).as("component"))
  }

  /** Exact minimum hop distance from the smallest vertex id in the edge
    * set, breadth-first up to `maxHops`: `(v, hops)` for every reached
    * vertex (the source itself at 0). Classic distributed frontier BFS:
    * each round expands the CURRENT frontier only (one equi-join on the
    * adjacency) and anti-joins the visited set, so per-round work is
    * O(frontier out-degree), never |V|·rounds. The driver loop only
    * controls rounds; all data flow is joins.
    */
  def bfsHops(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16, s"maxHops in [1,16]: $maxHops")
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(false)
    val source = sym.agg(least(min(col("u")), min(col("v"))).as("v"))
    // In an UNDIRECTED graph every neighbor of a distance-d vertex sits at
    // distance d-1, d, or d+1, so the next frontier is exactly
    // N(frontier) minus the last TWO frontiers — no anti-join against the
    // full (growing) visited set, no re-checkpoint of it per round, and no
    // driver-side action anywhere in the loop: the whole BFS materializes
    // as ONE job at the final union (each level pins lazily as it is
    // first read by the next level's join).
    var prev = source.select(col("v")).filter(lit(false))
    var cur = source.select(col("v")).localCheckpoint(false)
    val levels = scala.collection.mutable.ListBuffer(
      cur.select(col("v"), lit(0).as("hops")))
    for (i <- 1 to maxHops) {
      val next = cur.select(col("v").as("u"))
        .join(sym, Seq("u")).select(col("v")).distinct()
        .join(prev.union(cur), Seq("v"), "left_anti")
        .localCheckpoint(false)
      levels += next.select(col("v"), lit(i).as("hops"))
      prev = cur
      cur = next
    }
    levels.reduce(_.union(_))
  }

  /** Fixed-round k-core peel over an undirected `(src, dst)` edge list:
    * runs exactly `rounds` rounds of "drop every vertex with degree < k,
    * then drop its edges", and returns the survivors with their residual
    * degree `(v, core_degree)`. With `rounds` at or past the peel
    * fixpoint this IS the k-core; the fixed round count (rather than
    * iterate-to-convergence) is what lets the SQL oracle replay the exact
    * trajectory as an unrolled CTE chain. Each round is one degree
    * aggregate plus two semi-joins — all hash-partitioned on the vertex.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 2 && rounds >= 1 && rounds <= 12,
      s"k >= 2, rounds in [1,12]: k=$k rounds=$rounds")
    var e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val deg = e.select(explode(array(col("src"), col("dst"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("w"))
      e = e.join(keep.withColumnRenamed("w", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("w", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")).localCheckpoint(false)
    }
    e.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("core_degree"))
  }

  /** Directional association rules from a `(group, item)` relation:
    * one row per ordered pair (antecedent → consequent) co-occurring in
    * at least `minSupport` groups, with integer-exact floor-div metrics
    * at parts-per-million scale: `conf_ppm = 10⁶·n_both div n_ant` and
    * `lift_ppm = 10⁶·n_both·n_groups div (n_ant·n_cons)`. All counts are
    * distinct-group counts; the total-group count joins in as a broadcast
    * 1-row frame so nothing collects. Overflow bound: 10⁶·n_both·N must
    * fit int64, i.e. N·max_pair_support < 9.2·10¹² — beyond that, rescale
    * to per-mille or lift the products to DECIMAL.
    */
  def associationRules(df: DataFrame, groupCol: String, itemCol: String,
                       minSupport: Long): DataFrame = {
    val gp = df.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .distinct().localCheckpoint(false)
    val nItem = gp.groupBy("item").agg(count(lit(1)).as("n_item"))
    val total = gp.agg(countDistinct(col("g")).as("n_groups"))
    val und = coOccurrenceEdges(gp, "g", "item", minSupport)
    val pairs = und.select(col("src").as("ant"), col("dst").as("cons"), col("n_groups").as("n_both"))
      .union(und.select(col("dst").as("ant"), col("src").as("cons"), col("n_groups").as("n_both")))
    pairs
      .join(nItem.select(col("item").as("ant"), col("n_item").as("n_ant")), Seq("ant"))
      .join(nItem.select(col("item").as("cons"), col("n_item").as("n_cons")), Seq("cons"))
      .crossJoin(broadcast(total))
      .select(col("ant"), col("cons"), col("n_both"), col("n_ant"), col("n_cons"),
        expr("(1000000 * n_both) div n_ant").as("conf_ppm"),
        expr("(1000000 * n_both * n_groups) div (n_ant * n_cons)").as("lift_ppm"))
  }
}

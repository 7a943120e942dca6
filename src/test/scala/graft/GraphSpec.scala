package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Graph

/** Unit + cross-validation checks for the co-occurrence graph tier. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: K4 has four triangles, three per vertex") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: a 4-cycle has no triangles") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCounts(edges).count() === 0L)
  }

  test("coOccurrenceEdges: support threshold and within-group dedup") {
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 2L), // repeated item in one basket: one membership
      (30L, 2L), (30L, 3L)
    ).toDF("g", "item")
    val got = Graph.coOccurrenceEdges(df, "g", "item", 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L), (2L, 3L, 2L)))
  }

  test("pageRank: floor-div trajectory matches a scalar replay, mass bounded") {
    // path graph 1-2-3: the middle vertex must outrank the ends, and the
    // distributed ranks must equal an exact scalar replay of the same
    // integer recurrence
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val iters = 5
    val scale = 1000000000L
    val dir = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L)
    val deg = dir.groupBy(_._1).map { case (v, ns) => v -> ns.size.toLong }
    var r = deg.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val flow = dir.groupBy(_._2).map { case (v, ins) =>
        v -> ins.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = flow.map { case (v, f) => v -> (15L * scale / 100L + 85L * f / 100L) }
    }
    val got = Graph.pageRank(edges, iters, scale).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === r)
    assert(got(2L) > got(1L) && got(1L) === got(3L))
  }

  test("pageRank rejects an overflow-unsafe scale") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val err = intercept[IllegalArgumentException] {
      Graph.pageRank(edges, 2, Long.MaxValue / 10)
    }
    assert(err.getMessage.contains("overflow"))
  }

  test("connectedComponents: min-id labels over disjoint components") {
    // two components {1,2,3} (path) and {7,9} plus the chain order reversed
    val edges = Seq((2L, 3L), (1L, 2L), (7L, 9L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents equals brute-force union-find on the fixture graph") {
    val edges = Graph.coOccurrenceEdges(
      Tables(spark, sf).lineitem, "l_orderkey", "l_partkey", 2L)
    val es = edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- es) parent(find(a)) = find(b)
    val label = parent.keys.toSeq.groupBy(find).flatMap { case (_, vs) =>
      val m = vs.min; vs.map(_ -> m)
    }
    val got = Graph.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === label)
  }

  test("bfsHops: exact min distances, bounded by maxHops, unreached absent") {
    // 1-2-3-4-5 path plus disconnected 8-9: source is min id 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    val got = Graph.bfsHops(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)) // 5 beyond bound, 8/9 unreachable
  }

  test("kCorePeel: pendant chain peels away, the clique core survives") {
    // K4 on {1,2,3,4} with a tail 4-5-6: 3-core = the K4, residual degree 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.kCorePeel(edges, 3, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCorePeel runs exactly the requested rounds (trajectory semantic)") {
    // chain 1-2-3-4 with k=2: round 1 drops vertices 1 and 4 (degree 1),
    // leaving edge 2-3; round 2 drops it too. One round must KEEP 2-3.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.kCorePeel(edges, 2, 1).count() === 2L) // vertices 2,3 survive round 1
    assert(Graph.kCorePeel(edges, 2, 2).count() === 0L) // fixpoint: empty
  }

  test("associationRules: ppm metrics match hand-computed floor division") {
    // baskets: {1,2} x3, {1,3} x1, {1} x1  ->  N=5, n1=5, n2=3, n3=1
    val df = Seq(
      (10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L), (30L, 2L),
      (40L, 1L), (40L, 3L), (50L, 1L)
    ).toDF("g", "item")
    val got = Graph.associationRules(df, "g", "item", 2L).collect()
      .map(r => (r.getAs[Long]("ant"), r.getAs[Long]("cons")) ->
        (r.getAs[Long]("conf_ppm"), r.getAs[Long]("lift_ppm"))).toMap
    // only pair (1,2) clears support 2: conf 1->2 = 3/5, conf 2->1 = 3/3,
    // lift = 3*5/(5*3) = 1 exactly, both directions
    assert(got === Map(
      (1L, 2L) -> (600000L, 1000000L),
      (2L, 1L) -> (1000000L, 1000000L)))
  }

  test("degree-ordered enumeration equals brute force on the fixture graph") {
    val edges = Graph.coOccurrenceEdges(
      Tables(spark, sf).lineitem, "l_orderkey", "l_partkey", 2L)
    val es = edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    val expect = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- es; c <- adj(a) if c > b && adj(b)(c)) // a<b<c once per triangle
      for (v <- Seq(a, b, c)) expect(v) += 1L
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect.toMap)
    assert(got.nonEmpty, "the sf0.001 co-purchase graph seeds triangles")
  }
}

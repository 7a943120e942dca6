package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Nearest-centroid assignment of a quantized `array<bigint>` vector
  * against a fixed centroid table, as ONE native codegen'd expression.
  *
  * This replaces the k-means assignment shape
  * `crossJoin(broadcast(centroids)) → n·k dist rows → groupBy(id) argmin`
  * with a narrow per-row projection: the same exact integer distances
  * (`n2x − 2·dot + cn2` over longs), the same argmin, the same
  * lowest-cell-id tie-break (cells are scanned in ascending cid order and
  * only a STRICT improvement moves the winner) — but zero exploded rows
  * and zero shuffle. For a scale-adaptive fit (k ∝ n) the crossJoin shape
  * shuffles n·k rows, which the sf1-constrate run measured as the
  * super-linear term of the whole auto-dedup tier; this expression keeps
  * assignment linear in the scan with the k·dim flops inside
  * whole-stage codegen (same inner loop as [[DotProductQ]]).
  *
  * Since `n2x` is constant across cells for a given row, the comparison
  * key is `cn2 − 2·dot` — identical ordering, one subtraction saved; all
  * arithmetic stays in exact longs (the same products the crossJoin
  * computed, so the same overflow envelope).
  *
  * Null / shape semantics: null input array, null element, or a vector
  * whose length differs from the centroid dimension yields null (the
  * caller's join-back then drops the row, matching what a null dist
  * would have produced on the crossJoin path).
  *
  * Centroids ride inside the expression node (k·dim longs — the same
  * data the crossJoin broadcast), delivered to generated code via a
  * reference object, NOT inlined source: k·dim literals would blow past
  * the JVM's 64 KB method bytecode limit long before a real fit does.
  */
case class NearestCellQ(child: Expression, cids: Array[Int],
                        cqs: Array[Array[Long]], cn2s: Array[Long])
    extends UnaryExpression {

  require(cids.length == cqs.length && cids.length == cn2s.length &&
    cids.nonEmpty, "centroid arrays must be non-empty and aligned")
  require(cids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "cids must be strictly ascending (tie-break contract)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_cell_q expects array<bigint>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell_q"

  private val dim = cqs.head.length

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    // one validating copy to a primitive array, then pure long[] math: the
    // k·dim inner loop must not pay ArrayData's per-element accessor (and
    // per-element null check) k times over — at n·k·dim ≈ 4·10^10 element
    // reads per assignment pass that overhead, not the multiplies, was the
    // measured cost (sf10: ~100 s -> ~2 s after this hoist)
    val xs = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      xs(i) = x.getLong(i)
      i += 1
    }
    var best = Long.MaxValue; var bestCid = -1
    var c = 0
    while (c < cqs.length) {
      val cq = cqs(c)
      var dot = 0L; var j = 0
      while (j < dim) { dot += xs(j) * cq(j); j += 1 }
      val score = cn2s(c) - 2L * dot
      if (score < best) { best = score; bestCid = cids(c) }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cqsRef = ctx.addReferenceObj("cqs", cqs, "long[][]")
      val cn2sRef = ctx.addReferenceObj("cn2s", cn2s, "long[]")
      val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
      // per-partition scratch buffer (addMutableState, not a per-row
      // allocation): the validating copy target for the hot loop below
      val xs = ctx.addMutableState("long[]", "nearestCellScratch",
        v => s"$v = new long[$dim];")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val cq = ctx.freshName("cq")
      val score = ctx.freshName("score")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $xs[$i] = $a.getLong($i);
         |  }
         |  long $best = Long.MAX_VALUE;
         |  int $bestCid = -1;
         |  if (!${ev.isNull}) {
         |    for (int $c = 0; $c < ${cqs.length}; $c++) {
         |      final long[] $cq = $cqsRef[$c];
         |      long $dot = 0L;
         |      for (int $j = 0; $j < $dim; $j++) $dot += $xs[$j] * $cq[$j];
         |      final long $score = $cn2sRef[$c] - 2L * $dot;
         |      if ($score < $best) { $best = $score; $bestCid = $cidsRef[$c]; }
         |    }
         |  }
         |  ${ev.value} = $bestCid;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellQ =
    copy(child = newChild)

  // the centroid payload participates in equality/explain via its content,
  // not array identity — otherwise two structurally identical assignments
  // would not dedupe in the plan
  override def equals(o: Any): Boolean = o match {
    case n: NearestCellQ =>
      n.child == child && java.util.Arrays.equals(n.cids, cids) &&
        n.cn2s.sameElements(cn2s) && n.cqs.length == cqs.length &&
        n.cqs.indices.forall(i => java.util.Arrays.equals(n.cqs(i), cqs(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cids)
}

object NearestCellQ {
  /** Column entry point: assign `q` (quantized `array<bigint>`) to its
    * nearest centroid. `centroids` are `(cid, quantized components)` with
    * distinct cids; `cn2` is derived here so callers can't desync it.
    */
  def apply(q: Column, centroids: Seq[(Int, Seq[Long])]): Column = {
    val sorted = centroids.sortBy(_._1)
    val cqs = sorted.map(_._2.toArray).toArray
    GraftSqlBridge.column(NearestCellQ(
      GraftSqlBridge.expression(q),
      sorted.map(_._1).toArray,
      cqs,
      cqs.map(a => a.map(x => x * x).sum)))
  }
}

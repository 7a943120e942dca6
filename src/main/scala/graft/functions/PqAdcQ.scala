package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Asymmetric-distance computation (ADC) for product-quantized vectors as
  * ONE native codegen'd expression: given a FULL-precision quantized query
  * `array<bigint>` and a corpus row's PQ code word `array<int>` (one code
  * per subspace), return the exact integer squared L2 distance between the
  * query and the row's RECONSTRUCTION
  * `Σ_m (‖q_m‖² − 2·q_m·c[m][code_m] + ‖c[m][code_m]‖²)` — the
  * faiss-style compressed-domain scoring step (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Why this matters at 100 TB: the corpus side of an ADC scan reads ONLY
  * the M-int code column — a 64-dim float embedding (256 B) collapses to
  * M = 8 ints, so the scan moves ~32× less data (and a stored `tinyint`
  * code word 64×), which is the difference between an ANN sweep bounded by
  * I/O on the raw vectors and one bounded by the code column. Column
  * pruning does the rest: the physical scan of a PQ top-k never touches
  * the embedding column (plan-asserted in `PipelineOpsSpec`).
  *
  * Exactness/determinism contract (same as the other vector kernels):
  * every product and sum is exact long arithmetic over the 24-bit
  * quantized components — |x| ≤ 2²⁴ ⇒ per-term ≤ 2⁴⁸, dim-summed ≤ 2⁵⁴ —
  * so scores are bit-identical across partitionings and replay exactly in
  * the DuckDB oracle. Null array, null element, dimension/M mismatch, or
  * an out-of-range code yield null.
  *
  * The codebooks ride as reference objects (`long[M][ks][ds]` + the
  * precomputed `‖c‖²` table), never inlined source; the query vector is
  * copied once per row into a per-partition primitive scratch buffer so
  * the inner loops run on `long[]`.
  */
case class PqAdcQ(left: Expression, right: Expression,
                  cb: Array[Array[Array[Long]]],
                  cn2: Array[Array[Long]])
    extends BinaryExpression {

  require(cb.nonEmpty && cb.length == cn2.length,
    "codebooks must be non-empty and aligned with the norm table")
  require(cb.indices.forall(m => cb(m).nonEmpty && cb(m).length == cn2(m).length),
    "per-subspace codebooks must be non-empty and aligned")
  private val m = cb.length
  private val ds = cb(0)(0).length
  require(cb.forall(_.forall(_.length == ds)),
    "all codebook centroids must share the sub-dimension")
  private val dim = m * ds

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_q expects (array<bigint>, array<int>), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val qArr = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (qArr.numElements() != dim || codes.numElements() != m) return null
    val xs = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (qArr.isNullAt(i)) return null
      xs(i) = qArr.getLong(i)
      i += 1
    }
    var dist = 0L
    var mm = 0
    while (mm < m) {
      if (codes.isNullAt(mm)) return null
      val code = codes.getInt(mm)
      if (code < 0 || code >= cb(mm).length) return null
      val cq = cb(mm)(code)
      val off = mm * ds
      var dot = 0L; var qn2 = 0L; var j = 0
      while (j < ds) {
        val x = xs(off + j)
        dot += x * cq(j)
        qn2 += x * x
        j += 1
      }
      dist += qn2 - 2L * dot + cn2(mm)(code)
      mm += 1
    }
    dist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "long[][][]")
      val cn2Ref = ctx.addReferenceObj("pqCn2", cn2, "long[][]")
      val xs = ctx.addMutableState("long[]", "pqAdcScratch",
        v => s"$v = new long[$dim];")
      val i = ctx.freshName("i")
      val mm = ctx.freshName("mm")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val cq = ctx.freshName("cq")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val qn2 = ctx.freshName("qn2")
      val x = ctx.freshName("x")
      val dist = ctx.freshName("dist")
      s"""
         |if ($a.numElements() != $dim || $b.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $xs[$i] = $a.getLong($i);
         |  }
         |  long $dist = 0L;
         |  if (!${ev.isNull}) {
         |    for (int $mm = 0; $mm < $m; $mm++) {
         |      if ($b.isNullAt($mm)) { ${ev.isNull} = true; break; }
         |      final int $code = $b.getInt($mm);
         |      if ($code < 0 || $code >= $cbRef[$mm].length) { ${ev.isNull} = true; break; }
         |      final long[] $cq = $cbRef[$mm][$code];
         |      final int $off = $mm * $ds;
         |      long $dot = 0L; long $qn2 = 0L;
         |      for (int $j = 0; $j < $ds; $j++) {
         |        final long $x = $xs[$off + $j];
         |        $dot += $x * $cq[$j];
         |        $qn2 += $x * $x;
         |      }
         |      $dist += $qn2 - 2L * $dot + $cn2Ref[$mm][$code];
         |    }
         |  }
         |  ${ev.value} = $dist;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcQ =
    copy(left = newLeft, right = newRight)

  // content-based equality so structurally identical scorings dedupe in the
  // plan (same contract as the other kernel expressions)
  override def equals(o: Any): Boolean = o match {
    case p: PqAdcQ =>
      p.left == left && p.right == right && p.cb.length == cb.length &&
        p.cb.indices.forall { c =>
          p.cn2(c).sameElements(cn2(c)) && p.cb(c).length == cb(c).length &&
            p.cb(c).indices.forall(i => java.util.Arrays.equals(p.cb(c)(i), cb(c)(i)))
        }
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(cn2.asInstanceOf[Array[AnyRef]])
}

object PqAdcQ {
  /** Column entry point: exact ADC squared distance between a quantized
    * query vector and a PQ code word. `codebooks` rows are
    * `(subspace, code, quantized sub-centroid)`; subspaces must be dense
    * `0..M−1`, codes dense `0..ks_m−1` within each subspace (the fit's
    * numbering — enforced here). `‖c‖²` is derived here so callers can't
    * desync it.
    */
  def apply(q: Column, codes: Column, codebooks: Seq[(Int, Int, Seq[Long])]): Column = {
    require(codebooks.nonEmpty, "codebooks must be non-empty")
    val byM = codebooks.groupBy(_._1)
    val mCount = codebooks.map(_._1).max + 1
    require(byM.keySet == (0 until mCount).toSet, "subspaces must be dense 0..M-1")
    val cb = (0 until mCount).map { mm =>
      val rows = byM(mm).sortBy(_._2)
      require(rows.map(_._2) == rows.indices.toSeq,
        s"codes must be dense 0..ks-1 within subspace $mm")
      rows.map(_._3.toArray).toArray
    }.toArray
    GraftSqlBridge.column(PqAdcQ(
      GraftSqlBridge.expression(q),
      GraftSqlBridge.expression(codes),
      cb,
      cb.map(_.map(a => a.map(x => x * x).sum))))
  }
}

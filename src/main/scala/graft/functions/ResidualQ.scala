package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Residual of a quantized vector against its assigned coarse centroid —
  * `q − c[cell]`, elementwise exact long subtraction — as ONE native
  * codegen'd expression. This is the IVF-PQ encoding step (faiss's
  * residual quantization): product-quantizing the residual instead of the
  * raw vector concentrates the codebooks on the within-cell geometry,
  * which is where all the resolution is needed once the coarse quantizer
  * has localized the vector.
  *
  * Exactness: quantized components are ≤ 2²⁴ in magnitude, so residual
  * components are ≤ 2²⁵ — downstream ADC sums stay far inside long range,
  * and every value replays exactly in the DuckDB oracle.
  *
  * Null input array, null element, dimension mismatch, null cell id, or
  * an out-of-range cell id yield null. The centroid table rides as a
  * reference object (`long[k][dim]`), cells dense `0..k−1` (the fit's
  * numbering — enforced in the companion).
  */
case class ResidualQ(left: Expression, right: Expression,
                     centroids: Array[Array[Long]])
    extends BinaryExpression {

  require(centroids.nonEmpty, "centroid table must be non-empty")
  private val dim = centroids(0).length
  require(centroids.forall(_.length == dim), "centroids must share the dimension")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"residual_q expects (array<bigint>, int), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "residual_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cell = b.asInstanceOf[Int]
    if (x.numElements() != dim || cell < 0 || cell >= centroids.length) return null
    val c = centroids(cell)
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      out(i) = x.getLong(i) - c(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cRef = ctx.addReferenceObj("residualCentroids", centroids, "long[][]")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $dim || $b < 0 || $b >= ${centroids.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $c = $cRef[$b];
         |  final long[] $out = new long[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $out[$i] = $a.getLong($i) - $c[$i];
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ResidualQ =
    copy(left = newLeft, right = newRight)

  // content-based equality so structurally identical residuals dedupe in
  // the plan (same contract as the other kernel expressions)
  override def equals(o: Any): Boolean = o match {
    case r: ResidualQ =>
      r.left == left && r.right == right && r.centroids.length == centroids.length &&
        r.centroids.indices.forall(i =>
          java.util.Arrays.equals(r.centroids(i), centroids(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])
}

object ResidualQ {
  /** Column entry point: `q − centroids[cell]`. `centroids` are
    * `(cid, quantized components)` with cids dense `0..k−1` (the fit's
    * numbering — enforced here).
    */
  def apply(q: Column, cell: Column, centroids: Seq[(Int, Seq[Long])]): Column = {
    require(centroids.nonEmpty, "centroid table must be non-empty")
    val sorted = centroids.sortBy(_._1)
    require(sorted.map(_._1) == sorted.indices.toSeq, "cells must be dense 0..k-1")
    GraftSqlBridge.column(ResidualQ(
      GraftSqlBridge.expression(q),
      GraftSqlBridge.expression(cell),
      sorted.map(_._2.toArray).toArray))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** 24-bit fixed-point quantization of an `array<float>` — the narrow
  * prepare-pass companion of [[DotProductQ]]: `floor(x * 2^24)` per
  * element as a codegen'd primitive loop instead of the interpreted
  * `transform(v, x -> ...)` higher-order function. This runs once over
  * EVERY corpus vector in each similarity query (and each k-means fit),
  * so at scale it is a full-corpus narrow map — the HOF's per-element
  * lambda dispatch is pure overhead.
  *
  * Element nulls are preserved (as `transform` does); the float→double
  * widening is exact and floor is deterministic, so results are
  * bit-identical to the HOF composition.
  */
case class QuantizeFixed(child: Expression, scale: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"quantize_q expects array<float>, got $t")
  }
  override def dataType: DataType =
    ArrayType(LongType, child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize_q"

  override protected def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!in.isNullAt(i)) {
        out(i) = Math.floor(in.getFloat(i).toDouble * scale).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |final int $n = $in.numElements();
         |final Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$in.isNullAt($i)) {
         |    $out[$i] = (Object) (long) java.lang.Math.floor((double) $in.getFloat($i) * ${scale}L);
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeFixed =
    copy(child = newChild)
}

object QuantizeQ {
  def apply(v: Column, scale: Long): Column =
    GraftSqlBridge.column(QuantizeFixed(GraftSqlBridge.expression(v), scale))
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the native expressions on the SQL surface
  * (`spark.sql("... dot_q(a, b) ...")`), the standard
  * `SparkSessionExtensions` route: pass to `builder.withExtensions`, or
  * set `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  *  - `dot_q(array<bigint>, array<bigint>) -> bigint` — exact integer dot
  *    product ([[DotProductQ]]).
  *  - `quantize_q(array<float>[, scale]) -> array<bigint>` — fixed-point
  *    quantization ([[QuantizeFixed]]); scale defaults to 2^24 and must be
  *    a foldable integral literal (it parameterizes generated code).
  *  - `mg_topk(term, k) -> array<struct<term,n_est>>` — Misra-Gries
  *    heavy-hitter AGGREGATE ([[MisraGriesTopK]]); k must be a foldable
  *    integral literal (it sizes the summary).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val DefaultScale: Long = 1L << 24

  private def buildQuantize(children: Seq[Expression]): Expression = children match {
    case Seq(v) => QuantizeFixed(v, DefaultScale)
    case Seq(v, s) if s.foldable =>
      s.eval() match {
        case l: java.lang.Long => QuantizeFixed(v, l)
        case i: java.lang.Integer => QuantizeFixed(v, i.toLong)
        case other =>
          throw new IllegalArgumentException(s"quantize_q scale must be integral, got $other")
      }
    case _ =>
      throw new IllegalArgumentException("usage: quantize_q(vec[, scale-literal])")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotProductQ].getName, "dot_q"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "usage: dot_q(a, b)")
        DotProductQ(children.head, children(1))
      }),
    (FunctionIdentifier("quantize_q"),
      new ExpressionInfo(classOf[QuantizeFixed].getName, "quantize_q"),
      buildQuantize _),
    (FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[MisraGriesTopK].getName, "mg_topk"),
      (children: Seq[Expression]) => children match {
        // the analyzer wraps a returned AggregateFunction in its
        // AggregateExpression, same as the built-in aggregates
        case Seq(t, k) if k.foldable =>
          MisraGriesTopK(t, k.eval().asInstanceOf[Number].intValue())
        case _ =>
          throw new IllegalArgumentException("usage: mg_topk(term, k-literal)")
      }))
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary over a string column as a native
  * Catalyst TYPED IMPERATIVE AGGREGATE — the engine's first custom
  * aggregate function: Spark runs it with map-side partials and a
  * shuffle-side [[merge]] exactly like a built-in, so the summary is a
  * MERGEABLE sketch (Agarwal et al., "Mergeable Summaries", PODS'12) —
  * the shape that finds frequent terms over 100 TB with `k-1` counters
  * per partition and no full vocabulary shuffle.
  *
  * State: at most `k-1` (term, count) counters. Update is the classic
  * rule — increment a present term, insert if a counter is free,
  * otherwise decrement ALL counters (dropping zeros) and discard the
  * arrival. Merge adds counterpart counts, then restores capacity by
  * subtracting the k-th largest count from every counter and dropping
  * the non-positive ones (the PODS'12 merge, error-additive).
  *
  * Guarantee (both update and merge preserve it): for every term,
  * `true_n - floor(N/k) <= est <= true_n` where `N` is the total count
  * aggregated, and every term with `true_n > N/k` SURVIVES in the
  * summary. Estimates are deterministic only up to input partitioning
  * (like any MG summary), so gate queries must emit the provable
  * derivatives (survival / bound booleans against exact counts), not
  * raw estimates — see `TextOps.heavyHitterBounds`.
  *
  * Output: `array<struct<term string, n_est bigint>>`, sorted by
  * (n_est desc, term) for stable presentation.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 2, s"mg_topk needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_topk expects a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("n_est", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val t = v.asInstanceOf[UTF8String]
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1L)
      case None if buf.size < k - 1 =>
        // copy: Spark reuses the input row's backing memory across rows
        buf.update(UTF8String.fromBytes(t.getBytes), 1L)
      case None =>
        val dead = buf.iterator.collect { case (term, 1L) => term }.toList
        buf.mapValuesInPlace((_, c) => c - 1L)
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > k - 1) {
      // k-th largest count (capacity is k-1): subtract it everywhere,
      // drop the non-positive — error adds, never resets
      val cut = b1.valuesIterator.toArray.sortBy(-_).apply(k - 1)
      val dead = b1.iterator.collect { case (t, c) if c <= cut => t }.toList
      b1.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toSeq
      .sortBy { case (t, c) => (-c, t.toString) }
      .map { case (t, c) => new GenericInternalRow(Array[Any](t, c)) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
}

object MgTopK {
  /** Column-level entry point: `mgTopK(term, k)` — the MG summary of the
    * column as an aggregate (use inside `agg`).
    */
  def apply(term: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGriesTopK(GraftSqlBridge.expression(term), k).toAggregateExpression())
}

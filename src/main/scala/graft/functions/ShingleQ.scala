package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram construction as ONE narrow codegen'd pass over the
  * token array — the shuffle-free replacement for the
  * posexplode → `Exchange hashpartitioning(doc_id)` → `Sort (doc_id, pos)`
  * → k-1 `lead` windows chain ([[graft.llm.Dedup.shingleRows]] and the span
  * tier's window layer). The window form exchanges one row per TOKEN of the
  * corpus just to see each token's k-1 successors — adjacency that the
  * source row already has in its token array. At 100 TB that exchange is
  * the dominant shuffle of the whole text-dedup tier (token rows ≫ corpus
  * rows); this kernel removes it outright (optimization guide §2.4) while
  * producing bit-identical gram strings.
  *
  * Equivalence contract with the window chain (spec-pinned):
  * gram at 1-based position j = `concat_ws(sep, tok_j … tok_{j+n-1})`,
  * emitted only when the LAST token exists (the chain's
  * `wlast.isNotNull` filter); `concat_ws` skips interior nulls (whitespace
  * `split` never produces them — defensive parity only). With
  * `distinct = true` the per-doc duplicate grams collapse in-kernel
  * (first-occurrence order), exactly the rows the chain's
  * `(id, shingle)`-distinct would keep — per-doc set equality, since the
  * doc id rides outside the kernel.
  */
case class ShingleGrams(child: Expression, n: Int, sep: String,
                        distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"gram size n must be >= 1: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles_q expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_q"

  private lazy val sepBytes: Array[Byte] = sep.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleGrams(input.asInstanceOf[ArrayData], n, sepBytes, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TextKernels.shingleGrams($in, $n, $sepRef, $distinct);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGrams =
    copy(child = newChild)
}

/** Winnowing fingerprint selection ([[graft.llm.Dedup.winnowedFingerprints]])
  * as one narrow codegen'd pass: per document, the distinct
  * `md5hex(gram) || zeropad13(10^12 − pos)` window-minimum keys, replacing
  * posexplode → exchange+sort on the doc id → k-gram lead chain → rows-frame
  * `min` window → global distinct. The selection math is IDENTICAL to the
  * expression chain (same md5-hex key, same 13-digit position complement →
  * lexicographic min = (min fingerprint, rightmost position), same truncated
  * trailing windows), and the in-kernel dedup is exact because a key's
  * selecting window-starts form one contiguous run (if key k* at position p
  * is the min of windows s₁ < s₃, then for any s₂ between them
  * window(s₂) ⊆ window(s₁) ∪ window(s₃) and p ∈ window(s₂), so k* is s₂'s
  * min too) — so emit-on-change over ascending window starts is a complete
  * distinct. Keys are all-ASCII fixed width, so Java string order, UTF8String
  * order and the chain's string-min order coincide.
  */
case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2, s"k-gram size must be >= 2: $k")
  require(w >= 2 && w <= k, s"winnow window must be in [2, k=$k]: $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_q expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_q"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnowKeys(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TextKernels.winnowKeys($in, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}

/** Static kernels shared by the interpreted and generated paths. */
object TextKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Joined UTF-8 bytes of tokens[j .. j+n-1], `concat_ws` semantics
    * (null elements skipped — cannot occur from whitespace split); returns
    * null when the LAST gram token is null (the chain's filter).
    */
  private def gramBytes(in: ArrayData, j: Int, n: Int,
                        sep: Array[Byte]): Array[Byte] = {
    if (in.isNullAt(j + n - 1)) return null
    var len = 0
    var present = 0
    var i = 0
    while (i < n) {
      if (!in.isNullAt(j + i)) {
        len += in.getUTF8String(j + i).numBytes()
        present += 1
      }
      i += 1
    }
    val out = new Array[Byte](len + math.max(0, present - 1) * sep.length)
    var off = 0
    var first = true
    i = 0
    while (i < n) {
      if (!in.isNullAt(j + i)) {
        if (!first) { System.arraycopy(sep, 0, out, off, sep.length); off += sep.length }
        val u = in.getUTF8String(j + i)
        u.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += u.numBytes()
        first = false
      }
      i += 1
    }
    out
  }

  def shingleGrams(in: ArrayData, n: Int, sep: Array[Byte],
                   distinct: Boolean): ArrayData = {
    val len = in.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    if (!distinct) {
      val out = new Array[Any](m)
      var cnt = 0
      var j = 0
      while (j < m) {
        val b = gramBytes(in, j, n, sep)
        if (b != null) { out(cnt) = UTF8String.fromBytes(b); cnt += 1 }
        j += 1
      }
      new GenericArrayData(if (cnt == m) out else java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], cnt).asInstanceOf[Array[Any]])
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](math.min(m, 64))
      var j = 0
      while (j < m) {
        val b = gramBytes(in, j, n, sep)
        if (b != null) seen.add(UTF8String.fromBytes(b))
        j += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }
  }

  private val SpaceSep = " ".getBytes("UTF-8")
  private val Big = 1000000000000L // 10^12, the chain's 13-digit complement base

  def winnowKeys(in: ArrayData, k: Int, w: Int): ArrayData = {
    val len = in.numElements()
    val m = len - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // per-position key: md5hex(gram) || %013d(10^12 - pos), pos 1-based
    val keys = new Array[String](m)
    val digest = md5.get()
    var j = 0
    while (j < m) {
      val b = gramBytes(in, j, k, SpaceSep)
      // null gram (null last token) cannot occur from split(); mirror the
      // chain's filter by selecting around it if it ever does
      if (b != null) {
        digest.reset()
        val h = digest.digest(b)
        val sb = new java.lang.StringBuilder(45)
        var x = 0
        while (x < 16) {
          sb.append(HexDigits((h(x) >> 4) & 0xf)); sb.append(HexDigits(h(x) & 0xf))
          x += 1
        }
        sb.append(String.format(java.util.Locale.ROOT, "%013d",
          java.lang.Long.valueOf(Big - (j + 1))))
        keys(j) = sb.toString
      }
      j += 1
    }
    // sliding min over window starts s = 0..m-1, window [s, min(s+w-1, m-1)]
    // (truncated trailing frames select too, like the rows-frame min);
    // monotonic deque of candidate indices, emit-on-change dedup
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.ArrayList[Any](2 * m / (w + 1) + 4)
    var last: String = null
    var filled = -1 // highest index pushed
    var s = 0
    while (s < m) {
      val e = math.min(s + w - 1, m - 1)
      while (filled < e) {
        filled += 1
        if (keys(filled) != null) {
          while (tail > head && keys(dq(tail - 1)).compareTo(keys(filled)) >= 0) tail -= 1
          dq(tail) = filled
          tail += 1
        }
      }
      while (tail > head && dq(head) < s) head += 1
      if (tail > head) {
        val sel = keys(dq(head))
        if (!(sel eq last)) { out.add(UTF8String.fromString(sel)); last = sel }
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object ShingleQ {
  def apply(tokens: Column, n: Int, sep: String, distinct: Boolean): Column =
    GraftSqlBridge.column(
      ShingleGrams(GraftSqlBridge.expression(tokens), n, sep, distinct))
}

object WinnowQ {
  def apply(tokens: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowKeys(GraftSqlBridge.expression(tokens), k, w))
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType, StringType}

/** Native window-fingerprint kernels for the span-dedup family
  * (t77/t79/t55/t49 and the nine curation composites).
  *
  * The expression-tree form built one L-token STRING per window
  * (`concat_ws` over an array slice) and md5-hashed it — O(window
  * length) char copying plus a digest per fingerprint, and the t79
  * leave-one-out form pays it L times per window (measured: 60 s of
  * task time on one warm sf0.1 curation pipeline, the single hottest
  * kernel in the suite). Here each document is ONE pass: hash each
  * token once (FNV-1a 64 over its UTF-8 bytes), build polynomial
  * prefix hashes, and emit every window fingerprint in O(1) from the
  * prefix array — O(tokens) total for t77 windows, O(tokens·L) →
  * O(tokens) arithmetic (not string) work for t79's L fingerprints
  * per window.
  *
  * CONTRACT: these fingerprints are internal equality keys only —
  * every consumer compares/counts them and no declared query exposes
  * the values (outputs are cleaned text, offsets and counts), so any
  * injective-in-practice hash yields identical results. The DuckDB
  * twins keep their md5-string form and agree on every output because
  * both sides flag the same windows. (The CDC tier is NOT ported: its
  * anchor rule `md5(token) % rate == 0` makes segment BOUNDARIES
  * hash-dependent, so its hash is semantics, not an equality key.)
  * Collisions: 64-bit polynomial over FNV-hashed tokens, mod 2^64 with
  * an odd multiplier — ~2^-64 per pair, same class of risk the 56-bit
  * md5 lane already accepted; all three test scales verify hash-green.
  */
object SpanHash {
  /** Odd multiplier (golden-ratio constant) — invertible mod 2^64. */
  private val B = 0x9e3779b97f4a7c15L

  /** FNV-1a 64 over the token's UTF-8 bytes; null tokens hash as "". */
  private def tokHash(arr: ArrayData, i: Int): Long = {
    if (arr.isNullAt(i)) return 0xcbf29ce484222325L
    val b = arr.getUTF8String(i).getBytes
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < b.length) {
      h ^= (b(j) & 0xffL)
      h *= 0x100000001b3L
      j += 1
    }
    h
  }

  /** Prefix polynomial hashes: p(0)=0, p(j+1)=p(j)·B + tokHash(j). */
  private def prefixes(toks: ArrayData): Array[Long] = {
    val n = toks.numElements()
    val p = new Array[Long](n + 1)
    var j = 0
    while (j < n) {
      p(j + 1) = p(j) * B + tokHash(toks, j)
      j += 1
    }
    p
  }

  private def pows(upTo: Int): Array[Long] = {
    val pw = new Array[Long](upTo + 1)
    pw(0) = 1L
    var j = 1
    while (j <= upTo) { pw(j) = pw(j - 1) * B; j += 1 }
    pw
  }

  /** Poly hash of tokens [a, b) from the prefix array. */
  @inline private def range(p: Array[Long], pw: Array[Long],
                            a: Int, b: Int): Long =
    p(b) - p(a) * pw(b - a)

  /** Window fingerprints: element i (0-based) is the hash of tokens
    * [i, i+l); empty array when the document is shorter than l.
    */
  def windows(toks: ArrayData, l: Int): ArrayData = {
    val n = toks.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val p = prefixes(toks)
    val pw = pows(l)
    val out = new Array[Any](n - l + 1)
    var i = 0
    while (i <= n - l) {
      out(i) = range(p, pw, i, i + l)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Leave-one-out fingerprints: element w·l + s is the slot-keyed
    * hash of window [w, w+l) with token w+s removed — the poly hash of
    * the remaining l−1 tokens with the slot index mixed in, so windows
    * collide only slot-for-slot (the t79 rule). Empty when n < l.
    */
  def loo(toks: ArrayData, l: Int): ArrayData = {
    val n = toks.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val p = prefixes(toks)
    val pw = pows(l)
    val out = new Array[Any]((n - l + 1) * l)
    var w = 0
    while (w <= n - l) {
      var s = 0
      while (s < l) {
        // hash of [w, w+s) ++ [w+s+1, w+l), then the slot as a tail term
        val f = range(p, pw, w, w + s) * pw(l - 1 - s) +
          range(p, pw, w + s + 1, w + l)
        out(w * l + s) = f * B + (s + 1)
        s += 1
      }
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** array<string> → array<long> of per-offset window fingerprints. */
case class SpanWindowHashes(child: Expression, l: Int)
    extends UnaryExpression {
  require(l >= 2, "a span window is at least 2 tokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = DataTypes.createArrayType(LongType, false)

  override def prettyName: String = "graft_span_window_hashes"

  override protected def nullSafeEval(v: Any): Any =
    SpanHash.windows(v.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanHash.windows($c, $l);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> → array<long> of leave-one-out fingerprints, window-
  * major (entry w·l + s = window w, slot s).
  */
case class LooSpanHashes(child: Expression, l: Int)
    extends UnaryExpression {
  require(l >= 2, "a span window is at least 2 tokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = DataTypes.createArrayType(LongType, false)

  override def prettyName: String = "graft_loo_span_hashes"

  override protected def nullSafeEval(v: Any): Any =
    SpanHash.loo(v.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanHash.loo($c, $l);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Bloom-filter bit array over a long-hash column, as a
  * [[TypedImperativeAggregate]] — the membership sketch completing the
  * trio (KMV = cardinality, CMS = frequency, Bloom = membership).
  *
  * The 100 TB use is decontamination at benchmark scale: d8's exact
  * path broadcasts the benchmark's distinct shingle hashes (linear in
  * the benchmark); this builds a FIXED-m-bit filter instead, so the
  * broadcast payload is m/8 bytes no matter how many benchmarks are
  * profiled, at an engineered false-positive rate (one-sided: a miss
  * is definitive, exactly what a keep/quarantine pre-filter needs —
  * survivors of the bloom cut go to the exact path, which now scans a
  * tiny fraction of the corpus).
  *
  * Determinism contract (why this is oracle-gateable when library bloom
  * filters are not): bit positions are classic Kirsch–Mitzenmacher
  * double hashing over the repo's shared 56-bit md5-derived hash —
  * `h1 = v % m`, `h2 = 1 + (v / m) % (m-1)`, `pos_j = (h1 + j*h2) % m`
  * — all non-negative integer arithmetic DuckDB reproduces verbatim
  * (`%`, `//`). Merges are bitwise OR: associative, commutative,
  * duplicate-absorbing, so partial aggregation and shard unions are
  * exact, like [[KmvMins]].
  *
  * Buffer = `m/8` bytes, bit `p` ↔ byte `p >> 3` mask `1 << (p & 7)`;
  * the evaluated BinaryType value uses the identical layout, which is
  * what [[BloomContains]] probes. Nulls are ignored; inputs are assumed
  * non-negative (the [[Md5Lane]]/`TextOps.hash64` contract — a negative
  * hash would floor-mod differently across engines).
  */
case class BloomBits(
    child: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(m >= 64 && m <= (1 << 26) && m % 8 == 0,
    s"bloom m must be in [64, 2^26] and byte-aligned, got $m")
  require(k >= 1 && k <= 16, s"bloom k must be in [1, 16], got $k")

  // ImplicitCastInputTypes is unavailable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]), so int inputs are accepted
  // directly and widened in update()
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral argument, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    child.eval(input) match {
      case null => ()
      case v: Long => BloomBits.set(buf, v, m, k)
      case v: Int => BloomBits.set(buf, v.toLong, m, k)
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBits =
    copy(child = newChild)
}

object BloomBits {

  /** Kirsch–Mitzenmacher position j for value v in an m-bit filter.
    * `floorMod`, not `%`: the library contract feeds non-negative
    * [[Md5Lane]] hashes (where the two agree, keeping the DuckDB twin
    * exact), but the SQL functions are registered for arbitrary
    * columns — a signed hash (e.g. `xxhash64`) must degrade to a
    * well-defined position, not an executor-side
    * ArrayIndexOutOfBoundsException from a negative index.
    */
  def pos(v: Long, j: Int, m: Int): Int = {
    val h1 = java.lang.Math.floorMod(v, m.toLong)
    val h2 = 1L + java.lang.Math.floorMod(v / m, (m - 1).toLong)
    ((h1 + j * h2) % m).toInt
  }

  def set(buf: Array[Byte], v: Long, m: Int, k: Int): Unit = {
    var j = 0
    while (j < k) {
      val p = pos(v, j, m)
      buf(p >> 3) = (buf(p >> 3) | (1 << (p & 7))).toByte
      j += 1
    }
  }

  /** True iff all k bits for v are set — the probe kernel (static so
    * codegen emits one call).
    */
  def contains(buf: Array[Byte], v: Long, m: Int, k: Int): Boolean = {
    var j = 0
    while (j < k) {
      val p = pos(v, j, m)
      if ((buf(p >> 3) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }

  /** [[contains]] plus a length≡m/8 guard — the [[BloomContains]] probe
    * kernel. The SQL/Column surface takes the bit array as an arbitrary
    * binary column, so an m mismatched against the filter's build-time m
    * must fail with a descriptive error naming both sizes: a larger
    * build-m silently returns wrong membership answers, a smaller one
    * throws an opaque executor-side ArrayIndexOutOfBoundsException —
    * the exact error class the constInt/GraftErrors discipline exists
    * to avoid. Internal callers that already validate the length
    * ([[graft.ext.Dedup.classifyIncrementBloom]], the stream shards)
    * stay on the unchecked kernel.
    */
  def containsChecked(buf: Array[Byte], v: Long, m: Int, k: Int): Boolean = {
    if (buf.length != m / 8) throw new IllegalArgumentException(
      s"graft_bloom_contains: filter has ${buf.length * 8} bits but the " +
        s"probe was built for m=$m — build and probe must share m " +
        s"(filter bytes=${buf.length}, expected ${m / 8})")
    contains(buf, v, m, k)
  }
}

/** Membership probe against a [[BloomBits]] bit array, with codegen —
  * `graft_bloom_contains(bloom, v)` for the same plan-time (m, k) the
  * filter was built with. The filter side is typically a broadcast
  * 1-row frame (or a literal), so the probe is a pure per-row kernel:
  * no join, no shuffle, whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  require(m >= 64 && m <= (1 << 26) && m % 8 == 0,
    s"bloom m must be in [64, 2^26] and byte-aligned, got $m")
  require(k >= 1 && k <= 16, s"bloom k must be in [1, 16], got $k")

  // same private[sql] constraint as BloomBits: int probes (SQL
  // literals) are accepted and widened — Java int→long in codegen
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, integral), " +
          s"got ${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bloom: Any, v: Any): Any = {
    val h = v match { case l: Long => l; case i: Int => i.toLong }
    BloomBits.containsChecked(bloom.asInstanceOf[Array[Byte]], h, m, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.functions.BloomBits.containsChecked($b, $v, $m, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

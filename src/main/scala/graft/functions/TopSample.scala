package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-n-by-key aggregate: the n entries with the LARGEST
  * `key` per group (ties broken by ascending `id`), each carrying a
  * double `payload`, returned best-first as
  * `array<struct<sample_key, id, payload>>`.
  *
  * This is the 100-TB shape of per-group top-k (stratified weighted
  * sampling, per-stratum leaderboards): the declarative alternative —
  * `row_number() OVER (PARTITION BY g ORDER BY key DESC)` — shuffles
  * EVERY row to its group's reducer and sorts there, so the exchange
  * carries the full corpus. This aggregate folds each map task's
  * partition into an O(groups·n) buffer first (real partial
  * aggregation via ObjectHashAggregate), so the shuffle moves at most
  * groups × n × map-tasks entries — survivors only, never the corpus.
  * The merge is an order-free bounded union (same discipline as
  * [[KmvMins]]), so partitioning cannot change the result.
  *
  * Determinism contract: the (key DESC, id ASC) order is total for
  * unique ids, so the selected set and its order are pure functions of
  * the input rows. Rows with a null key or id are ignored (callers
  * filter/validate upstream — see [[graft.std.Sampling]]); a null
  * payload is stored as NULL. Duplicate (key, id) pairs collapse to
  * one entry (set semantics; ids are expected unique per group).
  */
case class TopSample(
    first: Expression,  // key: double
    second: Expression, // id: long
    third: Expression,  // payload: double
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[TopSample.Entry]]
  with TernaryLike[Expression] {

  require(n >= 1 && n <= (1 << 20),
    s"top_sample n must be in [1, 2^20], got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, LongType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (k, i, p) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint, double) arguments, " +
          s"got (${k.catalogString}, ${i.catalogString}, ${p.catalogString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sample_key", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_sample"

  override def createAggregationBuffer(): java.util.TreeSet[TopSample.Entry] =
    new java.util.TreeSet[TopSample.Entry](TopSample.order)

  private def add(buf: java.util.TreeSet[TopSample.Entry],
                  e: TopSample.Entry): Unit = {
    if (buf.size < n) { buf.add(e); () }
    else if (TopSample.order.compare(e, buf.last()) < 0) {
      if (buf.add(e) && buf.size > n) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[TopSample.Entry],
                      input: InternalRow): java.util.TreeSet[TopSample.Entry] = {
    val k = first.eval(input)
    val id = second.eval(input)
    if (k != null && id != null) {
      val p = third.eval(input)
      add(buf, TopSample.Entry(k.asInstanceOf[Double],
        id.asInstanceOf[Long],
        if (p == null) Double.NaN else p.asInstanceOf[Double],
        hasPayload = p != null))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[TopSample.Entry],
                     other: java.util.TreeSet[TopSample.Entry]):
      java.util.TreeSet[TopSample.Entry] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[TopSample.Entry]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // ascending comparator order = best first
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.key, e.id,
        if (e.hasPayload) e.payload else null))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[TopSample.Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(25 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.key); bb.putLong(e.id); bb.putDouble(e.payload)
      bb.put(if (e.hasPayload) 1.toByte else 0.toByte)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[TopSample.Entry] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) {
      val k = bb.getDouble; val id = bb.getLong; val p = bb.getDouble
      buf.add(TopSample.Entry(k, id, p, bb.get() == 1.toByte)); ()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopSample =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopSample {
  /** One buffered survivor. `payload` is NaN-backed when absent
    * (`hasPayload` is the truth bit — NaN itself is a legal payload).
    */
  final case class Entry(key: Double, id: Long, payload: Double,
                         hasPayload: Boolean)

  /** (key DESC, id ASC) — total for unique ids. `Double.compare` is
    * used (not `<`) so the order is total even on NaN keys, though
    * callers are expected to keep keys finite.
    */
  val order: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.key, a.key)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }
}

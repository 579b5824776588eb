package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property spec for the bottom-k sketch aggregate's buffer
  * algebra — the contract Spark's partial aggregation relies on: for ANY
  * input multiset, ANY split into partial buffers, and ANY serialize
  * round-trip, the merged sketch equals the bottom-k of the distinct
  * values. No SparkSession needed: the buffer ops are exercised directly
  * through the aggregate's own update/merge/serialize/eval.
  */
object KmvMinsPropSpec extends Properties("KmvMins") {

  private def agg(k: Int) =
    KmvMins(BoundReference(0, LongType, nullable = true), k)

  private val genCase = for {
    k <- Gen.choose(1, 64)
    vals <- Gen.listOf(Gen.choose(-1000L, 1000L))
    cut <- Gen.choose(0, 100)
  } yield (k, vals, cut)

  property("merged partials = bottom-k of distinct values, any split") =
    Prop.forAll(genCase) { case (k, vals, cut) =>
      val a = agg(k)
      val (l, r) = vals.splitAt(vals.length * cut / 100)
      val b1 = a.createAggregationBuffer()
      l.foreach(v => a.update(b1, InternalRow(v)))
      val b2 = a.createAggregationBuffer()
      r.foreach(v => a.update(b2, InternalRow(v)))
      // merge through a serialize round-trip, as the exchange would
      val merged = a.merge(
        a.deserialize(a.serialize(b1)), a.deserialize(a.serialize(b2)))
      val got = a.eval(merged)
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      got == vals.distinct.sorted.take(k)
    }

  property("merge is commutative") =
    Prop.forAll(genCase) { case (k, vals, cut) =>
      val a = agg(k)
      val (l, r) = vals.splitAt(vals.length * cut / 100)
      def buf(vs: Seq[Long]) = {
        val b = a.createAggregationBuffer()
        vs.foreach(v => a.update(b, InternalRow(v)))
        b
      }
      val lr = a.eval(a.merge(buf(l), buf(r)))
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      val rl = a.eval(a.merge(buf(r), buf(l)))
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      lr == rl
    }

  property("null inputs are ignored") =
    Prop.forAll(Gen.listOf(Gen.option(Gen.choose(-50L, 50L)))) { vals =>
      val a = agg(8)
      val b = a.createAggregationBuffer()
      vals.foreach(v => a.update(b, InternalRow(v.orNull)))
      val got = a.eval(b).asInstanceOf[GenericArrayData].toLongArray().toSeq
      got == vals.flatten.distinct.sorted.take(8)
    }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bloom filter: buffer algebra properties (no session) + end-to-end
  * aggregate/probe behavior through the Column and SQL surfaces.
  */
object BloomBitsPropSpec extends Properties("BloomBits") {

  private val M = 1 << 10
  private val K = 4

  private def agg = BloomBits(
    BoundReference(0, LongType, nullable = true), M, K)

  private val genCase = for {
    vals <- Gen.listOf(Gen.choose(0L, 1L << 56))
    cut <- Gen.choose(0, 100)
  } yield (vals, cut)

  property("no false negatives, any split + serialize round-trip") =
    Prop.forAll(genCase) { case (vals, cut) =>
      val a = agg
      val (l, r) = vals.splitAt(vals.length * cut / 100)
      def buf(vs: Seq[Long]) = {
        val b = a.createAggregationBuffer()
        vs.foreach(v => a.update(b, InternalRow(v)))
        b
      }
      val merged = a.merge(
        a.deserialize(a.serialize(buf(l))), a.deserialize(a.serialize(buf(r))))
      val bits = a.eval(merged).asInstanceOf[Array[Byte]]
      vals.forall(v => BloomBits.contains(bits, v, M, K))
    }

  property("signed inputs: defined positions, still no false negatives") =
    Prop.forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))) { vals =>
      // the SQL surface accepts any long column (e.g. xxhash64 is
      // signed); positions must stay in [0, M) — floorMod, not a crash
      val a = agg
      val b = a.createAggregationBuffer()
      vals.foreach(v => a.update(b, InternalRow(v)))
      val bits = a.eval(b).asInstanceOf[Array[Byte]]
      vals.forall(v => BloomBits.contains(bits, v, M, K)) &&
      vals.forall(v =>
        (0 until K).forall(j => {
          val p = BloomBits.pos(v, j, M); p >= 0 && p < M
        }))
    }

  property("merge ≡ single-pass build (OR is order/dup-insensitive)") =
    Prop.forAll(genCase) { case (vals, cut) =>
      val a = agg
      val (l, r) = vals.splitAt(vals.length * cut / 100)
      def buf(vs: Seq[Long]) = {
        val b = a.createAggregationBuffer()
        vs.foreach(v => a.update(b, InternalRow(v)))
        b
      }
      val one = a.eval(buf(vals ++ vals)).asInstanceOf[Array[Byte]]
      val two = a.eval(a.merge(buf(r), buf(l))).asInstanceOf[Array[Byte]]
      java.util.Arrays.equals(one, two)
    }
}

class BloomBitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.GraftColumns

  test("aggregate + probe: members always hit, fp rate is engineered") {
    val m = 1 << 16; val k = 4
    val members = (0L until 2000L).map(i => i * 7919L)
    val bloom = members.toDF("h").repartition(8)
      .agg(GraftColumns.bloomAgg(col("h"), m, k).as("bloom"))
    val probes = (0L until 10000L).map(i => 1000000000L + i * 104729L)
      .toDF("h").crossJoin(broadcast(bloom))
    val hits = probes
      .filter(GraftColumns.bloomContains(col("bloom"), col("h"), m, k))
      .count()
    // non-member fp: expected (1 - e^(-k*n/m))^k ≈ 0.04% at this load
    assert(hits < 100, s"false-positive count $hits out of range")
    val memberHits = members.toDF("h").crossJoin(broadcast(bloom))
      .filter(GraftColumns.bloomContains(col("bloom"), col("h"), m, k))
      .count()
    assert(memberHits == members.size) // one-sided: no false negatives
  }

  test("probe with mismatched m fails with a descriptive error, not AIOOBE") {
    // a filter built at one m probed at another must name both sizes:
    // a larger build-m silently returns wrong answers, a smaller one
    // would throw an opaque executor-side ArrayIndexOutOfBoundsException
    val bloom = Seq(11L, 22L).toDF("h")
      .agg(GraftColumns.bloomAgg(col("h"), 2048, 4).as("bloom"))
    val probed = Seq(22L).toDF("h").crossJoin(broadcast(bloom))
      .select(GraftColumns.bloomContains(col("bloom"), col("h"), 1024, 4))
    val e = intercept[Exception](probed.collect())
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msg.contains("graft_bloom_contains") && msg.contains("m=1024"),
      s"expected a descriptive m-mismatch error, got: $msg")
    // interpreted path hits the same guard
    val e2 = intercept[IllegalArgumentException](
      BloomBits.containsChecked(new Array[Byte](2048 / 8), 22L, 1024, 4))
    assert(e2.getMessage.contains("expected 128"))
  }

  test("SQL registration: graft_bloom_agg / graft_bloom_contains") {
    GraftColumns.registerFunctions(spark)
    Seq(11L, 22L, 33L).toDF("h").createOrReplaceTempView("bloom_in")
    val row = spark.sql(
      """SELECT graft_bloom_contains(b, 22, 1024, 4) AS yes,
        |       graft_bloom_contains(b, 44, 1024, 4) AS no
        |FROM (SELECT graft_bloom_agg(h, 1024, 4) AS b FROM bloom_in)
        |""".stripMargin).head()
    assert(row.getBoolean(0))
    assert(!row.getBoolean(1)) // 1 value among 1024 bits: no collision
  }
}

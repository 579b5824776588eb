package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucket purity: invariants, tie pinning, and the literal-plane fast
  * path against the HOF derivation.
  */
class BucketPuritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = (1 to 40).map { i =>
    (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).abs + 0.1),
      i % 3)
  }.toDF("vec_id", "embedding", "label")

  test("conservation and bounds: buckets partition the corpus") {
    val r = Similarity.bucketPurity(vecs, nPlanes = 4).collect()
    assert(r.map(_.getLong(1)).sum == 40L)
    r.foreach { row =>
      assert(row.getLong(3) <= row.getLong(1))
      assert(row.getDouble(5) > 0.0 && row.getDouble(5) <= 1.0)
      assert(row.getLong(4) <= 1000000000L)
    }
  }

  test("single-label corpus is perfectly pure") {
    val mono = vecs.withColumn("label",
      org.apache.spark.sql.functions.lit(7))
    val r = Similarity.bucketPurity(mono, nPlanes = 4).collect()
    r.foreach(row => assert(row.getLong(4) == 1000000000L))
  }

  test("tied majority resolves to the smallest label") {
    val twins = Seq(
      (1L, Array(1.0, 2.0, 3.0, 4.0), 5),
      (2L, Array(1.0, 2.0, 3.0, 4.0), 3))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.bucketPurity(twins, nPlanes = 4).collect()
    assert(r.length == 1, "identical vectors share a bucket")
    assert(r(0).getInt(2) == 3)
    assert(r(0).getLong(4) == 500000000L)
  }

  test("literal-plane fast path equals the HOF derivation") {
    val fast = Similarity.bucketPurity(vecs, nPlanes = 6,
      dims = Some(8)).collect().map(_.toSeq).toSet
    val hof = Similarity.bucketPurity(vecs, nPlanes = 6)
      .collect().map(_.toSeq).toSet
    assert(fast == hof)
  }
}

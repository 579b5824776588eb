package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Quantization error: exactly-representable vectors are lossless,
  * zero vectors are safe, real loss is bounded by half a scale step.
  */
class QuantErrorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("integer vectors at m=127 reconstruct exactly; zero vector is safe") {
    val vecs = Seq(
      (1L, Array(127.0, -64.0, 3.0, 0.0), 0),
      (2L, Array(0.0, 0.0, 0.0, 0.0), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.quantizationError(vecs).collect()
      .map(x => x.getInt(0) -> (x.getLong(1), x.getDouble(2),
        x.getDouble(3))).toMap
    assert(r(0) == ((4L, 0.0, 0.0)), "scale 1.0 codes ints losslessly")
    assert(r(1) == ((4L, 0.0, 0.0)), "all-zero vector must not divide")
  }

  test("error is bounded by half a quantization step") {
    val vecs = Seq((1L, Array.tabulate(16)(i => (i + 1) * 0.37), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.quantizationError(vecs).collect()(0)
    val scale = 16 * 0.37 / 127.0
    assert(r.getDouble(3) <= scale / 2 + 1e-6,
      s"max err ${r.getDouble(3)} exceeds half-step ${scale / 2}")
    assert(r.getDouble(2) > 0.0, "non-representable values must lose")
  }
}

package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** FD audit: violations counted per key, NULL dependents as their own
  * class, null determinants excluded.
  */
class FdAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("variant counting, the null-dependent class, and the verdict") {
    val broken = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("x")),
      (Some(2L), Some("y")), (Some(2L), Some("z")),
      (Some(3L), Option.empty[String]), (Some(3L), Some("w")),
      (Option.empty[Long], Some("q")))
      .toDF("det", "dep")
    val clean = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("det", "dep")
    val r = Validation.fdAudit(Seq(
        Validation.FdCheck("broken", broken, "det", "dep"),
        Validation.FdCheck("clean", clean, "det", "dep")))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))
      .toMap
    // key 2 has two values; key 3 maps to 'w' AND NULL -> 2 classes
    assert(r("broken") == ((3L, 2L, 2L, false)))
    assert(r("clean") == ((2L, 0L, 1L, true)))
  }
}

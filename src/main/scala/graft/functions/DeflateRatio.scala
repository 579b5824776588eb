package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib (DEFLATE level 6) compressed-size / raw-size ratio of a
  * string's UTF-8 bytes, rounded to 6 dp — the classic redundancy
  * signal a pre-training curation pipeline thresholds on: boilerplate
  * and template spam compress far below prose, random noise compresses
  * above 1. Native codegen expression, so the whole-corpus scoring
  * pass stays inside whole-stage codegen (no UDF serialization, one
  * Deflater per evaluation, no shared state).
  *
  * Determinism: zlib level-6 output for fixed input bytes is fixed for
  * the bundled java.util.zip implementation, and the ratio is a double
  * division of two exact ints — stable across runs and partitionings.
  * There is no DuckDB zlib, so [[graft.ext.TextAnalysis.compressionStats]]
  * is spec-gated rather than oracle-gated (the BPE precedent): the spec
  * pins exact ratios against a direct `java.util.zip` computation and
  * the repetitive < prose < noise ordering.
  *
  * Empty string → ratio of the 8-byte zlib envelope over 0 raw bytes
  * is undefined: returns null (callers coalesce or filter; a 0-byte
  * doc is a quality reject anyway).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(s: Any): Any =
    DeflateRatio.ratio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // manual codegen: the helper returns a BOXED Double (null for empty
    // input), so the generated code must route through the null flag
    // rather than defineCodeGen's non-null fast path
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("ratio")
      s"""
         |java.lang.Double $boxed = graft.functions.DeflateRatio.ratio($c);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {
  /** Shared by interpreted and generated paths. Null for empty input. */
  def ratio(s: UTF8String): java.lang.Double = {
    val raw = s.getBytes
    if (raw.length == 0) null
    else {
      val d = new java.util.zip.Deflater(6)
      try {
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](raw.length + 64)
        var compressed = 0L
        while (!d.finished()) {
          val n = d.deflate(buf)
          compressed += n
          if (n == 0 && !d.finished()) return null // defensive: no progress
        }
        java.math.BigDecimal.valueOf(compressed.toDouble / raw.length)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      } finally d.end()
    }
  }
}

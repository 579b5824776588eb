package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-shingles over a token array — string-identical to the
  * builtin chain `transform(sequence(1, size-n+1),
  * i => concat_ws(" ", slice(toks, i, n)))` with the whole-text
  * fallback for short docs, but as one codegen'd loop.
  *
  * Why: higher-order-function lambdas run INTERPRETED, so the
  * expression form pays per-window lambda dispatch plus a fresh slice
  * allocation and a varargs concat per shingle — a visible slice of
  * every MinHash/LSH consumer's hot stage (shingleFrame feeds d2/d5/
  * d9/d10/d11/t50/t72/t74 and all nine curation composites). The
  * OUTPUT STRINGS are byte-identical (concat_ws semantics: null
  * elements skipped, single-space joints), so every downstream md5
  * signature — and therefore every result — is unchanged.
  *
  * Null semantics: the caller ([[graft.ext.TextOps.shingles]]) keeps
  * the builtin chain's null behavior with an explicit isNull branch —
  * this expression itself is null-safe (null in → null out).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType =
    DataTypes.createArrayType(StringType, false)

  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    WordShingles.shingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** concat_ws(" ", toks[a..b)) — null elements skipped, like the
    * builtin.
    */
  private def join(toks: ArrayData, a: Int, b: Int): UTF8String = {
    val parts = new java.util.ArrayList[UTF8String](b - a)
    var i = a
    while (i < b) {
      if (!toks.isNullAt(i)) parts.add(toks.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(Space, parts.toArray(new Array[UTF8String](0)): _*)
  }

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n)
      return new GenericArrayData(Array[Any](join(toks, 0, len)))
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = join(toks, i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

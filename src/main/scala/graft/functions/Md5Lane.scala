package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `numBytes` bytes of the input's md5 digest starting at `startByte`,
  * as an unsigned big-endian long — natively, with codegen.
  *
  * Value-identical to the builtin chain the repo's cross-engine hash
  * contract is written in (`TextOps.hash64`, `Dedup.laneHash`):
  * `conv(substring(md5(x), 2*startByte+1, 2*numBytes), 16, 10)` — the
  * hex substring [2s, 2s+2n) IS digest bytes [s, s+n), so the DuckDB
  * twins (`CAST('0x' || substr(md5(x), ...) AS BIGINT)`) keep matching
  * bit-for-bit. The builtin chain materializes a 32-char hex string,
  * substrings it, and re-parses the hex (three allocations per hash);
  * this goes digest-bytes → long directly. md5 is the single hottest
  * kernel in the text pipeline (every shingle hashes 2-3 times), so
  * the allocations are the difference that shows up at corpus scale.
  *
  * `startByte`/`numBytes` are plan-time constants (construction fails
  * on an out-of-range lane; numBytes ≤ 7 keeps the value positive).
  */
case class Md5Lane(child: Expression, startByte: Int, numBytes: Int)
    extends UnaryExpression {
  require(startByte >= 0 && numBytes >= 1 && numBytes <= 7 &&
    startByte + numBytes <= 16,
    s"md5 lane [$startByte, ${startByte + numBytes}) out of digest range")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary argument, " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5lane"

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Md5Lane.lane(bytes, startByte, numBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = child.dataType match {
        case StringType => s"$c.getBytes()"
        case _ => c
      }
      s"${ev.value} = graft.functions.Md5Lane.lane($bytes, $startByte, $numBytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Lane {
  // MessageDigest is stateful; one per task thread, reset per call
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def lane(bytes: Array[Byte], start: Int, n: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (d(start + i) & 0xffL); i += 1 }
    v
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BloomBits, BloomContains, DotProductD, KmvMins, Md5Lane, NfcNormalize}

/** Session-extension entry point: configure
  * `spark.sql.extensions=graft.GraftExtensions` and the native
  * expressions become SQL functions cluster-wide (the registration path
  * for deployments that never touch the Scala API). For an
  * already-running session use
  * `org.apache.spark.sql.GraftColumns.registerFunctions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductD(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5lane"),
      new ExpressionInfo(classOf[Md5Lane].getName, "graft_md5lane"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // lane bounds arrive as SQL literals: graft_md5lane(x, 0, 7).
        // A non-foldable bound (column reference) must fail as a typed
        // analysis error, not an opaque NPE from eval(null).
        def toInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
                  pos: Int): Int =
          e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other if other.foldable =>
              other.eval() match {
                case n: Number => n.intValue()
                case bad => throw org.apache.spark.sql.GraftErrors
                  .nonConstantArgument("graft_md5lane", pos,
                    s"folded to non-integer value $bad")
              }
            case _ => throw org.apache.spark.sql.GraftErrors
              .nonConstantArgument("graft_md5lane", pos,
                "argument is not a constant (foldable) expression")
          }
        Md5Lane(children.head, toInt(children(1), 1), toInt(children(2), 2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_mins"),
      new ExpressionInfo(classOf[KmvMins].getName, "graft_kmv_mins"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other if other.foldable =>
            other.eval() match {
              case n: Number => n.intValue()
              case bad => throw org.apache.spark.sql.GraftErrors
                .nonConstantArgument("graft_kmv_mins", 1,
                  s"folded to non-integer value $bad")
            }
          case _ => throw org.apache.spark.sql.GraftErrors
            .nonConstantArgument("graft_kmv_mins", 1,
              "argument is not a constant (foldable) expression")
        }
        KmvMins(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomBits].getName, "graft_bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomBits(children.head,
          GraftExtensions.constInt("graft_bloom_agg", children(1), 1),
          GraftExtensions.constInt("graft_bloom_agg", children(2), 2))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName,
        "graft_bloom_contains"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomContains(children.head, children(1),
          GraftExtensions.constInt("graft_bloom_contains", children(2), 2),
          GraftExtensions.constInt("graft_bloom_contains", children(3), 3))))
  }
}

object GraftExtensions {
  /** Plan-time constant int argument (the kmv/md5lane extraction rule,
    * shared): a literal or foldable expression; anything else is a
    * typed analysis error, not an NPE from `eval(null)`.
    */
  private[graft] def constInt(
      fn: String,
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      pos: Int): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other if other.foldable =>
      other.eval() match {
        case n: Number => n.intValue()
        case bad => throw org.apache.spark.sql.GraftErrors
          .nonConstantArgument(fn, pos, s"folded to non-integer value $bad")
      }
    case _ => throw org.apache.spark.sql.GraftErrors
      .nonConstantArgument(fn, pos,
        "argument is not a constant (foldable) expression")
  }
}

package graft

import org.apache.spark.sql.{GraftColumns, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BloomBits, BloomContains, DeflateRatio, DotProductD, KmvMins, Md5Lane, NfcNormalize, TopSample}

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
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        // lane bounds arrive as SQL literals: graft_md5lane(x, 0, 7);
        // constInt turns a non-foldable bound into a typed analysis
        // error, not an opaque NPE from eval(null)
        Md5Lane(children.head,
          GraftColumns.constInt("graft_md5lane", children(1), 1),
          GraftColumns.constInt("graft_md5lane", children(2), 2))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName,
        "graft_deflate_ratio"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DeflateRatio(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_mins"),
      new ExpressionInfo(classOf[KmvMins].getName, "graft_kmv_mins"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvMins(children.head,
          GraftColumns.constInt("graft_kmv_mins", children(1), 1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomBits].getName, "graft_bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomBits(children.head,
          GraftColumns.constInt("graft_bloom_agg", children(1), 1),
          GraftColumns.constInt("graft_bloom_agg", children(2), 2))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName,
        "graft_bloom_contains"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomContains(children.head, children(1),
          GraftColumns.constInt("graft_bloom_contains", children(2), 2),
          GraftColumns.constInt("graft_bloom_contains", children(3), 3))))
    ext.injectFunction((
      FunctionIdentifier("graft_top_sample"),
      new ExpressionInfo(classOf[TopSample].getName, "graft_top_sample"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopSample(children.head, children(1), children(2),
          GraftColumns.constInt("graft_top_sample", children(3), 3))))
  }
}


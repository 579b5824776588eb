// MIPS ANN recall probe: s8's bucketed ANN path (`mipsTopKAnn`) at 10×
// the sf0.1 embedding corpus. Claims under test:
//
//  1. Recall@10 vs the exact kernel stays high (≥0.9 at the default
//     nPlanes=8) — approximation shows up ONLY as recall; every score
//     an ANN candidate gets is the exact inner product.
//  2. The candidate volume (bucket-join pairs actually scored) is a
//     small fraction of batch × corpus, shrinking as nPlanes grows —
//     the recall/cost dial a deployment tunes.
//
// Replicas are id-shifted with a per-replica deterministic mix of the
// reversed vector (distinct vectors, same distribution shape).
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/ann_recall_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Similarity

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime()
  val r = f
  (r, (System.nanoTime() - t0) / 1e9)
}

val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val corpus10 = {
  (0 until 10).map { r =>
    base.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
      zip_with(col("embedding").cast("array<double>"),
        reverse(col("embedding").cast("array<double>")),
        (x, y) => x * (1.0 - 0.03 * r) + y * (0.03 * r)).as("embedding"))
  }.reduce(_ unionByName _).cache()
}
val nCorpus = corpus10.count()
val queries = corpus10.filter(col("vec_id") % 100 === 7).cache()
val nQueries = queries.count()
println(s"[probe] corpus=$nCorpus queries=$nQueries k=10")

val k = 10
val (exact, tExact) = time("exact") {
  val df = Similarity.mipsTopK(queries, corpus10, k)
  df.cache(); df.count(); df
}
println(f"[probe] exact mipsTopK (quadratic)     wall=$tExact%8.2f s " +
  f"pairs=${nQueries * (nCorpus - 1)}%12d")

val truth = {
  exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
}

for ((nPlanes, nTables) <- Seq((8, 1), (8, 4), (8, 8), (12, 4), (16, 8))) {
  // candidate volume exactly as the ANN join scores it: per-table home
  // bucket + Hamming-1 probes, distinct (query, neighbor) pairs
  val candidates = {
    val c0 = corpus10.withColumn("cn", Similarity.l2Norm(col("embedding")))
    val mRow = c0.agg(max(col("cn")).as("_m"))
    val cB = c0.crossJoin(broadcast(mRow))
      .select(col("vec_id").as("neighbor_id"), explode(array(
        (0 until nTables).map(t => struct(lit(t).as("t"),
          Similarity.lshBucket(concat(col("embedding"), array(
            sqrt(greatest(col("_m") * col("_m") - col("cn") * col("cn"),
              lit(0.0))))), nPlanes, None, t * nPlanes).as("bucket"))): _*))
        .as("tb"))
      .select(col("neighbor_id"), col("tb.t").as("t"),
        col("tb.bucket").as("bucket"))
    val qh = (0 until nTables).foldLeft(
      queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))) { (df, t) =>
      df.withColumn(s"_b$t", Similarity.lshBucket(
        concat(col("qv").cast("array<double>"), array(lit(0.0))),
        nPlanes, None, t * nPlanes))
    }
    val probeStructs = (0 until nTables).flatMap { t =>
      (col(s"_b$t") +: (0 until nPlanes).map(p =>
        col(s"_b$t").bitwiseXOR(lit(1L << p))))
        .map(b => struct(lit(t).as("t"), b.as("bucket")))
    }
    val qP = qh.select(col("query_id"),
        explode(array(probeStructs: _*)).as("tb"))
      .select(col("query_id"), col("tb.t").as("t"),
        col("tb.bucket").as("bucket"))
    cB.join(qP, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct().count()
  }
  val (ann, tAnn) = time(s"ann$nPlanes/$nTables") {
    val df = Similarity.mipsTopKAnn(queries, corpus10, k,
      nPlanes = nPlanes, nTables = nTables)
    df.cache(); df.count(); df
  }
  val got = ann.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  val recall = (truth & got).size.toDouble / truth.size
  val frac = candidates.toDouble / (nQueries.toDouble * nCorpus)
  println(f"[probe] ann nPlanes=$nPlanes%2d nTables=$nTables%2d " +
    f"recall@10=$recall%6.3f candidates=$candidates%10d " +
    f"(${frac * 100}%5.2f%% of batch×corpus) wall=$tAnn%7.2f s")
}
sys.exit(0)

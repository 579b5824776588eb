// Snapshot-diff scale probe (t37/t38): the dataset-versioning delta at
// 1×/10× corpus. Claims under test:
//
//  1. snapshotDiff's join shuffles (doc_id, 16-byte digest) pairs, not
//     text — cost grows with ROW COUNT, independent of document size.
//  2. diffSeverity's shingle work is confined to the CHANGED subset:
//     the digest filter cuts first, so growing the corpus 10× with the
//     same change density grows the scored set 10×, linearly.
//
// Replica construction matches tools/dedup_scale_probe.scala: ids
// shifted, tokens suffixed per replica, change mix applied per replica
// (same density at every scale).
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/diff_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextOps}

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}

val docs = {
  val raw = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  raw.select(col("doc_id"), TextOps.normText(col("text")).as("text"))
}

def replicas(n: Int): DataFrame = {
  val rs = (0 until n).map { k =>
    docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(t, lit(s"·$k")))).as("text"))
  }
  rs.reduce(_ unionByName _)
}

// the t37 change mix, replica-local: drop %13, rewrite %30, revise %10,
// re-add %8
def crawlV2(v1: DataFrame): DataFrame = {
  val kept = v1.filter(col("doc_id") % 13 =!= 0)
  val mutated = kept.select(col("doc_id"),
    when(col("doc_id") % 30 === 0,
      concat_ws(" ", reverse(split(col("text"), " "))))
      .when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" revised v2")))
      .otherwise(col("text")).as("text"))
  mutated.unionByName(v1.filter(col("doc_id") % 8 === 0)
    .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
}

for (n <- Seq(1, 10)) {
  println(s"[probe] ===== corpus ${n}x =====")
  val v1 = replicas(n)
  val v2 = crawlV2(v1)
  // warm the file cache once
  v1.count(); v2.count()
  val statuses = time(s"snapshotDiff ${n}x") {
    Dedup.snapshotDiff(v1, v2)
      .groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
  println(s"[probe]   statuses: $statuses")
  val sev = time(s"diffSeverity ${n}x") {
    Dedup.diffSeverity(v1, v2)
      .groupBy(col("severity")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
  println(s"[probe]   severities: $sev")
}
sys.exit(0)

// Search/curation probe: t29 (BM25) and t28 (segment dedup) at 1x/10x
// the sf0.1 document corpus. Claims under test:
//
//  1. t29 BM25: after the broadcast query-vocabulary cut, every join
//     moves only postings whose token appears in some query — cost
//     grows with THOSE postings (linear in corpus for corpus-vocab
//     queries, but never touching the full vocabulary rollup).
//  2. t28 segment dedup: one hash-only count shuffle + one per-doc
//     rebuild — linear, no stage quadratic in corpus size.
//
// Replicas are id-shifted with per-replica token suffixes on every
// 10th token (distinct segment/posting space growth — the worst case).
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/search_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Search, TextAnalysis}

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  r
}

val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
def replicate(n: Int): DataFrame = {
  (0 until n).map { r =>
    docs0.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        (t, i) => when(i % 10 === 0, concat(t, lit(s"·$r")))
          .otherwise(t))).as("text"))
  }.reduce(_ unionByName _)
}
import spark.implicits._
val queries = {
  Seq((1L, "spark join merge"), (2L, "window stream batch"),
      (3L, "customer order line"), (4L, "vector hash table scan"))
    .toDF("query_id", "qtext")
}

for (n <- Seq(1, 10)) {
  val corpus = { replicate(n).repartition(32, col("doc_id")).cache() }
  corpus.count() // cache() + count(): input built OUTSIDE the timers
  time(s"t29 BM25 top-10 (${n}x corpus)") {
    Search.bm25TopK(corpus, queries).count()
  }
  graft.std.Materialize.releaseAll()
  time(s"t28 segment dedup (${n}x corpus)") {
    TextAnalysis.segmentDedup(corpus).count()
  }
  graft.std.Materialize.releaseAll()
  corpus.unpersist(blocking = true)
}
sys.exit(0)

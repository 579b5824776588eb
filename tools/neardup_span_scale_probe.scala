// t79 near-dup span probe: end-to-end wall time of nearDupSpanDedup on
// 1x/10x/30x replicas of the sf0.1 documents corpus, with the fixture's
// per-doc tweaked promo (token 6 replaced by 'trk'||doc_id) on every
// third doc. Replicas are token-suffix distinct, so cross-replica
// leave-one-out fingerprints never collide (a cross-replica window
// differs at EVERY slot, not one) and duplicated-span volume scales
// linearly. Expectation: wall time linear in tokens x L — the pipeline
// is t77's chain with L fingerprints per window instead of one (hash
// pass, hash-grouped count, dup-offset distinct, per-doc island merge,
// single-touch rebuild); super-linear growth would mean the fingerprint
// join or the distinct is fanning out.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/neardup_span_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}

val head = TextAnalysis.SpanPromoHead
val tail = TextAnalysis.SpanPromoTail
def withPromo(docs: DataFrame): DataFrame = docs.select(col("doc_id"),
  when(col("doc_id") % 3 === 0,
    concat_ws(" ", col("text"), lit(head),
      concat(lit("trk"), col("doc_id").cast("string")), lit(tail)))
    .otherwise(col("text")).as("text"))

def run(docs: DataFrame, label: String): Unit = {
  val r = time(label)(TextAnalysis.nearDupSpanDedup(withPromo(docs))
    .agg(sum("n_tokens"), sum("n_spans"), sum("n_removed_tokens"))
    .collect()(0))
  println(s"[probe] $label tokens=${r.getLong(0)} spans=${r.getLong(1)} removed=${r.getLong(2)}")
  graft.std.Materialize.releaseAll()
}

val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text").repartition(32, col("doc_id"))
def rep(n: Int): DataFrame = (0 until n).map(i =>
  docs1.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
    concat_ws(" ", transform(split(col("text"), " "),
      t => concat(t, lit(s"_$i")))).as("text"))).reduce(_ unionByName _)

run(docs1, "warmup") // absorb JVM/codegen warmup
run(docs1, "1x")
run(rep(10).repartition(32).localCheckpoint(true), "10x")
run(rep(30).repartition(64).localCheckpoint(true), "30x")
sys.exit(0)

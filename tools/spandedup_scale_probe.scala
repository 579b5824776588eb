// t77 span-dedup scale probe: end-to-end wall time of spanDedup on
// 1x/10x/30x replicas of the sf0.1 documents corpus. Replicas are
// token-suffix distinct (every token carries a replica marker), so
// cross-replica windows never collide and duplicated-span volume —
// the injected 12-token promo on every third doc, plus organic
// recurrence — scales linearly with the corpus. Expectation: wall
// time linear in total tokens (the pipeline is one hash pass over
// windows, a hash-grouped count, a dup-offset-only per-doc window
// sort, and a single-touch rebuild); super-linear growth would mean
// the dup join or island merge is fanning out.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/spandedup_scale_probe.scala
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

val promo = "subscribe to our newsletter today for weekly updates and exclusive member offers"
def withPromo(docs: DataFrame): DataFrame = docs.select(col("doc_id"),
  when(col("doc_id") % 3 === 0, concat_ws(" ", col("text"), lit(promo))).otherwise(col("text")).as("text"))

def run(docs: DataFrame, label: String): Unit = {
  val r = time(label)(TextAnalysis.spanDedup(withPromo(docs))
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

// s34 rank-k All-but-the-Top scale probe: wall time vs corpus replicas
// (1x/4x/10x of the sf0.1 embeddings, vec_id-shifted so ids stay
// unique; vectors identical, so the mean/PCs — and therefore the rank
// count and chain count — are IDENTICAL at every scale point and the
// probe isolates pure row-volume cost). Expectation: linear in rows —
// each power-iteration step is two partial-agg passes over the
// exploded (vid, dim) frame with v/mu broadcast; super-linear growth
// would mean a per-rank artifact (pin, plan) is compounding.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/allbuttopk_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Similarity

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[probe] $label%-10s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}

def run(vecs: DataFrame, label: String): Unit = {
  val rows = time(label)(Similarity.allButTopK(vecs, k = 3, varShareStop = 0.15, iters = 4).collect())
  println(s"[probe] $label ranks_removed=${rows.length} n=${rows.headOption.map(_.getLong(1)).getOrElse(0L)}")
  graft.std.Materialize.releaseAll()
}

val v1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(col("vec_id"), col("embedding")).repartition(32, col("vec_id"))
def rep(n: Int): DataFrame = (0 until n).map(i => v1.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"), col("embedding"))).reduce(_ unionByName _)

run(v1, "warmup")
run(v1, "1x")
run(rep(4).repartition(32, col("vec_id")).localCheckpoint(true), "4x")
run(rep(10).repartition(64, col("vec_id")).localCheckpoint(true), "10x")
sys.exit(0)

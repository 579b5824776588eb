// K-means trainer scale probe: wall-time for Similarity.kmeansTrain on
// 1x/4x/10x replicas of the sf0.1 embedding corpus (2k/8k/20k vectors,
// 64 dims). Replicas are vec-id-shifted, so the hash-mod init spreads
// them independently. Per Lloyd iteration the plan is ONE broadcast
// codebook equi-join over the exploded corpus (|corpus|·dims·k distance
// rows with partial-agg collapse) plus two aggregations, so with k and
// iters CONSTANT (the s16 sizing contract) total cost should scale
// linearly in the corpus. An iters=1 vs 4 split separates the fixed
// cost (explode + pin) from the per-iteration marginal. The k=64
// column shows the OTHER axis: cost is also linear in k, which is why
// the codebook size must stay a constant of the index, never a
// function of corpus size (tools/ivfpq_scale_probe.scala measures what
// violating that does to the composed index).
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/kmeans_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime()
  val r = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"[probe] $label%-28s $s%8.1f s")
  (r, s)
}

val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(col("vec_id"), col("embedding"))

def replicate(times: Int): DataFrame =
  (0 until times).map { i =>
    base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
      col("embedding"))
  }.reduce(_ unionByName _)

for (times <- Seq(1, 4, 10)) {
  val vecs = replicate(times)
  // warm-up absorbs JIT/codegen so the timed runs are steady-state
  graft.ext.Similarity.kmeansTrain(vecs, 8, 1).count()
  graft.std.Materialize.releaseAll()
  for ((k, iters) <- Seq((8, 1), (8, 4), (64, 4))) {
    val (rows, t) = time(f"${times}x k=$k iters=$iters") {
      graft.ext.Similarity.kmeansTrain(vecs, k, iters).count()
    }
    println(f"[probe]   codebook rows = $rows%d")
    graft.std.Materialize.releaseAll()
  }
}
println("[probe] done — expect near-linear growth in `times` at fixed")
println("[probe] (k, iters); the k=64 line shows cost is linear in k too,")
println("[probe] which is why codebook size is a CONSTANT of the index")
sys.exit(0)

// SemDeDup scale probe: wall-time AND within-cell candidate-pair count
// for Similarity.semDedup on vec-id-shifted replicas of the sf0.1
// embedding corpus (2k..80k vectors, 64 dims).
//
// The scale contract has two terms:
//   train:  linear in corpus × k (the kmeansLoop contract; sample-
//           bounded in production);
//   pairs:  Σ_cell n_c·(n_c−1)/2 exact-cosine comparisons — with k
//           FIXED, n_c grows with the corpus and this term is
//           QUADRATIC; with k ∝ corpus (the SemDeDup paper's policy,
//           ~100k clusters at LAION scale), n_c stays constant and it
//           is linear.
//
// At probe scale the linear training term dominates wall time, so the
// probe reports the PAIR COUNT next to the seconds: the fixed-k pair
// column grows ~16×/100× at 4×/10× data (quadratic — the term that
// owns the wall clock at production scale), while the proportional-k
// column grows ~4×/10× (linear). The 20×/40× fixed-k rows push far
// enough that the quadratic term starts bending wall time too.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/semdedup_scale_probe.scala
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

val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
  .select(col("vec_id"), col("embedding"))

def replicate(times: Int): DataFrame =
  (0 until times).map { i =>
    base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
      col("embedding"))
  }.reduce(_ unionByName _)

// exact candidate-pair count for a run's final assignment: the
// quadratic term, measured instead of argued
def pairCount(vecs: DataFrame, k: Int): Long = {
  val r = graft.ext.Similarity.semDedup(vecs, k, 4, 0.95)
  val n = r.groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
    .agg(sum(expr("n * (n - 1) div 2")).as("p")).head().getLong(0)
  graft.std.Materialize.releaseAll()
  n
}

// warm-up absorbs JIT/codegen
graft.ext.Similarity.semDedup(base, 8, 1, 0.95).count()
graft.std.Materialize.releaseAll()

for (times <- Seq(1, 4, 10, 20, 40)) {
  val vecs = replicate(times)
  val (p1, _) = time(f"${times}x k=8 FIXED") { pairCount(vecs, 8) }
  println(f"[probe]   pairs(fixed k=8)    = $p1%,d")
  if (times <= 10) {
    val kProp = 8 * times
    val (p2, _) = time(f"${times}x k=$kProp PROPORTIONAL") {
      pairCount(vecs, kProp)
    }
    println(f"[probe]   pairs(k=$kProp) = $p2%,d")
  }
}
println("[probe] done — fixed-k pairs grow QUADRATICALLY in the corpus")
println("[probe] (the term that owns production wall clock), while the")
println("[probe] proportional-k pairs grow linearly: cluster count is")
println("[probe] a FUNCTION of corpus size in the SemDeDup contract")
sys.exit(0)

// PageRank scale probe: wall-time per iteration on 1×/4×/16× replicas
// of the sf0.1 co-purchase graph (x20's edge construction). Replicas
// are node-id-shifted, so components stay disjoint: |V| and |E| scale
// linearly, per-iteration cost should too — the Pregel-as-joins loop
// has no all-pairs term. Also reports the fixed overhead (edge pin +
// node count) vs marginal per-iteration cost, which is the number that
// matters at 1000 iterations-to-convergence scale.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/pagerank_scale_probe.scala
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

val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
val baseEdges = li.select(col("l_partkey").as("src"), lead("l_partkey", 1).over(w).as("dst")).filter(col("dst").isNotNull)

def replicate(times: Int): DataFrame =
  (0 until times).map { i =>
    baseEdges.select((col("src") + lit(i * 1000000L)).as("src"),
      (col("dst") + lit(i * 1000000L)).as("dst"))
  }.reduce(_ unionByName _)

for (times <- Seq(1, 4, 16)) {
  val edges = replicate(times)
  // warm-up: JIT + shuffle-service spin-up contaminate the first
  // timed run otherwise (observed: a NEGATIVE per-iteration marginal)
  val warmed = graft.ext.Graph.pageRank(edges, iterations = 1).count()
  graft.std.Materialize.releaseAll()
  val (ranks, total) = time(s"${times}x pagerank(3 iters)") {
    val r = graft.ext.Graph.pageRank(edges, iterations = 3)
    r.count()
    r
  }
  // marginal iteration cost: 6 iters minus 3 iters ≈ 3 extra iterations
  val (_, total6) = time(s"${times}x pagerank(6 iters)") {
    val r = graft.ext.Graph.pageRank(edges, iterations = 6)
    r.count(); r
  }
  val perIter = (total6 - total) / 3.0
  println(f"[probe] ${times}x per-iteration marginal  $perIter%8.2f s" +
    f"  (fixed overhead ≈ ${total - 3 * perIter}%.2f s)")
  graft.std.Materialize.releaseAll()
}
println("[probe] done")
sys.exit(0)

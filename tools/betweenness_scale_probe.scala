// Betweenness scale probe: wall-time for Graph.betweennessCentrality
// on 1x/4x/10x replicas of the sf0.1 chain graph (x58's construction),
// under BOTH seed contracts — the harmonic probe's experiment on the
// three-pass Brandes operator:
//   fixed — the seed panel stays at the 1x size (the sampled-source
//           estimator contract: error is set by |S|); per pass the
//           (seed, node) frame grows only with per-copy reach, so
//           wall time should scale ~linearly in the graph.
//   prop  — seeds replicate with the graph: the |S|·|reached| state
//           grows quadratically-ish, the contract violation priced
//           the way the harmonic/ivfpq probes price theirs.
// Replicas are node-id-shifted (disjoint components), so per-seed
// reach is unchanged per copy and the comparison isolates |S|.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/betweenness_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime()
  val r = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"[probe] $label%-30s $s%8.1f s")
  (r, s)
}

val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
val pt = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
val baseEdges = li.select(col("l_partkey").as("src"), lead("l_partkey", 1).over(w).as("dst")).filter(col("dst").isNotNull)
val baseSeeds = pt.filter(col("p_partkey") % 500 === 0).select(col("p_partkey").as("seed"))

def replicateE(times: Int): DataFrame =
  (0 until times).map { i =>
    baseEdges.select((col("src") + lit(i * 1000000L)).as("src"),
      (col("dst") + lit(i * 1000000L)).as("dst"))
  }.reduce(_ unionByName _)

def replicateS(times: Int): DataFrame =
  (0 until times).map { i =>
    baseSeeds.select((col("seed") + lit(i * 1000000L)).as("seed"))
  }.reduce(_ unionByName _)

for (times <- Seq(1, 4, 10)) {
  val edges = replicateE(times)
  // warm-up absorbs JIT/codegen so the timed runs are steady-state
  graft.ext.Graph.betweennessCentrality(edges, baseSeeds,
    iterations = 1).count()
  graft.std.Materialize.releaseAll()
  time(s"betweenness ${times}x fixed-|S|") {
    graft.ext.Graph.betweennessCentrality(edges, baseSeeds,
      iterations = 4).count()
  }
  graft.std.Materialize.releaseAll()
  time(s"betweenness ${times}x prop-|S|") {
    graft.ext.Graph.betweennessCentrality(edges, replicateS(times),
      iterations = 4).count()
  }
  graft.std.Materialize.releaseAll()
}
println("[probe] done — fixed-|S| should track the graph ~linearly;")
println("[probe] prop-|S| prices the |S|*|reached| state explicitly")
sys.exit(0)

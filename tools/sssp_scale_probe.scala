// Shortest-paths scale probe: wall-time for Graph.shortestPaths on
// 1x/4x/10x replicas of the sf0.1 weighted co-purchase graph (x50's
// construction). Replicas are node-id-shifted (disjoint components,
// seeds replicated per copy), so |V|, |E| and |seeds| all scale
// linearly and each relaxation — one dist⋈edges equi-join plus one
// groupBy-MIN with map-side partial collapse — should too. The
// iterations=1 vs 4 split separates the fixed cost (edge
// MIN-collapse + pin) from the per-relaxation marginal.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/sssp_scale_probe.scala
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
val pt = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
val baseEdges = li.select(col("l_partkey").as("src"), lead("l_partkey", 1).over(w).as("dst"), col("l_quantity").cast("long").as("w")).filter(col("dst").isNotNull)
val baseSeeds = pt.filter(col("p_size") === 1).select(col("p_partkey").as("seed"))

def replicateE(times: Int): DataFrame =
  (0 until times).map { i =>
    baseEdges.select((col("src") + lit(i * 1000000L)).as("src"),
      (col("dst") + lit(i * 1000000L)).as("dst"), col("w"))
  }.reduce(_ unionByName _)

def replicateS(times: Int): DataFrame =
  (0 until times).map { i =>
    baseSeeds.select((col("seed") + lit(i * 1000000L)).as("seed"))
  }.reduce(_ unionByName _)

for (times <- Seq(1, 4, 10)) {
  val edges = replicateE(times)
  val seeds = replicateS(times)
  // warm-up absorbs JIT/codegen so the timed runs are steady-state
  graft.ext.Graph.shortestPaths(edges, seeds, iterations = 1).count()
  graft.std.Materialize.releaseAll()
  for (iters <- Seq(1, 4)) {
    val (reached, t) = time(f"${times}x iters=$iters") {
      graft.ext.Graph.shortestPaths(edges, seeds, iterations = iters)
        .count()
    }
    graft.std.Materialize.releaseAll()
    println(s"[probe]   reached=$reached")
  }
}
sys.exit(0)

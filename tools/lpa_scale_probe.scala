// Label-propagation scale probe: wall-time for Graph.labelPropagation
// on 1x/4x/10x replicas of the sf0.1 co-purchase graph (x34's
// construction). Replicas are node-id-shifted, so components stay
// disjoint: |V| and |E| scale linearly and per-iteration cost should
// too — each iteration is one labels⋈edges join, one partial-agg vote
// count, and a per-node winner window whose partition size is bounded
// by the node's DISTINCT-NEIGHBOR-LABEL count (≤ degree), never the
// corpus. An iterations=1 vs 3 split separates the fixed cost (edge
// canonicalize + pin) from the per-iteration marginal.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/lpa_scale_probe.scala
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

// single-line defs: spark-shell -I terminates a statement at any
// newline where the prefix parses
val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
val baseEdges = li.select(col("l_partkey").as("src"), lead("l_partkey", 1).over(w).as("dst")).filter(col("dst").isNotNull)

def replicate(times: Int): DataFrame =
  (0 until times).map { i =>
    baseEdges.select((col("src") + lit(i * 1000000L)).as("src"),
      (col("dst") + lit(i * 1000000L)).as("dst"))
  }.reduce(_ unionByName _)

for (times <- Seq(1, 4, 10)) {
  val edges = replicate(times)
  // warm-up run absorbs JIT/codegen so the timed runs are steady-state
  graft.ext.Graph.labelPropagation(edges, iterations = 1).count()
  graft.std.Materialize.releaseAll()
  for (iters <- Seq(1, 3)) {
    val (communities, t) = time(f"${times}x iters=$iters") {
      graft.ext.Graph.labelPropagation(edges, iterations = iters)
        .agg(countDistinct("community")).collect()(0).getLong(0)
    }
    println(f"[probe]   communities = $communities%d")
    graft.std.Materialize.releaseAll()
  }
}
println("[probe] done — expect near-linear growth in `times` and the")
println("[probe] iters=3 minus iters=1 marginal to scale with |E| alone")
sys.exit(0)

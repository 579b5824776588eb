// Bounded-SCC scale probe (x69): wall-time for Graph.stronglyConnected
// on 1x/4x/10x node-id-shifted replicas of the sf0.1 chain graph.
// Label state is |V| rows of two longs; each forward hop is one
// labels⋈edges join + a groupBy-MIN, each backward hop one join +
// distinct — all map-side-collapsible, so wall time should track |E|
// linearly. A hops=2 vs 4 split separates the fixed cost (edge pin +
// node frame) from the per-hop marginal. Confirmed-member counts must
// replicate exactly (disjoint replicas).
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/scc_scale_probe.scala
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

for (times <- Seq(1, 4, 10)) {
  val edges = replicate(times)
  graft.ext.Graph.stronglyConnected(edges, hops = 2).count()
  graft.std.Materialize.releaseAll()
  for (hops <- Seq(2, 4)) {
    val (n, t) = time(f"${times}x hops=$hops") {
      graft.ext.Graph.stronglyConnected(edges, hops = hops).count()
    }
    println(f"[probe]   confirmed members = $n%d")
    graft.std.Materialize.releaseAll()
  }
}
// the x71 peel-rounds knob at 1x: rounds 2 and 3 run on the REMAINDER
// (everything the earlier rounds didn't confirm), so each extra round
// should cost strictly less than the last — the frames only shrink.
// Confirmed members should grow monotonically with rounds.
for (rounds <- Seq(1, 2, 3)) {
  val (n, t) = time(f"1x peelRounds=$rounds") {
    graft.ext.Graph.stronglyConnectedPeel(replicate(1), hops = 4,
      peelRounds = rounds).count()
  }
  println(f"[probe]   confirmed members = $n%d")
  graft.std.Materialize.releaseAll()
}
println("[probe] done — expect near-linear growth in `times`, the")
println("[probe] hops=4 minus hops=2 marginal linear in |E|, peel")
println("[probe] round marginals shrinking, members monotone in")
println("[probe] rounds, and member counts replicating exactly")
sys.exit(0)

// Random-walk scale probe (x66): wall-time for Graph.randomWalks on
// 1x/4x/10x node-id-shifted replicas of the sf0.1 chain graph, with
// the seed panel replicated alongside — walks per replica stay
// proportional, so |walk state| and |capped adjacency| both scale
// linearly and per-step cost should too: each step is ONE equi-join
// of the frontier against the rank-capped adjacency with the pick
// predicate riding the join. A steps=1 vs 4 split separates the
// fixed cost (adjacency rank window + pin) from the per-step
// marginal, and a maxDegree=8 vs 64 split prices the neighbor cap
// (join fan-out per visit is bounded by the cap, so the capped run
// must not be slower).
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/walks_scale_probe.scala
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
val baseEdges = li.select(col("l_partkey").as("src"), lead("l_partkey", 1).over(w).as("dst")).filter(col("dst").isNotNull)
val baseSeeds = pt.filter(col("p_partkey") % 100 === 0).select(col("p_partkey").as("seed"))

def replicate(df: DataFrame, c1: String, c2: Option[String], times: Int): DataFrame =
  (0 until times).map { i =>
    val shifted = df.withColumn(c1, col(c1) + lit(i * 1000000L))
    c2.map(c => shifted.withColumn(c, col(c) + lit(i * 1000000L))).getOrElse(shifted)
  }.reduce(_ unionByName _)

for (times <- Seq(1, 4, 10)) {
  val edges = replicate(baseEdges, "src", Some("dst"), times)
  val seeds = replicate(baseSeeds, "seed", None, times)
  graft.ext.Graph.randomWalks(edges, seeds, steps = 1).count()
  graft.std.Materialize.releaseAll()
  for (steps <- Seq(1, 4)) {
    val (rows, t) = time(f"${times}x steps=$steps") {
      graft.ext.Graph.randomWalks(edges, seeds, steps = steps).count()
    }
    println(f"[probe]   walk rows = $rows%d")
    graft.std.Materialize.releaseAll()
  }
  val (rowsCap, tCap) = time(f"${times}x steps=4 cap=8") {
    graft.ext.Graph.randomWalks(edges, seeds, steps = 4, maxDegree = 8).count()
  }
  println(f"[probe]   walk rows = $rowsCap%d")
  graft.std.Materialize.releaseAll()
}
// x72 rider: skip-gram pair extraction over the generated corpus —
// one equi-self-join on walk_id with a (steps+1)^2 = 25-row bound per
// walk, so cost must track |walks| (i.e. `times`) linearly and the
// marginal over the bare walk run should be small and flat.
for (times <- Seq(1, 4, 10)) {
  val edges = replicate(baseEdges, "src", Some("dst"), times)
  val seeds = replicate(baseSeeds, "seed", None, times)
  val (pairs, t) = time(f"${times}x skipgram w=2") {
    graft.ext.Graph.skipGramPairs(
      graft.ext.Graph.randomWalks(edges, seeds, steps = 4),
      window = 2).count()
  }
  println(f"[probe]   pair groups = $pairs%d")
  graft.std.Materialize.releaseAll()
}
println("[probe] done — expect near-linear growth in `times`, the")
println("[probe] steps=4 minus steps=1 marginal linear in |walks|,")
println("[probe] the cap=8 run at-or-under the cap=64 one, and the")
println("[probe] skip-gram marginal over the walk run small and flat")
sys.exit(0)

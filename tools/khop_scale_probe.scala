// Bounded-BFS scale probe: wall-time and frontier sizes for
// Graph.kHopReach on 1x/4x replicas of the sf0.1 co-purchase graph
// (x38's construction) with the seed set scaled alongside. Replicas
// are node-id-shifted, so components stay disjoint: |V|, |E|, |seeds|
// and every frontier scale linearly, and so should hop cost — the
// batched (seed, node) frontier loop has no per-seed job series and
// no all-pairs term. The fixed cost (edge pin, seed distinct) is the
// x20-probe story: it amortizes over the hop count.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/khop_scale_probe.scala
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
// newline where the prefix parses, so a trailing `Window` would split
val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
val baseEdges = li.select(col("l_partkey").as("src"), lead("l_partkey", 1).over(w).as("dst")).filter(col("dst").isNotNull)

def replicate(times: Int): DataFrame =
  (0 until times).map { i =>
    baseEdges.select((col("src") + lit(i * 1000000L)).as("src"),
      (col("dst") + lit(i * 1000000L)).as("dst"))
  }.reduce(_ unionByName _)

def seedsOf(times: Int): DataFrame =
  (0 until times).map { i =>
    spark.range(1, 20001)
      .select((col("id") + lit(i * 1000000L)).as("seed"))
      .filter(col("seed") % 101 === 0)
  }.reduce(_ unionByName _)

for (times <- Seq(1, 4)) {
  val edges = replicate(times)
  val seeds = seedsOf(times)
  // warm-up run absorbs JIT/codegen so the timed run is steady-state
  graft.ext.Graph.kHopReach(edges, seeds, hops = 1).count()
  graft.std.Materialize.releaseAll()
  for (hops <- Seq(1, 3)) {
    val (reached, t) = time(f"${times}x hops=$hops") {
      graft.ext.Graph.kHopReach(edges, seeds, hops = hops)
        .agg(sum("n_reached")).collect()(0).getLong(0)
    }
    println(f"[probe]   reached total = $reached%d")
    graft.std.Materialize.releaseAll()
  }
}
println("[probe] done")
sys.exit(0)

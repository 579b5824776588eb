// Link-prediction scale probe (x67): wall-time for Graph.linkPrediction
// on 1x/4x/10x node-id-shifted replicas of the sf0.1 chain graph.
// Candidate pairs form ONLY through shared neighbors via the
// rank-capped adjacency, so pair volume is Σ_w min(deg(w), cap)² —
// linear in |V| at a fixed cap, and the probe's cap=8 vs 32 split
// prices the cap² fan-out directly (the d2/m5 skew-cap discipline:
// the cap is the knob that keeps a hub from going quadratic).
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/linkpred_scale_probe.scala
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
  graft.ext.Graph.linkPrediction(edges, maxDegree = 8).count()
  graft.std.Materialize.releaseAll()
  for (cap <- Seq(8, 32)) {
    val (n, t) = time(f"${times}x cap=$cap") {
      graft.ext.Graph.linkPrediction(edges, maxDegree = cap).count()
    }
    println(f"[probe]   report rows = $n%d")
    graft.std.Materialize.releaseAll()
  }
}
println("[probe] done — expect near-linear growth in `times` at fixed")
println("[probe] cap, and the cap=32 vs cap=8 gap bounded by (32/8)^2")
sys.exit(0)

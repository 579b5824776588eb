// Modularity / refinement-sweep scale probe: wall-time for
// Graph.modularity (x63's scorer) and Graph.modularityRefine (x64's
// sweep) on 1x/4x/10x node-shifted replicas of the sf0.1 chain graph.
// Labels are a synthetic id-block partition (8 consecutive ids per
// community, disjoint across replicas) so the probe prices the
// SCORER and SWEEP dataflow itself, not the LPA pass that produces
// labels in the x63/x64 queries (LPA's own scaling is the
// lpa_scale_probe). Both operators are non-iterative join+agg
// dataflows over the edge list and the skinny label frame — the
// expectation is plain linearity in |E|, and anything super-linear
// here would be a real defect (no |S| knob exists to hide behind).
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/modularity_scale_probe.scala
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
val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
val baseEdges = li.select(col("l_partkey").as("src"), lead("l_partkey", 1).over(w).as("dst")).filter(col("dst").isNotNull)
val shift = 10000000L

def replicateE(times: Int): DataFrame =
  (0 until times).map { i =>
    baseEdges.select((col("src") + lit(i * shift)).as("src"), (col("dst") + lit(i * shift)).as("dst"))
  }.reduce(_ unionAll _)

def labelsOf(e: DataFrame): DataFrame =
  e.select(col("src").as("node")).unionAll(e.select(col("dst").as("node"))).distinct().select(col("node"), (col("node") - (col("node") % 8)).as("community"))

// pins released per scale point — accumulated checkpoint blocks
// squeeze execution memory and fake a super-linear tail (the round-3
// bench lesson; Bench.scala releases after every query for the same
// reason)
for (t <- Seq(1, 4, 10)) {
  val e = graft.std.Materialize.once(replicateE(t))
  val l = graft.std.Materialize.once(labelsOf(e))
  time(s"warmup ${t}x edges count")(e.count() + l.count())
  time(s"modularity ${t}x")(graft.ext.Graph.modularity(e, l).count())
  time(s"refine ${t}x")(graft.ext.Graph.modularityRefine(e, l).count())
  graft.std.Materialize.releaseAll()
}
println("[probe] done — both are single-pass join+agg dataflows; expect ~linear in |E|")
sys.exit(0)

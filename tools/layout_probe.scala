// Storage-layout probe: measures what the write-time layout operators
// buy at a 10x scale-up. Claims under test:
//
//  1. Bucketing (sources/Bucketing): a bucketed orders ⋈ lineitem
//     equi-join plans ZERO shuffle exchanges and beats the plain join,
//     which must exchange both sides every run — the one-time write
//     shuffle amortizes across every downstream join/agg on the key.
//  2. Partition pruning (sources/Layout): a date-partitioned events
//     table filtered to one date lists/reads only that partition's
//     files — planning-time work proportional to the selected data,
//     not the table.
//
// The 10x fact tables are key-shifted unions (same construction as the
// README's 10x probe), written once to /tmp; join timings are min-of-2
// warm runs. Broadcast joins are disabled so the comparison is
// SMJ-vs-SMJ (broadcast would hide the exchange on the small side and
// at 100 TB neither side of a fact-fact join broadcasts).
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false \
//        --conf spark.sql.warehouse.dir=/tmp/layout_probe/wh \
//        --conf spark.sql.catalogImplementation=in-memory \
//        -I tools/layout_probe.scala
// (warehouse.dir is a STATIC conf: a runtime spark.conf.set throws and
// the bucketed tables would land in ./spark-warehouse + a Derby
// metastore in the launch directory — pass it at startup.)
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Layout, Tables}

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  r
}
def minOf2(label: String)(f: => Long): Unit = {
  val a = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
  val b = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
  println(f"[probe] $label%-44s ${math.min(a, b)}%8.2f s (min of 2)")
}

val sfDir = "/root/testdata/sf0.1"
val reps = 10

// 10x fact tables by key-shifted union (keys stay join-consistent)
val orders0 = Tables.orders(spark, sfDir)
val li0 = Tables.lineitem(spark, sfDir)
val maxKey = { orders0.agg(max("o_orderkey")).head().getLong(0) + 1 }
val orders10 = {
  (0 until reps).map(r => orders0.select(
    (col("o_orderkey") + lit(r * maxKey)).as("o_orderkey"),
    col("o_custkey"), col("o_totalprice"))).reduce(_ unionByName _)
}
val li10 = {
  (0 until reps).map(r => li0.select(
    (col("l_orderkey") + lit(r * maxKey)).as("o_orderkey"),
    col("l_quantity"), col("l_extendedprice"))).reduce(_ unionByName _)
}

// ---- claim 1: bucketed co-located join vs plain join at 10x ----
time("write 10x plain parquet (orders+lineitem)") {
  orders10.write.mode("overwrite").parquet("/tmp/layout_probe/orders_plain")
  li10.write.mode("overwrite").parquet("/tmp/layout_probe/li_plain")
}
time("write 10x bucketed tables (32 buckets)") {
  Bucketing.writeBucketed(orders10, "probe_orders_b", "o_orderkey", 32)
  Bucketing.writeBucketed(li10, "probe_li_b", "o_orderkey", 32)
}

val plainJoin = {
  spark.read.parquet("/tmp/layout_probe/orders_plain")
    .join(spark.read.parquet("/tmp/layout_probe/li_plain"), Seq("o_orderkey"))
}
val bucketJoin =
  Bucketing.colocatedJoin(spark, "probe_orders_b", "probe_li_b", "o_orderkey")
println(s"[probe] plain join exchanges:    ${Bucketing.exchangeCount(plainJoin)}")
println(s"[probe] bucketed join exchanges: ${Bucketing.exchangeCount(bucketJoin)}")
minOf2("plain join agg (shuffles both sides)") {
  plainJoin.agg(sum("l_quantity"), sum("o_totalprice")).head(); 0L
}
minOf2("bucketed join agg (zero exchanges)") {
  bucketJoin.agg(sum("l_quantity"), sum("o_totalprice")).head(); 0L
}

// ---- claim 2: partition pruning on a 10x date-partitioned table ----
val events10 = {
  val e = Tables.events(spark, sfDir)
  (0 until reps).map(r => e.select(
    (col("event_id") + lit(r * 10000000L)).as("event_id"),
    col("ts"), col("event_type"), col("value"))).reduce(_ unionByName _)
    .withColumn("event_date", to_date(col("ts")))
}
time("write 10x date-partitioned events") {
  Layout.writePartitioned(events10, "/tmp/layout_probe/events_part",
    Seq("event_date"))
}
val all = spark.read.parquet("/tmp/layout_probe/events_part")
val oneDate = all.select(min(col("event_date"))).head().getDate(0)
val pruned = all.filter(col("event_date") === lit(oneDate))
println(s"[probe] files, full scan:   ${Layout.filesRead(all)}")
println(s"[probe] files, one date:    ${Layout.filesRead(pruned)}")
println(s"[probe] partition filters:  ${Layout.partitionFilters(pruned)}")
minOf2("full-table count") { all.count() }
minOf2("one-date count (pruned)") { pruned.count() }

sys.exit(0)

// Incremental-dedup scale probe: a FIXED batch (today's increment)
// deduped against an EXISTING corpus grown 1×/10×/50×. The claim under
// test: with the corpus-side state precomputed (content digests +
// LSH band keys, hash-partitioned on the join key — what a production
// pipeline persists between increments), the per-increment cost is
// O(batch), not O(corpus): batch-side hashing is constant, and the
// candidate join only shuffles the batch side (the corpus side's
// partitioning is already compatible).
//
// Replica construction matches tools/dedup_scale_probe.scala: every
// token carries a replica marker, so cross-replica Jaccard is 0 and
// near-dup density per replica stays constant.
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/incremental_dedup_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextOps}

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}

def release(dfs: Seq[DataFrame]): Unit = {
  dfs.foreach { df =>
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ =>
    }
  }
}

val docs = {
  val raw = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  raw.select(col("doc_id"), TextOps.normText(col("text")).as("text"))
}

// replica k: ids shifted, every token suffixed ·k (cross-replica J = 0)
def replicas(n: Int): DataFrame = {
  val rs = (0 until n).map { k =>
    docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(t, lit(s"·$k")))).as("text"))
  }
  rs.reduce(_ unionByName _)
}

// the batch is fixed: fresh docs (suffix ·b — matches nothing) plus
// exact copies and near-dup mutations of replica-0 docs
val batch = {
  val r0 = docs.select(col("doc_id"),
    concat_ws(" ", transform(split(col("text"), " "),
      t => concat(t, lit("·0")))).as("text"))
  val fresh = docs.filter(col("doc_id") % 3 =!= 0)
    .select((col("doc_id") + 600000L).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(t, lit("·b")))).as("text"))
  val exactCopies = r0.filter(col("doc_id") % 6 === 0)
    .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
  val nearCopies = r0.filter(col("doc_id") % 9 === 0)
    .select((col("doc_id") + 400000L).as("doc_id"),
      concat_ws(" ", filter(split(col("text"), " "),
        (t, i) => (i + 1) % 11 =!= 0)).as("text"))
  fresh.unionByName(exactCopies).unionByName(nearCopies)
    .repartition(32, col("doc_id")).localCheckpoint(true)
}
println(s"[probe] batch docs = " + batch.count())

def shingledOf(d: DataFrame): DataFrame = {
  val spreadDf = d.repartition(32, col("doc_id"))
  val barrier = TextOps.attrBarrier(spreadDf, Seq("doc_id"), "_toks",
    split(col("text"), " "))
  barrier.select(col("doc_id"), TextOps.shingles(col("_toks"), 3).as("sh"))
}

for (n <- Seq(1, 10, 50)) {
  val label = s"${n}x"
  val existing = replicas(n)
  // ---- corpus-side state: built ONCE per corpus, persisted between
  // increments in production (reported separately, not increment cost)
  val exDig = time(s"$label state: digest set") {
    val d = existing.select(md5(col("text")).as("_dig")).distinct()
      .repartition(32, col("_dig")).localCheckpoint(true)
    d.count(); d
  }
  val exSh = time(s"$label state: corpus shingles") {
    val s = shingledOf(existing).localCheckpoint(true); s.count(); s
  }
  val exBands = time(s"$label state: corpus band keys") {
    val b = Dedup.bandKeysOf(Dedup.minHashSignatures(exSh, 8), 8, 4)
      .select(col("doc_id").as("id_b"), col("band"), col("key"))
      .repartition(32, col("band"), col("key")).localCheckpoint(true)
    b.count(); b
  }
  // ---- the increment itself: O(batch) is the claim
  val bd = time(s"$label inc: batch digests") {
    val d = batch.withColumn("_dig", md5(col("text"))).localCheckpoint(true)
    d.count(); d
  }
  val exact = time(s"$label inc: exact anti+semi") {
    val hits = bd.join(exDig, Seq("_dig"), "left_semi")
    println(s"[probe] $label n_exact=" + hits.count())
    bd.join(exDig, Seq("_dig"), "left_anti").select("doc_id", "text")
      .localCheckpoint(true)
  }
  val shB = time(s"$label inc: batch shingle+sig") {
    val s = shingledOf(exact).localCheckpoint(true); s.count(); s
  }
  val cands = time(s"$label inc: cross band join") {
    val bb = Dedup.bandKeysOf(Dedup.minHashSignatures(shB, 8), 8, 4)
      .select(col("doc_id").as("id_a"), col("band"), col("key"))
    val c = bb.join(exBands, Seq("band", "key"))
      .select("id_a", "id_b").distinct().localCheckpoint(true)
    println(s"[probe] $label n_cands=" + c.count()); c
  }
  time(s"$label inc: verify") {
    val exShB = exSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val bShA = shB.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val near = cands.join(bShA, "id_a").join(exShB, "id_b")
      .select(col("id_a"),
        round(Dedup.jaccard(col("sh_a"), col("sh_b")), 6).as("j"))
      .filter(col("j") >= 0.5).select("id_a").distinct()
    println(s"[probe] $label n_near=" + near.count())
  }
  release(Seq(exDig, exSh, exBands, bd, exact, shB, cands))
}
sys.exit(0)

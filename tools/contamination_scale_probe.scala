// Contamination-path scale probe (d8 + t23): the memoized profile build
// and its two consumers, timed per stage at 1x / 4x / 10x the sf0.1
// document corpus. Claims under test:
//
//  1. The profile build (shingle -> distinct 64-bit hash -> broadcast
//     join -> per-doc aggregate) scales ~linearly with corpus size, and
//     its broadcast side stays BOUNDED: only the benchmark partition's
//     distinct shingle hashes (8 bytes each) ship to executors — never
//     shingle text, never the corpus side.
//  2. The consumers are O(profile): d8 reads the pinned frame; t23 is a
//     per-row hash split + an id equi-join against the profile — neither
//     re-runs the shingle pass (the round-7 defect where t23 rebuilt the
//     9.1 s profile d8 had just finished).
//
// Replica construction matches tools/dedup_scale_probe.scala: every
// token carries a replica marker so shingle sets are replica-distinct
// (the benchmark overlap density per replica stays constant).
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/contamination_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis, TextOps}

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  r
}

val docs = {
  val raw = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  raw.select(col("doc_id"), TextOps.normText(col("text")).as("text"))
}

// replica k: ids shifted, every token suffixed ·k (replica-distinct shingles)
def replicas(n: Int): DataFrame = {
  val rs = (0 until n).map { k =>
    docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(t, lit(s"·$k")))).as("text"))
  }
  rs.reduce(_ unionByName _)
}

// warm every plan shape once so JVM/codegen startup doesn't land on 1x
{
  val w = replicas(1).limit(500)
  val sh = Dedup.shingleFrame(w, TextOps.tokens(col("text")))
  val p = Dedup.contaminationProfile(
    sh.filter(col("doc_id") % 31 =!= 0), sh.filter(col("doc_id") % 31 === 0))
  p.write.format("noop").mode("overwrite").save()
}

for (n <- Seq(1, 4, 10)) {
  println(s"[probe] ===== corpus scale ${n}x sf0.1 =====")
  val corpus = replicas(n)
  val nDocs = corpus.count()
  println(s"[probe] corpus docs: $nDocs")
  val profile = time(s"${n}x profile build (shingle+broadcast)") {
    val sh = Dedup.shingleFrame(corpus, TextOps.tokens(col("text")))
    val p = graft.std.Materialize.pinUnregistered(
      Dedup.contaminationProfile(
        sh.filter(col("doc_id") % 31 =!= 0),
        sh.filter(col("doc_id") % 31 === 0)))
    p
  }
  // the broadcast payload: benchmark-partition distinct shingle hashes
  val benchHashes = time(s"${n}x broadcast-side distinct hashes") {
    val sh = Dedup.shingleFrame(corpus.filter(col("doc_id") % 31 === 0),
      TextOps.tokens(col("text")))
    val c = sh.select(explode(array_distinct(col("sh"))).as("_s"))
    val h = c.select(TextOps.hash64(col("_s")).as("shash"))
    h.distinct().count()
  }
  println(f"[probe] ${n}x broadcast rows: $benchHashes%d (~${
    benchHashes * 8 / 1024}%d KiB of longs)")
  time(s"${n}x d8 consume (pinned profile)") {
    profile.write.format("noop").mode("overwrite").save()
  }
  time(s"${n}x t23 split (hash + id equi-join)") {
    val splits = {
      val s = TextAnalysis.trainTestSplit(corpus.filter(col("doc_id") % 31 =!= 0))
      s.select(col("doc_id"), col("split"))
    }
    val out = {
      val j = splits.join(
        profile.select(col("doc_id"), col("contamination_ratio")), "doc_id")
      j.select(col("doc_id"),
        when(col("contamination_ratio") >= 0.2, lit("quarantine"))
          .otherwise(col("split")).as("split"))
    }
    out.write.format("noop").mode("overwrite").save()
  }
  graft.std.Materialize.releasePin(profile)
  graft.std.Materialize.releaseAll()
}
sys.exit(0)

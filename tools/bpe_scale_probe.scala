// BPE training probe: does driver round-trip latency dominate the merge
// loop, and how much does bounded-iteration batching recover? Claims:
//
//  1. Sequential trainMerges runs 2 Spark jobs per MERGE (pair-count
//     head + vocab-rewrite pin) — at 32k merges that is 64k round
//     trips of pure scheduling latency over a vocabulary-sized frame.
//  2. trainMergesBatched commits ~maxBatch merges per 2-job round on a
//     real corpus (conflicts are rare outside the head of the
//     distribution), with a PROVABLY identical merge table (BpeSpec).
//
// Measures 1 000 merges on the sf0.1 documents table: sequential cost
// extrapolated from its first 100 merges (running all 1 000
// sequentially is the pathology under test, not a useful probe),
// batched run in full at maxBatch 16/64.
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/bpe_scale_probe.scala
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.ext.Bpe

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("ERROR")

val jobCount = new AtomicLong(0)
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(js: SparkListenerJobStart): Unit = {
    jobCount.incrementAndGet(); ()
  }
})

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

def run(label: String)(f: => Seq[(String, String)]): Seq[(String, String)] = {
  val j0 = jobCount.get()
  val t0 = System.nanoTime()
  val r = f
  val secs = (System.nanoTime() - t0) / 1e9
  val jobs = jobCount.get() - j0
  println(f"[probe] $label%-34s merges=${r.size}%5d jobs=$jobs%6d " +
    f"wall=$secs%8.2f s jobs/merge=${jobs.toDouble / r.size}%6.2f")
  r
}

// warm-up: parquet reader + codegen, off the books
{ Bpe.trainMerges(docs, 2); () }

val seq100 = run("sequential n=100")(Bpe.trainMerges(docs, 100))
val b16 = run("batched n=1000 maxBatch=16")(
  Bpe.trainMergesBatched(docs, 1000, maxBatch = 16))
val b64 = run("batched n=1000 maxBatch=64")(
  Bpe.trainMergesBatched(docs, 1000, maxBatch = 64))

// the batched prefix must equal the sequential table (the BpeSpec
// guarantee, re-checked here at probe scale)
assert(b16.take(seq100.size) == seq100,
  "batched(16) diverged from sequential")
assert(b64 == b16, "batch bound changed the merge table")
println("[probe] batched tables identical to sequential prefix: OK")

// The sf corpus is a 31-word near-UNIFORM vocabulary — maximal count
// ties, where the exactness trim legitimately degenerates to ~1
// merge/round (any tie could be overtaken after a merge). Real text is
// Zipfian with strict descents, which is what batching exploits —
// probe that regime on a synthetic 2 000-compound-word Zipf corpus.
val base = {
  docs.select(explode(split(lower(trim(regexp_replace(col("text"),
      "\\s+", " "))), " ")).as("w"))
    .distinct().orderBy("w").collect().map(_.getString(0)).filter(_.nonEmpty)
}
val zipfWords = {
  val n = base.length
  (0 until 2000).map(k => base(k % n) + base((k / n) % n) + base((k / n / n) % n))
}
val zipfCorpus = {
  val freqs = zipfWords.zipWithIndex.map { case (w, k) => (w, 200000 / (k + 1)) }
  spark.createDataFrame(freqs).toDF("w", "f")
    .select(explode(expr("array_repeat(w, f)")).as("text"))
    .select(monotonically_increasing_id().as("doc_id"), col("text"))
}
{ zipfCorpus.cache().count(); () }

val zSeq = run("zipf sequential n=100")(Bpe.trainMerges(zipfCorpus, 100))
val zB64 = run("zipf batched n=1000 maxBatch=64")(
  Bpe.trainMergesBatched(zipfCorpus, 1000, maxBatch = 64))
assert(zB64.take(zSeq.size) == zSeq, "zipf batched diverged from sequential")
println("[probe] zipf batched table identical to sequential prefix: OK")

// the production form: ONE Spark job (word-freq collect), merge loop on
// the driver with incremental pair counts
val l1 = run("local n=1000 (sf corpus)")(Bpe.trainMergesLocal(docs, 1000))
val zL = run("zipf local n=1000")(Bpe.trainMergesLocal(zipfCorpus, 1000))
assert(l1 == b64, "local diverged from distributed on the sf corpus")
assert(zL == zB64, "local diverged from distributed on the zipf corpus")
println("[probe] local tables identical to distributed: OK")
sys.exit(0)

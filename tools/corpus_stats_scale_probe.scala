// Corpus-stats scale probe (t24 / t25 / t26): the three round-9
// corpus-statistics operators timed at 1x / 4x / 10x the sf0.1 document
// corpus. Claims under test:
//
//  1. t24 (KMV): cost scales with the token stream, while the sketch
//     itself stays k longs per language regardless of corpus size; the
//     two-stage min-k never sorts a whole language's vocabulary in one
//     task.
//  2. t25 (unigram LM): the per-doc term-frequency frame bounds every
//     downstream stage (vocab rollup, total, scoring join) — no stage
//     touches raw token occurrences twice, and the LM table stays
//     vocabulary-sized.
//  3. t26 (temperature resample): one corpus pass builds the thin
//     per-doc frame; the rate table is |sources| rows broadcast back —
//     per-replica cost flat, no fact-side shuffle growth.
//
// Replica construction matches the sibling probes: ids shifted, every
// token suffixed ·k so vocabularies are replica-distinct (vocab grows
// linearly — the worst case for t24/t25).
//
// NOTE for editors: spark-shell -I drops top-level leading-dot
// continuation lines silently — keep every multi-line chain inside a
// brace block.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/corpus_stats_scale_probe.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis, TextOps}

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
  raw.select(col("doc_id"), col("lang"), col("source"),
    TextOps.normText(col("text")).as("text"))
}

// replica k: ids shifted, every token suffixed ·k (replica-distinct vocab)
def replicas(n: Int): DataFrame = {
  val rs = (0 until n).map { k =>
    docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
      col("lang"), col("source"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(t, lit(s"·$k")))).as("text"))
  }
  rs.reduce(_ unionByName _).repartition(32, col("doc_id"))
}

def drain(df: DataFrame): Unit = {
  df.write.format("noop").mode("overwrite").save()
}

// warm every plan shape once so JVM/codegen startup doesn't land on 1x
{
  val w = replicas(1).limit(500)
  drain(TextAnalysis.kmvCardinality(w))
  drain(TextAnalysis.unigramLogprob(w))
  drain(TextAnalysis.temperatureResample(w))
  graft.std.Materialize.releaseAll()
}

for (n <- Seq(1, 4, 10)) {
  val corpus = n match { case _ => replicas(n) }
  time(s"t24 kmv            ${n}x") { drain(TextAnalysis.kmvCardinality(corpus)) }
  graft.std.Materialize.releaseAll()
  time(s"t25 unigram-lm     ${n}x") { drain(TextAnalysis.unigramLogprob(corpus)) }
  graft.std.Materialize.releaseAll()
  time(s"t26 temp-resample  ${n}x") { drain(TextAnalysis.temperatureResample(corpus)) }
  graft.std.Materialize.releaseAll()
}
sys.exit(0)

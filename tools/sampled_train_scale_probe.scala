// Sampled-training (s27) scale probe: the FAISS train-on-sample /
// encode-full contract, measured. Corpus replicas at 1x/4x/10x of the
// sf0.1 embedding table (2k/8k/20k x 64-dim vectors), sampleMod scaled
// WITH the corpus (4, 16, 40) so the training sample stays a constant
// ~500 vectors — the production contract (FAISS trains IVF/PQ on ~1M
// vectors regardless of corpus size).
//
// Three numbers per scale:
//   train-only   — kmeansTrain on the hash-sample (the s27 predicate):
//                  must stay FLAT as the corpus grows, because its
//                  input is the constant-size sample.
//   cold s27     — train + encode-full + query.
//   warm s27     — the same call with the training memo hot, i.e.
//                  encode + query only: must grow ~linearly (encode is
//                  the one corpus-sized pass).
//   cold − warm ≈ training inside the composed operator: flat.
//
// Run: /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//        --driver-class-path target/scala-2.13/classes \
//        --conf spark.ui.enabled=false -I tools/sampled_train_scale_probe.scala
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

val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
  .select(col("vec_id"), col("embedding"))

def replicate(times: Int): DataFrame =
  (0 until times).map { i =>
    base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
      col("embedding"))
  }.reduce(_ unionByName _)

// warm-up absorbs JIT/codegen so the timed runs are steady-state
graft.ext.Similarity.ivfPqTopKSampled(
  base.filter(col("vec_id") < 5), base, 5, sampleMod = 4).count()
graft.std.Materialize.releaseAll()

for (times <- Seq(1, 4, 10)) {
  val vecs = replicate(times)
  val queries = vecs.filter(col("vec_id") < 20)
  val mod = 4 * times // sample stays ~500 vectors at every scale
  val sample = vecs.filter(
    graft.ext.TextOps.hash64(concat(lit("s27|"),
      col("vec_id").cast("string"))) % mod === 0)
  println(s"[probe] ${times}x corpus=${vecs.count()} " +
    s"sample=${sample.count()} (mod=$mod)")
  time(f"${times}x train-only (sample)") {
    graft.ext.Similarity.kmeansTrain(sample, 8, 4).count()
  }
  graft.std.Materialize.releaseAll()
  val tag = Some(s"probe$times")
  val (_, cold) = time(f"${times}x s27 cold (train+encode)") {
    graft.ext.Similarity.ivfPqTopKSampled(queries, vecs, 5,
      sampleMod = mod, memoTag = tag).count()
  }
  val (_, warm) = time(f"${times}x s27 warm (encode only)") {
    graft.ext.Similarity.ivfPqTopKSampled(queries, vecs, 5,
      sampleMod = mod, memoTag = tag).count()
  }
  println(f"[probe]   cold-warm (~= in-op training) ${cold - warm}%8.1f s")
  graft.std.SessionMemo.releaseSession(spark)
  graft.std.Materialize.releaseAll()
}
println("[probe] done — train-only and cold-warm must stay FLAT across")
println("[probe] 1x/4x/10x (constant sample); warm must grow ~linearly")
println("[probe] (encode is the one corpus-sized pass)")
sys.exit(0)

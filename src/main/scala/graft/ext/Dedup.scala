package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora — the core of an
  * LLM-training-data pipeline (extension beyond the reference; north star
  * in BASELINE.json).
  *
  * Scale design (100 TB):
  *  - signatures (MinHash, SimHash) are per-row `Column` expressions over
  *    the shingle/token arrays — computed in one narrow codegen stage,
  *    NO explode, NO shuffle;
  *  - candidate generation is LSH banding: explode only the b band keys
  *    (b ≈ 4-16 rows per doc, not |shingles| rows), shuffle on the band
  *    key, self-join inside buckets — never an O(n²) cross join;
  *  - verification joins candidate pairs back to the shingle arrays by
  *    doc id (two hash joins keyed on the id — broadcastable while the
  *    candidate set is small, shuffled beyond).
  */
object Dedup {

  /** Exact-duplicate groups keyed on md5 of normalized text: one shuffle
    * on a 128-bit key, never on the text itself (at 100 TB the group key
    * must be a digest, not the document).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(TextOps.normText(col(textCol))).as("group_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** Exact dedup keeping the smallest id per group (deterministic
    * survivor). One shuffle (window over the digest key).
    */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(TextOps.normText(col(textCol))))
      .orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signature: k seeded minima over the shingle set — array<long>
    * computed without exploding the shingles.
    */
  def minHashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleCol, s => TextOps.hash64Seeded(i, s)))): _*)

  /** LSH band keys: the signature split into `bands` rows of
    * `k / bands` values, each band md5-digested. array<struct<band,key>>.
    */
  def lshBandKeys(sigCol: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    array((0 until bands).map(j =>
      struct(
        lit(j).as("band"),
        md5(concat_ws(",", slice(sigCol, j * r + 1, r).cast("array<string>")))
          .as("key"))): _*)
  }

  /** Candidate pairs from LSH buckets: explode the band keys, self-join
    * on (band, key), keep ordered distinct pairs. Shuffle volume is
    * docs × bands rows of (long, int, string) — independent of document
    * size.
    */
  def lshCandidatePairs(docsWithBands: DataFrame, idCol: String = "doc_id",
                        bandsCol: String = "bands"): DataFrame = {
    val exploded = docsWithBands
      .select(col(idCol), explode(col(bandsCol)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.key").as("key"))
    val a = exploded.select(col(idCol).as("id_a"), col("band"), col("key"))
    val b = exploded.select(col(idCol).as("id_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Jaccard similarity of two shingle arrays (as sets). */
  def jaccard(shA: Column, shB: Column): Column = {
    val inter = size(array_intersect(shA, shB)).cast("double")
    val uni = size(array_union(shA, shB)).cast("double")
    when(uni > 0, inter / uni)
  }

  /** Verify candidate pairs against the true n-gram Jaccard: join the
    * pair list back to the per-doc shingle arrays and keep pairs at or
    * above `threshold`.
    */
  def verifiedNearDups(candidates: DataFrame, docShingles: DataFrame,
                       threshold: Double): DataFrame = {
    val a = docShingles.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docShingles.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    candidates.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash over the distinct token set: per-bit majority vote of
    * the token hashes, folded sequentially (deterministic). Pure per-row
    * expression — no explode, no shuffle.
    */
  def simHash32(toksCol: Column): Column = {
    val hs = transform(array_distinct(toksCol), t => TextOps.hash64(t))
    (0 until 32).map { b =>
      val votes = transform(hs, h =>
        when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(TextOps.foldSumLong(votes) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two SimHash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage: fuzzy (edit-distance) matching of a dirty probe feed
  * against a clean reference catalog — the entity-resolution step the
  * reference's fuzzy column resolver (`/root/reference/Project.py:103-117`,
  * two-tier name fallback) applies to SCHEMA names, generalized here to
  * DATA at corpus scale.
  *
  * The all-pairs edit-distance join is quadratic, so candidates are cut
  * by LENGTH-BUCKET BLOCKING first: `levenshtein(a, b) <= d` forces
  * `abs(len(a) - len(b)) <= d`, so with bucket width `d` the pair's
  * buckets differ by at most 1 — each probe expands to its 3 adjacent
  * buckets and equi-joins the catalog bucket. That is COMPLETE (no
  * missed pair, proven in the spec) while confining comparisons to
  * same-size strings. When the catalog is dimension-sized the bucket
  * join broadcasts; when both sides are corpus-sized it shuffles on the
  * bucket key — either way never the cross product.
  *
  * For corpora where length blocking alone leaves huge buckets (all
  * strings the same size), this exact kernel is the verification tier:
  * cut candidates first with the approximate similarity family
  * ([[Dedup.minHashLsh]] n-gram LSH / [[Similarity]] sign-LSH), the
  * same exact-kernel-vs-scale-path split as d4/s2.
  */
object Linkage {

  /** Best fuzzy match per probe: for every row of `probes`, the
    * catalog name with the smallest Levenshtein distance `<= maxDist`
    * (ties broken by name ascending — fully deterministic), or NULL
    * columns when nothing is within the threshold (the unmatched-probe
    * report is the point of a linkage audit).
    *
    * `catalog` is de-duplicated on `nameCol` before blocking, so its
    * volume entering the join is |distinct names|.
    *
    * 100 TB shape: probes explode ×3 (adjacent buckets) THEN join —
    * the blow-up is on the skinny (id, name, bucket) projection, never
    * the full row. The per-probe argmin runs as a window over the
    * candidate set (bounded by the bucket's catalog residents), and
    * the final left join re-attaches unmatched probes without a second
    * scan of the catalog.
    *
    * Determinism: Levenshtein with unit costs is engine-independent;
    * distance and rank are exact ints; NULL probe names produce NULL
    * match columns (never a fabricated distance).
    */
  def fuzzyBestMatch(probes: DataFrame, catalog: DataFrame,
                     idCol: String, probeCol: String, nameCol: String,
                     maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, "need a positive edit-distance threshold")
    val names = catalog.select(col(nameCol).as("_name"))
      .filter(col("_name").isNotNull).distinct()
      .withColumn("_b", floor(length(col("_name")) / maxDist))
    val pb = floor(length(col(probeCol)) / maxDist)
    val cand = probes
      .select(col(idCol), col(probeCol))
      .filter(col(probeCol).isNotNull)
      .withColumn("_b", explode(array(pb - 1, pb, pb + 1)))
      .join(names, Seq("_b"))
      .withColumn("_dist", levenshtein(col(probeCol), col("_name")))
      .filter(col("_dist") <= maxDist)
    val best = cand.withColumn("_rn",
        row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("_dist").asc, col("_name").asc)))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("_name").as("matched_name"),
        col("_dist").as("dist"))
    probes.select(col(idCol), col(probeCol))
      .join(best, Seq(idCol), "left_outer")
  }

  /** All in-threshold pairs (the audit form: every candidate within
    * `maxDist`, not just the winner) — same blocking, no argmin.
    */
  def fuzzyPairs(probes: DataFrame, catalog: DataFrame,
                 idCol: String, probeCol: String, nameCol: String,
                 maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, "need a positive edit-distance threshold")
    val names = catalog.select(col(nameCol).as("matched_name"))
      .filter(col("matched_name").isNotNull).distinct()
      .withColumn("_b", floor(length(col("matched_name")) / maxDist))
    val pb = floor(length(col(probeCol)) / maxDist)
    probes.select(col(idCol), col(probeCol))
      .filter(col(probeCol).isNotNull)
      .withColumn("_b", explode(array(pb - 1, pb, pb + 1)))
      .join(names, Seq("_b"))
      .withColumn("dist", levenshtein(col(probeCol), col("matched_name")))
      .filter(col("dist") <= maxDist)
      .drop("_b")
  }
}

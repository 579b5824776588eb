package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads plus a
  * typed metadata struct, with decode/feature/resize/frame-sample
  * operators.
  *
  * The decode step itself is STUBBED deterministically (no image/audio
  * codecs in this environment): [[decodeFeatureStub]] derives a fake
  * feature vector from the payload hash, and [[resizeStub]] models
  * resize as metadata rewrite + payload truncation. Everything around
  * the stub — the schema (binary + struct), per-row expressions, batch
  * shape, partition-by-content-hash — is the real plumbing a decode UDF
  * would slot into. A production build replaces the stub body with a
  * `mapInPandas`/JNI decoder with the SAME signature: binary in,
  * array<double> (features) or binary (pixels) out, one row per frame.
  *
  * Scale notes: payloads never enter a shuffle key (all keys are ids or
  * 128-bit digests); frame sampling explodes to `ceil(len/chunk)` rows
  * with binary slices — size the chunk so a partition of frames fits in
  * executor memory.
  */
object Media {

  /** Synthesize a media corpus from the documents table: an 8-hex-char
    * header (4 width + 4 height) followed by the text bytes, as one
    * UTF-8 binary payload. Deterministic stand-in for real image bytes.
    */
  def synthCorpus(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = (lit(64) + col("doc_id") % 192).cast("int")
    val h = (lit(64) + col("doc_id") % 128).cast("int")
    val payloadStr = concat(
      lpad(hex(w), 4, "0"), lpad(hex(h), 4, "0"), col(textCol))
    docs.select(
      col("doc_id"),
      encode(payloadStr, "UTF-8").as("payload"),
      struct(w.as("width"), h.as("height"), lit("synth/v1").as("codec"))
        .as("meta"))
  }

  /** Parse the header back out of the raw payload (as a consumer that
    * only has bytes would): width/height from the 8-byte hex header,
    * byte length, and a content digest of the payload.
    */
  def extractMeta(media: DataFrame): DataFrame = {
    val headerStr = decode(substring(col("payload"), 1, 8), "UTF-8")
    media.select(
      col("doc_id"),
      conv(substring(headerStr, 1, 4), 16, 10).cast("int").as("width"),
      conv(substring(headerStr, 5, 4), 16, 10).cast("int").as("height"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("content_md5"))
  }

  /** Deterministic fake of the decode+featurize step: an 8-dim feature
    * vector derived from the payload digest. Real decode goes here.
    */
  def decodeFeatureStub(payload: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)), i =>
      (TextOps.hash64(concat(md5(payload), lit("_"), i.cast("string")))
        % 1000L).cast("double") / 1000.0)

  /** Resize stub: metadata rewrite + proportional payload truncation —
    * the schema/flow of a real resampler without the codec.
    */
  def resizeStub(media: DataFrame, targetWidth: Int): DataFrame = {
    val scale = lit(targetWidth).cast("double") / col("meta.width").cast("double")
    val newLen = greatest(lit(9),
      (length(col("payload")).cast("double") * scale).cast("int"))
    media.select(
      col("doc_id"),
      col("payload").substr(lit(1), newLen).as("payload"),
      struct(lit(targetWidth).as("width"),
        (col("meta.height").cast("double") * scale).cast("int").as("height"),
        col("meta.codec").as("codec")).as("meta"))
  }

  /** Frame sampling: split the payload into fixed-size binary chunks,
    * one row per frame (`posexplode` → (frame_no, frame_bytes)).
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int): DataFrame = {
    val nChunks = ceil(length(col("payload")).cast("double") / chunkBytes)
      .cast("int")
    // sequence(0, -1) yields [0, -1] (Spark defaults to step -1 when
    // start > stop), so an empty payload must map to an empty array,
    // not two phantom frames
    val chunks = when(nChunks > 0,
      transform(sequence(lit(0), nChunks - 1), i =>
        substring(col("payload"), (i * chunkBytes + 1).cast("int"),
          lit(chunkBytes))))
      .otherwise(array().cast("array<binary>"))
    media.select(col("doc_id"), posexplode(chunks).as(Seq("frame_no", "frame")))
  }

  /** Feature extraction over the corpus: the per-row stub-decode
    * expression — embarrassingly parallel, no shuffle. A real decoder
    * slots into [[decodeFeatureStub]]'s position with the same
    * (binary → array<double>) signature.
    */
  def featurize(media: DataFrame, dims: Int = 8): DataFrame =
    media.select(col("doc_id"),
      decodeFeatureStub(col("payload"), dims).as("features"))

  /** Chunk-level payload dedup (m4): fixed-offset `chunkBytes` chunks
    * ([[sampleFrames]]) digested and reference-counted across the
    * corpus — content-addressable-storage accounting at the SUB-file
    * grain, where [[graft.ext.ExtQueries.mediaDedup]]'s whole-file
    * digests see nothing (an appended watermark or re-encode tail
    * changes the file hash but leaves every full prefix chunk shared).
    * `n_refs > 1` rows are the dedup win: each such chunk stores once
    * and saves `(n_refs − 1) × chunk_bytes`.
    *
    * Scale shape: the shuffle moves (128-bit digest, byte-count) pairs
    * with map-side partial counts — payload bytes are digested where
    * they are read and never cross the wire; this is the fixed-offset
    * half of a CDC (content-defined chunking) store, the right grain
    * for codec-framed media (frames/GOPs sit at stable offsets).
    */
  def chunkDedup(media: DataFrame, chunkBytes: Int = 64): DataFrame = {
    require(chunkBytes >= 1, "positive chunk size")
    sampleFrames(media, chunkBytes)
      .select(md5(col("frame")).as("chunk_md5"),
        length(col("frame")).cast("long").as("_len"))
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_refs"), max(col("_len")).as("chunk_bytes"))
  }

  /** Chunk-store savings summary (m6): the capacity-planning readout
    * over a [[chunkDedup]] refcount frame — logical bytes (what
    * clients uploaded), physical bytes (what a content-addressed store
    * keeps: each chunk once), and the savings ratio. The number a
    * dedup tier is judged by, derived entirely from the |chunks| frame
    * — no second pass over payloads.
    *
    * Determinism: exact integer byte arithmetic; the ratio is the x31
    * truncating fixed point. Empty store → one row of zeros (ratio
    * null — no logical bytes to save against).
    */
  def dedupSavings(chunks: DataFrame): DataFrame =
    chunks.agg(
      coalesce(count(lit(1)), lit(0L)).as("n_unique_chunks"),
      coalesce(sum(col("n_refs")), lit(0L)).as("n_chunk_refs"),
      coalesce(sum(col("n_refs") * col("chunk_bytes")), lit(0L))
        .as("logical_bytes"),
      coalesce(sum(col("chunk_bytes")), lit(0L)).as("physical_bytes"))
      .select(col("n_unique_chunks"), col("n_chunk_refs"),
        col("logical_bytes"), col("physical_bytes"),
        (col("logical_bytes") - col("physical_bytes")).as("saved_bytes"),
        when(col("logical_bytes") > 0,
          expr("CAST(CAST(logical_bytes - physical_bytes AS " +
            "DECIMAL(38,0)) * 1000000000 div logical_bytes AS BIGINT)"))
          .as("savings_e9"))

  /** Media NEAR-dup pairs (m5): Jaccard over the DISTINCT chunk-digest
    * sets of two files — the d4 similarity kernel at the sub-file
    * grain, where m3's whole-file digest and even m4's per-chunk
    * refcounts stop short of a PAIRWISE verdict. A re-encoded tail or
    * appended watermark leaves most chunks shared: the pair surfaces
    * here with its similarity, ready for a keep/drop policy.
    *
    * Candidate generation is a SHARED-CHUNK self-join (two files that
    * share zero chunks cannot clear any threshold > 0 — no all-pairs
    * term), with chunks referenced by more than `maxRefs` files
    * EXCLUDED from candidate generation (the d2 `maxBucketSize`
    * discipline: a boilerplate header chunk shared by the whole corpus
    * would otherwise go quadratic). Excluded chunks still count in the
    * Jaccard DENOMINATOR sets, so similarity is not inflated; a pair
    * sharing ONLY over-cap chunks is missed by construction —
    * documented recall trade, same as every blocked dedup here.
    *
    * Scale: shuffle carries (digest, doc_id) pairs and the per-pair
    * counts — payload bytes never move; output is bounded by genuinely
    * similar pairs.
    */
  /** Byte-level average-hash (m7): the perceptual signature that
    * catches RE-ENCODED duplicates every digest in m3–m5 is blind to —
    * the multimodal analogue of d2 (MinHash) vs d1 (exact hash). The
    * algorithm is aHash's: split the payload BODY (container header
    * excluded — perceptual hashes fingerprint pixels, not metadata)
    * into `grid` contiguous cells, and emit one bit per cell: is the
    * cell's mean byte value above the whole body's mean? A re-encode
    * that shifts every byte by a small constant (brightness/gain
    * noise) changes EVERY chunk digest but shifts cell and global
    * means together, so every strict inequality — and the signature —
    * survives. Comparisons are exact integer cross-multiplications
    * (`sum_cell × n_total > sum_total × n_cell`), so there is no
    * rounding to disagree on and the DuckDB twin is bit-identical.
    *
    * Pure per-row expressions over `hex(payload)` — no UDF, no
    * shuffle; O(bytes) per row at the decode site, the same place a
    * real pixel decode pays. (At pixel scale the sums ride the same
    * arithmetic over the decoded luma plane — swap [[decodeFeatureStub]]
    * for the codec and the signature algebra is unchanged.)
    *
    * Returns a `grid`-char '0'/'1' string — the LSH bucket key for
    * [[perceptualDups]]. Cells that own no bytes (payload shorter than
    * `grid`) emit '0', and an empty body is all-zeros in both engines.
    */
  /** Expression-level let-binding: `transform` over a one-element
    * array binds the evaluated value to a lambda VARIABLE, so every
    * reference inside `body` reads the bound value instead of
    * re-evaluating the expression tree. Higher-order-function
    * lambdas get NO common-subexpression elimination — without this,
    * each chunk reference in [[perceptualHash]] re-hexes the whole
    * payload and the signature goes quadratic in payload size (the
    * per-byte reference form has exactly that shape, which is why
    * it is the reference, not the product).
    */
  private def let(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  /** The shared cell pipeline of [[perceptualHash]] (aHash) and
    * [[gradientHash]] (dHash): hex the payload ONCE (let-bound — HOF
    * lambdas get no CSE; a bare reference re-hexes per chunk and the
    * signature goes quadratic in payload size), split the body into
    * `grid` contiguous cells, and hand `body` the let-bound
    * `(sum, len)` cell array plus the byte count.
    *
    * Cell byte sums cost ONE `conv` per 6-byte chunk (12 hex chars)
    * instead of per byte — the per-byte string parse was the hot
    * allocation site of the whole media tier (m7–m10 all inline this
    * expression). The sum doesn't need byte POSITIONS, only the byte
    * total, and Σ bytes of a value v telescopes to
    *   v − 255 · Σ_{p≥1} floor(v / 256^p)
    * (each division peels the low byte off the running remainder),
    * with terms past the chunk's real length vanishing on their own
    * (v < 256^m ⇒ floor(v/256^p) = 0 for p ≥ m) — so a chunk costs
    * one conv + five divisions, no inner loop; the chunk value is a
    * lambda VARIABLE of the aggregate, bound once per element.
    * Chunks stay ≤ 2^48, so the long→double cast is exact and
    * dividing by a power of two only shifts the exponent: the byte
    * sums — and every derived signature — are bit-identical to the
    * per-byte form, which [[perceptualHashRef]] + its equality spec
    * pin.
    */
  private def withCells(payload: Column, grid: Int, headerBytes: Int)(
      body: (Column, Column) => Column): Column = {
    let(substring(hex(payload), headerBytes * 2 + 1, Int.MaxValue)) {
      hh =>
    // Column `/` is DOUBLE division — cast each quotient back to long
    // (exact: byte counts sit far below 2^53)
    let((length(hh) / 2).cast("long")) { n =>
      val cellW = ((n + (grid - 1)) / grid).cast("long")
      def cellSum(start: Column, len: Column): Column = {
        val nChunks = floor((len + lit(5L)) / 6).cast("long")
        val chunks = transform(sequence(lit(0L), nChunks - 1), c => {
          val chunkLen = least(lit(6L), len - c * 6L)
          conv(hh.substr(((start + c * 6L) * 2L + 1L).cast("int"),
            (chunkLen * 2L).cast("int")), 16, 10).cast("long")
        })
        aggregate(chunks, lit(0L), (acc, v) =>
          acc + v - lit(255L) * (floor(v / 256L).cast("long") +
            floor(v / 65536L).cast("long") +
            floor(v / 16777216L).cast("long") +
            floor(v / 4294967296L).cast("long") +
            floor(v / 1099511627776L).cast("long")))
      }
      val cellsExpr = transform(sequence(lit(0), lit(grid - 1)), c => {
        val start = c.cast("long") * cellW
        val len = greatest(least(cellW, n - start), lit(0L))
        struct(
          when(len > 0, cellSum(start, len)).otherwise(lit(0L)).as("s"),
          len.as("l"))
      })
      let(cellsExpr) { cells => body(cells, n) }
    }
    }
  }

  def perceptualHash(payload: Column, grid: Int = 16,
                     headerBytes: Int = 8): Column =
    withCells(payload, grid, headerBytes) { (cells, n) =>
      val tot = aggregate(cells, lit(0L),
        (acc, x) => acc + x.getField("s"))
      concat_ws("", transform(cells, x =>
        when(x.getField("l") > 0 &&
          x.getField("s") * n > tot * x.getField("l"), lit("1"))
          .otherwise(lit("0"))))
    }

  /** Gradient signature (m10): dHash next to [[perceptualHash]]'s
    * aHash — one bit per ADJACENT cell pair (`mean_i > mean_{i+1}`
    * by exact integer cross-multiplication `s_i·l_{i+1} >
    * s_{i+1}·l_i`), `grid − 1` bits. Where aHash thresholds each
    * cell against the GLOBAL mean, dHash captures the local gradient
    * structure — the two keys collide differently, which is why
    * image-dedup pipelines run both and union the candidate pairs.
    * Same invariance argument as m7 (a brightness/gain re-encode
    * shifts both sides of every strict inequality together), same
    * cell pipeline, same O(bytes) per-row cost.
    */
  def gradientHash(payload: Column, grid: Int = 16,
                   headerBytes: Int = 8): Column = {
    require(grid >= 2, s"gradientHash needs at least 2 cells to " +
      s"form an adjacent pair, got grid=$grid (grid=1 would build " +
      s"sequence(0,-1) = [0,-1] and element_at would throw at index 0)")
    withCells(payload, grid, headerBytes) { (cells, _) =>
      concat_ws("", transform(sequence(lit(0), lit(grid - 2)), i => {
        val a = element_at(cells, i + 1)
        val b = element_at(cells, i + 2)
        when(a.getField("l") > 0 && b.getField("l") > 0 &&
          a.getField("s") * b.getField("l") >
            b.getField("s") * a.getField("l"), lit("1"))
          .otherwise(lit("0"))
      }))
    }
  }

  /** The per-byte reference form of [[perceptualHash]] — one
    * `conv(hex-pair)` per byte, the shape the fast word-peeled
    * version must equal bit-for-bit (spec-pinned on random payloads,
    * all tail lengths). Kept as the readable spec of the signature
    * algebra; never on a hot path.
    */
  def perceptualHashRef(payload: Column, grid: Int = 16,
                        headerBytes: Int = 8): Column = {
    val hh = substring(hex(payload), headerBytes * 2 + 1, Int.MaxValue)
    val n = (length(hh) / 2).cast("long")
    val cellW = ((n + (grid - 1)) / grid).cast("long")
    def byteAt(j: Column): Column =
      conv(hh.substr((j * 2 + 1).cast("int"), lit(2)), 16, 10)
        .cast("long")
    val cells = transform(sequence(lit(0), lit(grid - 1)), c => {
      val start = c.cast("long") * cellW
      val len = greatest(least(cellW, n - start), lit(0L))
      struct(
        when(len > 0,
          aggregate(sequence(start, start + len - 1), lit(0L),
            (acc, j) => acc + byteAt(j)))
          .otherwise(lit(0L)).as("s"),
        len.as("l"))
    })
    val tot = aggregate(cells, lit(0L), (acc, x) => acc + x.getField("s"))
    concat_ws("", transform(cells, x =>
      when(x.getField("l") > 0 &&
        x.getField("s") * n > tot * x.getField("l"), lit("1"))
        .otherwise(lit("0"))))
  }

  /** Perceptual near-dup pairs (m7): [[perceptualHash]] as the bucket
    * key — candidate pairs form ONLY inside equal-signature buckets
    * (an equi-self-join on the 16-bit key, never all-pairs), with
    * buckets larger than `maxBucket` excluded from pair generation
    * (the d2/m5 skew cap: a corpus of solid-color thumbnails would
    * otherwise go quadratic; excluded buckets are a documented recall
    * trade). `digest_match` reports whether the whole-file digest
    * ALSO matches — false on exactly the re-encoded pairs the
    * perceptual signature exists to catch.
    *
    * Scale shape: one scan computes (id, signature, digest); the
    * shuffle moves those skinny triples keyed on the signature;
    * output is bounded by genuinely matching pairs.
    */
  def perceptualDups(media: DataFrame, grid: Int = 16,
                     headerBytes: Int = 8,
                     maxBucket: Int = 64): DataFrame =
    sigDups(media, perceptualHash(col("payload"), grid, headerBytes),
      "psig", maxBucket)

  /** Gradient-hash near-dup pairs (m10): [[perceptualDups]]'s bucket
    * self-join with [[gradientHash]] as the key — the second entry of
    * the two-key image-dedup discipline (run both, union the pairs;
    * the keys collide differently, so each catches pairs the other's
    * buckets split). Same skew cap, same scale shape.
    */
  def gradientDups(media: DataFrame, grid: Int = 16,
                   headerBytes: Int = 8,
                   maxBucket: Int = 64): DataFrame =
    sigDups(media, gradientHash(col("payload"), grid, headerBytes),
      "gsig", maxBucket)

  /** The equal-signature bucket self-join shared by m7/m10: one scan
    * computes (id, signature, digest); the shuffle moves those skinny
    * triples keyed on the signature; buckets past `maxBucket` are
    * excluded from pair generation (the d2/m5 skew cap — a corpus of
    * solid-color thumbnails would otherwise go quadratic; excluded
    * buckets are a documented recall trade); output is bounded by
    * genuinely matching pairs.
    */
  private def sigDups(media: DataFrame, sig: Column, sigName: String,
                      maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, "maxBucket must allow at least a pair")
    val sigs = graft.std.Materialize.once(
      media.select(col("doc_id"), sig.as(sigName),
        md5(col("payload")).as("_md5")))
    val ok = sigs.groupBy(col(sigName))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucket)
      .select(col(sigName))
    val elig = sigs.join(ok, Seq(sigName))
    elig.select(col(sigName), col("doc_id").as("id_a"),
        col("_md5").as("_ma"))
      .join(elig.select(col(sigName), col("doc_id").as("id_b"),
        col("_md5").as("_mb")), Seq(sigName))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col(sigName),
        (col("_ma") === col("_mb")).as("digest_match"))
  }

  def nearDupPairs(media: DataFrame, chunkBytes: Int = 64,
                   threshold: Double = 0.5,
                   maxRefs: Int = 64): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    require(maxRefs >= 2, "maxRefs must allow at least a pair")
    val chunks = graft.std.Materialize.once(
      sampleFrames(media, chunkBytes)
        .select(col("doc_id"), md5(col("frame")).as("chunk_md5"))
        .distinct())
    val sizes = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    val eligible = chunks.join(
      chunks.groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("_refs"))
        .filter(col("_refs") <= maxRefs)
        .select(col("chunk_md5")),
      Seq("chunk_md5"))
    val shared = eligible.select(col("chunk_md5"), col("doc_id").as("id_a"))
      .join(eligible.select(col("chunk_md5"), col("doc_id").as("id_b")),
        Seq("chunk_md5"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("id_a"),
        col("n_chunks").as("_na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"),
        col("n_chunks").as("_nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("_na") + col("_nb") - col("n_shared")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Scene-cut detection (m9): per-asset boundaries in the frame-local
    * perceptual signature stream — the segmentation step a video
    * pipeline runs BEFORE sampling frames for training (one keyframe
    * per scene beats N near-identical frames of the same shot; m2
    * samples uniformly, this says WHERE the content actually changes).
    * A cut is a frame whose signature disagrees with its predecessor
    * in ≥ `cutBits` of the `grid` bits; `scene_no` is the running cut
    * count + 1, so downstream "one frame per (doc, scene)" sampling is
    * a groupBy away.
    *
    * Shares m8's frame pipeline verbatim (body → `frameBytes` frames →
    * frame-local [[perceptualHash]]): signatures are re-encode
    * invariant by the m7 argument, so the SAME cut boundaries survive
    * a brightness-shifted re-upload — scene structure is a content
    * property, not a byte property.
    *
    * 100 TB shape: per-row expressions to signatures (no UDF), ONE
    * shuffle on doc_id for the lag/cumulative windows over per-doc
    * frame counters — windows run over |frames-per-doc| rows, and a
    * single asset's frame list is bounded by payload size, the same
    * bound m8 already carries. Determinism: signatures are exact bit
    * strings, the delta an exact per-position count, the verdict an
    * integer compare — nothing rounds.
    */
  def sceneCuts(media: DataFrame, frameBytes: Int = 32, grid: Int = 8,
                headerBytes: Int = 8, cutBits: Int = 4): DataFrame = {
    require(cutBits >= 1 && cutBits <= grid,
      "cut threshold must lie within the signature width")
    val body = media.select(col("doc_id"),
      substring(col("payload"), headerBytes + 1, Int.MaxValue)
        .as("payload"))
    // attrBarrier: the delta below reads fsig through 8 substring
    // references plus the lag — without the barrier Catalyst's
    // project collapse inlines the whole perceptualHash expression
    // into EACH reference (measured 30.6 s vs 3.5 s at sf0.1)
    val sigs = TextOps.attrBarrier(
      sampleFrames(body, frameBytes)
        .select(col("doc_id"),
          col("frame_no").cast("long").as("frame_no"), col("frame")),
      Seq("doc_id", "frame_no"), "fsig",
      perceptualHash(col("frame"), grid, headerBytes = 0))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val run = byDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val delta = (1 to grid).map(i =>
      when(substring(col("fsig"), i, 1) =!=
        substring(col("_prev"), i, 1), 1L).otherwise(0L))
      .reduce(_ + _)
    sigs
      .withColumn("_prev", lag(col("fsig"), 1).over(byDoc))
      .withColumn("sig_delta",
        when(col("_prev").isNotNull, delta))
      .withColumn("is_cut",
        coalesce(col("sig_delta") >= cutBits, lit(false)))
      .withColumn("scene_no",
        sum(when(col("is_cut"), 1L).otherwise(0L)).over(run) + 1L)
      .select(col("doc_id"), col("frame_no"), col("fsig"),
        col("sig_delta"), col("is_cut"), col("scene_no"))
  }

  /** Temporal media alignment (m8): asset pairs sharing a RUN of
    * `window` consecutive per-frame perceptual signatures — the
    * sequence-level near-dup the per-file signature (m7) and the
    * chunk-set Jaccard (m5) both miss when a duplicate is re-encoded
    * AND trimmed/offset (a clipped re-upload, an ad bumper, a resumed
    * recording): every m3–m5 digest changes, m7's whole-file
    * signature shifts with the content grid, but the frame-local
    * signatures still line up — just at a different frame offset.
    *
    * Pipeline: frames of `frameBytes` over the payload BODY →
    * [[perceptualHash]] per frame (`grid` bits, re-encode-invariant by
    * the m7 argument, applied frame-LOCALLY so trimming upstream
    * can't move cell boundaries downstream) → sliding `window`-gram of
    * consecutive signatures hashed to a 64-bit key (the winnowing/t7
    * idea on media) → equal-key candidate pairs with the d2/m5
    * `maxRefs` popular-window cap (an all-black bumper shared by the
    * whole corpus must not go quadratic) → per pair, align on the
    * MODAL frame offset: `n_aligned` = windows agreeing at that
    * offset, ties to the smallest offset.
    *
    * Scale shape: one scan to signatures (per-row expressions, no
    * UDF), one shuffle of (wkey, doc, start) triples, pair output
    * bounded by genuine alignments + the capped collision budget.
    */
  def temporalAlignment(media: DataFrame, frameBytes: Int = 32,
                        window: Int = 4, grid: Int = 8,
                        headerBytes: Int = 8,
                        maxRefs: Int = 64): DataFrame = {
    require(window >= 1, "need at least a one-frame window")
    require(maxRefs >= 2, "maxRefs must allow at least a pair")
    val body = media.select(col("doc_id"),
      substring(col("payload"), headerBytes + 1, Int.MaxValue)
        .as("payload"))
    val sigs = sampleFrames(body, frameBytes)
      .select(col("doc_id"), col("frame_no"),
        perceptualHash(col("frame"), grid, headerBytes = 0).as("fsig"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val wkeys = graft.std.Materialize.once(
      sigs.select(col("doc_id"), col("frame_no").as("start"),
          concat_ws("|", (0 until window).map(i =>
            lead(col("fsig"), i).over(byDoc)): _*).as("_wk"),
          lead(col("fsig"), window - 1).over(byDoc).as("_tail"))
        .filter(col("_tail").isNotNull)
        .select(col("doc_id"), col("start"),
          TextOps.hash64(col("_wk")).as("wkey")))
    val ok = wkeys.groupBy(col("wkey"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxRefs)
      .select(col("wkey"))
    val elig = wkeys.join(ok, Seq("wkey"))
    val pairs = elig.select(col("wkey"), col("doc_id").as("id_a"),
        col("start").as("_sa"))
      .join(elig.select(col("wkey"), col("doc_id").as("id_b"),
        col("start").as("_sb")), Seq("wkey"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"),
        (col("_sb").cast("long") - col("_sa")).as("frame_offset"))
      .agg(count(lit(1)).as("n_aligned"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"))
      .orderBy(col("n_aligned").desc, col("frame_offset").asc)
    pairs.withColumn("_rn", row_number().over(best))
      .filter(col("_rn") === 1)
      .select(col("id_a"), col("id_b"), col("frame_offset"),
        col("n_aligned"))
  }
}

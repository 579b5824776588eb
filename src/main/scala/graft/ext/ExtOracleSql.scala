package graft.ext

/** DuckDB twins for [[ExtQueries]]. Repetitive fragments (the k MinHash
  * minima, the 32 SimHash bit votes) are generated so they cannot drift
  * from the Spark expressions.
  *
  * Dialect traps (beyond OracleSql's):
  *  - DuckDB `regexp_replace` needs the 'g' flag (Spark replaces all);
  *  - DuckDB list lambdas index 1-based (Spark's `(x, i)` is 0-based);
  *  - `len()`/`length()` return BIGINT (Spark sizes cast to long);
  *  - the shared 56-bit hash is `CAST('0x'||substr(md5(s),1,14) AS BIGINT)`.
  */
object ExtOracleSql {

  private def h64(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 14)) AS BIGINT)"

  /** The DECIMAL moment device shared by every regression /
    * correlation twin (x28, t56, x55): from an `(x, y)` frame, exact
    * order-free sums — COUNT, linear sums in a caller-chosen DECIMAL
    * (28,9 for pre-rounded 9-dp logs, 18,6 for raw business values),
    * product moments in DECIMAL(38,12). Keyed or global.
    */
  private def momentsCte(src: String, keyCols: Seq[String],
                         nAlias: String,
                         linDec: String = "DECIMAL(28,9)"): String = {
    val ks = keyCols.map(_ + ", ").mkString
    val grp = if (keyCols.isEmpty) ""
      else s" GROUP BY ${keyCols.indices.map(_ + 1).mkString(", ")}"
    s"""SELECT ${ks}COUNT(*) AS $nAlias,
         SUM(CAST(x AS $linDec)) AS sx,
         SUM(CAST(y AS $linDec)) AS sy,
         SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,12))) AS syy,
         SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy
  FROM $src$grp"""
  }

  /** The least-squares fit tail shared by the t56/x55 twins: over a
    * frame carrying `nd, sxd, syd, covn, varx, vary` doubles, the
    * 6-dp slope / intercept / r² with the varx>0 guards. The
    * intercept re-rounds the slope first — the published-slope
    * discipline both engines share.
    */
  private def fitExprs(slope: String, intercept: String): String =
    s"""CASE WHEN varx > 0 THEN round(covn / varx, 6) END AS $slope,
       CASE WHEN varx > 0
            THEN round((syd - round(covn / varx, 6) * sxd) / nd, 6)
       END AS $intercept,
       CASE WHEN varx > 0 AND vary > 0
            THEN round(covn * covn / (varx * vary), 6) END AS r2"""

  private val Norm = """lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"""

  /** n-shingle list from a toks list expression (TextOps.shingles'
    * whole-text fallback for docs shorter than n).
    */
  private def shN(toks: String, whole: String, n: Int): String =
    s"""CASE WHEN len($toks) >= $n
       THEN list_transform(generate_series(1, len($toks) - ${n - 1}),
              i -> array_to_string(($toks)[i:i+${n - 1}], ' '))
       ELSE [$whole] END"""

  /** 3-shingle list from a toks list expression. */
  private def sh3(toks: String, whole: String): String =
    shN(toks, whole, 3)

  val d1ExactDedup: String = s"""WITH base AS (
  SELECT doc_id, text FROM documents
), corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 200000, text FROM base WHERE doc_id % 5 = 0
)
SELECT md5($Norm) AS group_hash,
       COUNT(*) AS n_copies, MIN(doc_id) AS keeper
FROM corpus GROUP BY 1"""

  /** t72: source shingle-diversity — distinct/total 3-shingle hashes
    * per source over the template-farm-injected corpus; shingles
    * hash through the shared md5 lane so the exact distinct counts
    * agree; one truncating e9 division.
    */
  val t72SourceShingleDiversity: String = s"""WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 900000, 'tmplfarm',
         'contact us terms privacy about shipping returns faq page '
           || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 6 = 0
), t AS (
  SELECT source, string_split($Norm, ' ') AS toks
  FROM corpus WHERE text IS NOT NULL AND source IS NOT NULL
), shs AS (
  SELECT source,
         unnest(${sh3("toks", "array_to_string(toks, ' ')")}) AS sh
  FROM t
), agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(COUNT(DISTINCT ${h64("sh")}) AS BIGINT)
           AS n_distinct_shingles
  FROM shs GROUP BY 1
), nd AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM corpus WHERE text IS NOT NULL AND source IS NOT NULL
  GROUP BY 1
)
SELECT agg.source, n_docs, n_shingles, n_distinct_shingles,
       CAST(n_distinct_shingles * 1000000000 // n_shingles AS BIGINT)
         AS diversity_e9,
       CAST(CAST(n_distinct_shingles * 1000000000 // n_shingles
                 AS BIGINT) AS DOUBLE) / 1000000000.0 AS diversity
FROM agg JOIN nd USING (source)"""

  /** t53: cross-source overlap matrix over the source-rotated mirror
    * corpus (every 5th doc re-attributed to the source +7 mod 20).
    * Counts are exact set sizes; the ratio columns are single IEEE
    * divisions of those exact integers — no rounding step, identical
    * bits on both engines.
    */
  val t53SourceOverlap: String = s"""WITH corpus AS (
  SELECT COALESCE(text, '') AS text, source FROM documents
  UNION ALL
  SELECT COALESCE(text, '') AS text,
         'src' || CAST((CAST(substr(source, 4) AS INTEGER) + 7) % 20
                       AS VARCHAR) AS source
  FROM documents WHERE doc_id % 5 = 0
), d AS (
  SELECT DISTINCT source, md5($Norm) AS h
  FROM corpus WHERE source IS NOT NULL
), counts AS (
  SELECT source, COUNT(*) AS n FROM d GROUP BY 1
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n AS n_digests_a, b.n AS n_digests_b
  FROM counts a JOIN counts b ON a.source < b.source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS ns
  FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT pairs.source_a, pairs.source_b,
       pairs.n_digests_a, pairs.n_digests_b,
       COALESCE(shared.ns, 0) AS n_shared,
       CAST(COALESCE(shared.ns, 0) AS DOUBLE) /
         CAST(pairs.n_digests_a + pairs.n_digests_b
              - COALESCE(shared.ns, 0) AS DOUBLE) AS jaccard,
       CAST(COALESCE(shared.ns, 0) AS DOUBLE) /
         CAST(LEAST(pairs.n_digests_a, pairs.n_digests_b) AS DOUBLE)
         AS overlap_coeff
FROM pairs LEFT JOIN shared
  ON pairs.source_a = shared.source_a
 AND pairs.source_b = shared.source_b"""

  /** Shared near-dup corpus + shingles (mirrors ExtQueries.nearDupCorpus:
    * normalized text, every 13th token dropped in the +100000 copies).
    */
  /** `base` (normalized documents) + the injected near-dup corpus
    * (mirrors ExtQueries.nearDupCorpus: +100000 copies of every 7th
    * doc with every 13th token dropped); output CTE name a parameter
    * — four twins build on this corpus shape.
    */
  private def nearDupCorpusCtes(name: String = "corpus"): String = s"""base AS (
  SELECT doc_id, $Norm AS text FROM documents
), $name AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(list_filter(string_split(text, ' '),
           (t, i) -> i % 13 <> 0), ' ')
  FROM base WHERE doc_id % 7 = 0
)"""

  private val NearDupCtes: String = s"""WITH ${nearDupCorpusCtes()}, shing AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         ${sh3("string_split(text, ' ')", "text")} AS sh
  FROM corpus
)"""

  /** The k=8 lane-hash minima (4 × 32-bit lanes per seeded md5 — mirrors
    * Dedup.laneHash), bands of 2 → 4 band keys.
    */
  private val sigCols: String = (0 until 8).map { i =>
    val seed = i / 4; val pos = (i % 4) * 8 + 1
    s"list_min(list_transform(sh, s -> CAST(('0x' || substr(md5('$seed|' || s), $pos, 8)) AS BIGINT))) AS s$i"
  }.mkString(",\n         ")

  private def bandSelectsFrom(table: String): String = (0 until 4).map { j =>
    val a = 2 * j; val b = 2 * j + 1
    s"SELECT doc_id, $j AS band, md5(CAST(s$a AS VARCHAR) || ',' || CAST(s$b AS VARCHAR)) AS key FROM $table"
  }.mkString("\n  UNION ALL\n  ")

  private val bandSelects: String = bandSelectsFrom("sig")

  /** Second factoring sweep: the m-family payload, the t67/t70
    * en-marker prelude, the s1/s32 cosine panel, the promo corpus,
    * and the s3/s10 lang×embedding explode.
    */
  private def MediaPayloadCte: String = """m AS (
  SELECT doc_id,
         lpad(hex(64 + doc_id % 192), 4, '0')
           || lpad(hex(64 + doc_id % 128), 4, '0') || text AS payload_str
  FROM documents
)"""

  private def EnMarkerScoreCtes: String = s"""t AS (
  SELECT doc_id, lang,
         string_split(lower(trim(regexp_replace(
           CASE WHEN lang = 'en' AND doc_id % 2 = 0
                THEN text || ' the of and is to' ELSE text END,
           '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), s AS (
  SELECT (lang = 'en') AS pos,
         CAST(len(list_filter(toks,
           tk -> tk IN ${LangLists.toMap.apply("en")})) AS BIGINT)
           AS score
  FROM t
)"""

  private def cosinePanelCtes(panel: Int): String = s"""n AS (
  SELECT vec_id, e, sqrt(${dotExpr("e", "e")}) AS nm FROM v
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(CASE WHEN q.nm * c.nm > 0
               THEN ${dotExpr("q.e", "c.e")} / (q.nm * c.nm) END, 6) AS cosine
  FROM n q CROSS JOIN n c
  WHERE q.vec_id < $panel AND q.vec_id <> c.vec_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC NULLS LAST, neighbor_id ASC) AS rank
  FROM scored
)"""

  private def promoCorpusCte(srcRel: String, reps: Int,
                             name: String = "corpus"): String = {
    val tail = Seq.fill(reps)(SpanPromo).mkString(", ")
    s"""$name AS (
  SELECT doc_id,
         COALESCE(CASE WHEN doc_id % 3 = 0
              THEN concat_ws(' ', text, $tail)
              ELSE text END, '') AS text
  FROM $srcRel
)"""
  }

  private def LangEmbJoinSel: String =
    """SELECT d.lang,
         unnest(generate_series(0, len(e.embedding) - 1)) AS dim,
         unnest(e.embedding) AS val
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id"""

  /** The t32/t33 unigram+2-shingle feature prelude over
    * COALESCE(text,'') (the t28 survive rule) — CTEs `t`, `f`.
    */
  private def HashedFeatsCtes: String = s"""t AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(COALESCE(text, ''),
           '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         list_concat(toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(generate_series(1, len(toks) - 1),
                       i -> array_to_string(toks[i:i+1], ' '))
                ELSE [array_to_string(toks, ' ')] END) AS feats
  FROM t
)"""

  /** The IP/phone/SSN PII tail on every 6th doc (t34/t64). */
  private def PiiStructuredInjectExpr: String =
    """CASE WHEN doc_id % 6 = 0
              THEN text || ' ip 192.168.' || CAST(doc_id % 250 AS VARCHAR)
                   || '.17 call 555-010-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || ' ssn 987-65-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text"""

  /** BM25 per-(doc, term) weight (k1=1.2, b=0.75) + join tail
    * (t29/t54).
    */
  private def Bm25TermSel: String = """round(round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5) + 1.0), 9)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(l.dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
               9) AS w
  FROM dtf d
  JOIN qt ON d.token = qt.token
  JOIN dfq ON d.token = dfq.token
  JOIN dl l ON d.doc_id = l.doc_id
  CROSS JOIN stats"""

  /** The email+URL PII tail on every 9th doc (t15/t34/t64). */
  private def PiiInjectExpr: String = """CASE WHEN doc_id % 9 = 0
              THEN text || ' contact user' || doc_id
                   || '@example.com at http://site' || doc_id
                   || '.example/path'
              ELSE text END"""

  /** The injected near-dup vector corpus (s2/d13; mirrors
    * ExtQueries.nearDupVectors).
    */
  private def NearDupVecCorpusCte: String = """corpus AS (
  SELECT vec_id, e FROM v
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(list_zip(e, list_reverse(e)),
           p -> p[1] * 0.9 + p[2] * 0.1)
  FROM v WHERE vec_id % 11 = 0
)"""

  /** Coarse-quantizer (vid, dim, x) explode over `v` (5 twins). */
  private def CoarseExplodeSel: String =
    """SELECT vec_id AS vid, 0 AS sub,
         unnest(generate_series(0, len(e) - 1)) AS dim,
         unnest(e) AS x
  FROM v"""

  /** The rounded t3 composite quality score (d12/t21/t51). */
  private def QScoreRound: String =
    """round(least(n_tok / 100.0, 1.0) * 0.5
               + (1.0 - CASE WHEN n_char > 0 THEN punct / n_char
                             ELSE 0.0 END) * 0.3
               + least(CASE WHEN n_tok > 0 THEN stop_n / n_tok
                            ELSE 0.0 END * 5.0, 1.0) * 0.2, 6)"""

  /** The w-family 5-minute lag/gap sessionization (w3/x32/x41);
    * `cols` = extra projected columns. CTEs `o` and `s`.
    */
  private def sessionCtes(cols: String): String = s"""o AS (
  SELECT user_id, ts$cols,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '5 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
)"""

  /** IVF-PQ shared blocks: nprobe=2 cut, 20-query ADC table, and
    * the candidate→ADC-sum→rank tail (s16 + s27; s23 stays inline).
    */
  private def ProbedCte: String = """probed AS (
  SELECT query_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY csim DESC NULLS LAST, cell ASC) AS prn
    FROM probe) p
  WHERE prn <= 2
)"""

  private def QexAdcCtes: String = """qex AS (
  SELECT vid, sub, dim, x FROM exs WHERE vid < 20
), adc AS (
  SELECT e.vid AS query_id, e.sub, cb.cw,
         SUM(CAST((e.x - cb.c) * (e.x - cb.c) AS DECIMAL(38,12))) AS dist
  FROM qex e JOIN pq_cb3 cb ON cb.dim = e.dim
  GROUP BY 1, 2, 3
)"""

  /** The ADC candidate/sum/rank tail. `perCell = true` keys the ADC
    * lookup by probed cell too — the residual variant (s23), whose
    * distance tables are cell-dependent.
    */
  private def adcTailSql(k: Int, perCell: Boolean = false): String = {
    val cellSel = if (perCell) ", cells.cell" else ""
    val cellJoin =
      if (perCell) "\n                      AND a.cell = cand.cell" else ""
    s"""cand AS (
  SELECT p.query_id, cells.neighbor_id$cellSel, codes.sub, codes.cw
  FROM probed p
  JOIN cells ON cells.cell = p.cell
  JOIN codes ON codes.neighbor_id = cells.neighbor_id
  WHERE p.query_id <> cells.neighbor_id
), adcsum AS (
  SELECT cand.query_id, cand.neighbor_id, SUM(a.dist) AS adc
  FROM cand JOIN adc a ON a.query_id = cand.query_id$cellJoin
                      AND a.sub = cand.sub AND a.cw = cand.cw
  GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY adc, neighbor_id) AS rank
  FROM adcsum
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(CAST(adc AS DOUBLE), 9) AS adc_dist
FROM r WHERE rank <= $k"""
  }

  /** Shared ANN-family prelude blocks (each appeared verbatim in
    * 4–18 twins): embeddings load `v`, explode `exq`, subspace split
    * `exs`, coarse copy `exc`, norm block `cent`/`cn`/`q`, probe.
    */
  private def VCte: String =
    """v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
)"""

  private def ExqCte: String = """exq AS (
  SELECT vec_id AS vid,
         unnest(generate_series(0, len(e) - 1)) AS dim,
         unnest(e) AS x
  FROM v
)"""

  private def ExsCte: String = """exs AS (
  SELECT vid, dim, CAST(x AS DOUBLE) AS x,
         CAST(dim % 16 AS INTEGER) AS sub
  FROM exq
)"""

  private def ExcCte: String = """exc AS (
  SELECT vid, 0 AS sub, dim, x FROM exs
)"""

  private def CentCnQCtes: String = s"""cent AS (
  SELECT cw AS cell, list(c ORDER BY dim) AS c FROM km_cb4 GROUP BY 1
), cn AS (
  SELECT cell, c, sqrt(${dotExpr("c", "c")}) AS nm FROM cent
), q AS (
  SELECT vec_id AS query_id, e AS qv, sqrt(${dotExpr("e", "e")}) AS qn
  FROM v WHERE vec_id < 20
)"""

  private def ProbeCte: String = s"""probe AS (
  SELECT q.query_id, cn.cell,
         round(CASE WHEN q.qn * cn.nm > 0
               THEN ${dotExpr("q.qv", "cn.c")} / (q.qn * cn.nm) END, 6)
           AS csim
  FROM q CROSS JOIN cn
)"""

  private def jaccardExpr(a: String, b: String): String =
    s"""round(CASE WHEN len(list_distinct(list_concat($a, $b))) > 0
       THEN CAST(len(list_intersect($a, $b)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat($a, $b))) AS DOUBLE)
       END, 6)"""

  val d2MinHashLshPairs: String = NearDupCtes + s""", ${lshVerifyCtes("shing")}
SELECT id_a, id_b, jaccard FROM ver WHERE jaccard >= 0.5"""

  /** Band selects for an arbitrary band count over the 8 minima —
    * mirrors Dedup.bandKeys: band j digests s(j·r)..s(j·r+r−1) joined
    * with ',' (concat_ws), md5'd.
    */
  private def bandSelectsCfg(bands: Int): String = {
    val r = 8 / bands
    (0 until bands).map { j =>
      val parts = (0 until r)
        .map(x => s"CAST(s${j * r + x} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $j AS band, md5($parts) AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
  }

  /** t50: LSH tuning report — the d2 signature space re-banded at
    * 2/4/8 bands, each config's candidate/verified/truth-found counts
    * via scalar subqueries (COUNT(*) stays BIGINT — no HUGEINT).
    */
  val t50LshTuning: String = {
    val configs = Seq(2, 4, 8)
    val perCfg = configs.map { bands =>
      s"""bands$bands AS (
  ${bandSelectsCfg(bands)}
), cand$bands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands$bands a JOIN bands$bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), ver$bands AS (
  SELECT id_a, id_b
  FROM cand$bands c
  JOIN hsh sa ON c.id_a = sa.doc_id
  JOIN hsh sb ON c.id_b = sb.doc_id
  WHERE CASE WHEN len(sa.hs) + len(sb.hs)
                  - len(list_intersect(sa.hs, sb.hs)) > 0
        THEN round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                   / CAST(len(sa.hs) + len(sb.hs)
                          - len(list_intersect(sa.hs, sb.hs)) AS DOUBLE),
                   6) END >= 0.5
), rep$bands AS (
  SELECT $bands AS bands, ${8 / bands} AS rows_per_band,
         (SELECT COUNT(*) FROM cand$bands) AS n_candidates,
         (SELECT COUNT(*) FROM ver$bands) AS n_verified,
         (SELECT COUNT(*) FROM truth) AS n_truth,
         (SELECT COUNT(*) FROM cand$bands c
          JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b)
           AS n_truth_found
)"""
    }.mkString(", ")
    NearDupCtes + s""", sig AS (
  SELECT doc_id, $sigCols
  FROM shing
), hsh AS (
  SELECT doc_id,
         list_distinct(list_transform(sh, s -> ${h64("s")})) AS hs
  FROM shing
), truth AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
  FROM shing sa JOIN shing sb ON sb.doc_id = sa.doc_id + 100000
  WHERE ${jaccardExpr("sa.sh", "sb.sh")} >= 0.5
), $perCfg
SELECT bands, rows_per_band, n_candidates, n_verified, n_truth,
       n_truth_found,
       CASE WHEN n_candidates > 0
            THEN round(CAST(n_verified AS DOUBLE)
                       / CAST(n_candidates AS DOUBLE), 6) END
         AS pair_precision,
       CASE WHEN n_truth > 0
            THEN round(CAST(n_truth_found AS DOUBLE)
                       / CAST(n_truth AS DOUBLE), 6) END AS pair_recall
FROM (SELECT * FROM rep2 UNION ALL SELECT * FROM rep4
      UNION ALL SELECT * FROM rep8)"""
  }

  /** The d2 pair pipeline + transitive closure (reach set per node,
    * component rep = min reachable) over a caller-named corpus/shingle
    * relation pair, CTE names suffixed with `sfx` so two chains can
    * coexist in one statement — d5/d6/d7/d12/d13/d14 run it over the
    * injected near-dup corpus under the default names; the curation
    * composite runs a second chain over the span-cleaned corpus.
    */
  /** sig/bands/cand over a caller-named shingle relation — the LSH
    * candidate stage shared by the cluster chain, d2, d10, and the
    * increment twin's self-join side.
    */
  private def lshCandCtes(shingRel: String, sfx: String = ""): String = s"""sig$sfx AS (
  SELECT doc_id, $sigCols
  FROM $shingRel
), bands$sfx AS (
  ${bandSelectsFrom(s"sig$sfx")}
), cand$sfx AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands$sfx a JOIN bands$sfx b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""

  /** [[lshCandCtes]] + the Jaccard verify stage. */
  private def lshVerifyCtes(shingRel: String, sfx: String = ""): String =
    s"""${lshCandCtes(shingRel, sfx)}, ver$sfx AS (
  SELECT id_a, id_b, ${jaccardExpr("sa.sh", "sb.sh")} AS jaccard
  FROM cand$sfx
  JOIN $shingRel sa ON cand$sfx.id_a = sa.doc_id
  JOIN $shingRel sb ON cand$sfx.id_b = sb.doc_id
)"""

  private def clusterChain(corpusRel: String, shingRel: String,
                           sfx: String = ""): String = s"""${lshVerifyCtes(shingRel, sfx)}, edges$sfx AS (
  SELECT id_a AS src, id_b AS dst FROM ver$sfx WHERE jaccard >= 0.5
  UNION ALL
  SELECT id_b, id_a FROM ver$sfx WHERE jaccard >= 0.5
), reach$sfx AS (
  SELECT doc_id AS src, doc_id AS dst FROM $corpusRel
  UNION
  SELECT r.src, e.dst FROM reach$sfx r JOIN edges$sfx e ON r.dst = e.src
), clusters$sfx AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_rep,
         src = MIN(dst) AS is_keeper
  FROM reach$sfx GROUP BY src
)"""

  /** The default-named chain over the injected near-dup corpus —
    * shared by d5/d6/d7 (and d12/d13/d14 below).
    */
  private val ClusterCtes: String =
    NearDupCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + ", " +
      clusterChain("corpus", "shing")

  val d5DedupClusters: String = ClusterCtes + """
SELECT doc_id, cluster_rep, is_keeper FROM clusters"""

  /** d14's split stage over a caller-named clusters relation: the
    * split lane `h64('split|' || key) % 100` on the cluster rep
    * (guarded) and on the doc id (naive counterfactual), and the
    * per-cluster would-have-leaked flag — CTEs `assigned$sfx` /
    * `leaks$sfx`. Shared by d14 and the curation composite.
    */
  private def splitChain(clustersRel: String, sfx: String = "")
      : String = {
    def lane(key: String): String =
      s"""CASE WHEN ${h64(s"'split|' || CAST($key AS VARCHAR)")}
                   % 100 < 90 THEN 'train'
              WHEN ${h64(s"'split|' || CAST($key AS VARCHAR)")}
                   % 100 < 95 THEN 'val'
              ELSE 'test' END"""
    s"""assigned$sfx AS (
  SELECT doc_id, cluster_rep,
         ${lane("cluster_rep")} AS split,
         ${lane("doc_id")} AS naive_split
  FROM $clustersRel
), leaks$sfx AS (
  SELECT cluster_rep,
         COUNT(DISTINCT naive_split) > 1 AS cluster_leaks
  FROM assigned$sfx GROUP BY 1
)"""
  }

  /** d14: leakage-aware split — the shared cluster chain + the shared
    * split stage.
    */
  val d14LeakageSplit: String = ClusterCtes + ",\n" +
    splitChain("clusters") + """
SELECT a.doc_id, a.cluster_rep, a.split, a.naive_split, l.cluster_leaks
FROM assigned a JOIN leaks l USING (cluster_rep)"""

  val d6DedupSurvivors: String = ClusterCtes + """
SELECT c.doc_id, md5(c.text) AS text_md5
FROM corpus c
WHERE c.doc_id IN (SELECT doc_id FROM clusters WHERE is_keeper)"""

  val d7DedupDropped: String = ClusterCtes + """
SELECT c.doc_id, md5(c.text) AS text_md5
FROM corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM clusters WHERE is_keeper)"""

  /** d12: quality-ranked keeper per cluster — the t3 composite score
    * (over the normalized corpus text; the expressions are the t3 twins
    * verbatim) ranked within each cluster, doc_id tiebreak.
    */
  val d12BestKeeper: String = ClusterCtes + s""", qc AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_char,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
              AS DOUBLE) AS punct,
         CAST(len(list_filter(string_split(text, ' '),
           tk -> tk IN ('the','a','of','and','is','to'))) AS DOUBLE) AS stop_n
  FROM corpus
), q AS (
  SELECT doc_id,
         ${QScoreRound}
           AS quality_score
  FROM qc
), ranked AS (
  SELECT cl.doc_id, cl.cluster_rep, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY cl.cluster_rep
                            ORDER BY q.quality_score DESC, cl.doc_id ASC)
           AS rn
  FROM clusters cl JOIN q USING (doc_id)
)
SELECT doc_id, cluster_rep, quality_score, rn = 1 AS is_best_keeper
FROM ranked"""

  /** 32 per-bit majority votes over the distinct-token hashes `hh`. */
  private def simhashExpr(hh: String): String = (0 until 32).map { b =>
    s"""(CASE WHEN list_aggregate(list_transform($hh,
       h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
       THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)"""
  }.mkString(" + ")

  val d3SimHashFingerprints: String = NearDupCtes + s""", hs AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')),
           t -> ${h64("t")}) AS hh
  FROM corpus
)
SELECT doc_id, ${simhashExpr("hh")} AS simhash32 FROM hs"""

  val d4JaccardGroundTruth: String = NearDupCtes + s""", hs AS (
  SELECT doc_id, list_transform(list_distinct(toks), t -> ${h64("t")}) AS hh
  FROM shing
), fps AS (
  SELECT doc_id, ${simhashExpr("hh")} AS fp FROM hs
), enriched AS (
  SELECT s.doc_id, s.sh, f.fp FROM shing s JOIN fps f ON s.doc_id = f.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ${jaccardExpr("a.sh", "b.sh")} AS jaccard,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming_dist
FROM enriched a JOIN enriched b ON b.doc_id = a.doc_id + 100000"""

  private val ToksCte: String = s"""WITH t AS (
  SELECT doc_id, text, lang, string_split($Norm, ' ') AS toks FROM documents
)"""

  val t1TokenStats: String = ToksCte + """
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
       round(list_aggregate(list_transform(toks,
               tk -> CAST(length(tk) AS DOUBLE)), 'sum')
             / CAST(len(toks) AS DOUBLE), 6) AS avg_token_len,
       CAST(length(text) AS BIGINT) AS n_chars_raw
FROM t"""

  val t2LangStats: String = ToksCte + """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
       round(AVG(length(text)), 2) AS avg_chars
FROM t GROUP BY 1"""

  /** The t3 quality-feature prelude over the ToksCte frame: raw
    * counts (`c`) and the punct/stopword ratio stage (`r`), with an
    * optional carried column — t3 runs it bare, t17 carries `lang`.
    */
  private def qualityRatioCtes(carry: String = ""): String = {
    val sel = if (carry.isEmpty) "" else s"$carry, "
    s""", c AS (
  SELECT doc_id, ${sel}len(toks) AS n_tokens_i,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_char,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
              AS DOUBLE) AS punct,
         CAST(len(list_filter(toks,
           tk -> tk IN ('the','a','of','and','is','to'))) AS DOUBLE) AS stop_n
  FROM t
), r AS (
  SELECT doc_id, ${sel}n_tokens_i,
         CASE WHEN n_char > 0 THEN punct / n_char ELSE 0.0 END AS pr,
         CASE WHEN n_tok > 0 THEN stop_n / n_tok ELSE 0.0 END AS sr,
         n_tok
  FROM c
)"""
  }

  val t3QualityScores: String = ToksCte + qualityRatioCtes() + """
SELECT doc_id, CAST(n_tokens_i AS BIGINT) AS n_tokens,
       round(pr, 6) AS punct_ratio,
       round(sr, 6) AS stopword_ratio,
       round(least(n_tok / 100.0, 1.0) * 0.5 + (1.0 - pr) * 0.3
             + least(sr * 5.0, 1.0) * 0.2, 6) AS quality_score
FROM r"""

  private val LangLists: Seq[(String, String)] = Seq(
    "de" -> "('der','die','das','und','ist','nicht')",
    "en" -> "('the','a','of','and','is','to')",
    "es" -> "('el','la','de','los','y','es')",
    "fr" -> "('le','la','de','les','et','est')",
    "zh" -> "('de_zh','shi','le_zh','zai','he','you')")

  val t4LangId: String = ToksCte + s""", sc AS (
  SELECT doc_id,
         ${LangLists.map { case (l, set) =>
            s"CAST(len(list_filter(toks, tk -> tk IN $set)) AS BIGINT) AS s_$l"
          }.mkString(",\n         ")}
  FROM t
), mx AS (
  SELECT *, greatest(${LangLists.map("s_" + _._1).mkString(", ")}) AS m FROM sc
)
SELECT doc_id,
       CASE ${LangLists.map { case (l, _) =>
          s"WHEN s_$l = m AND m > 0 THEN '$l'"
        }.mkString(" ")} ELSE 'und' END AS lang_pred,
       m AS n_marker_hits
FROM mx"""

  /** t67: tie-corrected rank AUC of the en marker score against the
    * true `lang = 'en'` label — per-score groups, negatives-below
    * window, exact-integer wins/ties, e9 integer AUC.
    */
  val t67ClassifierAuc: String = s"""WITH ${EnMarkerScoreCtes}, f AS (
  SELECT pos, score FROM s
  WHERE pos IS NOT NULL AND score IS NOT NULL
), g AS (
  SELECT score AS sc,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM f GROUP BY 1
), cw AS (
  SELECT np, nn,
         CAST(COALESCE(SUM(nn) OVER (ORDER BY sc ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS below
  FROM g
), agg AS (
  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(nn) AS BIGINT) AS n_neg,
         CAST(SUM(np * below) AS BIGINT) AS wins,
         CAST(SUM(np * nn) AS BIGINT) AS ties
  FROM cw
)
SELECT n_pos, n_neg, wins, ties,
       CAST(CAST(2 * wins + ties AS HUGEINT) * 1000000000
            // (2 * n_pos * n_neg) AS BIGINT) AS auc_e9,
       CAST(CAST(CAST(2 * wins + ties AS HUGEINT) * 1000000000
            // (2 * n_pos * n_neg) AS BIGINT) AS DOUBLE) / 1000000000.0
         AS auc
FROM agg"""

  /** t71: dedup token savings — the d1 mirror corpus rolled up per
    * source in token units: keeper = MIN(doc_id) per content md5,
    * kept/total docs and tokens, saved share in e9 fixed point.
    */
  val t71DedupTokenSavings: String = s"""WITH base AS (
  SELECT doc_id, source, text FROM documents
), corpus AS (
  SELECT doc_id, source, text FROM base
  UNION ALL
  SELECT doc_id + 200000, source, text FROM base WHERE doc_id % 5 = 0
), tk AS (
  SELECT doc_id, source, md5($Norm) AS gh,
         CAST(len(string_split($Norm, ' ')) AS BIGINT) AS nt
  FROM corpus
), kp AS (
  SELECT gh, MIN(doc_id) AS keeper FROM tk GROUP BY 1
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_kept,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN doc_id = keeper THEN nt ELSE 0 END)
            AS BIGINT) AS n_tokens_kept,
       CAST(CAST(SUM(nt) - SUM(CASE WHEN doc_id = keeper
                                    THEN nt ELSE 0 END) AS HUGEINT)
            * 1000000000 // SUM(nt) AS BIGINT) AS saved_share_e9,
       CAST(CAST(CAST(SUM(nt) - SUM(CASE WHEN doc_id = keeper
                                         THEN nt ELSE 0 END) AS HUGEINT)
                 * 1000000000 // SUM(nt) AS BIGINT) AS DOUBLE)
         / 1000000000.0 AS saved_share
FROM tk JOIN kp USING (gh)
GROUP BY 1"""

  /** t70: calibration curve — t67's scored fixture (same injected
    * stopword text, same en-marker score) read as equal-width score
    * bins with fixed-point positive shares. Bin arithmetic is exact
    * integers (`(score − lo) · 10 // (hi − lo + 1)`), shares ride the
    * x31 fixed-point lane.
    */
  val t70CalibrationCurve: String = s"""WITH ${EnMarkerScoreCtes}, b AS (
  SELECT MIN(score) AS lo, MAX(score) AS hi FROM s
), binned AS (
  SELECT CAST((score - lo) * 10 // (hi - lo + 1) AS INTEGER) AS bin,
         score, CASE WHEN pos THEN 1 ELSE 0 END AS y
  FROM s CROSS JOIN b
)
SELECT bin, MIN(score) AS lo_score, MAX(score) AS hi_score,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       CAST(CAST(SUM(y) AS HUGEINT) * 1000000000 // COUNT(*)
            AS BIGINT) AS pos_share_e9,
       CAST(CAST(CAST(SUM(y) AS HUGEINT) * 1000000000 // COUNT(*)
                 AS BIGINT) AS DOUBLE) / 1000000000.0 AS pos_share
FROM binned GROUP BY 1"""

  /** v8: exact two-sample KS statistic between purchase and click
    * value distributions — merged per-value counts, one ordered
    * cumulative window, max integer gap `|F1·n2 − F2·n1|` with the
    * smallest value on ties.
    */
  /** One v10 output row: the pair's exact counters read off the
    * single aggregate row `m`, rates as truncating e9 divisions,
    * lift in per-mille, NULL where undefined.
    */
  private def v10PairRow(a: String, b: String): String = {
    val nb = s"nb_${a}_$b"
    val cond = s"CASE WHEN n_$a > 0 THEN " +
      s"CAST($nb * 1000000000 // n_$a AS BIGINT) END"
    val marg = s"CASE WHEN n > 0 THEN " +
      s"CAST(n_$b * 1000000000 // n AS BIGINT) END"
    s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n_rows,
       CAST(n_$a AS BIGINT) AS n_a_null,
       CAST(n_$b AS BIGINT) AS n_b_null,
       CAST($nb AS BIGINT) AS n_both_null,
       $cond AS cond_null_e9, $marg AS marginal_null_e9,
       CASE WHEN ($cond) IS NOT NULL AND ($marg) > 0
            THEN CAST(($cond) * 1000 // ($marg) AS BIGINT)
       END AS lift_permille
  FROM m"""
  }

  /** v10: missingness co-occurrence — the broken-client corruption
    * (user_id ≡ 0 mod 13 drops user_id AND value; event_id ≡ 0 mod
    * 17 drops value alone; ts never), one aggregate row of exact
    * counters, one [[v10PairRow]] per audited pair.
    */
  val v10Missingness: String = s"""WITH ev AS (
  SELECT event_id,
         CASE WHEN user_id % 13 = 0 THEN NULL ELSE user_id END
           AS user_id,
         CASE WHEN user_id % 13 = 0 OR event_id % 17 = 0 THEN NULL
              ELSE value END AS value,
         ts
  FROM events
), m AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS n_user_id,
         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_value,
         SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS n_ts,
         SUM(CASE WHEN user_id IS NULL AND value IS NULL
                  THEN 1 ELSE 0 END) AS nb_user_id_value,
         SUM(CASE WHEN value IS NULL AND user_id IS NULL
                  THEN 1 ELSE 0 END) AS nb_value_user_id,
         SUM(CASE WHEN user_id IS NULL AND ts IS NULL
                  THEN 1 ELSE 0 END) AS nb_user_id_ts
  FROM ev
)
${v10PairRow("user_id", "value")}
UNION ALL
${v10PairRow("value", "user_id")}
UNION ALL
${v10PairRow("user_id", "ts")}"""

  val v8KsDrift: String = s"""WITH a1 AS (
  SELECT value AS v FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
), b1 AS (
  SELECT value AS v FROM events
  WHERE event_type = 'click' AND value IS NOT NULL
), ca AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c1 FROM a1 GROUP BY 1
), cb AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c2 FROM b1 GROUP BY 1
), m AS (
  SELECT COALESCE(ca.v, cb.v) AS v,
         COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
), na AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1v FROM ca
), nb AS (
  SELECT CAST(SUM(c2) AS BIGINT) AS n2v FROM cb
), cum AS (
  SELECT v,
         CAST(SUM(c1) OVER (ORDER BY v ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY v ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS f2
  FROM m
), g AS (
  SELECT v, abs(f1 * n2v - f2 * n1v) AS gap, n1v, n2v
  FROM cum CROSS JOIN na CROSS JOIN nb
), top AS (
  SELECT * FROM g ORDER BY gap DESC, v ASC LIMIT 1
)
SELECT n1v AS n_a, n2v AS n_b, CAST(gap AS BIGINT) AS ks_num,
       v AS at_value,
       CAST(CAST(gap AS HUGEINT) * 1000000000
            // (n1v * n2v) AS BIGINT) AS ks_e9,
       CAST(CAST(CAST(gap AS HUGEINT) * 1000000000
            // (n1v * n2v) AS BIGINT) AS DOUBLE) / 1000000000.0 AS ks
FROM top"""

  val t5Fingerprints: String = s"""WITH t AS (
  SELECT doc_id, $Norm AS ntext FROM documents
), tk AS (
  SELECT doc_id, ntext, string_split(ntext, ' ') AS toks FROM t
), hs AS (
  SELECT doc_id, ntext,
         ${sh3("toks", "ntext")} AS sh3,
         list_transform(list_distinct(toks), tok -> ${h64("tok")}) AS hh
  FROM tk
)
SELECT doc_id, md5(ntext) AS content_md5,
       list_min(list_transform(sh3, s -> ${h64("s")})) AS min_shingle_hash,
       ${simhashExpr("hh")} AS simhash32
FROM hs"""

  private def dotExpr(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip($a, $b), p -> p[1] * p[2]), 'sum')"

  val s1CosineTopK: String = s"""WITH ${VCte}, ${cosinePanelCtes(20)}
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM r WHERE rank <= 5"""

  /** s32: hubness — the s1 scoring chain over a 100-query panel,
    * k-occurrence counts per neighbor, histogram plus the antihub
    * zero row (corpus count minus retrieved count).
    */
  val s32Hubness: String = s"""WITH ${VCte}, ${cosinePanelCtes(100)}, occ AS (
  SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS k_occ
  FROM r WHERE rank <= 5 GROUP BY 1
), hist AS MATERIALIZED (
  SELECT k_occ AS k_occurrences, CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM occ GROUP BY 1
)
SELECT k_occurrences, n_vectors FROM hist
UNION ALL
SELECT CAST(0 AS BIGINT) AS k_occurrences,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v) -
       (SELECT COALESCE(CAST(SUM(n_vectors) AS BIGINT), 0) FROM hist)
         AS n_vectors"""

  /** s31: MMR diversified re-rank — the s1 top-20 candidates per
    * probe query, then k = 5 unrolled greedy rounds: each `sel$r` CTE
    * (MATERIALIZED — every round is referenced by all later rounds
    * and the final union) picks argmax of
    * `round((7·rel − 3·maxsim)/10, 6)` with ties to the smallest
    * candidate id, maxsim read from the candidate-pair cosine frame
    * against the union of earlier picks (COALESCE 0 when nothing is
    * comparable). Identical doubles, identical rounding, identical
    * tie order to the Spark twin.
    */
  val s31MmrRerank: String = {
    val k = 5
    val rounds = (2 to k).map { r =>
      val selAll = (1 until r).map(i => s"SELECT query_id, cand_id FROM sel$i")
        .mkString("\n    UNION ALL ")
      s"""sel$r AS MATERIALIZED (
  SELECT query_id, cand_id, rel, ms,
         round((7.0 * rel - 3.0 * ms) / 10.0, 6) AS mmr
  FROM (
    SELECT m.*, row_number() OVER (PARTITION BY query_id
      ORDER BY round((7.0 * rel - 3.0 * ms) / 10.0, 6) DESC,
               cand_id ASC) AS rn
    FROM (
      SELECT c.query_id, c.cand_id, c.rel,
             COALESCE(MAX(p.sim), 0.0) AS ms
      FROM cand c
      LEFT JOIN (SELECT ps.query_id, ps.aid, ps.sim
                 FROM ps JOIN ($selAll) s
                   ON ps.query_id = s.query_id
                  AND ps.bid = s.cand_id) p
        ON p.query_id = c.query_id AND p.aid = c.cand_id
      WHERE NOT EXISTS (SELECT 1 FROM ($selAll) s2
                        WHERE s2.query_id = c.query_id
                          AND s2.cand_id = c.cand_id)
      GROUP BY 1, 2, 3
    ) m
  ) WHERE rn = 1
)"""
    }.mkString(", ")
    val out = (1 to k).map(r =>
      s"""SELECT query_id, CAST($r AS BIGINT) AS rank,
       cand_id AS neighbor_id, rel AS relevance,
       ms AS max_prior_sim, mmr AS mmr_score
  FROM sel$r""").mkString("\nUNION ALL\n")
    s"""WITH ${VCte}, n AS (
  SELECT vec_id, e, sqrt(${dotExpr("e", "e")}) AS nm FROM v
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         round(CASE WHEN q.nm * c.nm > 0
               THEN ${dotExpr("q.e", "c.e")} / (q.nm * c.nm) END, 6)
           AS rel
  FROM n q CROSS JOIN n c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
), cand AS MATERIALIZED (
  SELECT query_id, cand_id, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY rel DESC NULLS LAST, cand_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 20 AND rel IS NOT NULL
), ps AS MATERIALIZED (
  SELECT a.query_id, a.cand_id AS aid, b.cand_id AS bid,
         round(CASE WHEN na.nm * nb.nm > 0
               THEN ${dotExpr("na.e", "nb.e")} / (na.nm * nb.nm) END, 6)
           AS sim
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
  JOIN n na ON na.vec_id = a.cand_id
  JOIN n nb ON nb.vec_id = b.cand_id
), sel1 AS MATERIALIZED (
  SELECT query_id, cand_id, rel, CAST(0.0 AS DOUBLE) AS ms,
         round((7.0 * rel - 3.0 * 0.0) / 10.0, 6) AS mmr
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY round((7.0 * rel - 3.0 * 0.0) / 10.0, 6) DESC,
               cand_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
), $rounds
$out"""
  }

  /** s8: MIPS top-5 for the s1 probe set — raw dot product, no
    * normalization; rank by exact 6 dp score, neighbor_id tiebreak.
    */
  val s8MipsTopK: String = s"""WITH ${VCte}, scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(${dotExpr("q.e", "c.e")}, 6) AS inner_product
  FROM v q CROSS JOIN v c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY inner_product DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, inner_product
FROM r WHERE rank <= 5"""

  /** s24: binary Hamming top-k — sign bits packed into two 32-bit
    * words (DuckDB's BIGINT `<<` rejects shift 63, so 32-bit words
    * are the portable contract both engines implement), distance =
    * popcount(XOR) summed over words. Integer-exact end to end: no
    * rounding, (hamming, neighbor_id) total order. Dimensions ≤ 64
    * enforced loudly (the Spark twin's `assert_true` ≡ the `i > 64 →
    * error(...)` arm here): a 65th sign bit has no word to land in,
    * and silent truncation would fake Hamming distances.
    */
  val s24HammingTopK: String = """WITH u AS (
  SELECT vec_id, unnest(embedding) AS e,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), codes AS (
  SELECT vec_id,
         bit_or(CASE WHEN i > 64 THEN CAST(error('binaryCodes: vector '
                       || 'dimension exceeds the 64-dim sign-code '
                       || 'word contract') AS BIGINT)
                     WHEN e > 0 AND i <= 32
                     THEN 1::BIGINT << (i - 1) ELSE 0 END) AS w0,
         bit_or(CASE WHEN e > 0 AND i > 32 AND i <= 64
                     THEN 1::BIGINT << (i - 33) ELSE 0 END) AS w1
  FROM u GROUP BY 1
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(q.w0, c.w0))
              + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
  FROM codes q CROSS JOIN codes c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY hamming ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, hamming
FROM r WHERE rank <= 5"""

  /** s9: IVF ANN top-5 — language-label coarse quantizer. Centroid
    * components are DECIMAL-summed and rounded to 6 dp (the s3
    * discipline), the probe similarity ranks on the rounded 6 dp cosine
    * with a lang-ascending tiebreak (nprobe=2), and the final exact
    * cosines rank like s1. Every ranking input is a rounded value on
    * identical doubles, so the probed lists — and the result set —
    * match the Spark plan bit-for-bit.
    */
  val s9IvfTopK: String = s"""WITH ${VCte}, exq AS (
  ${CoarseExplodeSel}
), exc AS (
  SELECT vid, sub, dim, CAST(x AS DOUBLE) AS x FROM exq
), ${kmeansCtes("km", "exc", 8, 4)},
cellof AS (
  SELECT vid AS neighbor_id, cw AS cell FROM km_a4
), ${CentCnQCtes}, probe AS (
  SELECT q.query_id, q.qv, q.qn, cn.cell,
         round(CASE WHEN q.qn * cn.nm > 0
               THEN ${dotExpr("q.qv", "cn.c")} / (q.qn * cn.nm) END, 6)
           AS csim
  FROM q CROSS JOIN cn
), pr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY csim DESC NULLS LAST, cell ASC) AS prn
  FROM probe
), probed AS (
  SELECT query_id, qv, qn, cell FROM pr WHERE prn <= 2
), inv AS (
  SELECT co.neighbor_id, co.cell, v.e AS cv,
         sqrt(${dotExpr("v.e", "v.e")}) AS cm
  FROM cellof co JOIN v ON v.vec_id = co.neighbor_id
), scored AS (
  SELECT p.query_id, inv.neighbor_id,
         round(CASE WHEN p.qn * inv.cm > 0
               THEN ${dotExpr("p.qv", "inv.cv")} / (p.qn * inv.cm) END, 6)
           AS cosine
  FROM probed p JOIN inv ON p.cell = inv.cell
  WHERE p.query_id <> inv.neighbor_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC NULLS LAST, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM r WHERE rank <= 5"""

  /** x10: exact integer window sums, every double derived from them by
    * the identical expression tree (see `Timeseries.hourlyAnomalies`);
    * the verdict compares the ROUNDED z. DuckDB SUM(BIGINT) is
    * HUGEINT, hence the DOUBLE casts before any arithmetic.
    */
  val x10HourlyAnomalies: String = {
    val varE = "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)" +
      " / 24.0) / 23.0"
    val zE = s"CASE WHEN $varE > 0 THEN round((CAST(n AS DOUBLE) - " +
      s"CAST(s AS DOUBLE) / 24.0) / sqrt($varE), 6) END"
    s"""WITH h AS (
  SELECT COALESCE(event_type, '') AS event_type,
         date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), wd AS (
  SELECT event_type, hour, n,
         COUNT(n) OVER win AS hist,
         SUM(n) OVER win AS s,
         SUM(n * n) OVER win AS ss
  FROM h
  WINDOW win AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n,
       round(CAST(s AS DOUBLE) / 24.0, 6) AS trailing_mean,
       $zE AS zscore,
       COALESCE($zE >= 3.0 OR $zE <= -3.0, FALSE) AS is_anomaly
FROM wd WHERE hist = 24"""
  }

  /** x12: pure integer counts over distinct (user, day) pairs; every
    * cohort has an offset-0 row by construction, so the size join is
    * total.
    */
  val x12RetentionCohorts: String = """WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), coh AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
), counts AS (
  SELECT c.cohort_day,
         CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
         COUNT(*) AS n_active
  FROM days d JOIN coh c USING (user_id)
  GROUP BY 1, 2
), sz AS (
  SELECT cohort_day, n_active AS cohort_size FROM counts WHERE day_offset = 0
)
SELECT c.cohort_day, c.day_offset, c.n_active, s.cohort_size,
       round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM counts c JOIN sz s USING (cohort_day)"""

  /** x14: JSON extraction — malformed/missing payloads yield NULL k
    * (the from_json PERMISSIVE contract), guarded here with
    * json_valid + TRY_CAST.
    */
  val x14PropsRollup: String = """WITH e AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k,
       COALESCE(CAST(SUM(k) AS BIGINT), 0) AS sum_k,
       round(CAST(SUM(k) AS DOUBLE) / COUNT(k), 6) AS mean_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM e GROUP BY 1"""

  /** x15: SCD2 intervals — change points via null-safe lag compare
    * (IS DISTINCT FROM ≡ Spark's !(a <=> b)), half-open intervals
    * closed by the next change, (ts, event_id) total order.
    */
  val x15Scd2Intervals: String = """WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), chg AS (
  SELECT * FROM flagged WHERE rn = 1 OR event_type IS DISTINCT FROM prev
), v AS (
  SELECT user_id, event_type,
         CAST(row_number() OVER w2 AS BIGINT) AS version,
         ts AS valid_from,
         lead(ts) OVER w2 AS valid_to
  FROM chg
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, event_type, version, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM v"""

  /** x16: PSI drift — exact integer bin counts, Laplace-smoothed
    * double fractions, 9 dp `(p-q)·ln(p/q)` terms (libm agreement at
    * that grain, the t25 discipline), DECIMAL(28,9) order-free total.
    */
  /** x35: CDC apply — same synthetic change batch, replayed
    * relationally: winner per key via QUALIFY (seq DESC, op DESC),
    * NOT EXISTS anti-join for survivors, non-delete winners upserted.
    */
  val x35CdcApply: String = """WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders
), base AS (
  SELECT * FROM o WHERE o_orderkey % 3 <> 1
), changes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 100.0 AS o_totalprice, o_orderdate,
         CAST(2 AS BIGINT) AS seq, 'U' AS op
  FROM o WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, NULL, NULL, NULL, NULL, 3, 'D'
  FROM o WHERE o_orderkey % 7 = 3
  UNION ALL
  SELECT o_orderkey + 3000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, 1, 'I'
  FROM o WHERE o_orderkey % 11 = 2
), win AS (
  SELECT * FROM changes
  QUALIFY row_number() OVER (PARTITION BY o_orderkey
                             ORDER BY seq DESC, op DESC) = 1
)
SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice,
       b.o_orderdate
FROM base b
WHERE NOT EXISTS (SELECT 1 FROM win WHERE win.o_orderkey = b.o_orderkey)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
FROM win WHERE op <> 'D'"""

  val x16DriftPsi: String = """WITH rb AS (
  SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT)
           AS bin, COUNT(*) AS c
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
  GROUP BY 1
), cb AS (
  SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT)
           AS bin, COUNT(*) AS c
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
  GROUP BY 1
), j AS (
  SELECT COALESCE(rb.bin, cb.bin) AS bin,
         COALESCE(rb.c, 0) AS rc, COALESCE(cb.c, 0) AS cc
  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin
), t AS (
  SELECT SUM(rc) AS rt, SUM(cc) AS ct, COUNT(*) AS nb FROM j
), s AS (
  SELECT bin, rc, cc,
         CAST(rc + 1 AS DOUBLE) / CAST(rt + nb AS DOUBLE) AS p,
         CAST(cc + 1 AS DOUBLE) / CAST(ct + nb AS DOUBLE) AS q
  FROM j CROSS JOIN t
), e AS (
  SELECT bin, rc AS n_ref, cc AS n_cur,
         round(p, 9) AS p_ref, round(q, 9) AS p_cur,
         round((p - q) * ln(p / q), 9) AS psi_term
  FROM s
)
SELECT *,
       CAST(round(SUM(CAST(psi_term AS DECIMAL(28,9))) OVER (), 9)
            AS DOUBLE) AS total_psi
FROM e"""

  /** x17: key-skew report — exact long counts, double ratios of exact
    * integers rounded 6 dp, top-N order fully determined by
    * (count DESC, key ASC).
    */
  val x17KeySkew: String = """WITH k AS (
  SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n_rows
  FROM events GROUP BY 1
), t AS (
  SELECT CAST(SUM(n_rows) AS DOUBLE) AS total, COUNT(*) AS n_keys FROM k
)
SELECT key, n_rows,
       round(CAST(n_rows AS DOUBLE) / total, 6) AS share,
       round(CAST(n_rows AS DOUBLE) * n_keys / total, 6) AS skew_ratio
FROM k CROSS JOIN t
ORDER BY n_rows DESC, key ASC
LIMIT 20"""

  /** x18: fuzzy linkage — deliberately UNBLOCKED (all-pairs + filter):
    * identical results prove the Spark side's length-bucket blocking
    * lossless. Unit-cost Levenshtein and the (dist, name) argmin rank
    * are exact ints, engine-independent.
    */
  val x18FuzzyLinkage: String = """WITH names AS (
  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
), probes AS (
  SELECT p_partkey AS probe_id,
         CASE WHEN p_partkey % 3 = 0 THEN substr(p_name, 2)
              WHEN p_partkey % 3 = 1 THEN p_name || 'x'
              ELSE replace(p_name, ' ', '_') END AS probe_name
  FROM part WHERE p_partkey % 5 = 0
), cand AS (
  SELECT probe_id, name, levenshtein(probe_name, name) AS dist
  FROM probes CROSS JOIN names
  WHERE levenshtein(probe_name, name) <= 2
), best AS (
  SELECT probe_id, name, dist,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY dist ASC, name ASC) AS rn
  FROM cand
)
SELECT p.probe_id, p.probe_name, b.name AS matched_name, b.dist
FROM probes p
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON p.probe_id = b.probe_id"""

  /** t45: canonical-URL dedup — the identical normalization chain
    * under RE2 (DuckDB needs the explicit 'g' flag only where multiple
    * matches exist, and `\1` backrefs where Java uses `$1`); byte-equal
    * canonicals make the window-min keeper engine-independent.
    */
  val t45UrlDedup: String = """WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 'https://WWW.Example.COM:443'
              ELSE 'https://www.example.com' END
         || '/Docs/' || CAST(doc_id % 100 AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&utm_campaign=x'
                 WHEN doc_id % 5 = 1 THEN '?ref=1&utm_medium=email'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END AS url
  FROM documents
), s1 AS (
  SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nofrag FROM u
), s2 AS (
  SELECT *, regexp_extract(nofrag, '^(https?://[^/?#]*)', 1) AS prefix
  FROM s1
), s3 AS (
  SELECT doc_id, url,
         regexp_replace(
           regexp_replace(lower(prefix), '^(https://[^:/]*):443$', '\1'),
           '^(http://[^:/]*):80$', '\1')
         || substr(nofrag, length(prefix) + 1) AS base
  FROM s2
), s4 AS (
  SELECT doc_id, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(base,
               '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
             '[?&]$', ''),
           '/$', '') AS canonical_url
  FROM s3
)
SELECT doc_id, url, canonical_url,
       doc_id = MIN(doc_id) OVER (PARTITION BY canonical_url) AS keep
FROM s4"""

  /** x19: bloom-pruned join — the oracle is the PLAIN join; equality
    * proves the bloom prefilter dropped nothing it shouldn't.
    */
  val x19BloomJoin: String = """SELECT o_orderkey, o_custkey,
       c_mktsegment, o_totalprice
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey = 1"""

  /** x20: PageRank, 3 unrolled iterations in FIXED-POINT — ranks are
    * BIGINTs in 1e-9 units, `//` floor-division everywhere (operands
    * positive, so it equals Spark's truncating `div`), exact long
    * sums. No float op exists until the final display division, so no
    * rounding mode can disagree (9-dp double rounding provably did, at
    * .5-ulp boundaries). The output `rank_e9` is CAST back to BIGINT:
    * DuckDB's SUM over BIGINT widens to HUGEINT, and the driver's
    * fetch path renders HUGEINT as a float (`75000.0` vs Spark's
    * `75000`) — the r10 hash mismatch was the TYPE, not the values.
    */
  /** The co-purchase chain graph every x-series graph twin walks:
    * lead-window successor pairs per order. Shared VERBATIM by
    * x20/x30/x33/x34/x38/x46 (and quantity-filtered variants inline
    * their own `WHERE`) so the graph construction cannot drift
    * between twins.
    */
  private val ChainSeq: String = """seq AS (
  SELECT l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey) AS nxt
  FROM lineitem
)"""

  /** The distinct co-purchase chain arc select over [[ChainSeq]] —
    * nine graph twins open their edge CTE with it.
    */
  private val ChainArcSel: String =
    """SELECT DISTINCT l_partkey AS src, nxt AS dst
  FROM seq WHERE nxt IS NOT NULL AND l_partkey <> nxt"""

  /** Distinct directed edges + node set over [[ChainSeq]]. */
  private val ChainEdges: String = s"""e AS (
  $ChainArcSel
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
)"""

  /** The unrolled PageRank-family iteration chain (`c$i`/`s$i`/`r$i`
    * CTEs): contribution join, partial sum, rank recombination — one
    * generator for x20/x33/x46 so the fixed-point arithmetic is
    * written once per VARIANT (contribution expression + teleport
    * term), not once per iteration per query. The final round emits
    * only `s$iters`; the caller's SELECT applies the rank term once
    * more (exactly as the hand-unrolled originals did).
    */
  private def prChain(iters: Int, contrib: String => String,
                      contribJoin: String, rankTerm: Int => String,
                      rankFrom: String): String =
    (1 to iters).map { i =>
      val head = s"""c$i AS (
  SELECT e.dst AS node, ${contrib(s"r${i - 1}")} AS c
  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node $contribJoin
), s$i AS (SELECT node, SUM(c) AS s FROM c$i GROUP BY 1)"""
      if (i < iters) head + s""",
r$i AS (
  SELECT nodes.node,
         ${rankTerm(i)} AS rank_e9
  FROM nodes $rankFrom LEFT JOIN s$i ON nodes.node = s$i.node
)"""
      else head
    }.mkString(", ")

  private def x20Rank(i: Int): String =
    s"150000000 // n + COALESCE(s$i.s, 0) * 850 // 1000"

  /** The PageRank-family final readout: fixed-point rank_e9 + double
    * rank over the last unrolled sum CTE — shared by x20/x33/x46.
    */
  private def prReadout(rank: String, joins: String): String =
    s"""SELECT nodes.node,
       CAST($rank AS BIGINT)
         AS rank_e9,
       CAST($rank AS DOUBLE)
         / CAST(1000000000 AS DOUBLE) AS rank
FROM nodes $joins LEFT JOIN s3 ON nodes.node = s3.node"""

  val x20PageRank: String = s"""WITH $ChainSeq, $ChainEdges,
nn AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY 1),
r0 AS (
  SELECT node, 1000000000 // n AS rank_e9 FROM nodes CROSS JOIN nn
), ${prChain(3, r => s"$r.rank_e9 // outdeg.odeg",
      "JOIN outdeg ON e.src = outdeg.src", x20Rank, "CROSS JOIN nn")}
${prReadout(x20Rank(3), "CROSS JOIN nn")}"""

  /** x30: HITS, 2 unrolled iterations in exact integer arithmetic —
    * unnormalized longs (seeds 1, integer sums; DuckDB's run in
    * HUGEINT, Spark's in longs, identical values inside the long
    * range the Spark side guards), normalized once at the end to
    * 1e-9 fixed point with the same truncating `//`. Outputs CAST to
    * BIGINT (HUGEINT discipline, see x20).
    */
  val x30Hits: String = s"""WITH $ChainSeq, $ChainEdges, a1 AS (
  SELECT dst AS node, COUNT(*) AS v FROM e GROUP BY 1
), h1 AS (
  SELECT e.src AS node, SUM(a1.v) AS v
  FROM e JOIN a1 ON e.dst = a1.node GROUP BY 1
), a2 AS (
  SELECT e.dst AS node, SUM(h1.v) AS v
  FROM e JOIN h1 ON e.src = h1.node GROUP BY 1
), h2 AS (
  SELECT e.src AS node, SUM(a2.v) AS v
  FROM e JOIN a2 ON e.dst = a2.node GROUP BY 1
), sums AS (
  SELECT (SELECT SUM(v) FROM a2) AS sa, (SELECT SUM(v) FROM h2) AS sh
)
SELECT nodes.node,
       CAST(COALESCE(a2.v, 0) * 1000000000 // sa AS BIGINT) AS auth_e9,
       CAST(COALESCE(h2.v, 0) * 1000000000 // sh AS BIGINT) AS hub_e9,
       CAST(CAST(COALESCE(a2.v, 0) * 1000000000 // sa AS BIGINT)
            AS DOUBLE) / 1000000000.0 AS auth,
       CAST(CAST(COALESCE(h2.v, 0) * 1000000000 // sh AS BIGINT)
            AS DOUBLE) / 1000000000.0 AS hub
FROM nodes CROSS JOIN sums
LEFT JOIN a2 ON nodes.node = a2.node
LEFT JOIN h2 ON nodes.node = h2.node"""

  /** x33: personalized PageRank (TrustRank), 3 unrolled iterations in
    * the x20 fixed-point discipline. The teleport term exists only on
    * seed rows (`p_size = 1` parts present in the graph); seedBase =
    * 150 · (1e9 // nSeed) // 1000 mirrors the Spark side's exact-long
    * driver arithmetic, and every division is the truncating `//` on
    * positive operands. Outputs CAST to BIGINT (HUGEINT discipline).
    */
  private def x33Rank(i: Int): String =
    s"nodes.seed * seed_base + COALESCE(s$i.s, 0) * 850 // 1000"

  val x33TrustRank: String = s"""WITH $ChainSeq, e AS (
  $ChainArcSel
), nodes0 AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), nodes AS (
  SELECT nodes0.node,
         CASE WHEN p.p_partkey IS NULL THEN 0 ELSE 1 END AS seed
  FROM nodes0 LEFT JOIN (
    SELECT DISTINCT p_partkey FROM part WHERE p_size = 1
  ) p ON nodes0.node = p.p_partkey
), ns AS (SELECT SUM(seed) AS n FROM nodes),
consts AS (
  SELECT 1000000000 // n AS seed_rank,
         150 * (1000000000 // n) // 1000 AS seed_base
  FROM ns
),
outdeg AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY 1),
r0 AS (
  SELECT node, seed * seed_rank AS rank_e9 FROM nodes CROSS JOIN consts
), ${prChain(3, r => s"$r.rank_e9 // outdeg.odeg",
      "JOIN outdeg ON e.src = outdeg.src", x33Rank,
      "CROSS JOIN consts")}
${prReadout(x33Rank(3), "CROSS JOIN consts")}"""

  /** x48: connected components over the high-quantity co-purchase
    * chain graph — transitive closure via a recursive reach CTE,
    * component rep = min reachable node (the d5 cluster discipline on
    * a graph-tier input), plus per-component sizes.
    */
  val x48Components: String = """WITH RECURSIVE chain AS (
  SELECT l_partkey AS src,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey) AS dst
  FROM lineitem WHERE l_quantity >= 48
), e0 AS (
  SELECT src, dst FROM chain WHERE dst IS NOT NULL AND src <> dst
), edges AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
), nodes AS (
  SELECT DISTINCT src AS node_id FROM edges
), reach AS (
  SELECT node_id AS src, node_id AS dst FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT src AS node_id, MIN(dst) AS cluster_rep FROM reach GROUP BY 1
), sizes AS (
  SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS component_size
  FROM comp GROUP BY 1
)
SELECT c.node_id, c.cluster_rep, s.component_size
FROM comp c JOIN sizes s USING (cluster_rep)"""

  /** One unrolled frontier-relax round — the Bellman-Ford family's
    * shared CTE shape: dist' = MIN(keep, step across an edge) at
    * `carry :+ node` grain. x50 instantiates it at node grain over
    * weighted edges (`e.w` step); x54 at (seed, node) grain over the
    * hop graph (`1` step). Pure integer MIN/+, nothing to round.
    */
  private def relaxChain(tag: String, iters: Int, edgeTable: String,
                         stepCost: String,
                         carry: Seq[String] = Nil,
                         materialized: Boolean = false): String = {
    // DuckDB inlines CTEs per reference; a consumer that reads the
    // final level from several places (x58's σ/δ passes) would
    // otherwise re-expand the whole chain per reference
    val mat = if (materialized) "MATERIALIZED " else ""
    (1 to iters).map { i =>
      val cs = (carry :+ "node").mkString(", ")
      val carrySel = carry.map(c => s"d.$c, ").mkString
      s"""$tag$i AS $mat(
  SELECT $cs, MIN(dist) AS dist FROM (
    SELECT $cs, dist FROM $tag${i - 1}
    UNION ALL
    SELECT ${carrySel}e.dst AS node, d.dist + $stepCost AS dist
    FROM $tag${i - 1} d JOIN $edgeTable e ON d.node = e.src
  ) GROUP BY ${(1 to carry.size + 1).mkString(", ")}
)"""
    }.mkString(", ")
  }

  /** x50: multi-source weighted shortest paths — 4 unrolled
    * Bellman-Ford relaxations over the chain graph with edge cost =
    * the source line's quantity (parallel edges MIN-collapsed), seeds
    * = the `p_size = 1` parts at distance 0.
    */
  val x50ShortestPaths: String = s"""WITH wseq AS (
  SELECT l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey) AS nxt,
         l_quantity
  FROM lineitem
), ew AS (
  SELECT l_partkey AS src, nxt AS dst,
         MIN(CAST(l_quantity AS BIGINT)) AS w
  FROM wseq WHERE nxt IS NOT NULL AND l_partkey <> nxt
  GROUP BY 1, 2
), d0 AS (
  SELECT DISTINCT p_partkey AS node, CAST(0 AS BIGINT) AS dist
  FROM part WHERE p_size = 1
), ${relaxChain("d", 4, "ew", "e.w")}
SELECT node AS node_id, CAST(dist AS BIGINT) AS min_cost FROM d4"""

  /** x54: sampled-source harmonic centrality — 4 [[relaxChain]] BFS
    * rounds at (seed, node) grain over the [[ChainSeq]] edges
    * (reusing the shared chain + edge CTEs), seeds = every 500th
    * part. Terms are `1e9 // d` on positive integers; the harmonic
    * sum is an order-free BIGINT sum (HUGEINT cast back).
    */
  val x54HarmonicCentrality: String = s"""WITH $ChainSeq, $ChainEdges,
h0 AS (
  SELECT DISTINCT p_partkey AS seed, p_partkey AS node,
         CAST(0 AS BIGINT) AS dist
  FROM part WHERE p_partkey % 500 = 0
), ${relaxChain("h", 4, "e", "1", Seq("seed"))}
SELECT node AS node_id, CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(1000000000 // dist) AS BIGINT) AS harmonic_e9,
       CAST(CAST(SUM(1000000000 // dist) AS BIGINT) AS DOUBLE)
         / 1000000000.0 AS harmonic
FROM h4 WHERE dist >= 1 GROUP BY 1"""

  /** x58 pass 2: level-synchronous shortest-path counts — level l's
    * σ sums the level-(l−1) predecessors' σ across edges, membership
    * gated by the finalized distance frame. Exact BIGINTs.
    */
  private def sigmaCtes(iters: Int): String =
    (1 to iters).map { l =>
      s"""sg$l AS MATERIALIZED (
  SELECT p.seed, e.dst AS node, CAST(SUM(p.sigma) AS BIGINT) AS sigma
  FROM sg${l - 1} p
  JOIN e ON p.node = e.src
  JOIN h$iters d ON d.seed = p.seed AND d.node = e.dst
                AND d.dist = $l
  GROUP BY 1, 2
)"""
    }.mkString(", ")

  /** x58 pass 3: Brandes' backward dependency accumulation by
    * decreasing level — δ(v) = Σ σ_v·(1e9 + δ_w) // σ_w over
    * successors one level deeper (the LEFT joins leave non-(l+1)
    * successors NULL, which SUM skips; childless nodes COALESCE to
    * 0). Per-term truncation on positive operands ≡ Spark's `div`.
    */
  private def deltaCtes(iters: Int): String =
    ((iters - 1) to 0 by -1).map { l =>
      s"""dl$l AS MATERIALIZED (
  SELECT sv.seed, sv.node,
         CAST(COALESCE(SUM(sv.sigma * (1000000000 + dw.delta)
                           // sw.sigma), 0) AS BIGINT) AS delta
  FROM sg$l sv
  LEFT JOIN e ON sv.node = e.src
  LEFT JOIN sg${l + 1} sw ON sw.seed = sv.seed AND sw.node = e.dst
  LEFT JOIN dl${l + 1} dw ON dw.seed = sv.seed AND dw.node = e.dst
  GROUP BY 1, 2
)"""
    }.mkString(", ")

  /** x58: sampled-source betweenness — the x54 forward [[relaxChain]]
    * distances, [[sigmaCtes]] path counts, [[deltaCtes]] backward
    * dependencies, sources excluded from their own rollup. The
    * σ·(1e9+δ) products run in overflow-CHECKED BIGINT here vs
    * Spark's longs (the x30 twin discipline — identical values
    * inside the range the sparse graph keeps them in).
    */
  val x58Betweenness: String = s"""WITH $ChainSeq, $ChainEdges,
h0 AS (
  SELECT DISTINCT p_partkey AS seed, p_partkey AS node,
         CAST(0 AS BIGINT) AS dist
  FROM part WHERE p_partkey % 500 = 0
), ${relaxChain("h", 4, "e", "1", Seq("seed"), materialized = true)},
sg0 AS MATERIALIZED (
  SELECT seed, node, CAST(1 AS BIGINT) AS sigma FROM h4 WHERE dist = 0
), ${sigmaCtes(4)},
dl4 AS MATERIALIZED (
  SELECT seed, node, CAST(0 AS BIGINT) AS delta FROM sg4
), ${deltaCtes(4)},
alld AS (
  SELECT * FROM dl0 UNION ALL SELECT * FROM dl1 UNION ALL
  SELECT * FROM dl2 UNION ALL SELECT * FROM dl3 UNION ALL
  SELECT * FROM dl4
)
SELECT node AS node_id, CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(delta) AS BIGINT) AS betweenness_e9,
       CAST(CAST(SUM(delta) AS BIGINT) AS DOUBLE) / 1000000000.0
         AS betweenness
FROM alld WHERE node <> seed GROUP BY 1"""

  /** x62 rounds: earliest-arrival relax — keep the current arrival
    * or step across an edge whose activation time is not before it,
    * MIN per node. Exact date MINs.
    */
  private def temporalRelax(iters: Int): String =
    (1 to iters).map { i =>
      s"""tr$i AS (
  SELECT node, MIN(fr) AS fr FROM (
    SELECT node, fr FROM tr${i - 1}
    UNION ALL
    SELECT e.dst AS node, e.etime AS fr
    FROM tr${i - 1} d JOIN te e ON d.node = e.src AND e.etime >= d.fr
  ) GROUP BY 1
)"""
    }.mkString(", ")

  /** x62: temporal reachability — earliest time-respecting arrival
    * from the x54 seed panel, edges active at their source line's
    * ship date, 4 [[temporalRelax]] rounds (the x50 shape with a
    * DATE in place of a cost).
    */
  val x62TemporalReach: String = s"""WITH wseq AS (
  SELECT l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey) AS nxt,
         l_shipdate
  FROM lineitem
), te AS (
  SELECT DISTINCT l_partkey AS src, nxt AS dst,
         CAST(l_shipdate AS DATE) AS etime
  FROM wseq WHERE nxt IS NOT NULL AND l_partkey <> nxt
), tr0 AS (
  SELECT DISTINCT p_partkey AS node, DATE '1992-01-01' AS fr
  FROM part WHERE p_partkey % 500 = 0
), ${temporalRelax(4)}
SELECT node AS node_id, fr AS first_reach FROM tr4"""

  /** x61: PageRank convergence report — the x20 [[prChain]] rounds
    * with each iteration priced: L1/max rank movement (exact e9
    * longs, order-free sums) and total mass. r3 is the chain's final
    * rank term materialized as a frame; every delta joins adjacent
    * complete |V|-row frames.
    */
  val x61PageRankConvergence: String = s"""WITH $ChainSeq, $ChainEdges,
nn AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY 1),
r0 AS (
  SELECT node, 1000000000 // n AS rank_e9 FROM nodes CROSS JOIN nn
), ${prChain(3, r => s"$r.rank_e9 // outdeg.odeg",
      "JOIN outdeg ON e.src = outdeg.src", x20Rank, "CROSS JOIN nn")},
r3 AS (
  SELECT nodes.node, ${x20Rank(3)} AS rank_e9
  FROM nodes CROSS JOIN nn LEFT JOIN s3 ON nodes.node = s3.node
), dd AS (
  SELECT 1 AS iteration,
         SUM(ABS(CAST(a.rank_e9 AS BIGINT)
                 - CAST(b.rank_e9 AS BIGINT))) AS l1,
         MAX(ABS(CAST(a.rank_e9 AS BIGINT)
                 - CAST(b.rank_e9 AS BIGINT))) AS mx,
         SUM(CAST(a.rank_e9 AS BIGINT)) AS mass
  FROM r1 a JOIN r0 b USING (node)
  UNION ALL
  SELECT 2,
         SUM(ABS(CAST(a.rank_e9 AS BIGINT)
                 - CAST(b.rank_e9 AS BIGINT))),
         MAX(ABS(CAST(a.rank_e9 AS BIGINT)
                 - CAST(b.rank_e9 AS BIGINT))),
         SUM(CAST(a.rank_e9 AS BIGINT))
  FROM r2 a JOIN r1 b USING (node)
  UNION ALL
  SELECT 3,
         SUM(ABS(CAST(a.rank_e9 AS BIGINT)
                 - CAST(b.rank_e9 AS BIGINT))),
         MAX(ABS(CAST(a.rank_e9 AS BIGINT)
                 - CAST(b.rank_e9 AS BIGINT))),
         SUM(CAST(a.rank_e9 AS BIGINT))
  FROM r3 a JOIN r2 b USING (node)
)
SELECT CAST(iteration AS BIGINT) AS iteration,
       CAST(l1 AS BIGINT) AS l1_delta_e9,
       CAST(mx AS BIGINT) AS max_delta_e9,
       CAST(mass AS BIGINT) AS mass_e9,
       CAST(CAST(l1 AS BIGINT) AS DOUBLE) / 1000000000.0 AS l1_delta
FROM dd"""

  /** x59: degree assortativity — Pearson of the two endpoint degrees
    * across every undirected-support edge, through the shared
    * [[momentsCte]]/[[momentDoubles]]/[[PearsonExpr]] device (exact
    * for integer degrees).
    */
  val x59Assortativity: String = s"""WITH $ChainSeq, e0 AS (
  $ChainArcSel
), und AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
), degs AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM und GROUP BY 1
), pr AS (
  SELECT CAST(da.degree AS DOUBLE) AS x, CAST(db.degree AS DOUBLE) AS y
  FROM und
  JOIN degs da ON und.src = da.node
  JOIN degs db ON und.dst = db.node
), m AS (
  ${momentsCte("pr", Nil, "n", "DECIMAL(18,6)")}
), s AS (
  ${momentDoubles("m", "CAST(n AS BIGINT) AS n_pairs")}
)
SELECT n_pairs, $PearsonExpr AS assortativity FROM s"""

  /** x60 peel rounds: each round recounts degrees over the
    * alive-induced edge set (two semi-joins referenced TWICE per
    * round — MATERIALIZED, or DuckDB's per-reference CTE inlining
    * re-expands the peel ladder exponentially) and keeps nodes at
    * degree ≥ k.
    */
  private def kcorePeel(rounds: Int, k: Int): String =
    (1 to rounds).map { r =>
      s"""kd$r AS MATERIALIZED (
  SELECT und.src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM und
  JOIN ka${r - 1} a ON und.src = a.node
  JOIN ka${r - 1} b ON und.dst = b.node
  GROUP BY 1
), ka$r AS MATERIALIZED (
  SELECT node FROM kd$r WHERE degree >= $k
)"""
    }.mkString(", ")

  /** x60: k-core peel — 4 unrolled [[kcorePeel]] rounds at k = 3,
    * survivors with their final induced-subgraph degree. Exact
    * integers end to end.
    */
  val x60KCore: String = s"""WITH $ChainSeq, e0 AS (
  $ChainArcSel
), und AS MATERIALIZED (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
), ka0 AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM und
), ${kcorePeel(4, 3)}
SELECT und.src AS node_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM und
JOIN ka4 a ON und.src = a.node
JOIN ka4 b ON und.dst = b.node
GROUP BY 1"""

  /** x55: degree power-law readout — degree histogram of the chain
    * graph's undirected support (via the shared CTEs) + the t56
    * regression arithmetic over (ln degree, ln n_nodes): 9-dp logs,
    * DECIMAL moment sums, 6-dp slope/intercept/r², fit columns
    * repeated per histogram row.
    */
  val x55DegreeDistribution: String = s"""WITH $ChainSeq, e0 AS (
  $ChainArcSel
), und AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
), degs AS (
  SELECT src AS node, COUNT(*) AS degree FROM und GROUP BY 1
), hist AS (
  SELECT CAST(degree AS BIGINT) AS degree,
         CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM degs GROUP BY 1
), xy AS (
  SELECT round(ln(CAST(degree AS DOUBLE)), 9) AS x,
         round(ln(CAST(n_nodes AS DOUBLE)), 9) AS y
  FROM hist
), m AS (
  ${momentsCte("xy", Nil, "n")}
), s AS (
  SELECT CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM m
), fit0 AS (
  SELECT nd, sxd, syd,
         nd * sxyd - sxd * syd AS covn,
         nd * sxxd - sxd * sxd AS varx,
         nd * syyd - syd * syd AS vary
  FROM s
), fit AS (
  SELECT ${fitExprs("pl_slope", "pl_intercept")} FROM fit0
)
SELECT h.degree, h.n_nodes, f.pl_slope, f.pl_intercept, f.r2
FROM hist h CROSS JOIN fit f"""

  /** Shared x34 LPA chain over the x20 chain graph's undirected
    * support: `e0`/`und` + `iters` unrolled synchronous QUALIFY vote
    * rounds (votes are exact COUNTs; winner per node via votes DESC,
    * label ASC — pure integer arithmetic), ending in
    * `lab(node, community)`. `lab` is MATERIALIZED: x63/x64 reference
    * it repeatedly and DuckDB would otherwise re-expand the whole
    * vote chain per reference. Used by x34/x63/x64.
    */
  private def lpaCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS (
  SELECT e.u AS node, l.label, COUNT(*) AS votes
  FROM und e JOIN l${i - 1} l ON e.v = l.node GROUP BY 1, 2
  QUALIFY row_number() OVER (PARTITION BY e.u
    ORDER BY COUNT(*) DESC, l.label ASC) = 1
)"""
    }.mkString(", ")
    s"""e0 AS (
  $ChainArcSel
), und AS (
  SELECT src AS u, dst AS v FROM e0
  UNION
  SELECT dst AS u, src AS v FROM e0
), l0 AS (
  SELECT DISTINCT u AS node, u AS label FROM und
), $rounds, lab AS MATERIALIZED (
  SELECT node, label AS community FROM l$iters
)"""
  }

  /** x34: label propagation — the shared [[lpaCtes]] chain plus
    * community sizes.
    */
  val x34LabelPropagation: String = s"""WITH $ChainSeq, ${lpaCtes(3)},
sizes AS (
  SELECT community, COUNT(*) AS community_size FROM lab GROUP BY 1
)
SELECT lab.node, lab.community,
       CAST(sizes.community_size AS BIGINT) AS community_size
FROM lab JOIN sizes ON lab.community = sizes.community"""

  /** x63: Newman modularity of the x34 LPA partition — the shared
    * [[lpaCtes]] chain plus a modularity tail of per-community exact
    * counters in the x31 HUGEINT fixed-point discipline:
    * `e_c·1e9 // m` and `d_c²·1e9 // 4m²`, one floor per subterm on
    * non-negative operands, matching Spark's truncating `div` exactly.
    */
  val x63Modularity: String = s"""WITH $ChainSeq, ${lpaCtes(3)},
eu AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e0
), deg AS (
  SELECT u AS node, COUNT(*) AS degree FROM und GROUP BY 1
), mm AS (
  SELECT COUNT(*) AS m FROM eu
), ein AS (
  SELECT lu.community, COUNT(*) AS internal_edges
  FROM eu
  JOIN lab lu ON eu.u = lu.node
  JOIN lab lv ON eu.v = lv.node
  WHERE lu.community = lv.community
  GROUP BY 1
), dsum AS (
  SELECT lab.community, COUNT(*) AS n_nodes,
         CAST(SUM(deg.degree) AS BIGINT) AS degree_sum
  FROM deg JOIN lab ON deg.node = lab.node GROUP BY 1
), terms AS (
  SELECT d.community, d.n_nodes,
         COALESCE(e.internal_edges, 0) AS internal_edges,
         d.degree_sum,
         CAST(CAST(COALESCE(e.internal_edges, 0) AS HUGEINT)
                * 1000000000 // mm.m
              - CAST(d.degree_sum AS HUGEINT) * d.degree_sum
                * 1000000000
                // (CAST(4 AS HUGEINT) * mm.m * mm.m)
              AS BIGINT) AS q_term_e9
  FROM dsum d LEFT JOIN ein e ON d.community = e.community
  CROSS JOIN mm
)
SELECT t.community, CAST(t.n_nodes AS BIGINT) AS n_nodes,
       CAST(t.internal_edges AS BIGINT) AS internal_edges,
       t.degree_sum, t.q_term_e9, tot.modularity_e9,
       CAST(tot.modularity_e9 AS DOUBLE) / 1000000000 AS modularity
FROM terms t CROSS JOIN (
  SELECT CAST(SUM(q_term_e9) AS BIGINT) AS modularity_e9 FROM terms
) tot"""

  /** x64: one synchronous Louvain sweep over the x34 LPA partition.
    * The comparator is EXACT integer arithmetic (no truncation):
    * maximizing ΔQ(v→c) over c is maximizing
    * score(c) = 2m·k_{v,c} − k_v·d'_c (ΔQ scaled by 2m²; d'_c drops
    * v's own degree when c is v's current community). Winner per node
    * via QUALIFY (score DESC, community ASC); a node moves only if
    * the winner STRICTLY beats staying. Labels come from the shared
    * [[lpaCtes]] chain.
    */
  val x64ModularityRefine: String = s"""WITH $ChainSeq, ${lpaCtes(3)},
eu AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e0
), deg AS MATERIALIZED (
  SELECT u AS node, COUNT(*) AS degree FROM und GROUP BY 1
), mm AS (
  SELECT COUNT(*) AS m FROM eu
), kvc AS (
  SELECT e.u AS node, l.community AS cand, COUNT(*) AS k_c
  FROM und e JOIN lab l ON e.v = l.node GROUP BY 1, 2
), allc AS (
  SELECT node, cand, MAX(k_c) AS k_c FROM (
    SELECT node, cand, k_c FROM kvc
    UNION ALL
    SELECT node, community AS cand, 0 AS k_c FROM lab
  ) GROUP BY 1, 2
), dsum AS (
  SELECT lab.community AS cand,
         CAST(SUM(deg.degree) AS BIGINT) AS d_c
  FROM deg JOIN lab ON deg.node = lab.node GROUP BY 1
), scored AS MATERIALIZED (
  SELECT a.node, a.cand, lb.community AS own,
         CAST(2 AS HUGEINT) * mm.m * a.k_c
           - CAST(dg.degree AS HUGEINT)
             * (dsum.d_c - CASE WHEN a.cand = lb.community
                                THEN dg.degree ELSE 0 END) AS score
  FROM allc a
  JOIN lab lb ON lb.node = a.node
  JOIN deg dg ON dg.node = a.node
  JOIN dsum ON dsum.cand = a.cand
  CROSS JOIN mm
), best AS (
  SELECT node, cand, score FROM scored
  QUALIFY row_number() OVER (PARTITION BY node
    ORDER BY score DESC, cand ASC) = 1
), stay AS (
  SELECT node, own, score AS stay_sc FROM scored WHERE cand = own
), newlab AS (
  SELECT b.node,
         CASE WHEN b.score > s.stay_sc THEN b.cand ELSE s.own END
           AS community
  FROM best b JOIN stay s ON s.node = b.node
), sizes AS (
  SELECT community, COUNT(*) AS community_size FROM newlab GROUP BY 1
)
SELECT n.node, n.community,
       CAST(s.community_size AS BIGINT) AS community_size
FROM newlab n JOIN sizes s ON n.community = s.community"""

  /** Shared x65 truss-round fragments. `trussTriSup(i)` enumerates
    * te$i's triangles once in plain id order (a < b < c — any total
    * order yields the same set, so the Spark side's degree order and
    * this differ only in enumeration) and counts per-edge support;
    * `trussPrune(i, k)` drops edges below support k−2 into te${i+1}
    * (MATERIALIZED — each round's edge set is referenced four times
    * and DuckDB re-expands per reference otherwise).
    */
  private def trussTriSup(i: Int): String = s"""tri$i AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM te$i e1
  JOIN te$i e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN te$i e3 ON e3.u = e1.v AND e3.v = e2.v
), sup$i AS (
  SELECT u, v, COUNT(*) AS support FROM (
    SELECT a AS u, b AS v FROM tri$i
    UNION ALL SELECT a, c FROM tri$i
    UNION ALL SELECT b, c FROM tri$i
  ) GROUP BY 1, 2
)"""

  private def trussPrune(i: Int, k: Int): String =
    s"""te${i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM te$i e
  LEFT JOIN sup$i s ON e.u = s.u AND e.v = s.v
  WHERE COALESCE(s.support, 0) >= ${k - 2}
)"""

  /** x65: bounded k-truss peel on the chain graph — k=3, 2 unrolled
    * rounds, final support reported against the FINAL edge set (may
    * sit below k−2 when the round budget truncates the fixpoint —
    * the bounded contract the spec pins).
    */
  val x65KTruss: String = {
    val k = 3; val rounds = 2
    val peel = (0 until rounds)
      .map(i => s"${trussTriSup(i)}, ${trussPrune(i, k)}").mkString(", ")
    s"""WITH $ChainSeq, e0x AS (
  $ChainArcSel
), te0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e0x
), $peel, ${trussTriSup(rounds)}
SELECT e.u AS src, e.v AS dst,
       CAST(COALESCE(s.support, 0) AS BIGINT) AS support
FROM te$rounds e
LEFT JOIN sup$rounds s ON e.u = s.u AND e.v = s.v"""
  }

  /** x70: directed triad census — one two-hop path CTE closed by one
    * arc join per motif; cycles canonicalize on the minimum node,
    * FFL roles roll up via a three-way union, full-outer stitch with
    * zero fills.
    */
  val x70TriadCensus: String = s"""WITH $ChainSeq, $ChainEdges,
paths AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  WHERE e1.src <> e2.dst
), ffl AS MATERIALIZED (
  SELECT p.a, p.b, p.c
  FROM paths p JOIN e ON e.src = p.a AND e.dst = p.c
), cyc AS MATERIALIZED (
  SELECT p.a, p.b, p.c
  FROM paths p JOIN e ON e.src = p.c AND e.dst = p.a
  WHERE p.a <= LEAST(p.b, p.c)
), cycCounts AS (
  SELECT node_id, CAST(COUNT(*) AS BIGINT) AS n_cycles FROM (
    SELECT a AS node_id FROM cyc
    UNION ALL SELECT b FROM cyc
    UNION ALL SELECT c FROM cyc
  ) GROUP BY 1
), fflCounts AS (
  SELECT node_id, CAST(SUM(s) AS BIGINT) AS n_ffl_source,
         CAST(SUM(m) AS BIGINT) AS n_ffl_middle,
         CAST(SUM(k) AS BIGINT) AS n_ffl_sink FROM (
    SELECT a AS node_id, 1 AS s, 0 AS m, 0 AS k FROM ffl
    UNION ALL SELECT b, 0, 1, 0 FROM ffl
    UNION ALL SELECT c, 0, 0, 1 FROM ffl
  ) GROUP BY 1
)
SELECT COALESCE(cy.node_id, ff.node_id) AS node_id,
       COALESCE(cy.n_cycles, 0) AS n_cycles,
       COALESCE(ff.n_ffl_source, 0) AS n_ffl_source,
       COALESCE(ff.n_ffl_middle, 0) AS n_ffl_middle,
       COALESCE(ff.n_ffl_sink, 0) AS n_ffl_sink
FROM cycCounts cy FULL OUTER JOIN fflCounts ff
  ON cy.node_id = ff.node_id"""

  /** x69/x71 forward chain: `lb$i$sfx` = per node the MIN label seen
    * within i hops (x48's min-propagation along edge DIRECTION) over
    * edge relation `er`. The final level is MATERIALIZED — the
    * backward chain reads it once per hop and DuckDB inlines per
    * reference.
    */
  private def sccLabCtes(hops: Int, sfx: String = "",
                         er: String = "e"): String =
    (1 to hops).map { i =>
      val mat = if (i == hops) "MATERIALIZED " else ""
      s"""lb$i$sfx AS $mat(
  SELECT node, MIN(lab) AS lab FROM (
    SELECT node, lab FROM lb${i - 1}$sfx
    UNION ALL
    SELECT e.dst AS node, l.lab FROM lb${i - 1}$sfx l
    JOIN $er e ON l.node = e.src
  ) GROUP BY 1
)"""
    }.mkString(", ")

  /** x69/x71 backward chain: flags walk edges BACKWARD from each
    * color root, gated to the root's own color — every level
    * MATERIALIZED (each is referenced by the next level and the
    * final rollup).
    */
  private def sccFlagCtes(hops: Int, sfx: String = "",
                          er: String = "e"): String =
    (1 to hops).map { i =>
      s"""fg$i$sfx AS MATERIALIZED (
  SELECT DISTINCT node, lab FROM (
    SELECT node, lab FROM fg${i - 1}$sfx
    UNION ALL
    SELECT e.src AS node, f.lab
    FROM fg${i - 1}$sfx f
    JOIN $er e ON e.dst = f.node
    JOIN lb$hops$sfx lv ON lv.node = e.src AND lv.lab = f.lab
  )
)"""
    }.mkString(", ")

  /** One full coloring round (the [[sccLabCtes]] forward chain seeded
    * from `nr`, roots, the [[sccFlagCtes]] backward chain) — the CTE
    * twin of `Graph.colorConfirmRound`, shared by x69 (one round over
    * the whole graph) and x71 (one per peel round over the shrinking
    * remainder). Confirmed members land in `fg$hops$sfx`.
    */
  private def sccRoundCtes(hops: Int, sfx: String, nr: String,
                           er: String): String =
    s"""lb0$sfx AS (
  SELECT node, node AS lab FROM $nr
), ${sccLabCtes(hops, sfx, er)},
fg0$sfx AS MATERIALIZED (
  SELECT node, lab FROM lb$hops$sfx WHERE node = lab
), ${sccFlagCtes(hops, sfx, er)}"""

  private val SccHops = 4

  /** x69: bounded strongly connected components — 4 unrolled
    * [[sccLabCtes]] min-label hops, roots seed the flag frame, 4
    * [[sccFlagCtes]] backward-confirmation hops, confirmed members
    * roll up to per-SCC sizes.
    */
  val x69Scc: String = s"""WITH $ChainSeq, $ChainEdges,
${sccRoundCtes(SccHops, "", "nodes", "e")},
sizes AS (
  SELECT lab, CAST(COUNT(*) AS BIGINT) AS scc_size
  FROM fg$SccHops GROUP BY 1
)
SELECT f.node AS node_id, f.lab AS scc_id, s.scc_size
FROM fg$SccHops f JOIN sizes s ON f.lab = s.lab"""

  private val SccPeelRounds = 3

  /** x71: iterative-peel SCC — [[sccRoundCtes]] unrolled once per
    * peel round; between rounds the node frame anti-joins away the
    * round's confirmed members and the edge frame semi-joins to the
    * remainder (both MATERIALIZED — each is referenced 2+ times and
    * DuckDB inlines per reference). Labs are disjoint across rounds
    * (every root confirms itself and is peeled), so sizes group by
    * lab alone, exactly as the Spark side argues.
    */
  val x71SccPeel: String = {
    val rounds = (1 to SccPeelRounds).map { r =>
      val sfx = s"_$r"
      val prelude =
        if (r == 1) s"""n$sfx AS MATERIALIZED (
  SELECT node FROM nodes
), e$sfx AS MATERIALIZED (
  SELECT src, dst FROM e
)"""
        else {
          val p = s"_${r - 1}"
          s"""n$sfx AS MATERIALIZED (
  SELECT n.node FROM n$p n
  LEFT JOIN fg$SccHops$p f ON n.node = f.node
  WHERE f.node IS NULL
), e$sfx AS MATERIALIZED (
  SELECT e.src, e.dst FROM e$p e
  JOIN n$sfx a ON e.src = a.node
  JOIN n$sfx b ON e.dst = b.node
)"""
        }
      s"$prelude,\n${sccRoundCtes(SccHops, sfx, s"n$sfx", s"e$sfx")}"
    }.mkString(",\n")
    val unioned = (1 to SccPeelRounds).map(r =>
      s"SELECT node, lab, CAST($r AS INTEGER) AS peel_round" +
        s" FROM fg${SccHops}_$r").mkString("\n  UNION ALL ")
    s"""WITH $ChainSeq, $ChainEdges,
$rounds,
allf AS MATERIALIZED (
  $unioned
), sizes AS (
  SELECT lab, CAST(COUNT(*) AS BIGINT) AS scc_size
  FROM allf GROUP BY 1
)
SELECT f.node AS node_id, f.lab AS scc_id, s.scc_size, f.peel_round
FROM allf f JOIN sizes s ON f.lab = s.lab"""
  }

  /** One unrolled x66 walk step: walk w at node v takes capped-
    * adjacency rank `hash64("w|s|v") % outdeg + 1` — the shared md5
    * lane replayed move-for-move. MATERIALIZED: each step is
    * referenced by the next step AND the final union, and DuckDB
    * inlines per reference.
    */
  private def walkStepCtes(steps: Int): String =
    (1 to steps).map { s =>
      val h = h64(s"CAST(w.walk_id AS VARCHAR) || '|$s|' || " +
        "CAST(w.node AS VARCHAR)")
      s"""w$s AS MATERIALIZED (
  SELECT w.walk_id, a.dst AS node
  FROM w${s - 1} w JOIN adjc a ON w.node = a.src
   AND a.r = ($h % a.outdeg) + 1
)"""
    }.mkString(", ")

  private val WalkSteps = 4

  /** The x66 walk corpus as a reusable CTE fragment (rank-capped
    * adjacency, every-100th-part seed panel, [[walkStepCtes]] chain,
    * level union as `walks`) — written once, read by x66 (the corpus
    * itself) and x72 (the skip-gram consumer). `walks` MATERIALIZED:
    * x72 self-joins it and DuckDB inlines per reference.
    */
  private def walkCorpusCtes(steps: Int): String = {
    val levels = (0 to steps).map(s =>
      s"""  SELECT walk_id, CAST($s AS BIGINT) AS step, node AS node_id
  FROM w$s""").mkString("\n  UNION ALL\n")
    s"""adj AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) AS r
  FROM e
), adjc AS MATERIALIZED (
  SELECT src, dst, r,
         CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS outdeg
  FROM adj WHERE r <= 64
), w0 AS (
  SELECT DISTINCT p_partkey AS walk_id, p_partkey AS node
  FROM part WHERE p_partkey % 100 = 0
), ${walkStepCtes(steps)},
walks AS MATERIALIZED (
$levels
)"""
  }

  /** x66: deterministic random walks — rank-capped adjacency (cap 64,
    * neighbors ordered by node id), 4 unrolled [[walkStepCtes]] hops
    * from the every-100th-part seed panel, dead ends terminating.
    */
  val x66RandomWalks: String =
    s"""WITH $ChainSeq, $ChainEdges, ${walkCorpusCtes(WalkSteps)}
SELECT walk_id, step, node_id FROM walks"""

  /** x72: skip-gram pair counts over the x66 walk corpus — one
    * self-join of `walks` on walk_id with |step delta| in [1, 2],
    * exact counts per (center, context). The word2vec data step;
    * deterministic because the walks are.
    */
  val x72SkipGramPairs: String =
    s"""WITH $ChainSeq, $ChainEdges, ${walkCorpusCtes(WalkSteps)}
SELECT c.node_id AS center, o.node_id AS context,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM walks c JOIN walks o
  ON c.walk_id = o.walk_id AND o.step <> c.step
 AND abs(o.step - c.step) <= 2
GROUP BY 1, 2"""

  /** The x67 Adamic–Adar chain as a reusable CTE fragment (symmetric
    * support from `srcRel`, exact uncapped degrees, rank-capped pair
    * witnesses, rounded-log DECIMAL(28,9) terms, minCommon gate) —
    * written once, read by x67 (over the full edge set) and x73 (over
    * the holdout-trained remainder).
    */
  private def aaChainCtes(srcRel: String, cap: Int,
                          minCommon: Int): String = s"""und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM $srcRel
    UNION ALL
    SELECT dst AS a, src AS b FROM $srcRel
  ) WHERE a <> b
), deg AS (
  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM und GROUP BY 1
), adjc AS MATERIALIZED (
  SELECT w, n FROM (
    SELECT a AS w, b AS n,
           row_number() OVER (PARTITION BY a ORDER BY b) AS r
    FROM und
  ) WHERE r <= $cap
), cand AS (
  SELECT x.n AS u, y.n AS v, x.w
  FROM adjc x JOIN adjc y ON x.w = y.w AND x.n < y.n
), term AS (
  SELECT u, v,
         CAST(round(1.0 / round(ln(CAST(degree AS DOUBLE)), 9), 9)
              AS DECIMAL(28,9)) AS t
  FROM cand JOIN deg ON cand.w = deg.node
), scored AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         SUM(t) AS aa
  FROM term GROUP BY 1, 2
  HAVING COUNT(*) >= $minCommon
)"""

  /** x67: link prediction — symmetric support, exact degrees, pair
    * witnesses through the rank-capped adjacency (cap 16) only,
    * AA terms as `round(1/round(ln(deg),9),9)` DECIMAL(28,9) sums
    * (the t56 rounded-log discipline), linked pairs excluded, top
    * 100 by (aa DESC, u, v).
    */
  val x67LinkPrediction: String = s"""WITH $ChainSeq, $ChainEdges,
${aaChainCtes("e", 16, 2)}
SELECT u AS node_u, v AS node_v, common_neighbors,
       CAST(aa AS DOUBLE) AS aa_score
FROM scored s
WHERE NOT EXISTS (SELECT 1 FROM und
                  WHERE und.a = s.u AND und.b = s.v)
ORDER BY aa_score DESC, node_u, node_v
LIMIT 100"""

  /** x75: edge reciprocity — distinct edges, one reversed self-join,
    * per-src exact counts and the fixed-point share.
    */
  val x75Reciprocity: String = s"""WITH $ChainSeq, $ChainEdges,
rec AS (
  SELECT a.src, a.dst,
         CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END AS r
  FROM e a LEFT JOIN e b ON b.src = a.dst AND b.dst = a.src
)
SELECT src AS node_id,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(r) AS BIGINT) AS n_reciprocated,
       CAST(SUM(r) AS BIGINT) * 1000000000 // CAST(COUNT(*) AS BIGINT)
         AS reciprocity_e9
FROM rec GROUP BY 1"""

  private val DiamHops = 6

  /** x74: double-sweep diameter estimate — two [[relaxChain]] BFS
    * chains at node grain over the undirected support (every level
    * MATERIALIZED: the final levels feed the argmax, the eccentricity
    * scalar, and the reached count, and DuckDB inlines per
    * reference); the sweep-2 seed is the sweep-1 argmax
    * (dist DESC, node ASC — the Spark min(struct) tie rule).
    */
  val x74Diameter: String = s"""WITH $ChainSeq, $ChainEdges,
und AS MATERIALIZED (
  SELECT src, dst FROM e
  UNION
  SELECT dst AS src, src AS dst FROM e
),
a0 AS (
  SELECT MIN(node) AS node, CAST(0 AS BIGINT) AS dist FROM nodes
), ${relaxChain("a", DiamHops, "und", "1", materialized = true)},
u AS (
  SELECT node, dist FROM a$DiamHops
  ORDER BY dist DESC, node ASC LIMIT 1
),
b0 AS (
  SELECT node, CAST(0 AS BIGINT) AS dist FROM u
), ${relaxChain("b", DiamHops, "und", "1", materialized = true)},
v AS (
  SELECT node, dist FROM b$DiamHops
  ORDER BY dist DESC, node ASC LIMIT 1
)
SELECT (SELECT MIN(node) FROM nodes) AS start_node,
       (SELECT node FROM u) AS sweep1_far_node,
       (SELECT dist FROM u) AS sweep1_ecc,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM a$DiamHops)
         AS sweep1_reached,
       (SELECT node FROM v) AS sweep2_far_node,
       (SELECT dist FROM v) AS sweep2_ecc,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b$DiamHops)
         AS sweep2_reached,
       GREATEST((SELECT dist FROM u), (SELECT dist FROM v))
         AS diameter_lb"""

  /** x73: link-prediction holdout evaluation — the `lph` md5-lane
    * holdout (mod 10) over canonical pairs, the shared [[aaChainCtes]]
    * over the trained remainder (minCommon 1), rank over the top-100
    * report, hit counts against the holdout at k ∈ {10, 50, 100},
    * precision/recall in exact fixed point.
    */
  val x73LinkPredEval: String = {
    val lane = h64("'lph|' || CAST(u AS VARCHAR) || '|' || " +
      "CAST(v AS VARCHAR)")
    s"""WITH $ChainSeq, $ChainEdges,
canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e
), held AS MATERIALIZED (
  SELECT u, v FROM canon WHERE $lane % 10 = 0
), train AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM canon WHERE $lane % 10 <> 0
),
${aaChainCtes("train", 16, 1)},
preds AS MATERIALIZED (
  SELECT u, v,
         row_number() OVER (ORDER BY CAST(aa AS DOUBLE) DESC, u, v)
           AS rank
  FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM und
                    WHERE und.a = s.u AND und.b = s.v)
  ORDER BY CAST(aa AS DOUBLE) DESC, u, v
  LIMIT 100
), hits AS (
  SELECT p.rank,
         CASE WHEN h.u IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM preds p LEFT JOIN held h ON p.u = h.u AND p.v = h.v
), hc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_held FROM held
)
SELECT k, n_hits, n_held,
       n_hits * 1000000 // k AS precision_e6,
       CASE WHEN n_held = 0 THEN NULL
            ELSE n_hits * 1000000 // n_held END AS recall_e6
FROM (
  SELECT ks.k,
         CAST(SUM(CASE WHEN hits.rank <= ks.k THEN hits.hit
                       ELSE 0 END) AS BIGINT) AS n_hits
  FROM hits CROSS JOIN (VALUES (10), (50), (100)) ks(k)
  GROUP BY 1
) CROSS JOIN hc"""
  }

  /** x31: triangles + clustering coefficient. The oracle orients the
    * undirected edge set by plain node id (u < v) and enumerates each
    * triangle once as a < b < c — a DIFFERENT orientation than the
    * Spark side's degree order, which is the point: any total order
    * yields the same triangle set, so count equality cross-checks the
    * algorithm, not the implementation. Counts are exact integers;
    * lcc rides the x20 fixed-point discipline (truncating `//`,
    * HUGEINT products CAST back to BIGINT).
    */
  val x31Triangles: String = s"""WITH $ChainSeq, e AS (
  $ChainArcSel
), und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e
), deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und
  ) GROUP BY 1
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
), pern AS (
  SELECT node, COUNT(*) AS t FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY 1
)
SELECT deg.node, deg.degree,
       COALESCE(pern.t, 0) AS triangles,
       CAST(CASE WHEN deg.degree >= 2
            THEN CAST(COALESCE(pern.t, 0) AS HUGEINT) * 2000000000
                 // (deg.degree * (deg.degree - 1))
            ELSE 0 END AS BIGINT) AS lcc_e9,
       CAST(CAST(CASE WHEN deg.degree >= 2
            THEN CAST(COALESCE(pern.t, 0) AS HUGEINT) * 2000000000
                 // (deg.degree * (deg.degree - 1))
            ELSE 0 END AS BIGINT) AS DOUBLE) / 1000000000.0 AS lcc
FROM deg LEFT JOIN pern ON deg.node = pern.node"""

  /** x21: incremental rollup — the oracle recomputes from scratch;
    * equality proves the state+delta merge timeline exact. DECIMAL
    * sums make both engines' totals order-free.
    */
  val x21IncrementalRollup: String = """SELECT o_orderpriority,
       o_orderstatus,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 6) AS DOUBLE)
         AS sum_o_totalprice,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_o_totalprice,
       COUNT(*) AS n_rows
FROM orders
GROUP BY 1, 2"""

  /** x22: join-size estimate — the t24 KMV twin applied to both key
    * sets and their union; estimates are double ratios of exact ints
    * in the identical operation order, rounded 3/6 dp.
    */
  val x22JoinEstimate: String = """WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
), ha AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 14)) AS BIGINT)
      AS hv
  FROM orders WHERE o_custkey IS NOT NULL
), hb AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 14)) AS BIGINT)
      AS hv
  FROM dim WHERE c_custkey IS NOT NULL
), side_a AS (
  SELECT COUNT(*) AS n_probe, COUNT(DISTINCT o_custkey) AS d_probe_exact
  FROM orders
), side_b AS (
  SELECT COUNT(*) AS n_build, COUNT(DISTINCT c_custkey) AS d_build_exact
  FROM dim
), ka AS (
  SELECT COUNT(*) AS ka, MAX(hv) AS kth_a
  FROM (SELECT hv FROM ha ORDER BY hv LIMIT 256)
), kb AS (
  SELECT COUNT(*) AS kb, MAX(hv) AS kth_b
  FROM (SELECT hv FROM hb ORDER BY hv LIMIT 256)
), u AS (
  SELECT hv, MAX(ia) AS ia, MAX(ib) AS ib
  FROM (SELECT hv, 1 AS ia, 0 AS ib FROM ha
        UNION ALL SELECT hv, 0, 1 FROM hb)
  GROUP BY hv
), ku AS (
  SELECT COUNT(*) AS ku, MAX(hv) AS kth_u, SUM(ia * ib) AS nb
  FROM (SELECT * FROM u ORDER BY hv LIMIT 256)
), je AS (
  SELECT COUNT(*) AS join_exact
  FROM orders JOIN dim ON o_custkey = c_custkey
), est AS (
  SELECT n_probe, n_build, d_probe_exact, d_build_exact,
         round(CASE WHEN ka < 256 THEN CAST(ka AS DOUBLE)
               ELSE CAST(ka - 1 AS DOUBLE)
                    / (CAST(kth_a AS DOUBLE) / 72057594037927936.0) END,
               3) AS d_probe_est,
         round(CASE WHEN kb < 256 THEN CAST(kb AS DOUBLE)
               ELSE CAST(kb - 1 AS DOUBLE)
                    / (CAST(kth_b AS DOUBLE) / 72057594037927936.0) END,
               3) AS d_build_est,
         round(CAST(nb AS DOUBLE) / ku, 6) AS jaccard_est,
         round(CASE WHEN ku < 256 THEN CAST(ku AS DOUBLE)
               ELSE CAST(ku - 1 AS DOUBLE)
                    / (CAST(kth_u AS DOUBLE) / 72057594037927936.0) END,
               3) AS d_union_est,
         join_exact
  FROM side_a CROSS JOIN side_b CROSS JOIN ka CROSS JOIN kb
       CROSS JOIN ku CROSS JOIN je
)
SELECT n_probe, n_build, d_probe_exact, d_build_exact,
       d_probe_est, d_build_est, jaccard_est,
       round(jaccard_est * d_union_est, 3) AS inter_est,
       round(round(jaccard_est * d_union_est, 3)
             * (CAST(n_probe AS DOUBLE) / d_probe_est), 3) AS join_est,
       join_exact
FROM est"""

  /** t55: duplicated spans — same injected corpus, 8-token shingle
    * hashes (the shared 56-bit md5 lane), COUNT > 1 duplicate set,
    * window sweep-merge of overlapping/adjacent covers. Positions are
    * 0-based (`i - 1` off the 1-based generate_series).
    */
  val t55DuplicateSpans: String = s"""WITH c1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text ||
           ' all rights reserved contact us at example dot com for details'
         ELSE text END AS t0
  FROM documents
), c2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 2 THEN t0 || ' ' || array_to_string(
           (string_split(lower(trim(regexp_replace(t0, '\\s+', ' ', 'g'))),
                         ' '))[1:10], ' ')
         ELSE t0 END AS text
  FROM c1
), t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM c2
  WHERE text IS NOT NULL
), pos AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, len(toks) - 7)) AS i
  FROM t WHERE len(toks) >= 8
), sh AS (
  SELECT doc_id, i - 1 AS pos,
         ${h64("array_to_string(toks[i:i+7], ' ')")} AS h
  FROM pos
), dup AS (
  SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1
), cov AS (
  SELECT sh.doc_id, CAST(sh.pos AS BIGINT) AS s,
         CAST(sh.pos + 7 AS BIGINT) AS e
  FROM sh JOIN dup ON sh.h = dup.h
), m AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -2) + 1
         THEN 1 ELSE 0 END AS brk
  FROM cov
), g AS (
  SELECT doc_id, s, e,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS grp
  FROM m
)
SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS span_tokens
FROM g GROUP BY doc_id, grp"""

  /** t46: weighted sample — identical deterministic draw: md5-lane
    * uniform, ln-key at 9 dp, (key DESC, id ASC) cut. The `+ 0.0` on
    * the key canonicalizes negative zero: a key in (-5e-10, 0) rounds
    * to `-0.0` under DuckDB's float round but to `+0.0` under Spark's
    * BigDecimal HALF_UP (which has no signed zero) — the values are
    * equal, the sign bit is not, and the driver's hash sees the sign
    * (the r10 t46 mismatch was exactly one such row). `x + 0.0` is
    * exact for every double and maps -0.0 to +0.0.
    */
  /** The t46/t48 weighted-sampling `keyed` CTE over a caller-chosen
    * projection: the Efraimidis–Spirakis key ln(u)/w, 9 dp, on the
    * md5 uniform lane (+0.0 normalizes -0.0).
    */
  private def wsKeyedCte(cols: String): String = s"""keyed AS (
  SELECT $cols,
         round(ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                        1, 14)) AS BIGINT) + 1)
                  / 72057594037927936.0)
               / CAST(o_totalprice AS DOUBLE), 9) + 0.0 AS sample_key
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
)"""

  val t46WeightedSample: String = s"""WITH ${wsKeyedCte("o_orderkey, o_totalprice")}
SELECT o_orderkey, o_totalprice, sample_key
FROM keyed
ORDER BY sample_key DESC, o_orderkey ASC
LIMIT 100"""

  /** t48: stratified weighted sample — the t46 draw cut per priority
    * class by a `row_number` window (the oracle may shuffle-everything;
    * the Spark side must not — see Sampling.stratifiedWeightedSample).
    * Same `+ 0.0` signed-zero canonicalization as t46.
    */
  val t48StratifiedSample: String = s"""WITH ${wsKeyedCte(
    "o_orderpriority, o_orderkey, o_totalprice")}, ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY sample_key DESC, o_orderkey ASC)
              AS rn
  FROM keyed
)
SELECT o_orderpriority, o_orderkey, o_totalprice, sample_key
FROM ranked WHERE rn <= 20"""

  /** x23: equal-frequency binning — quantile_cont boundaries (the x13
    * agreement), 6-dp rounded, counted with list_filter.
    */
  val x23EqualFreqBins: String = """WITH b AS (
  SELECT list_transform(
           quantile_cont(o_totalprice,
             [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]),
           x -> round(x, 6)) AS bounds
  FROM orders
)
SELECT o_orderkey, o_totalprice,
       CASE WHEN o_totalprice IS NULL THEN NULL
            ELSE len(list_filter(b.bounds, x -> o_totalprice >= x)) END
         AS bin
FROM orders CROSS JOIN b"""

  /** x24: z-score standardization — DECIMAL(18,6) moment sums (the
    * square stays in-precision under both engines' rules), pinned
    * double arithmetic, 6-dp mean/std/score.
    */
  val x24ZscoreEvents: String = """WITH m AS (
  SELECT event_type,
         COUNT(value) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
           AS ss
  FROM events GROUP BY 1
), stats AS (
  SELECT event_type,
         round(CAST(s AS DOUBLE) / n, 6) AS mean,
         round(sqrt(greatest(round((CAST(ss AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                      / n)
                                   / n, 6), 0)), 6) AS std
  FROM m
)
SELECT event_id, events.event_type, value,
       CASE WHEN std > 0 THEN round((value - mean) / std, 6) END AS zscore
FROM events JOIN stats ON events.event_type = stats.event_type"""

  /** t47: source entropy — 9-dp `-p·ln p` terms (t25 grain),
    * DECIMAL(28,9) order-free sum, 9-dp normalizer. `n_tokens` is
    * CAST to BIGINT because DuckDB's SUM(BIGINT) widens to HUGEINT,
    * which the driver's fetch renders as a float — the r10 hash
    * mismatch was the type, not the values (see x20).
    */
  val t47SourceEntropy: String = s"""WITH t AS (
  SELECT doc_id, source, string_split($Norm, ' ') AS toks FROM documents
), ex AS (
  SELECT source, unnest(toks) AS tok FROM t
), counts AS (
  SELECT source, tok, COUNT(*) AS c FROM ex GROUP BY 1, 2
), totals AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct_tokens
  FROM counts GROUP BY 1
), terms AS (
  SELECT counts.source,
         round(-(c / n_tokens) * ln(c / n_tokens), 9) AS h
  FROM counts JOIN totals ON counts.source = totals.source
), hs AS (
  SELECT source, SUM(CAST(h AS DECIMAL(28,9))) AS hsum
  FROM terms GROUP BY 1
)
SELECT totals.source, n_tokens, n_distinct_tokens,
       CAST(hsum AS DOUBLE) AS entropy,
       CASE WHEN n_distinct_tokens > 1
            THEN round(CAST(hsum AS DOUBLE)
                       / round(ln(n_distinct_tokens), 9), 6)
            ELSE CAST(0 AS DOUBLE) END AS norm_entropy
FROM hs JOIN totals ON hs.source = totals.source"""

  /** t49: repeated n-gram spans — the near-dup corpus (NearDupCtes'
    * construction, text pre-normalized so a bare string_split matches
    * Spark's tokens), 5-token windows hashed with the shared md5 lane,
    * per-doc occurrence counts joined to corpus document frequency.
    * Aggregate outputs CAST to BIGINT (HUGEINT discipline, see x20).
    */
  val t49RepeatedNgrams: String = s"""WITH ${nearDupCorpusCtes()}, t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
), w AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 5
           THEN list_transform(generate_series(1, len(toks) - 4),
                  i -> ${h64("array_to_string(toks[i:i+4], ' ')")})
           ELSE CAST([] AS BIGINT[]) END AS gs
  FROM t
), ex AS (
  SELECT doc_id, unnest(gs) AS g FROM w
), pairs AS (
  SELECT doc_id, g, COUNT(*) AS c FROM ex GROUP BY 1, 2
), dfg AS (
  SELECT g, COUNT(*) AS n_docs FROM pairs GROUP BY 1
), rep AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_repeated
  FROM pairs JOIN dfg USING (g) WHERE n_docs >= 2 GROUP BY 1
), b2 AS (
  SELECT doc_id,
         CAST(greatest(COALESCE(len(toks) - 4, 0), 0) AS BIGINT)
           AS n_windows
  FROM t
)
SELECT b2.doc_id, n_windows,
       COALESCE(n_repeated, 0) AS n_repeated,
       CASE WHEN n_windows > 0
            THEN round(CAST(COALESCE(n_repeated, 0) AS DOUBLE)
                       / CAST(n_windows AS DOUBLE), 6) END AS repeated_frac
FROM b2 LEFT JOIN rep ON b2.doc_id = rep.doc_id"""

  /** x26: robust outliers — exact interpolated medians (the x13
    * agreement) twice, pinned double chain.
    */
  val x26RobustOutliers: String = """WITH med AS (
  SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.5), 6) AS m
  FROM orders GROUP BY 1
), dev AS (
  SELECT o_orderkey, orders.o_orderpriority, o_totalprice, m,
         abs(o_totalprice - m) AS d
  FROM orders JOIN med ON orders.o_orderpriority = med.o_orderpriority
), mad AS (
  SELECT o_orderpriority, round(quantile_cont(d, 0.5), 6) AS mad
  FROM dev GROUP BY 1
)
SELECT o_orderkey, dev.o_orderpriority, o_totalprice,
       CASE WHEN mad > 0
            THEN round((o_totalprice - m) / (1.4826 * mad), 6) END
         AS robust_z,
       COALESCE(CASE WHEN mad > 0
                     THEN abs(round((o_totalprice - m) / (1.4826 * mad), 6))
                          > 3.5 END, false) AS is_outlier
FROM dev JOIN mad ON dev.o_orderpriority = mad.o_orderpriority"""

  /** x28: per-group Pearson r from DECIMAL moment sums — never the
    * engines' running-double `corr` aggregates, which are shuffle-
    * order-dependent and disagree in the last digits.
    */
  /** The moment→double staging shared by the Pearson twins (x28,
    * x57): cast the exact DECIMAL moments of a keyed [[momentsCte]]
    * frame to the doubles the correlation divides.
    */
  private def momentDoubles(src: String, carry: String): String =
    s"""SELECT $carry,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM $src"""

  /** Pearson r over a [[momentDoubles]] frame — guards both
    * variances, divides by the sqrt product (≡ the Spark side's
    * `Features.pearson`), one 6-dp round. A `def`, not a `val`:
    * oracle vals earlier in the file interpolate it during object
    * init, and a val would still be null there (x59 caught this).
    */
  private def PearsonExpr: String =
    """CASE WHEN nd * sxxd - sxd * sxd > 0
            AND nd * syyd - syd * syd > 0
       THEN round((nd * sxyd - sxd * syd)
                  / (sqrt(nd * sxxd - sxd * sxd)
                     * sqrt(nd * syyd - syd * syd)), 6)
       END"""

  val x28PriceDelayCorr: String = s"""WITH fs AS (
  SELECT l_orderkey, MIN(l_shipdate) AS ship FROM lineitem GROUP BY 1
), j AS (
  SELECT o_orderpriority,
         o_totalprice AS x,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(ship AS DATE)) AS DOUBLE) AS y
  FROM orders JOIN fs ON o_orderkey = l_orderkey
  WHERE o_totalprice IS NOT NULL
), m AS (
  ${momentsCte("j", Seq("o_orderpriority"), "n", "DECIMAL(18,6)")}
), s AS (
  ${momentDoubles("m", "o_orderpriority, n")}
)
SELECT o_orderpriority, n, $PearsonExpr AS pearson_r
FROM s"""

  /** x57: seasonality autocorrelation — the shared x53 daily collapse
    * (value_micro exact longs, then ONE deterministic /1e6 double),
    * per-series calendar-lag self-joins at lags 1 and 7, Pearson via
    * the shared moment device. Missing days drop the pair (calendar
    * lag, not row lag).
    */
  private def lagCorrCtes(lag: Int): String = s"""pl$lag AS (
  SELECT a.series, a.v AS x, b.v AS y
  FROM daily a JOIN daily b
    ON a.series = b.series AND b.day + $lag = a.day
), m$lag AS (
  ${momentsCte(s"pl$lag", Seq("series"), "n", "DECIMAL(18,6)")}
), s$lag AS (
  ${momentDoubles(s"m$lag", "series, CAST(n AS BIGINT) AS n_pairs")}
)"""

  val x57Autocorrelation: String = s"""WITH daily0 AS (
  $guardedDailySql
), daily AS (
  SELECT series, day,
         CAST(value_micro AS DOUBLE) / 1000000.0 AS v
  FROM daily0
), ${lagCorrCtes(1)}, ${lagCorrCtes(7)}
SELECT series, CAST(1 AS BIGINT) AS lag, n_pairs,
       $PearsonExpr AS autocorr
FROM s1
UNION ALL
SELECT series, CAST(7 AS BIGINT) AS lag, n_pairs,
       $PearsonExpr AS autocorr
FROM s7"""

  /** x29: per-group mode — (count DESC, value ASC NULLS LAST) rank
    * pins the tie deterministically in both engines.
    */
  val x29ModalHour: String = """WITH c AS (
  SELECT event_type, CAST(hour(ts) AS VARCHAR) AS v, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, SUM(n) AS total FROM c GROUP BY 1
), r AS (
  SELECT event_type, v, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, v ASC NULLS LAST) AS rn
  FROM c
)
SELECT r.event_type, v AS mode_value, n AS n_mode,
       round(CAST(n AS DOUBLE) / total, 6) AS mode_share
FROM r JOIN t ON r.event_type = t.event_type
WHERE rn = 1"""

  /** v5: k-anonymity — exact class sizes, post-aggregate HAVING. */
  val v5KAnonymity: String = """SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS class_size
FROM customer
GROUP BY 1, 2
HAVING COUNT(*) < 10"""

  /** x13: exact interpolated quantiles — both engines place the
    * quantile at p*(n-1) over the sorted group and interpolate
    * lower + (upper-lower)*frac on identical doubles; round 6 dp.
    */
  val x13PriceQuantiles: String = """WITH q AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9]) AS qv
  FROM orders GROUP BY 1
)
SELECT o_orderpriority,
       unnest(CAST([0.25, 0.5, 0.75, 0.9] AS DOUBLE[])) AS quantile,
       round(unnest(qv), 6) AS value
FROM q"""

  /** x11: floor-binned fixed-width histogram — floor on IEEE doubles
    * is bit-exact cross-engine, so bins and counts match exactly.
    */
  val x11PriceHistogram: String = """WITH b AS (
  SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT)
           AS bin,
         COUNT(*) AS n
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
)
SELECT bin, round(CAST(bin AS DOUBLE) * 25000.0, 6) AS bin_lo,
       n, round(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS frac
FROM b"""

  /** One v1 profile row: exact counts; numeric min/max + DECIMAL-exact
    * mean rounded to 6 dp (null for non-numeric columns).
    */
  private def profileRow(c: String, numeric: Boolean): String = {
    val (mn, mx, mean) =
      if (numeric) (
        s"round(MIN(CAST($c AS DOUBLE)), 6)",
        s"round(MAX(CAST($c AS DOUBLE)), 6)",
        s"round(CAST(SUM(CAST($c AS DECIMAL(38,18))) AS DOUBLE) / COUNT($c), 6)")
      else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        "CAST(NULL AS DOUBLE)")
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT($c) AS n_null,
       round(CAST(COUNT(*) - COUNT($c) AS DOUBLE) / COUNT(*), 6) AS null_frac,
       COUNT(DISTINCT $c) AS n_distinct,
       $mn AS min_num, $mx AS max_num, $mean AS mean_num
  FROM orders"""
  }

  val v1ColumnProfile: String = Seq(
    "o_orderkey" -> true, "o_custkey" -> true, "o_orderstatus" -> false,
    "o_totalprice" -> true, "o_orderdate" -> false,
    "o_orderpriority" -> false)
    .map { case (c, num) => profileRow(c, num) }.mkString("\nUNION ALL\n")

  /** One v2 verdict: orphans via NOT EXISTS (anti-join semantics — a
    * duplicate parent key must not double-count the child).
    */
  private def fkRow(name: String, child: String, ck: String,
                    parent: String, pk: String): String =
    s"""SELECT '$name' AS "constraint",
       (SELECT COUNT(*) FROM $child) AS n_child,
       (SELECT COUNT(*) FROM $child c
         WHERE c.$ck IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))
         AS n_orphans,
       (SELECT COUNT(*) FROM $child c
         WHERE c.$ck IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck)) = 0
         AS ok"""

  val v2RefIntegrity: String = Seq(
    ("lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("embeddings_vec_id", "embeddings", "vec_id", "documents", "doc_id"))
    .map { case (n, c, ck, p, pk) => fkRow(n, c, ck, p, pk) }
    .mkString("\nUNION ALL\n")

  /** One v4 verdict: duplicate groups over non-null keys (SQL UNIQUE
    * ignores null keys — they are reported, not folded into a group).
    */
  private def pkRow(name: String, table: String, keys: Seq[String]): String = {
    val nonNull = keys.map(k => s"$k IS NOT NULL").mkString(" AND ")
    val anyNull = keys.map(k => s"$k IS NULL").mkString(" OR ")
    val dupGroups =
      s"""(SELECT COUNT(*) AS c FROM $table WHERE $nonNull
          GROUP BY ${keys.mkString(", ")} HAVING COUNT(*) > 1)"""
    s"""SELECT '$name' AS check_name,
       (SELECT COUNT(*) FROM $table) AS n_rows,
       (SELECT COUNT(*) FROM $table WHERE $anyNull) AS n_null_keys,
       (SELECT COUNT(*) FROM $dupGroups t) AS n_dup_keys,
       COALESCE((SELECT CAST(SUM(c) AS BIGINT) FROM $dupGroups t), 0)
         AS n_dup_rows,
       (SELECT COUNT(*) FROM $dupGroups t) = 0 AS ok"""
  }

  val v4KeyUniqueness: String = Seq(
    ("orders_pk", "orders", Seq("o_orderkey")),
    ("customer_pk", "customer", Seq("c_custkey")),
    ("lineitem_pk", "lineitem", Seq("l_orderkey", "l_linenumber")),
    ("documents_pk", "documents", Seq("doc_id")),
    ("events_pk", "events", Seq("event_id")))
    .map { case (n, t, ks) => pkRow(n, t, ks) }.mkString("\nUNION ALL\n")

  /** v3: violation predicates mirror the Spark null-safe form
    * (`COALESCE(NOT pred, TRUE)` — a NULL measure violates its range
    * check). DuckDB SUM(int) is HUGEINT, hence the BIGINT casts.
    */
  val v3ConstraintAudit: String = {
    val checks = Seq(
      "qty_positive" -> "COALESCE(NOT(l_quantity > 0), TRUE)",
      "discount_in_unit" ->
        "COALESCE(NOT(l_discount >= 0 AND l_discount <= 1), TRUE)",
      "tax_nonneg" -> "COALESCE(NOT(l_tax >= 0), TRUE)",
      "price_positive" -> "COALESCE(NOT(l_extendedprice > 0), TRUE)",
      "linenumber_positive" -> "COALESCE(NOT(l_linenumber >= 1), TRUE)",
      "shipdate_present" -> "l_shipdate IS NULL")
    val sums = checks.map { case (n, p) =>
      s"SUM(CASE WHEN $p THEN 1 ELSE 0 END) AS v_$n"
    }.mkString(",\n         ")
    val rows = checks.map { case (n, _) =>
      s"""SELECT '$n' AS "constraint", n AS n_rows,
       CAST(v_$n AS BIGINT) AS n_violations,
       round(CAST(v_$n AS DOUBLE) / n, 6) AS violation_frac,
       v_$n = 0 AS ok FROM a"""
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (
  SELECT COUNT(*) AS n,
         $sums
  FROM lineitem
)
$rows"""
  }

  val s2EmbeddingNearDups: String = s"""WITH ${VCte}, ${NearDupVecCorpusCte}, n AS (
  SELECT vec_id, e, sqrt(${dotExpr("e", "e")}) AS nm FROM corpus
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(CASE WHEN a.nm * b.nm > 0
               THEN ${dotExpr("a.e", "b.e")} / (a.nm * b.nm) END, 6) AS cosine
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.97"""

  /** Deterministic hyperplane component for (plane p, 0-based dim i):
    * hash-derived uniform in [-0.5, 0.5). DuckDB list lambdas index
    * 1-based, so the twin hashes `i - 1` to match Spark's 0-based
    * `transform` index (see `Similarity.planeComponent`).
    */
  private def planeComp(p: Int): String =
    s"(CAST(${h64(s"'plane$p|' || CAST(i - 1 AS VARCHAR)")} % 10000 " +
      "AS DOUBLE) / 10000.0 - 0.5)"

  /** Sign bit of plane `p`'s projection, weighted 2^p — summed into the
    * 16-bit sign-LSH bucket id. The projection folds left-to-right
    * (`list_aggregate`), bit-identical to Spark's `aggregate` fold.
    */
  private def bucketExpr(e: String, nPlanes: Int): String =
    (0 until nPlanes).map { p =>
      s"""CASE WHEN list_aggregate(list_transform($e,
         (x, i) -> x * ${planeComp(p)}), 'sum') >= 0
         THEN ${1L << p} ELSE 0 END"""
    }.mkString(" + ")

  /** The s4 CTE chain (injected near-dup corpus → sign-LSH buckets →
    * in-bucket cosine pairs) — shared by s4 and the d11 closure.
    */
  private val s4Ctes: String = s"""WITH ${VCte}, ${NearDupVecCorpusCte}, n AS (
  SELECT vec_id, e, sqrt(${dotExpr("e", "e")}) AS nm,
         ${bucketExpr("e", 16)} AS bucket
  FROM corpus
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(CASE WHEN a.nm * b.nm > 0
               THEN ${dotExpr("a.e", "b.e")} / (a.nm * b.nm) END, 6) AS cosine
  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)"""

  val s4LshNearDups: String = s4Ctes + """
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.97"""

  /** d11: SemDeDup-style embedding-cluster dedup — s4's verified pairs
    * as edges, transitive closure via the same recursive reach-set CTE
    * the d5 text clusters use (component rep = min reachable id).
    */
  val d11SemanticClusters: String =
    s4Ctes.replaceFirst("WITH ", "WITH RECURSIVE ") + """, edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE cosine >= 0.97
  UNION ALL
  SELECT id_b, id_a FROM pairs WHERE cosine >= 0.97
), reach AS (
  SELECT vec_id AS src, vec_id AS dst FROM corpus
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), clusters AS (
  SELECT src AS vec_id, MIN(dst) AS cluster_rep,
         src = MIN(dst) AS is_keeper
  FROM reach GROUP BY src
)
SELECT vec_id, cluster_rep, is_keeper FROM clusters"""

  /** s6: incremental embedding dedup — batch (vec_id % 3 != 0) vs
    * corpus (% 3 == 0) over the injected near-dup vector set; candidates
    * share a sign-LSH bucket, verified at cosine ≥ 0.97.
    */
  val s6IncrementalEmbeddingDedup: String = s4Ctes + """, b AS (
  SELECT * FROM n WHERE vec_id % 3 <> 0
), c AS (
  SELECT * FROM n WHERE vec_id % 3 = 0
), scored AS (
  SELECT b.vec_id, c.vec_id AS cid,
         round(CASE WHEN b.nm * c.nm > 0
               THEN """ + dotExpr("b.e", "c.e") + """ / (b.nm * c.nm)
               END, 6) AS cosine
  FROM b LEFT JOIN c ON b.bucket = c.bucket
)
SELECT vec_id,
       CASE WHEN max(CASE WHEN cosine >= 0.97 THEN cosine END) IS NOT NULL
            THEN 'near_dup' ELSE 'unique' END AS status,
       count(cid) AS n_candidates,
       max(CASE WHEN cosine >= 0.97 THEN cosine END) AS best_cosine
FROM scored GROUP BY vec_id"""

  /** s7: per-language centroid-distance outliers. Centroids and the
    * per-language moments run in DECIMAL (exact, order-free) and every
    * double derived from them (mean, variance, z) repeats the Spark
    * side's operation order exactly — IEEE arithmetic on identical
    * inputs is identical, so the 4 dp z-scores hash-compare.
    */
  val s7EmbeddingOutliers: String = s"""WITH j AS (
  SELECT e.vec_id, d.lang, CAST(e.embedding AS DOUBLE[]) AS emb
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
), ex AS (
  SELECT lang,
         unnest(generate_series(0, len(emb) - 1)) AS dim,
         unnest(emb) AS x
  FROM j
), cent AS (
  SELECT lang, dim,
         round(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6)
           AS c
  FROM ex GROUP BY 1, 2
), cv AS (
  SELECT lang, list(c ORDER BY dim) AS cvec FROM cent GROUP BY 1
), scored AS (
  SELECT j.vec_id, j.lang,
         round(CASE WHEN sqrt(${dotExpr("j.emb", "j.emb")})
                         * sqrt(${dotExpr("cv.cvec", "cv.cvec")}) > 0
               THEN ${dotExpr("j.emb", "cv.cvec")}
                    / (sqrt(${dotExpr("j.emb", "j.emb")})
                       * sqrt(${dotExpr("cv.cvec", "cv.cvec")}))
               END, 6) AS cos_centroid
  FROM j JOIN cv USING (lang)
), stats AS (
  SELECT lang, COUNT(*) AS n,
         SUM(CAST(cos_centroid AS DECIMAL(38,18))) AS s1,
         SUM(CAST(cos_centroid * cos_centroid AS DECIMAL(38,18))) AS s2
  FROM scored GROUP BY 1
), zs AS (
  SELECT s.vec_id, s.lang, s.cos_centroid,
         CASE WHEN st.n > 1 AND sqrt(greatest(
                (CAST(st.s2 AS DOUBLE) / st.n
                 - (CAST(st.s1 AS DOUBLE) / st.n)
                   * (CAST(st.s1 AS DOUBLE) / st.n))
                * st.n / (st.n - 1.0), 0.0)) > 0
              THEN round((s.cos_centroid - CAST(st.s1 AS DOUBLE) / st.n)
                   / sqrt(greatest(
                       (CAST(st.s2 AS DOUBLE) / st.n
                        - (CAST(st.s1 AS DOUBLE) / st.n)
                          * (CAST(st.s1 AS DOUBLE) / st.n))
                       * st.n / (st.n - 1.0), 0.0)), 4)
         END AS z_score
  FROM scored s JOIN stats st USING (lang)
)
SELECT vec_id, lang, cos_centroid, z_score,
       COALESCE(z_score <= -2.0, FALSE) AS is_outlier
FROM zs"""

  /** s5: per-vector symmetric int8 quantization in long form. floor of
    * the shifted ratio (not round()) — the engines disagree on banker's
    * rounding; floor on IEEE doubles is bit-exact.
    */
  val s5QuantizedVectors: String = """WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings
), u AS (
  SELECT vec_id, mx,
         unnest(list_transform(embedding,
           (x, i) -> {'di': i - 1,
                      'q': CASE WHEN mx > 0
                           THEN CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx
                                           + 0.5) AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END})) AS s
  FROM m
)
SELECT vec_id, CAST(s.di AS BIGINT) AS dim_idx, s.q AS q,
       round(mx / 127.0, 6) AS scale
FROM u"""

  val t9TrainTestSplit: String = s"""WITH b AS (
  SELECT lang, ${h64(Norm)} % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs
FROM b GROUP BY 1, 2"""

  val t8NfcFingerprints: String = """
SELECT doc_id,
       md5(nfc_normalize(text)) AS nfc_md5,
       CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_nfc
FROM documents"""

  val t7WinnowingSketch: String = s"""WITH t AS (
  SELECT doc_id, $Norm AS ntext FROM documents
)
SELECT doc_id,
       array_to_string(
         (list_sort(list_transform(
            generate_series(1, greatest(length(ntext) - 7, 1)),
            i -> ${h64("substr(ntext, CAST(i AS INTEGER), 8)")})))[1:8],
         ',') AS sketch
FROM t"""

  /** x1's oracle is the UNSALTED aggregate — the salted two-stage form
    * must be indistinguishable from a plain groupBy.
    */
  // DECIMAL sum on both sides: exact, associative — immune to the
  // two-stage-vs-one-stage float summation-order drift.
  val x1SaltedRevenue: String = graft.queries.OracleSql.EnrichedCte + """
SELECT fin_month_label,
       CAST(ROUND(SUM(CAST(total_line_price AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS revenue
FROM enriched GROUP BY 1"""

  /** x6/x7 share the region list with the Spark pivot (no drift). */
  private val PivotRegions: Seq[String] =
    graft.queries.BiQueries.RegionPivotValues

  val x6PivotRegions: String = graft.queries.OracleSql.EnrichedCte + s"""
SELECT fin_month_label,
       ${PivotRegions.map(r =>
        s"ROUND(SUM(CASE WHEN region_desc = '$r' THEN total_line_price END), 2)" +
          s" AS ${r.toLowerCase.replace(' ', '_')}").mkString(",\n       ")}
FROM enriched GROUP BY 1"""

  val x7UnpivotRegions: String = graft.queries.OracleSql.EnrichedCte + s"""
SELECT fin_month_label,
       lower(replace(region_desc, ' ', '_')) AS region_key,
       ROUND(SUM(total_line_price), 2) AS revenue
FROM enriched
WHERE region_desc IN (${PivotRegions.map(r => s"'$r'").mkString(", ")})
GROUP BY 1, 2
HAVING SUM(total_line_price) IS NOT NULL"""

  val t10CharPercentiles: String = """
SELECT lang, COUNT(*) AS n_docs,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.5), 6) AS p50,
       round(quantile_cont(n_chars, 0.75), 6) AS p75,
       round(quantile_cont(n_chars, 0.9), 6) AS p90
FROM documents GROUP BY 1"""

  val t11DocChunks: String = """WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 50, 1), 150))
           AS chunk_start
  FROM documents
)
SELECT doc_id, CAST(chunk_start AS BIGINT) AS chunk_start,
       CAST(length(substr(text, CAST(chunk_start AS INTEGER), 200)) AS BIGINT)
         AS chunk_len,
       md5(substr(text, CAST(chunk_start AS INTEGER), 200)) AS chunk_md5
FROM s"""

  val t12SequencePacking: String = s"""WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split($Norm, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT lang,
       CAST(FLOOR((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc
FROM c GROUP BY 1, 2"""

  val d8Decontamination: String = s"""WITH t AS (
  SELECT doc_id, ${sh3(s"string_split($Norm, ' ')", Norm)} AS sh
  FROM documents
), ex AS (
  SELECT doc_id, unnest(list_distinct(sh)) AS s FROM t WHERE doc_id % 31 <> 0
), exh AS (
  SELECT doc_id, ${h64("s")} AS shash FROM ex
), bench AS (
  SELECT DISTINCT ${h64("s")} AS shash
  FROM (SELECT unnest(list_distinct(sh)) AS s FROM t WHERE doc_id % 31 = 0)
)
SELECT e.doc_id,
       COUNT(*) AS n_shingles,
       CAST(COALESCE(SUM(CASE WHEN b.shash IS NOT NULL THEN 1 END), 0)
            AS BIGINT) AS n_contaminated,
       round(CAST(COALESCE(SUM(CASE WHEN b.shash IS NOT NULL THEN 1 END), 0)
                  AS DOUBLE) / COUNT(*), 6) AS contamination_ratio
FROM exh e LEFT JOIN bench b ON e.shash = b.shash
GROUP BY 1"""

  /** t69: long-n-gram decontamination — the GPT-3/PaLM 13-gram
    * verdict over d8's benchmark split plus injected quoting docs
    * (+500000, benchmark text behind a 3-token preamble). Same
    * distinct-gram-hash join as d8; `is_contaminated` compares exact
    * longs, `hit_share` is d8's proven round-6dp ratio.
    */
  val t69NgramDecontamination: String = s"""WITH base AS (
  SELECT doc_id, text FROM documents
), corpus AS (
  SELECT doc_id, text FROM base WHERE doc_id % 31 <> 0
  UNION ALL
  SELECT doc_id + 500000, 'regarding the benchmark: ' || text
  FROM base WHERE doc_id % 62 = 0
), ct AS (
  SELECT doc_id, ${shN(s"string_split($Norm, ' ')", Norm, 13)} AS sh
  FROM corpus
), ex AS (
  SELECT doc_id, unnest(list_distinct(sh)) AS s FROM ct
), exh AS (
  SELECT doc_id, ${h64("s")} AS gh FROM ex
), bt AS (
  SELECT doc_id, ${shN(s"string_split($Norm, ' ')", Norm, 13)} AS sh
  FROM base WHERE doc_id % 31 = 0
), bench AS (
  SELECT DISTINCT ${h64("s")} AS gh
  FROM (SELECT unnest(list_distinct(sh)) AS s FROM bt)
)
SELECT e.doc_id,
       COUNT(*) AS n_ngrams,
       CAST(COALESCE(SUM(CASE WHEN b.gh IS NOT NULL THEN 1 END), 0)
            AS BIGINT) AS n_hit,
       round(CAST(COALESCE(SUM(CASE WHEN b.gh IS NOT NULL THEN 1 END), 0)
                  AS DOUBLE) / COUNT(*), 6) AS hit_share,
       COALESCE(SUM(CASE WHEN b.gh IS NOT NULL THEN 1 END), 0) >= 1
         AS is_contaminated
FROM exh e LEFT JOIN bench b ON e.gh = b.gh
GROUP BY 1"""

  /** t23: contamination-aware split — d8's per-doc benchmark-overlap
    * profile composed with t9's content-hash buckets; ≥ 20% overlap
    * (on the ROUNDED ratio both dialects emit) quarantines the doc.
    */
  // the contamination profile is d8's chain verbatim, embedded as a
  // derived table (the t58 pattern) — ONE definition of "contaminated"
  val t23ContaminationSplit: String = s"""WITH t AS (
  SELECT doc_id, ${h64(Norm)} % 100 AS bucket FROM documents
), prof AS (
  SELECT doc_id, contamination_ratio AS cr FROM ($d8Decontamination) d8p
)
SELECT t.doc_id,
       CASE WHEN p.cr >= 0.2 THEN 'quarantine'
            WHEN t.bucket < 80 THEN 'train'
            WHEN t.bucket < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM t JOIN prof p ON t.doc_id = p.doc_id
WHERE t.doc_id % 31 <> 0"""

  /** t24: KMV distinct-token cardinality per language — bottom-256 of
    * the shared 56-bit token hashes; estimator (k-1)/U with U = kth
    * minimum as a fraction of the 2^56 hash space. The estimate is
    * deterministic cross-engine (same hashes, same IEEE int→double
    * conversion and division), so it hash-compares exactly — unlike an
    * HLL-based approx_count_distinct, which is engine-private.
    */
  val t24KmvCardinality: String = ToksCte + """, ex AS (
  SELECT lang, unnest(toks) AS tok FROM t
), h AS (
  SELECT DISTINCT lang, CAST(('0x' || substr(md5(tok), 1, 14)) AS BIGINT)
    AS hv
  FROM ex
), mins AS (
  SELECT lang, hv,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rn
  FROM h
), kth AS (
  SELECT lang, MAX(hv) AS kth, COUNT(*) AS k_used
  FROM mins WHERE rn <= 256 GROUP BY 1
), exact AS (
  SELECT lang, COUNT(*) AS n_exact FROM h GROUP BY 1
), est AS (
  SELECT lang, k_used, n_exact,
         round(CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
               ELSE CAST(k_used - 1 AS DOUBLE)
                    / (CAST(kth AS DOUBLE) / 72057594037927936.0) END,
               3) AS est_distinct
  FROM kth JOIN exact USING (lang)
)
SELECT lang, k_used, n_exact, est_distinct,
       round((est_distinct - CAST(n_exact AS DOUBLE))
             / CAST(n_exact AS DOUBLE), 6) AS rel_err
FROM est"""

  /** t25: corpus-unigram-LM document scoring. Log-probs round to 9 dp
    * (libm ln agrees cross-engine at that grain) and the per-doc total
    * runs in DECIMAL — rounded-double → DECIMAL(28,9) recovers the
    * exact 9 dp value, and decimal × small-int count and decimal
    * addition are exact in both engines.
    */
  /** The t25 unigram-LM chain: token counts → vocabulary → 9-dp ln
    * probabilities (CTEs `ex`..`lm`). Shared verbatim by t25's per-doc
    * readout and t62's bucket rollup.
    */
  private val UnigramLmCtes: String = ToksCte + """, ex AS (
  SELECT doc_id, unnest(toks) AS token FROM t
), dtf AS (
  SELECT doc_id, token, COUNT(*) AS cnt_d FROM ex GROUP BY 1, 2
), vocab AS (
  SELECT token, SUM(cnt_d) AS cnt FROM dtf GROUP BY 1
), tot AS (
  SELECT SUM(cnt) AS n_total FROM vocab
), lm AS (
  SELECT token,
         round(ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE)), 9) AS lp
  FROM vocab CROSS JOIN tot
)"""

  val t25UnigramLogprob: String = UnigramLmCtes + """
SELECT doc_id,
       CAST(SUM(cnt_d) AS BIGINT) AS n_tokens,
       round(CAST(SUM(CAST(lp AS DECIMAL(28,9))
                      * CAST(cnt_d AS DECIMAL(9,0))) AS DOUBLE)
             / CAST(SUM(cnt_d) AS DOUBLE), 6) AS avg_logprob,
       MIN(lp) AS min_logprob
FROM dtf JOIN lm USING (token)
GROUP BY 1"""

  /** t26: temperature-based (α = 0.5) domain resampling plan. sqrt is
    * IEEE-exact cross-engine (libm pow is not), the weight normalizer
    * sums 9 dp weights in DECIMAL, and the rate formula repeats the
    * Spark side's operation order.
    */
  val t26TemperatureResample: String = s"""WITH perdoc AS (
  SELECT doc_id, source,
         CAST(len(string_split($Norm, ' ')) AS BIGINT) AS m,
         CAST(${h64(Norm)} % 1000000 AS DOUBLE) / 1000000.0 AS u
  FROM documents
), bysrc AS (
  SELECT source, COUNT(*) AS n_total, SUM(m) AS mass_tokens
  FROM perdoc GROUP BY 1
), tot AS (
  SELECT SUM(mass_tokens) AS tot FROM bysrc
), withw AS (
  SELECT source, n_total, mass_tokens,
         CAST(mass_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS p,
         round(sqrt(CAST(mass_tokens AS DOUBLE) / CAST(tot AS DOUBLE)), 9)
           AS w,
         tot
  FROM bysrc CROSS JOIN tot
), nrm AS (
  SELECT SUM(CAST(w AS DECIMAL(28,9))) AS nw FROM withw
), rates AS (
  SELECT source, n_total, mass_tokens, p, w,
         round(least(1.0, (${TextAnalysis.TempTargetFrac}
                          * CAST(tot AS DOUBLE))
                    * (w / CAST(nw AS DOUBLE))
                    / CAST(mass_tokens AS DOUBLE)), 6) AS rate
  FROM withw CROSS JOIN nrm
)
SELECT r.source,
       CAST(r.n_total AS BIGINT) AS n_total,
       CAST(r.mass_tokens AS BIGINT) AS mass_tokens,
       round(r.p * 100, 4) AS mix_pct,
       r.w AS weight,
       r.rate AS rate,
       CAST(SUM(CASE WHEN d.u < r.rate THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN d.u < r.rate THEN d.m ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(SUM(CASE WHEN d.u < ${TextAnalysis.TempTargetFrac}
                 THEN 1 ELSE 0 END) AS BIGINT) AS naive_n_kept,
       CAST(SUM(CASE WHEN d.u < ${TextAnalysis.TempTargetFrac}
                 THEN d.m ELSE 0 END) AS BIGINT) AS naive_kept_tokens
FROM perdoc d JOIN rates r USING (source)
GROUP BY 1, 2, 3, 4, 5, 6"""

  /** t27: Count-Min-sketch heavy hitters — the seeded cell hashes are
    * md5-derived, so every counter cell and every MIN-over-rows point
    * estimate is reproduced exactly.
    */
  val t27CmsHeavyHitters: String = {
    def cell(r: Int, tok: String): String =
      s"CAST(${h64(s"'$r|' || $tok")} % 1024 AS BIGINT)"
    val occ = (0 until 4).map(r =>
      s"SELECT $r AS r, ${cell(r, "token")} AS cell FROM ex")
      .mkString("\n  UNION ALL ")
    val probes = (0 until 4).map(r =>
      s"SELECT token, true_count, $r AS r, ${cell(r, "token")} AS cell " +
        "FROM top")
      .mkString("\n  UNION ALL ")
    ToksCte + s""", ex AS (
  SELECT unnest(toks) AS token FROM t
), occ AS (
  $occ
), cells AS (
  SELECT r, cell, COUNT(*) AS cnt FROM occ GROUP BY 1, 2
), top AS (
  SELECT token, COUNT(*) AS true_count FROM ex GROUP BY 1
  ORDER BY true_count DESC, token ASC LIMIT 20
), probes AS (
  $probes
)
SELECT p.token, CAST(p.true_count AS BIGINT) AS true_count,
       MIN(c.cnt) AS cms_estimate,
       MIN(c.cnt) - CAST(p.true_count AS BIGINT) AS overestimate
FROM probes p JOIN cells c USING (r, cell)
GROUP BY 1, 2"""
  }

  /** t28: segment-level dedup — the 8-token header injected on even
    * docs (mirrors ExtQueries.segmentDedup) recurs in half the corpus,
    * exceeds the 3-doc cap, and is removed; the cleaned text is the
    * surviving segments re-joined in `seg_idx` order. The two same-level
    * `unnest`s zip positionally (DuckDB semantics), giving the
    * `posexplode` twin; `string_agg` skips the removed (NULLed)
    * segments and coalesces to '' for an all-boilerplate doc, matching
    * Spark's `concat_ws` over an empty array.
    */
  val t28SegmentDedup: String = s"""WITH withh AS (
  SELECT doc_id,
         -- the operator coalesces AFTER injection ('' on null), and
         -- hdr || NULL is NULL in both dialects — so the whole CASE
         -- coalesces, exactly like the Spark side
         COALESCE(CASE WHEN doc_id % 2 = 0
              THEN 'nav home about contact privacy terms login search '
                   || text
              ELSE text END, '') AS text
  FROM documents
), t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM withh
), segs AS (
  SELECT doc_id,
         unnest(generate_series(0, (len(toks) - 1) // 8)) AS seg_idx,
         unnest(list_transform(generate_series(0, (len(toks) - 1) // 8),
           i -> array_to_string(toks[(i*8+1):(i*8+8)], ' '))) AS seg
  FROM t
), hashed AS (
  SELECT doc_id, seg_idx, seg, ${h64("seg")} AS h FROM segs
), counts AS (
  SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM hashed GROUP BY 1
)
SELECT s.doc_id,
       COALESCE(string_agg(CASE WHEN c.n_docs <= 3 THEN s.seg END, ' '
                           ORDER BY s.seg_idx), '') AS clean_text,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN c.n_docs > 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM hashed s JOIN counts c USING (h)
GROUP BY 1"""

  /** t77: sliding-span exact-substring dedup — the 12-token promo
    * appended to every third doc (mirrors ExtQueries.spanDedup) recurs
    * corpus-wide at a DIFFERENT token offset per doc; every token
    * offset opens an 8-token window, duplicated windows (occ > 1 over
    * positions, within-doc repeats included) island-merge by offset
    * arithmetic (break iff off > prev + 8), and the rebuild keeps the
    * positions no island covers. `hashed` is MATERIALIZED: it feeds
    * both the occurrence count and the dup join, and DuckDB re-expands
    * per-reference CTEs (the Brandes/k-core OOM lesson).
    */
  /** The t77/t78 span-dedup chain over a caller-provided `corpus` CTE
    * (doc_id, text[, …]): L-token windows at every offset, md5-lane
    * hashes, corpus-wide occurrence counts, offset-arithmetic island
    * merge, and the per-doc rebuild — ending in `spanout` (doc_id,
    * clean_text, n_tokens, n_spans, n_removed_tokens). The window
    * length and occurrence cap are GENERATED from the same constants
    * the Spark operator defaults to ([[TextAnalysis.SpanMinTokens]] /
    * [[TextAnalysis.SpanMaxOcc]]) — r17 advice: hardcoded 8/7 and
    * `occ > 1` meant a Spark-default change silently diverged the twin.
    */
  /** Shared window prelude: tokenize `corpus`, open one L-token window
    * per offset — CTEs `t` (doc_id, toks) and `wins` (doc_id, off, win).
    */
  private def spanPreludeCtes(sfx: String = "",
                              srcRel: String = "corpus"): String = {
    val L = TextAnalysis.SpanMinTokens
    s"""t$sfx AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM $srcRel
), wins$sfx AS (
  SELECT doc_id,
         unnest(generate_series(1, len(toks) - ${L - 1})) AS off,
         unnest(list_transform(generate_series(1, len(toks) - ${L - 1}),
           i -> array_to_string(toks[i:i+${L - 1}], ' '))) AS win
  FROM t$sfx WHERE len(toks) >= $L
)"""
  }

  /** The exact tier's fingerprint prelude: tokenize + window explode +
    * the 56-bit window hash, ending at `hashed$sfx` (doc_id, off, h).
    */
  private def exactHashedCtes(sfx: String = "",
                              srcRel: String = "corpus"): String =
    s"""${spanPreludeCtes(sfx, srcRel)}, hashed$sfx AS MATERIALIZED (
  SELECT doc_id, off, ${h64("win")} AS h FROM wins$sfx
)"""

  private def spanChainCtes(sfx: String = "",
                            srcRel: String = "corpus"): String = {
    val maxOcc = TextAnalysis.SpanMaxOcc
    s"""${exactHashedCtes(sfx, srcRel)}, counts$sfx AS (
  SELECT h, COUNT(*) AS occ FROM hashed$sfx GROUP BY 1
), dups$sfx AS (
  SELECT doc_id, off FROM hashed$sfx JOIN counts$sfx USING (h)
  WHERE occ > $maxOcc
), ${spanTailCtes(sfx = sfx)}"""
  }

  /** t79's detection stage: L leave-one-out fingerprints per window
    * (slot i + the window minus token i+1), colliding slot-for-slot
    * across copies that differ by ONE substituted token; exact copies
    * collide on all L fingerprints, so the flagged set ⊇ t77's.
    */
  /** t79's fingerprint prelude: window explode kept as token lists,
    * then L slot-keyed leave-one-out variants per window, hashed on
    * the shared lane — ends at `hashed$sfx` (doc_id, off, h).
    */
  private def nearDupHashedCtes(sfx: String = "",
                                srcRel: String = "corpus"): String = {
    val L = TextAnalysis.SpanMinTokens
    s"""${spanPreludeCtes(sfx, srcRel)}, wtoks$sfx AS (
  SELECT doc_id, off, string_split(win, ' ') AS wt FROM wins$sfx
), loo$sfx AS (
  SELECT doc_id, off,
         unnest(generate_series(0, ${L - 1})) AS slot,
         unnest(list_transform(generate_series(0, ${L - 1}),
           i -> array_to_string(wt[1:i] || wt[i+2:$L], ' '))) AS var
  FROM wtoks$sfx
), hashed$sfx AS MATERIALIZED (
  SELECT doc_id, off,
         ${h64("CAST(slot AS VARCHAR) || '|' || var")} AS h
  FROM loo$sfx
)"""
  }

  private def nearDupChainCtes(sfx: String = "",
                               srcRel: String = "corpus"): String = {
    val maxOcc = TextAnalysis.SpanMaxOcc
    s"""${nearDupHashedCtes(sfx, srcRel)}, counts$sfx AS (
  SELECT h, COUNT(*) AS occ FROM hashed$sfx GROUP BY 1
), dups$sfx AS (
  SELECT DISTINCT doc_id, off
  FROM hashed$sfx JOIN counts$sfx USING (h) WHERE occ > $maxOcc
), ${spanTailCtes(sfx = sfx)}"""
  }

  /** Shared island merge + per-doc rebuild over a `dups` (doc_id, off)
    * CTE — ends in `spanout` (doc_id, clean_text, n_tokens, n_spans,
    * n_removed_tokens).
    */
  private def spanTailCtes(L: Int = TextAnalysis.SpanMinTokens,
                           sfx: String = ""): String = {
    s"""flagged$sfx AS (
  SELECT doc_id, off,
         CASE WHEN off > COALESCE(lag(off) OVER
                (PARTITION BY doc_id ORDER BY off), ${-(L + 1)}) + $L
              THEN 1 ELSE 0 END AS brk
  FROM dups$sfx
), numbered$sfx AS (
  SELECT doc_id, off,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY off
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM flagged$sfx
), islands$sfx AS (
  SELECT doc_id, MIN(off) AS s, MAX(off) + ${L - 1} AS e
  FROM numbered$sfx GROUP BY doc_id, isl
), perdoc$sfx AS (
  SELECT doc_id, COUNT(*) AS n_spans,
         CAST(SUM(e - s + 1) AS BIGINT) AS n_removed,
         list({'s': s, 'e': e}) AS iv
  FROM islands$sfx GROUP BY 1
), spanout$sfx AS (
  SELECT t$sfx.doc_id,
         -- COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
         -- concat_ws over an empty array is '' (the t28 string_agg rule)
         CASE WHEN p.iv IS NULL THEN array_to_string(toks, ' ')
              ELSE COALESCE(array_to_string(list_transform(list_filter(
                     generate_series(1, len(toks)),
                     q -> len(list_filter(p.iv,
                            x -> q >= x.s AND q <= x.e)) = 0),
                     q -> toks[q]), ' '), '') END AS clean_text,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         COALESCE(p.n_spans, 0) AS n_spans,
         COALESCE(p.n_removed, 0) AS n_removed_tokens
  FROM t$sfx LEFT JOIN perdoc$sfx p USING (doc_id)
)"""
  }

  /** SQL literal of the shared promo sentence — same source constant
    * as the Spark-side injection ([[TextAnalysis.SpanPromoText]]), so
    * the fixtures cannot drift apart (r17 advice).
    */
  private val SpanPromo: String = {
    require(!TextAnalysis.SpanPromoText.contains("'"),
      "promo must stay embeddable as a single-quoted SQL literal")
    "'" + TextAnalysis.SpanPromoText + "'"
  }

  val t77SpanDedup: String = s"""WITH ${promoCorpusCte("documents", 1)}, ${spanChainCtes()}
SELECT doc_id, clean_text, n_tokens, n_spans, n_removed_tokens
FROM spanout"""

  /** t79: near-duplicate span dedup — the t77 corpus shape, but the
    * injected promo carries a PER-DOC tracking token at position 6
    * ('trk' || doc_id), so no two copies are verbatim-equal and the
    * exact chain removes nothing of them; the leave-one-out chain
    * collides the copies slot-for-slot. Promo fragments derive from
    * the same shared constant as the Spark fixture.
    */
  val t79NearDupSpans: String =
    s"""WITH ${tweakedPromoCorpusCte("documents")}, ${nearDupChainCtes()}
SELECT doc_id, clean_text, n_tokens, n_spans, n_removed_tokens
FROM spanout"""

  /** t79's corpus shape as a generator: every third doc gets the
    * shared promo with the per-doc tracking token substituted at
    * [[TextAnalysis.SpanPromoTweakPos]] — shared by t79 and the
    * near-dup curation composite so the fixtures cannot drift.
    */
  private def tweakedPromoCorpusCte(srcRel: String,
                                    name: String = "corpus"): String = {
    val head = TextAnalysis.SpanPromoHead
    val tail = TextAnalysis.SpanPromoTail
    s"""$name AS (
  SELECT doc_id,
         COALESCE(CASE WHEN doc_id % 3 = 0
              THEN concat_ws(' ', text, '$head',
                             'trk' || doc_id, '$tail')
              ELSE text END, '') AS text
  FROM $srcRel
)"""
  }

  /** The curation pipeline composite (pipeline_curation): the full
    * t77 → d5 → d14 → t22 chain in ONE statement, each tier the SAME
    * generator its standalone oracle uses — the near-dup corpus
    * (NearDupCtes' injected-mutation shape) gets the t77 promo chrome,
    * the span chain strips it, the cluster chain resolves near-dups
    * over the CLEANED text (suffix-2 names), the split stage keys on
    * the cluster rep, and the train order runs over the train-split
    * keepers. One row per (epoch, surviving train doc).
    */
  val pipelineCuration: String =
    pipelineCurationSql(promoCorpusCte("rawc", 1), spanChainCtes())

  /** The composite under the NEAR-DUP span policy (pipeline_curation_
    * neardup): t79's tweaked-chrome corpus shape and leave-one-out
    * detection chain, then the identical cluster/split/order tail —
    * one generator, two policies, zero drift surface.
    */
  val pipelineCurationNearDup: String =
    pipelineCurationSql(tweakedPromoCorpusCte("rawc"), nearDupChainCtes())

  /** The standing corpus's full curation chain — injected corpus →
    * span chain → cluster/split/order CTEs ending at `traindocs` +
    * `e`. Shared by both one-shot composite policies and (with the
    * exact policy) the increment twin's standing side.
    */
  private def pipelineCurationCtes(corpusCte: String,
                                   spanChain: String): String = s"""WITH RECURSIVE ${nearDupCorpusCtes("rawc")}, $corpusCte, $spanChain,
corpus2 AS (
  -- span-emptied docs drop here: zero training signal, and at scale
  -- they form one degenerate LSH bucket (n(n-1)/2 candidates)
  SELECT doc_id, clean_text AS text FROM spanout WHERE clean_text <> ''
), shing2 AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         ${sh3("string_split(text, ' ')", "text")} AS sh
  FROM corpus2
), ${clusterChain("corpus2", "shing2", "2")},
${splitChain("clusters2", "2")},
traindocs AS (
  SELECT a.doc_id, a.cluster_rep
  FROM assigned2 a JOIN clusters2 c USING (doc_id)
  WHERE a.split = 'train' AND c.is_keeper
), ${trainOrderChain("traindocs")}"""

  /** The composite under the CDC/budget span policy (pipeline_
    * curation_cdc): t80's doubled-promo corpus shape and content-
    * defined segment chain, then the identical cluster/split/order
    * tail — the tier the dedup selection table prescribes when t77's
    * per-offset fingerprint volume exceeds budget.
    */
  val pipelineCurationCdc: String =
    pipelineCurationSql(promoCorpusCte("rawc", 2), cdcChainCtes())

  private def pipelineCurationSql(corpusCte: String,
                                  spanChain: String): String =
    pipelineCurationCtes(corpusCte, spanChain) + """
SELECT e.epoch, e.doc_id, e.h % 8 AS shard,
       CAST(row_number() OVER (PARTITION BY e.epoch, e.h % 8
         ORDER BY e.h ASC, e.doc_id ASC) AS BIGINT) AS shard_pos,
       t.cluster_rep
FROM e JOIN traindocs t USING (doc_id)"""

  /** The incremental composite (pipeline_curation_increment): the v2
    * crawl increment replayed through the INCREMENTAL algorithm — the
    * standing chain above plays the materialized state (its `counts`
    * CTE is the span index, `shing2`/`sig2`-family the d9 "existing
    * side's keys", `clusters2` the standing resolution, `e` the
    * shipped train order), and the increment flows: span-clean against
    * standing + own window counts → cross-LSH attach to standing reps
    * plus self-LSH for inc-internal pairs → components over {inc docs}
    * ∪ {touched reps} → rep-lane split → train order APPENDED after
    * the standing per-(epoch, shard) fill. Mirrors
    * [[graft.ext.ExtQueries.curationTrainPipelineIncrement]] CTE for
    * stage; the full-rebuild equivalence itself is spec-proven Spark-
    * side (`CurationIncrementSpec`).
    */
  val pipelineCurationIncrement: String =
    pipelineCurationIncrementSql("exact")

  /** The incremental composite under the near-dup span policy
    * (pipeline_curation_increment_neardup): t79's tweaked chrome and
    * leave-one-out tier — the standing chain's loo-fingerprint
    * `counts` plays the index, and the increment's per-copy tweaked
    * chrome is stripped purely by standing counts.
    */
  val pipelineCurationIncrementNearDup: String =
    pipelineCurationIncrementSql("neardup")

  /** The incremental composite under the CDC/budget span policy
    * (pipeline_curation_increment_cdc): t80's doubled-promo chrome
    * and content-defined segment tier against the standing segment-
    * fingerprint counts.
    */
  val pipelineCurationIncrementCdc: String =
    pipelineCurationIncrementSql("cdc")

  /** Day-2 incremental composite (pipeline_curation_increment2): the
    * v3 crawl counted/attached against standing ∪ v2 — the twin's
    * standing side is the rebuilt union chain, standing in for the
    * Spark side's ADVANCED state (valid because the day-1 spec proves
    * freeze + increment-row equivalence on this fixture; the day-2
    * spec then proves the advanced state reproduces this rebuild).
    */
  val pipelineCurationIncrement2: String =
    pipelineCurationIncrementSql("exact", day2 = true)

  /** Day-2 under the CDC/budget policy. */
  val pipelineCurationIncrement2Cdc: String =
    pipelineCurationIncrementSql("cdc", day2 = true)

  /** Day-2 under the near-dup policy — the same two-layer incremental
    * replay (it models the ALGORITHM, so it needs no freeze argument;
    * the rebuild-equivalence claim is the thing this tier doesn't
    * have, not the oracle).
    */
  val pipelineCurationIncrement2NearDup: String =
    pipelineCurationIncrementSql("neardup", day2 = true)

  /** The increment side's detection chain per span policy: the
    * policy's fingerprint prelude over `corpusi`, the shared
    * incremental total rule (own counts + the standing chain's
    * `counts` index), and the policy's dup flag + the shared tail —
    * CTEs suffixed `i`, ending at `spanouti`. Mirrors
    * [[graft.ext.TextAnalysis]]'s `incrementDupHashes` contract:
    * total = increment + standing, exactly the full rebuild's count
    * for any fingerprint occurring in the increment.
    */
  private def incDetectCtes(span: String, sfx: String = "i",
                            standingCounts: Seq[String] = Seq("counts"))
      : String = {
    val maxOcc = TextAnalysis.SpanMaxOcc
    val joins = standingCounts.zipWithIndex.map { case (rel, k) =>
      s"LEFT JOIN $rel c$k USING (h)"
    }.mkString("\n  ")
    val add = standingCounts.indices
      .map(k => s"COALESCE(c$k.occ, 0)").mkString(" + ")
    val tot = s"""counts$sfx AS (
  SELECT h, COUNT(*) AS occ FROM hashed$sfx GROUP BY 1
), tot$sfx AS (
  -- the incremental rule: total occurrences = standing index(es) + own
  SELECT cx.h, cx.occ + $add AS occ
  FROM counts$sfx cx
  $joins
)"""
    span match {
      case "exact" =>
        s"""${exactHashedCtes(sfx, s"corpus$sfx")}, $tot, dups$sfx AS (
  SELECT doc_id, off FROM hashed$sfx JOIN tot$sfx USING (h)
  WHERE occ > $maxOcc
), ${spanTailCtes(sfx = sfx)}"""
      case "neardup" =>
        s"""${nearDupHashedCtes(sfx, s"corpus$sfx")}, $tot, dups$sfx AS (
  SELECT DISTINCT doc_id, off FROM hashed$sfx JOIN tot$sfx USING (h)
  WHERE occ > $maxOcc
), ${spanTailCtes(sfx = sfx)}"""
      case "cdc" =>
        s"""${cdcHashedCtes(sfx, s"corpus$sfx")}, $tot, dupseg$sfx AS (
  SELECT doc_id, s, e FROM hashed$sfx JOIN tot$sfx USING (h)
  WHERE occ > $maxOcc
), dups$sfx AS (
  SELECT doc_id, unnest(generate_series(s, e)) AS off FROM dupseg$sfx
), ${spanTailCtes(1, sfx)}"""
    }
  }

  /** The v2 crawl fixture as a named CTE over `base` — shared by the
    * day-1 twins (the increment side) and the day-2 twins (where it
    * joins the standing side: the rebuilt standing ∪ v2 chain plays
    * the ADVANCED state, valid exactly because the day-1 spec proves
    * freeze + increment-equivalence on this fixture).
    */
  private def rawIncCte(name: String): String = s"""$name AS (
  SELECT doc_id + ${ExtQueries.IncChangedOffset} AS doc_id,
         array_to_string(list_filter(string_split(text, ' '),
           (t, i) -> i % ${ExtQueries.IncChangedDrop} <> 0), ' ') AS text
  FROM base WHERE doc_id % ${ExtQueries.IncChangedMod} = 1
  UNION ALL
  SELECT doc_id + ${ExtQueries.IncFreshOffset},
         array_to_string(list_reverse(string_split(text, ' ')), ' ')
  FROM base WHERE doc_id % ${ExtQueries.IncFreshMod} = 0
  UNION ALL
  SELECT doc_id + ${ExtQueries.IncPairAOffset},
         array_to_string(list_transform(string_split(text, ' '),
           tk -> '${ExtQueries.IncPairPrefix}' || tk), ' ')
  FROM base WHERE doc_id % ${ExtQueries.IncPairMod} = 0
  UNION ALL
  SELECT doc_id + ${ExtQueries.IncPairBOffset},
         array_to_string(list_filter(list_transform(string_split(text, ' '),
           tk -> '${ExtQueries.IncPairPrefix}' || tk),
           (t, i) -> i % ${ExtQueries.IncPairDrop} <> 0), ' ')
  FROM base WHERE doc_id % ${ExtQueries.IncPairMod} = 0
)"""

  /** The v3 (day-2) crawl fixture — substitution markers and the pair
    * echo mirror [[graft.ext.ExtQueries.curationIncrementCorpusV3]]
    * from the same shared constants (DuckDB's list lambda index is
    * 1-based = Spark's `i + 1`).
    */
  private def rawInc2Cte(name: String): String = {
    // markers embed the v3 doc's OWN (post-offset) id, spelled
    // explicitly on both sides — see curationIncrementCorpusV3
    val sub = (src: String, off: Long, mark: String) =>
      s"""array_to_string(list_transform($src,
           (t, i) -> CASE WHEN i % ${ExtQueries.IncChangedDrop} = 0
               OR i = len(string_split(text, ' '))
             THEN '$mark' || (doc_id + $off) || 'x' || i
             ELSE t END), ' ')"""
    s"""$name AS (
  SELECT doc_id + ${ExtQueries.Inc2ChangedOffset} AS doc_id,
         ${sub("string_split(text, ' ')", ExtQueries.Inc2ChangedOffset,
      ExtQueries.Inc2SubMark)} AS text
  FROM base WHERE doc_id % ${ExtQueries.IncChangedMod} = ${
      ExtQueries.Inc2ChangedRem}
  UNION ALL
  SELECT doc_id + ${ExtQueries.Inc2AttachOffset},
         ${sub("list_reverse(string_split(text, ' '))",
      ExtQueries.Inc2AttachOffset, ExtQueries.Inc2AttachMark)}
  FROM base WHERE doc_id % ${ExtQueries.IncFreshMod} = 0
  UNION ALL
  SELECT doc_id + ${ExtQueries.Inc2EchoOffset},
         array_to_string(list_append(list_transform(
           string_split(text, ' ')[1:${ExtQueries.Inc2EchoLen}],
           tk -> '${ExtQueries.IncPairPrefix}' || tk),
           '${ExtQueries.Inc2EchoMark}' ||
             (doc_id + ${ExtQueries.Inc2EchoOffset})), ' ')
  FROM base WHERE doc_id % ${ExtQueries.IncPairMod} = 0
  UNION ALL
  SELECT doc_id + ${ExtQueries.Inc2FreshOffset},
         array_to_string(list_transform(string_split(text, ' '),
           tk -> '${ExtQueries.Inc2Prefix}' || tk), ' ')
  FROM base WHERE doc_id % ${ExtQueries.Inc2FreshMod} = 0
  UNION ALL
  SELECT doc_id + ${ExtQueries.Inc2PairAOffset},
         array_to_string(list_transform(string_split(text, ' '),
           tk -> '${ExtQueries.Inc2Prefix}' || tk), ' ')
  FROM base WHERE doc_id % ${ExtQueries.Inc2PairMod} = 0
  UNION ALL
  SELECT doc_id + ${ExtQueries.Inc2PairBOffset},
         array_to_string(list_filter(list_transform(string_split(text, ' '),
           tk -> '${ExtQueries.Inc2Prefix}' || tk),
           (t, i) -> i % ${ExtQueries.IncPairDrop} <> 0), ' ')
  FROM base WHERE doc_id % ${ExtQueries.Inc2PairMod} = 0
)"""
  }

  private def pipelineCurationIncrementSql(span: String,
                                           day2: Boolean = false): String = {
    def corpusOf(src: String, name: String) = span match {
      case "exact"   => promoCorpusCte(src, 1, name)
      case "neardup" => tweakedPromoCorpusCte(src, name)
      case "cdc"     => promoCorpusCte(src, 2, name)
    }
    val stdChain = span match {
      case "exact"   => spanChainCtes()
      case "neardup" => nearDupChainCtes()
      case "cdc"     => cdcChainCtes()
    }
    val day1 = s"""${pipelineCurationCtes(corpusOf("rawc", "corpus"),
      stdChain)},
stdmax AS (
  SELECT epoch, h % 8 AS shard, COUNT(*) AS npos FROM e GROUP BY 1, 2
), ${rawIncCte("rawinc")}, ${corpusOf("rawinc", "corpusi")},
${incLayerCtes(span, "i", "3", Seq("counts"),
      "shing2", "bands2", "clusters2")}"""
    if (!day2)
      day1 + incrementSelect("i", "stdmax")
    else
      // day 2 replays the TRUE advanced state — standing chain ∪ the
      // day-1 incremental layer's outputs (cleaned docs, shingles,
      // bands, clusters, fingerprint counts, appended fill) — NOT a
      // rebuilt standing ∪ v2 union: the two coincide only where the
      // day-1 freeze holds, which is fixture-empirical per scale
      // (measured: at sf0.01 a rebuilt-union twin drifts the shard
      // fill by the handful of v2 rows the rebuild renumbers)
      day1 + s""",
stdmax2 AS MATERIALIZED (
  SELECT epoch, shard, SUM(npos) AS npos FROM (
    SELECT epoch, shard, npos FROM stdmax
    UNION ALL
    SELECT epoch, h % 8 AS shard, COUNT(*) AS npos FROM ei GROUP BY 1, 2
  ) GROUP BY 1, 2
), shingU AS MATERIALIZED (
  SELECT doc_id, sh FROM shing2 UNION ALL SELECT doc_id, sh FROM shing3
), bandsU AS MATERIALIZED (
  SELECT * FROM bands2 UNION ALL SELECT * FROM bands3
), clustersU AS MATERIALIZED (
  SELECT doc_id, cluster_rep FROM clusters2
  UNION ALL SELECT doc_id, cluster_rep FROM clustersi
), ${rawInc2Cte("rawinc3")}, ${corpusOf("rawinc3", "corpusj")},
${incLayerCtes(span, "j", "4", Seq("counts", "countsi"),
        "shingU", "bandsU", "clustersU")}""" +
        incrementSelect("j", "stdmax2")
  }

  /** One incremental crawl layer over `corpus$sfx`: the policy's
    * detection chain under the incremental total rule against the
    * given standing count rels, then cluster attach against the given
    * standing shingle/band/cluster rels, the rep-lane split, and the
    * train order — ends at `traindocs$sfx` and `e$sfx`. Instantiated
    * once for day 1 (against the standing chain) and twice for day 2
    * (day 1's layer, then v3 against the unioned state).
    */
  private def incLayerCtes(span: String, sfx: String, num: String,
                           standingCounts: Seq[String], stdShing: String,
                           stdBands: String, stdClusters: String): String =
    s"""${incDetectCtes(span, sfx, standingCounts)},
corpus$num AS MATERIALIZED (
  SELECT doc_id, clean_text AS text FROM spanout$sfx WHERE clean_text <> ''
), shing$num AS MATERIALIZED (
  SELECT doc_id, ${sh3("string_split(text, ' ')", "text")} AS sh
  FROM corpus$num
), ${lshVerifyCtes(s"shing$num", num)}, candx$sfx AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands$num a JOIN $stdBands b ON a.band = b.band AND a.key = b.key
), verx$sfx AS (
  SELECT id_a, id_b, ${jaccardExpr("sa.sh", "sb.sh")} AS jaccard
  FROM candx$sfx
  JOIN shing$num sa ON candx$sfx.id_a = sa.doc_id
  JOIN $stdShing sb ON candx$sfx.id_b = sb.doc_id
), edgesx$sfx AS (
  -- a verified cross edge rewires to the standing cluster's REP node
  SELECT DISTINCT v.id_a AS src, c.cluster_rep AS dst
  FROM verx$sfx v JOIN $stdClusters c ON v.id_b = c.doc_id
  WHERE v.jaccard >= 0.5
), edgesall$sfx AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM ver$num WHERE jaccard >= 0.5
  UNION ALL SELECT id_b, id_a FROM ver$num WHERE jaccard >= 0.5
  UNION ALL SELECT src, dst FROM edgesx$sfx
  UNION ALL SELECT dst, src FROM edgesx$sfx
), nodes$sfx AS MATERIALIZED (
  SELECT doc_id FROM corpus$num
  UNION SELECT dst FROM edgesx$sfx
), reach$sfx AS (
  SELECT doc_id AS src, doc_id AS dst FROM nodes$sfx
  UNION
  SELECT r.src, e2.dst
  FROM reach$sfx r JOIN edgesall$sfx e2 ON r.dst = e2.src
), clusters$sfx AS MATERIALIZED (
  SELECT src AS doc_id, MIN(dst) AS cluster_rep,
         src = MIN(dst) AS is_keeper
  FROM reach$sfx WHERE src IN (SELECT doc_id FROM corpus$num)
  GROUP BY src
), ${splitChain(s"clusters$sfx", sfx)},
traindocs$sfx AS (
  SELECT a.doc_id, a.cluster_rep
  FROM assigned$sfx a JOIN clusters$sfx c USING (doc_id)
  WHERE a.split = 'train' AND c.is_keeper
), ${trainOrderChain(s"traindocs$sfx", sfx)}"""

  /** The append-after-fill final select shared by the increment twins. */
  private def incrementSelect(sfx: String, fill: String): String = s"""
SELECT e$sfx.epoch, e$sfx.doc_id, e$sfx.h % 8 AS shard,
       CAST(COALESCE(s.npos, 0) + row_number() OVER (
         PARTITION BY e$sfx.epoch, e$sfx.h % 8
         ORDER BY e$sfx.h ASC, e$sfx.doc_id ASC) AS BIGINT) AS shard_pos,
       t.cluster_rep
FROM e$sfx JOIN traindocs$sfx t USING (doc_id)
LEFT JOIN $fill s ON s.epoch = e$sfx.epoch AND s.shard = e$sfx.h % 8"""

  /** t80: content-defined chunk dedup — anchor tokens on the seeded
    * `cdc|` lane open segments, segment fingerprints are the md5 lane
    * over the ORDERED token-hash CSV (never text), segments under
    * minTokens never participate, dup segments explode to positions
    * and run the shared tail at L = 1 (pure interval union). Fixture:
    * the shared promo appended TWICE (24-token chrome) to every third
    * doc.
    */
  val t80CdcDedup: String =
    s"""WITH ${promoCorpusCte("documents", 2)}, ${cdcChainCtes()}
SELECT doc_id, clean_text, n_tokens, n_spans, n_removed_tokens
FROM spanout"""

  /** t80's detection chain reading `corpus` and ending `spanout` —
    * anchor tokens, segment fingerprints over ordered token hashes,
    * dup segments exploded to positions, the shared tail at L = 1.
    * Shared by t80 and the CDC/budget curation composite.
    */
  /** t80's fingerprint prelude: anchor tokens on the seeded `cdc|`
    * lane open segments, fingerprints are the md5 lane over the
    * ORDERED token-hash CSV, segments under minTokens never
    * participate — ends at `hashed$sfx` (doc_id, s, e, h).
    */
  private def cdcHashedCtes(sfx: String = "",
                            srcRel: String = "corpus"): String = {
    val L = TextAnalysis.SpanMinTokens
    val k = TextAnalysis.CdcAvgSegTokens
    val segHash = h64("array_to_string(list_transform(toks[b.s:b.e], " +
      s"tok -> CAST(${h64("tok")} AS VARCHAR)), ',')")
    s"""t$sfx AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM $srcRel
), tk$sfx AS (
  SELECT doc_id, unnest(generate_series(1, len(toks))) AS p,
         unnest(toks) AS tok
  FROM t$sfx
), af$sfx AS (
  SELECT doc_id, p,
         CASE WHEN ${h64("'cdc|' || tok")} % $k = 0
              THEN 1 ELSE 0 END AS a
  FROM tk$sfx
), sg$sfx AS (
  SELECT doc_id, p,
         SUM(a) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS UNBOUNDED PRECEDING) AS seg
  FROM af$sfx
), bounds$sfx AS (
  SELECT doc_id, seg, MIN(p) AS s, MAX(p) AS e
  FROM sg$sfx GROUP BY 1, 2
), hashed$sfx AS MATERIALIZED (
  SELECT b.doc_id, b.s, b.e, $segHash AS h
  FROM bounds$sfx b JOIN t$sfx USING (doc_id)
  WHERE b.e - b.s + 1 >= $L
)"""
  }

  private def cdcChainCtes(sfx: String = "",
                           srcRel: String = "corpus"): String = {
    val maxOcc = TextAnalysis.SpanMaxOcc
    s"""${cdcHashedCtes(sfx, srcRel)}, counts$sfx AS (
  SELECT h, COUNT(*) AS occ FROM hashed$sfx GROUP BY 1
), dupseg$sfx AS (
  SELECT doc_id, s, e FROM hashed$sfx JOIN counts$sfx USING (h)
  WHERE occ > $maxOcc
), dups$sfx AS (
  SELECT doc_id, unnest(generate_series(s, e)) AS off FROM dupseg$sfx
), ${spanTailCtes(1, sfx)}"""
  }

  /** t78: per-source span-duplication pressure — the shared
    * [[spanChainCtes]] over a source-hash-gated promo injection
    * (sources whose md5 leads below '8' get the chrome), rolled up to
    * source grain with exact fixed-point shares and verdicts.
    */
  val t78SourceSpanPressure: String = s"""WITH corpus AS (
  SELECT doc_id, source,
         COALESCE(CASE WHEN substr(md5(source), 1, 1) < '8'
              THEN concat_ws(' ', text, $SpanPromo)
              ELSE text END, '') AS text
  FROM documents
), ${spanChainCtes()},
rolled AS (
  SELECT c.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
         CAST(SUM(s.n_spans) AS BIGINT) AS n_spans,
         CAST(SUM(s.n_removed_tokens) AS BIGINT) AS n_removed_tokens
  FROM spanout s JOIN corpus c USING (doc_id)
  GROUP BY 1
)
SELECT source, n_docs, n_tokens, n_spans, n_removed_tokens,
       removed_share_e9,
       CASE WHEN removed_share_e9 >= 300000000 THEN 'chrome_heavy'
            WHEN removed_share_e9 <= 50000000 THEN 'clean'
            ELSE 'mixed' END AS verdict
FROM (
  SELECT *,
         -- HUGEINT widen before the 1e9 multiply (the t71 guard)
         CAST(CAST(n_removed_tokens AS HUGEINT) * 1000000000
              // n_tokens AS BIGINT) AS removed_share_e9
  FROM rolled
)"""

  /** t31: bigram-LM document scoring — `ln P(w1) + Σ ln P(wi|wi-1)`
    * averaged over n_tokens, t25's rounding discipline (9 dp ln,
    * DECIMAL term sums, 6 dp average). The two same-level `unnest`s
    * zip positionally: `toks[1:n-1]` with `toks[2:n]` IS the
    * consecutive-pair stream.
    */
  val t31BigramLogprob: String = ToksCte + """, ex AS (
  SELECT doc_id, unnest(toks) AS w FROM t
), uni AS (
  SELECT w, COUNT(*) AS c1 FROM ex GROUP BY 1
), tot AS (
  SELECT SUM(c1) AS n FROM uni
), bg AS (
  SELECT doc_id,
         unnest(toks[1:len(toks)-1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM t
), dbg AS (
  SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2, 3
), bglm AS (
  SELECT w1, w2, SUM(cnt) AS c12 FROM dbg GROUP BY 1, 2
), bgsc AS (
  SELECT doc_id,
         CAST(round(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)), 9)
              AS DECIMAL(28,9)) * CAST(cnt AS DECIMAL(9,0)) AS contrib
  FROM dbg
  JOIN bglm USING (w1, w2)
  JOIN uni ON dbg.w1 = uni.w
), hsc AS (
  SELECT doc_id,
         CAST(round(ln(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS contrib
  FROM (SELECT doc_id, toks[1] AS w FROM t) h
  JOIN uni USING (w)
  CROSS JOIN tot
), terms AS (
  SELECT doc_id, contrib FROM bgsc
  UNION ALL SELECT doc_id, contrib FROM hsc
), nt AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t
)
SELECT doc_id, n_tokens,
       round(CAST(SUM(contrib) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS avg_logprob
FROM terms JOIN nt USING (doc_id)
GROUP BY 1, 2"""

  /** t68: duplication-density profile — per doc, distinct 3-shingles
    * hashed to the shared 64-bit lane, corpus doc-frequency joined
    * back, unique (df = 1) and common (df ≥ 5) shares in truncating
    * 1e-9 fixed point with the banded verdict. NULL texts excluded on
    * both sides.
    */
  val t68DupDensity: String = s"""WITH t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM documents
  WHERE text IS NOT NULL
), s AS (
  SELECT doc_id,
         unnest(list_distinct(${sh3("toks", "array_to_string(toks, ' ')")}))
           AS sh
  FROM t
), h AS (
  SELECT doc_id, ${h64("sh")} AS hh FROM s
), dfreq AS (
  SELECT hh, COUNT(*) AS df FROM h GROUP BY 1
), agg AS (
  SELECT h.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique,
         CAST(SUM(CASE WHEN dfreq.df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common
  FROM h JOIN dfreq USING (hh) GROUP BY 1
)
SELECT doc_id, n_shingles, n_unique, n_common,
       CAST(n_unique * 1000000000 // n_shingles AS BIGINT)
         AS unique_share_e9,
       CAST(n_common * 1000000000 // n_shingles AS BIGINT)
         AS common_share_e9,
       CASE WHEN n_unique * 1000000000 // n_shingles >= 800000000
              THEN 'novel'
            WHEN n_common * 1000000000 // n_shingles >= 500000000
              THEN 'boilerplate_heavy'
            ELSE 'mixed' END AS verdict
FROM agg"""

  /** t66: PMI collocations — top-100 adjacent bigrams with count ≥ 5
    * by `ln(p(w1w2)/(p(w1)p(w2)))`; the argument is pure IEEE
    * division over exact longs, ONE `ln` rounded to 9 dp (t31's
    * portability discipline), ties on (w1, w2).
    */
  /** t76: per-doc novelty vs reference — the id-lane 80/20 split,
    * per-side distinct shingle hashes through the shared md5 lane,
    * one hash-keyed membership join, exact fixed-point shares with
    * the novel/mixed/redundant verdict.
    */
  val t76NoveltyScore: String = s"""WITH t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
), dsh AS MATERIALIZED (
  SELECT DISTINCT doc_id, ${h64("sh")} AS h FROM (
    SELECT doc_id,
           unnest(${sh3("toks", "array_to_string(toks, ' ')")}) AS sh
    FROM t
  )
), refsh AS MATERIALIZED (
  SELECT DISTINCT h FROM dsh WHERE doc_id % 5 <> 4
), scored AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN r.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM dsh b LEFT JOIN refsh r ON b.h = r.h
  WHERE b.doc_id % 5 = 4
  GROUP BY 1
)
SELECT doc_id, n_shingles, n_novel,
       n_novel * 1000000000 // n_shingles AS novelty_e9,
       CASE WHEN n_novel * 1000000000 // n_shingles >= 800000000
              THEN 'novel'
            WHEN n_novel * 1000000000 // n_shingles <= 200000000
              THEN 'redundant'
            ELSE 'mixed' END AS verdict
FROM scored"""

  /** t75: readability — sentence/word/vowel-group counts as exact
    * integers (min-1 conventions matching the Spark side), the two
    * scores as single double expressions rounded once at 6 dp, the
    * curriculum band on the rounded Flesch value.
    */
  val t75Readability: String = """WITH base AS (
  SELECT doc_id,
         GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
           AS n_words,
         CAST(COALESCE(list_sum(list_transform(
           regexp_extract_all(lower(text), '[a-z]+'),
           w -> GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
           0) AS BIGINT) AS n_syllables
  FROM documents
  WHERE text IS NOT NULL
), scored AS (
  SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
         n_words, n_syllables,
         CASE WHEN n_words > 0 THEN
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / CAST(n_sentences AS DOUBLE))
                 - 84.6 * (CAST(n_syllables AS DOUBLE)
                           / CAST(n_words AS DOUBLE)), 6)
         END AS flesch,
         CASE WHEN n_words > 0 THEN
           round(0.39 * (CAST(n_words AS DOUBLE)
                         / CAST(n_sentences AS DOUBLE))
                 + 11.8 * (CAST(n_syllables AS DOUBLE)
                           / CAST(n_words AS DOUBLE)) - 15.59, 6)
         END AS fk_grade
  FROM base
)
SELECT doc_id, n_sentences, n_words, n_syllables, flesch, fk_grade,
       CASE WHEN flesch IS NULL THEN 'unscored'
            WHEN flesch >= 70.0 THEN 'easy'
            WHEN flesch >= 50.0 THEN 'standard'
            WHEN flesch >= 30.0 THEN 'difficult'
            ELSE 'very_difficult' END AS band
FROM scored"""

  /** t74: cross-source shingle-overlap matrix — the mirrorsrc fixture
    * (every 7th doc re-emitted verbatim), per-source distinct shingle
    * hashes through the shared md5 lane, the maxSources=64 background
    * cap applied BEFORE pairing, one hash self-join, Jaccard + both
    * containments in fixed point, verdict on the greatest share.
    */
  val t74SourceOverlap: String = s"""WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 900000, 'mirrorsrc', text
  FROM documents WHERE doc_id % 7 = 0
), t AS (
  SELECT source, string_split($Norm, ' ') AS toks
  FROM corpus WHERE text IS NOT NULL AND source IS NOT NULL
), sh AS MATERIALIZED (
  SELECT DISTINCT source, ${h64("sh")} AS h FROM (
    SELECT source,
           unnest(${sh3("toks", "array_to_string(toks, ' ')")}) AS sh
    FROM t
  )
), keeph AS MATERIALIZED (
  SELECT h FROM (SELECT h, COUNT(*) AS ds FROM sh GROUP BY 1)
  WHERE ds <= 64
), shf AS MATERIALIZED (
  SELECT sh.source, sh.h FROM sh JOIN keeph ON sh.h = keeph.h
), sizes AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM shf GROUP BY 1
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM shf a JOIN shf b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
), scored AS (
  SELECT p.source_a, p.source_b,
         COALESCE(s.n_shared, 0) AS n_shared, p.n_a, p.n_b,
         COALESCE(s.n_shared, 0) * 1000000000
           // (p.n_a + p.n_b - COALESCE(s.n_shared, 0)) AS jaccard_e9,
         COALESCE(s.n_shared, 0) * 1000000000 // p.n_a
           AS containment_a_e9,
         COALESCE(s.n_shared, 0) * 1000000000 // p.n_b
           AS containment_b_e9
  FROM (
    SELECT sa.source AS source_a, sb.source AS source_b,
           sa.n_distinct AS n_a, sb.n_distinct AS n_b
    FROM sizes sa CROSS JOIN sizes sb WHERE sa.source < sb.source
  ) p LEFT JOIN shared s
    ON p.source_a = s.source_a AND p.source_b = s.source_b
)
SELECT source_a, source_b, n_shared, n_a, n_b,
       jaccard_e9, containment_a_e9, containment_b_e9,
       CASE WHEN GREATEST(jaccard_e9, containment_a_e9,
                          containment_b_e9) >= 500000000 THEN 'mirror'
            WHEN GREATEST(jaccard_e9, containment_a_e9,
                          containment_b_e9) >= 100000000
              THEN 'overlapping'
            ELSE 'distinct' END AS verdict
FROM scored"""

  /** t73: TF-IDF top terms — the shared [[ToksCte]] tokenization, one
    * (doc, term) tf collapse, one df collapse, `round(tf ·
    * round(ln(N/df), 9), 9)` (the t56 rounded-log discipline), rank
    * ties on the term ascending, top 5 per doc.
    */
  val t73TfidfTopTerms: String = ToksCte + """, ex AS (
  SELECT doc_id, unnest(toks) AS term FROM t
), tf AS MATERIALIZED (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM ex GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nd AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * round(ln(n / CAST(df AS DOUBLE)), 9), 9) AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
    ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(rank AS BIGINT) AS rank, tf, tfidf
FROM ranked WHERE rank <= 5"""

  val t66PmiCollocations: String = ToksCte + """, ex AS (
  SELECT unnest(toks) AS w FROM t
), uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM ex GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni
), bg AS (
  SELECT unnest(toks[1:len(toks)-1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM t
), bgc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
), nb AS (
  SELECT CAST(SUM(c12) AS BIGINT) AS m FROM bgc
)
SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
       round(ln((CAST(c12 AS DOUBLE) / CAST(m AS DOUBLE))
                / ((CAST(u1.c AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(u2.c AS DOUBLE) / CAST(n AS DOUBLE)))), 9)
         AS pmi
FROM bgc
JOIN uni u1 ON u1.w = bgc.w1
JOIN uni u2 ON u2.w = bgc.w2
CROSS JOIN tot CROSS JOIN nb
WHERE c12 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 100"""

  /** The t32/t33 logit readout over the milli-weight sum CTE `m`. */
  private val LogitTail: String = """, s AS (
  SELECT doc_id, n_features,
         round((CAST(milli AS DOUBLE) / 1000.0)
               / CAST(n_features AS DOUBLE), 6) AS logit
  FROM m
)
SELECT doc_id, n_features, logit, logit > 0 AS keep FROM s"""

  /** t32: hashed-feature linear classifier — unigram + 2-shingle
    * features hashed into 4096 buckets, md5-derived stub milli-weights
    * summed as exact BIGINTs (order-free), logit = sum/1000/n at 6 dp.
    */
  val t32HashedClassifier: String = {
    val wMilli =
      s"${h64(s"'w|' || CAST(${h64("x")} % 4096 AS VARCHAR)")} % 2001 - 1000"
    // own toks CTE, NOT the shared one: the Spark side coalesces NULL
    // text to '' (the t28 survive-with-accounting rule), so the twin
    // must tokenize COALESCE(text, '') too
    s"""WITH ${HashedFeatsCtes}, m AS (
  SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_features,
         list_aggregate(list_transform(feats, x -> $wMilli), 'sum') AS milli
  FROM f
)""" + LogitTail
  }

  /** t33: the t32 classifier scored against a weight TABLE — the twin
    * builds the same (bucket → milli-weight) table the Spark side packs
    * (`TextAnalysis.stubWeights`), lists it bucket-ordered, and scores
    * by 1-based list index per hashed feature. Values are identical to
    * t32 by construction; what t33 verifies is the table→lookup path.
    */
  val t33WeightedClassifier: String = {
    s"""WITH wt AS (
  SELECT b AS bucket,
         ${h64("'w|' || CAST(b AS VARCHAR)")} % 2001 - 1000 AS wm
  FROM generate_series(0, 4095) g(b)
), wl AS (
  SELECT list(wm ORDER BY bucket) AS w FROM wt
), ${HashedFeatsCtes}, m AS (
  SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_features,
         list_aggregate(list_transform(feats,
           x -> w[(${h64("x")} % 4096) + 1]), 'sum') AS milli
  FROM f CROSS JOIN wl
)""" + LogitTail
  }

  /** t30: bloom-filter decontamination — replays the
    * Kirsch–Mitzenmacher positions (`h1 = h % m`,
    * `h2 = 1 + (h // m) % (m-1)`, `pos_j = (h1 + j*h2) % m`, m = 2^16,
    * k = 4) in pure BIGINT arithmetic: the occupied-position set IS the
    * bit array, and a probe hits iff all 4 of its positions are
    * occupied — so even false positives match the Spark filter
    * bit-for-bit. Mirrors d8's corpus split (doc_id % 31).
    */
  val t30BloomDecontamination: String = {
    val posOf = (h: String) =>
      s"(($h % 65536 + j * (1 + ($h // 65536) % 65535)) % 65536)"
    s"""WITH t AS (
  SELECT doc_id, ${sh3(s"string_split($Norm, ' ')", Norm)} AS sh
  FROM documents
), ks AS (
  SELECT unnest(generate_series(0, 3)) AS j
), bh AS (
  SELECT ${h64("s")} AS h
  FROM (SELECT unnest(list_distinct(sh)) AS s FROM t WHERE doc_id % 31 = 0)
), occ AS (
  SELECT DISTINCT ${posOf("h")} AS p FROM bh CROSS JOIN ks
), exh AS (
  SELECT doc_id, ${h64("s")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM t
        WHERE doc_id % 31 <> 0)
), probe AS (
  SELECT doc_id, h, ${posOf("h")} AS p FROM exh CROSS JOIN ks
), hit AS (
  SELECT doc_id, h, COUNT(occ.p) = 4 AS is_hit
  FROM probe LEFT JOIN occ ON probe.p = occ.p
  GROUP BY 1, 2
)
SELECT doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN is_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_hits,
       round(CAST(SUM(CASE WHEN is_hit THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS bloom_ratio
FROM hit GROUP BY 1"""
  }

  /** t29: BM25 top-10 retrieval over the four literal probe queries
    * (mirrors ExtQueries.bm25Search). The t25 discipline: idf's `ln`
    * rounds to 9 dp before use, each term weight is IEEE double
    * arithmetic in the exact operation order of the Spark expression
    * then rounds to 9 dp, and per-(query, doc) totals sum in DECIMAL.
    * Ranking orders by the exact decimal total, doc_id tiebreak — never
    * the displayed 6 dp score. df is computed on the query-vocabulary
    * cut of the posting lists (identical values; the Spark side never
    * builds a full-vocabulary rollup).
    */
  /** The t29 BM25 chain over the four fixed probe queries — CTEs `q`
    * through `agg` (query_id, doc_id, raw DECIMAL score `s`). Shared
    * verbatim by t29's ranking tail and t54's lexical fusion side.
    */
  private def Bm25AggCtes: String = s"""q(query_id, qtext) AS (
  VALUES (CAST(1 AS BIGINT), 'spark join merge'),
         (2, 'window stream batch'),
         (3, 'customer order line'),
         (4, 'vector hash table scan')
), t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM documents
), ex AS (
  SELECT doc_id, unnest(toks) AS token FROM t
), dtf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM ex GROUP BY 1, 2
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM dtf GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
), qt AS (
  SELECT query_id, unnest(list_distinct(string_split(qtext, ' '))) AS token
  FROM q
), dfq AS (
  SELECT token, COUNT(*) AS df FROM dtf
  WHERE token IN (SELECT token FROM qt) GROUP BY 1
), scored AS (
  SELECT qt.query_id, d.doc_id,
         ${Bm25TermSel}
), agg AS (
  SELECT query_id, doc_id, SUM(CAST(w AS DECIMAL(28,9))) AS s
  FROM scored GROUP BY 1, 2
)"""

  val t29Bm25TopK: String = s"""WITH $Bm25AggCtes, rk AS (
  SELECT query_id, doc_id, s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS rank
  FROM agg
)
SELECT query_id, doc_id, round(CAST(s AS DOUBLE), 6) AS score,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= 10"""

  /** t54: hybrid retrieval — the full t29 BM25 chain (top-10) full-outer
    * joined with an s1-style dense cosine top-10 (query vectors =
    * vec_id 1..4), fused by reciprocal rank: each 1/(60+rank) term
    * rounded to 9 dp and summed in DECIMAL(28,9) (order-free), re-ranked
    * by (score DESC, doc_id ASC). Ranks CAST to BIGINT (HUGEINT
    * discipline); a doc absent from one ranker carries a NULL rank and
    * a zero term.
    */
  val t54HybridRrf: String = s"""WITH $Bm25AggCtes, lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS rank
  FROM agg QUALIFY rank <= 10
), ${VCte}, n AS (
  SELECT vec_id, e, sqrt(${dotExpr("e", "e")}) AS nm FROM v
), dscored AS (
  SELECT qv.vec_id AS query_id, c.vec_id AS doc_id,
         round(CASE WHEN qv.nm * c.nm > 0
               THEN ${dotExpr("qv.e", "c.e")} / (qv.nm * c.nm) END, 6)
           AS cosine
  FROM n qv CROSS JOIN n c
  WHERE qv.vec_id BETWEEN 1 AND 4 AND qv.vec_id <> c.vec_id
), dense AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC NULLS LAST, doc_id ASC) AS rank
  FROM dscored QUALIFY rank <= 10
), fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         l.rank AS lex_rank, d.rank AS dense_rank,
         CAST(COALESCE(round(1.0 / (60.0 + CAST(l.rank AS DOUBLE)), 9), 0)
              AS DECIMAL(28,9))
         + CAST(COALESCE(round(1.0 / (60.0 + CAST(d.rank AS DOUBLE)), 9), 0)
                AS DECIMAL(28,9)) AS s
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, doc_id, round(CAST(s AS DOUBLE), 9) AS rrf_score,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(dense_rank AS BIGINT) AS dense_rank,
       CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY s DESC, doc_id ASC) AS BIGINT) AS fused_rank
FROM fused
QUALIFY fused_rank <= 10"""

  /** d9: incremental dedup — existing corpus (doc_id % 3 = 0), batch =
    * the rest + injected exact copies (+300000, every 6th existing) and
    * near-dup mutations (+400000, every 9th existing, 11th tokens
    * dropped). Exact digest hits first, then cross-corpus LSH + Jaccard.
    */
  val d9IncrementalDedup: String = s"""WITH base AS (
  SELECT doc_id, $Norm AS text FROM documents
), existing AS (
  SELECT doc_id, text FROM base WHERE doc_id % 3 = 0
), batch AS (
  SELECT doc_id, text FROM base WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT doc_id + 300000, text FROM existing WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id + 400000,
         array_to_string(list_filter(string_split(text, ' '),
           (t, i) -> i % 11 <> 0), ' ')
  FROM existing WHERE doc_id % 9 = 0
), exdig AS (
  SELECT DISTINCT md5(text) AS dig FROM existing
), bd AS (
  SELECT doc_id, text, md5(text) AS dig FROM batch
), exact AS (
  SELECT doc_id FROM bd WHERE dig IN (SELECT dig FROM exdig)
), rest AS (
  SELECT doc_id, text FROM bd WHERE dig NOT IN (SELECT dig FROM exdig)
), rsh AS (
  SELECT doc_id, ${sh3("string_split(text, ' ')", "text")} AS sh FROM rest
), esh AS (
  SELECT doc_id, ${sh3("string_split(text, ' ')", "text")} AS sh
  FROM existing
), rsig AS (
  SELECT doc_id, $sigCols
  FROM rsh
), esig AS (
  SELECT doc_id, $sigCols
  FROM esh
), rbands AS (
  ${bandSelectsFrom("rsig")}
), ebands AS (
  ${bandSelectsFrom("esig")}
), cand AS (
  SELECT DISTINCT r.doc_id AS id_a, e.doc_id AS id_b
  FROM rbands r JOIN ebands e ON r.band = e.band AND r.key = e.key
), ver AS (
  SELECT id_a, ${jaccardExpr("sa.sh", "sb.sh")} AS jaccard
  FROM cand
  JOIN rsh sa ON cand.id_a = sa.doc_id
  JOIN esh sb ON cand.id_b = sb.doc_id
), near AS (
  SELECT DISTINCT id_a AS doc_id FROM ver WHERE jaccard >= 0.5
), newids AS (
  SELECT doc_id FROM rest
  WHERE doc_id NOT IN (SELECT doc_id FROM near)
)
SELECT doc_id, 'exact_dup' AS status FROM exact
UNION ALL
SELECT doc_id, 'near_dup' AS status FROM near
UNION ALL
SELECT doc_id, 'new' AS status FROM newids"""

  /** d10: containment pairs over the near-dup corpus + snippet docs
    * (+500000: first max(3, 40%) tokens of every 17th doc).
    */
  val d10Containment: String = s"""WITH ${nearDupCorpusCtes("corpus0")}, corpus AS (
  SELECT doc_id, text FROM corpus0
  UNION ALL
  SELECT doc_id + 500000,
         array_to_string(string_split(text, ' ')[1:GREATEST(3,
           CAST(floor(len(string_split(text, ' ')) * 0.4) AS INTEGER))], ' ')
  FROM corpus0 WHERE doc_id % 17 = 0
), shing AS (
  SELECT doc_id, ${sh3("string_split(text, ' ')", "text")} AS sh
  FROM corpus
), ${lshCandCtes("shing")}, scored AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS ia,
         CAST(len(list_distinct(sa.sh)) AS DOUBLE) AS na,
         CAST(len(list_distinct(sb.sh)) AS DOUBLE) AS nb
  FROM cand
  JOIN shing sa ON cand.id_a = sa.doc_id
  JOIN shing sb ON cand.id_b = sb.doc_id
)
SELECT id_a, id_b,
       round(ia / na, 6) AS cont_a,
       round(ia / nb, 6) AS cont_b,
       round(greatest(ia / na, ia / nb), 6) AS containment
FROM scored
WHERE round(greatest(ia / na, ia / nb), 6) >= 0.6"""

  /** t19: per-source boilerplate 3-shingles over the corpus with the
    * injected per-source header on every even doc (mirrors
    * ExtQueries.boilerplateNgrams): ≥ 5 docs AND ≥ 20% of the source.
    */
  val t19Boilerplate: String = s"""WITH withbp AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 2 = 0
              THEN '(c) ' || source || ' terms apply. all rights reserved. '
                   || text
              ELSE text END AS text
  FROM documents
), t AS (
  SELECT doc_id, source, string_split($Norm, ' ') AS toks FROM withbp
), s AS (
  SELECT doc_id, source,
         unnest(list_distinct(${sh3("toks", "array_to_string(toks, ' ')")}))
           AS sh
  FROM t
), d AS (
  SELECT source, sh, COUNT(DISTINCT doc_id) AS n_docs FROM s GROUP BY 1, 2
), n AS (
  SELECT source, COUNT(*) AS ndocs FROM withbp GROUP BY 1
)
SELECT d.source, d.sh, d.n_docs
FROM d JOIN n ON d.source = n.source
WHERE d.n_docs >= 5
  AND CAST(d.n_docs AS DOUBLE) >= CAST(n.ndocs AS DOUBLE) * 0.2"""

  /** t20: stratified content-hash sampling — en kept at 20%, the rest
    * at 60%, salt 'strat1'.
    */
  val t20StratifiedSample: String = s"""WITH b AS (
  SELECT doc_id, lang,
         ${h64(s"'strat1|' || $Norm")} % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM b
WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 60 END"""

  /** t21: per-source top-10 by the t3 quality score (same rounded
    * double), doc_id tiebreak.
    */
  val t21DomainQuota: String = s"""WITH t AS (
  SELECT doc_id, source, text, string_split($Norm, ' ') AS toks
  FROM documents
), c AS (
  SELECT doc_id, source,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_char,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
              AS DOUBLE) AS punct,
         CAST(len(list_filter(toks,
           tk -> tk IN ('the','a','of','and','is','to'))) AS DOUBLE) AS stop_n
  FROM t
), q AS (
  SELECT source, doc_id,
         ${QScoreRound}
           AS quality_score
  FROM c
), r AS (
  SELECT source, doc_id, quality_score,
         CAST(row_number() OVER (PARTITION BY source
           ORDER BY quality_score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM q
), mdq AS (
  -- the best quality the quota DROPPED: within a source the dropped
  -- maximum sits at rank quota+1, so the boundary rows carry it
  SELECT MAX(quality_score) AS m FROM r
  WHERE rank = ${TextAnalysis.DomainQuotaN + 1}
)
SELECT source, doc_id, quality_score, rank,
       COALESCE(quality_score < (SELECT m FROM mdq), FALSE)
         AS displaces_better
FROM r WHERE rank <= ${TextAnalysis.DomainQuotaN}"""

  /** t22: deterministic sharded training order — 2 epochs × 8 shards,
    * epoch-salted id hash, dense row_number per (epoch, shard).
    */
  /** t22's epoch fan-out over a caller-named docs relation — the
    * seeded order hash per (epoch, doc). Shared by t22 and the
    * curation composite.
    */
  private def trainOrderChain(docsRel: String,
                              sfx: String = ""): String = s"""e$sfx AS (
  SELECT 0 AS epoch, doc_id,
         ${h64("'ord0|' || CAST(doc_id AS VARCHAR)")} AS h
  FROM $docsRel
  UNION ALL
  SELECT 1 AS epoch, doc_id,
         ${h64("'ord1|' || CAST(doc_id AS VARCHAR)")} AS h
  FROM $docsRel
)"""

  val t22TrainOrder: String = s"""WITH ${trainOrderChain("documents")}
SELECT epoch, doc_id, h % 8 AS shard,
       CAST(row_number() OVER (PARTITION BY epoch, h % 8
         ORDER BY h ASC, doc_id ASC) AS BIGINT) AS shard_pos
FROM e"""

  // mirrors t3's scoring CTEs with lang carried through, then gates on
  // the same ROUNDED score both dialects compare in t3
  val t17QualityGate: String = ToksCte + qualityRatioCtes("lang") + """, s AS (
  SELECT lang, n_tokens_i,
         round(least(n_tok / 100.0, 1.0) * 0.5 + (1.0 - pr) * 0.3
               + least(sr * 5.0, 1.0) * 0.2, 6) AS q
  FROM r
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN q >= 0.5 AND n_tokens_i BETWEEN 5 AND 5000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
       round(CAST(SUM(CASE WHEN q >= 0.5 AND n_tokens_i BETWEEN 5 AND 5000
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS pass_rate
FROM s GROUP BY 1"""

  val t18DomainMixture: String = s"""WITH d AS (
  SELECT source,
         ${h64("source")} % 81 + 10 AS rate,
         ${h64(Norm)} % 100 AS bucket
  FROM documents
)
SELECT source, CAST(MAX(rate) AS BIGINT) AS target_pct,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM d GROUP BY 1"""

  val t13TopTokens: String = ToksCte + """, ex AS (
  SELECT doc_id, unnest(toks) AS token FROM t
)
SELECT token, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM ex GROUP BY 1
ORDER BY n_occurrences DESC, token ASC
LIMIT 50"""

  // the same log-free rational IDF as the Spark side (libm ln is not
  // correctly-rounded and may differ across engines in the last ulp)
  val t14TfIdfTerms: String = ToksCte + """, ex AS (
  SELECT doc_id, unnest(toks) AS term FROM t
), tf AS (
  SELECT doc_id, term, COUNT(*) AS cnt FROM ex GROUP BY 1, 2
), tfn AS (
  SELECT doc_id, term, cnt,
         SUM(cnt) OVER (PARTITION BY doc_id) AS n_tok
  FROM tf
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY 1
), nd AS (
  SELECT COUNT(*) AS n FROM documents
), scored AS (
  SELECT tfn.doc_id, tfn.term,
         (CAST(tfn.cnt AS DOUBLE) / tfn.n_tok)
           * (CAST(nd.n + 1 AS DOUBLE) / (dfreq.df + 1)) AS score
  FROM tfn JOIN dfreq USING (term) CROSS JOIN nd
), ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, CAST(rnk AS BIGINT) AS term_rank,
       round(score, 6) AS tfidf
FROM ranked WHERE rnk <= 5"""

  val t15PiiScrub: String = {
    val email = TextAnalysis.EmailPattern
    val url = TextAnalysis.UrlPattern
    s"""WITH p AS (
  SELECT doc_id,
         ${PiiInjectExpr} AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
       md5(regexp_replace(regexp_replace(text, '$url', '<URL>', 'g'),
                          '$email', '<EMAIL>', 'g')) AS scrubbed_md5
FROM p"""
  }

  val t16Repetition: String = s"""WITH t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks, $Norm AS ntext
  FROM documents
), sh AS (
  SELECT doc_id, unnest(${sh3("toks", "ntext")}) AS s FROM t
), c AS (
  SELECT doc_id, ${h64("s")} AS shash, COUNT(*) AS cnt
  FROM sh GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_shingles,
       COUNT(*) AS n_distinct_shingles,
       CAST(MAX(cnt) AS BIGINT) AS max_shingle_count,
       round(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS repetition_ratio
FROM c GROUP BY 1"""

  // DECIMAL elementwise sums: exact/associative, so the mean is immune
  // to partial-aggregation order (same rationale as x1).
  val s3LangCentroids: String = s"""WITH j AS (
  ${LangEmbJoinSel}
)
SELECT lang, CAST(dim AS BIGINT) AS dim,
       round(CAST(SUM(CAST(val AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6)
         AS centroid,
       COUNT(*) AS n_vecs
FROM j GROUP BY 1, 2"""

  /** s10: centroid drift — two s3 centroid CTEs, DECIMAL(38,18) sums
    * of exact double products, pinned cosine/l2 chain.
    */
  val s10CentroidDrift: String = s"""WITH jr AS (
  ${LangEmbJoinSel}
  WHERE d.doc_id % 2 = 0
), rc AS (
  SELECT lang, dim,
         round(CAST(SUM(CAST(val AS DECIMAL(38,18))) AS DOUBLE)
               / COUNT(*), 6) AS c
  FROM jr GROUP BY 1, 2
), jc AS (
  ${LangEmbJoinSel}
  WHERE d.doc_id % 2 = 1
), cc AS (
  SELECT lang, dim,
         round(CAST(SUM(CAST(val AS DECIMAL(38,18))) AS DOUBLE)
               / COUNT(*), 6) AS c
  FROM jc GROUP BY 1, 2
), agg AS (
  SELECT rc.lang,
         COUNT(*) AS n_dims,
         SUM(CAST(rc.c * cc.c AS DECIMAL(38,18))) AS dot,
         SUM(CAST(rc.c * rc.c AS DECIMAL(38,18))) AS rr,
         SUM(CAST(cc.c * cc.c AS DECIMAL(38,18))) AS cs,
         SUM(CAST((rc.c - cc.c) * (rc.c - cc.c) AS DECIMAL(38,18))) AS d2
  FROM rc JOIN cc ON rc.lang = cc.lang AND rc.dim = cc.dim
  GROUP BY 1
)
SELECT lang, n_dims,
       CASE WHEN rr > 0 AND cs > 0
            THEN round(CAST(dot AS DOUBLE)
                       / (sqrt(CAST(rr AS DOUBLE))
                          * sqrt(CAST(cs AS DOUBLE))), 6) END AS cos_sim,
       round(sqrt(CAST(d2 AS DOUBLE)), 6) AS l2_shift,
       COALESCE(CASE WHEN rr > 0 AND cs > 0
                     THEN round(CAST(dot AS DOUBLE)
                                / (sqrt(CAST(rr AS DOUBLE))
                                   * sqrt(CAST(cs AS DOUBLE))), 6)
                          < 0.98 END, true) AS drifted
FROM agg"""

  val w4ClickFunnel: String = """WITH fc AS (
  SELECT user_id, MIN(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY 1
), conv AS (
  SELECT COUNT(DISTINCT fc.user_id) AS n_converted
  FROM fc JOIN events e
    ON e.user_id = fc.user_id
   AND e.event_type = 'purchase'
   AND e.ts >= fc.first_click
   AND e.ts <= fc.first_click + INTERVAL '1 hour'
)
SELECT (SELECT COUNT(*) FROM fc) AS n_clickers,
       n_converted,
       round(CAST(n_converted AS DOUBLE) / (SELECT COUNT(*) FROM fc), 6)
         AS conversion_rate
FROM conv"""

  /** w5 — the per-user transition rows behind w4's summary: the batch
    * run of the streaming `flatMapGroupsWithState` funnel. Anchored at
    * MIN(click ts) per user, conversion = any purchase within the hour
    * of it (inclusive at both ends, matching the state fold).
    */
  val w5FunnelTransitions: String = """WITH fc AS (
  SELECT user_id, MIN(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY 1
), conv AS (
  SELECT DISTINCT fc.user_id
  FROM fc JOIN events e
    ON e.user_id = fc.user_id
   AND e.event_type = 'purchase'
   AND e.ts >= fc.first_click
   AND e.ts <= fc.first_click + INTERVAL '1 hour'
)
SELECT user_id, 'clicked' AS stage FROM fc
UNION ALL
SELECT user_id, 'converted' AS stage FROM conv"""

  val x8CubeSales: String = graft.queries.OracleSql.EnrichedCte + """
SELECT region_desc, brand_desc,
       ROUND(SUM(total_line_price), 2) AS revenue,
       CAST(GROUPING(region_desc) * 2 + GROUPING(brand_desc) AS BIGINT)
         AS level_id
FROM enriched
GROUP BY CUBE (region_desc, brand_desc)"""

  val x9SetOpsUsers: String = """WITH c AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
), p AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT
  (SELECT COUNT(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p)) AS n_both,
  (SELECT COUNT(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p)) AS n_click_only,
  (SELECT COUNT(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM c)) AS n_purchase_only,
  (SELECT COUNT(*) FROM (SELECT * FROM c UNION SELECT * FROM p)) AS n_any"""

  val x2RangeJoinAttribution: String = """WITH c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, ts AS p_ts, value FROM events WHERE event_type = 'purchase'
)
SELECT click_id, COUNT(p_ts) AS n_purchases,
       round(SUM(value), 2) AS attributed_value
FROM c LEFT JOIN p
  ON c.user_id = p.user_id
 AND p.p_ts > c.click_ts
 AND p.p_ts <= c.click_ts + INTERVAL '30 minutes'
GROUP BY 1"""

  val x3AsOfJoin: String = """WITH o AS (
  SELECT *, last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS asof_ts
  FROM events
)
SELECT event_id, user_id, ts AS event_ts, asof_ts
FROM o WHERE event_type = 'error'"""

  val x4RollupSales: String = graft.queries.OracleSql.EnrichedCte + """
SELECT fin_month_label, region_desc, brand_desc,
       ROUND(SUM(total_line_price), 2) AS revenue,
       CAST(GROUPING(fin_month_label) * 4 + GROUPING(region_desc) * 2
            + GROUPING(brand_desc) AS BIGINT) AS level_id
FROM enriched
GROUP BY ROLLUP (fin_month_label, region_desc, brand_desc)"""

  val x5MovingAvgRevenue: String = graft.queries.OracleSql.EnrichedCte + """
, daily AS (
  SELECT CAST(event_date AS DATE) AS day, SUM(total_line_price) AS _rev
  FROM enriched GROUP BY 1
)
SELECT day, round(_rev, 2) AS revenue,
       round(AVG(_rev) OVER (ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS revenue_ma7
FROM daily"""

  val t6BpeTokenCounts: String = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_word_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]'))
            - len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_punct_tokens
FROM documents"""

  val m2MediaFrames: String = """WITH m AS (
  SELECT doc_id,
         octet_length(encode(
           lpad(hex(64 + doc_id % 192), 4, '0')
             || lpad(hex(64 + doc_id % 128), 4, '0') || text)) AS n_bytes
  FROM documents
)
SELECT doc_id,
       CAST(ceil(n_bytes / 32.0) AS BIGINT) AS n_frames,
       CAST(n_bytes AS BIGINT) AS total_bytes
FROM m"""

  val m1MediaMetadata: String = s"""WITH ${MediaPayloadCte}
SELECT doc_id,
       CAST(('0x' || substr(payload_str, 1, 4)) AS INTEGER) AS width,
       CAST(('0x' || substr(payload_str, 5, 4)) AS INTEGER) AS height,
       CAST(octet_length(encode(payload_str)) AS BIGINT) AS n_bytes,
       md5(payload_str) AS content_md5
FROM m"""

  /** m3: binary media dedup over the m1 synthetic corpus + re-uploads
    * (+700000, identical payload) — digest groups, keeper, bytes.
    */
  val m3MediaDedup: String = s"""WITH ${MediaPayloadCte}, corpus AS (
  SELECT doc_id, payload_str FROM m
  UNION ALL
  SELECT doc_id + 700000, payload_str FROM m WHERE doc_id % 4 = 0
)
SELECT md5(payload_str) AS content_md5,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keeper,
       CAST(SUM(octet_length(encode(payload_str))) AS BIGINT) AS total_bytes
FROM corpus GROUP BY 1"""

  /** m4: chunk-level media dedup — the m3 synthetic corpus plus
    * appended-tail re-uploads (+700000), 64-char chunks (payloads are
    * pure ASCII, so char offsets ARE byte offsets and `md5(string)`
    * equals Spark's `md5(binary)` of the UTF-8 bytes). The zipped
    * unnests mirror `posexplode`; `ceil(len/64)` chunks with the last
    * one short, exactly like `Media.sampleFrames`.
    */
  /** The m4/m5 re-upload corpus (+700000 copies with an appended v2
    * tail) and the 64-byte chunk explode over it — shared verbatim.
    */
  private val MediaChunkCtes: String = s"""${MediaPayloadCte}, corpus AS (
  SELECT doc_id, payload_str FROM m
  UNION ALL
  SELECT doc_id + 700000, payload_str || ' v2 reupload tail'
  FROM m WHERE doc_id % 4 = 0
), chx AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, CAST(ceil(length(payload_str) / 64.0)
                                   AS INTEGER) - 1),
           i -> substr(payload_str, CAST(i * 64 + 1 AS INTEGER), 64)))
           AS chunk
  FROM corpus
)"""

  val m4MediaChunkDedup: String = s"""WITH $MediaChunkCtes
SELECT md5(chunk) AS chunk_md5,
       COUNT(*) AS n_refs,
       CAST(MAX(length(chunk)) AS BIGINT) AS chunk_bytes
FROM chx GROUP BY 1"""

  /** m5: media near-dup pairs — the m4 chunk CTE, distinct per-doc
    * digests, shared-chunk candidates (refs ≤ 64), Jaccard ≥ 0.5.
    */
  val m5MediaNearDups: String = s"""WITH $MediaChunkCtes, ch AS (
  SELECT DISTINCT doc_id, md5(chunk) AS chunk_md5 FROM chx
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY 1
), ok AS (
  SELECT chunk_md5 FROM ch GROUP BY 1 HAVING COUNT(*) <= 64
), elig AS (
  SELECT ch.doc_id, ch.chunk_md5 FROM ch JOIN ok USING (chunk_md5)
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM elig a JOIN elig b
    ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), scored AS (
  SELECT id_a, id_b, n_shared,
         round(CAST(n_shared AS DOUBLE)
               / (sa.n_chunks + sb.n_chunks - n_shared), 6) AS jaccard
  FROM shared
  JOIN sizes sa ON shared.id_a = sa.doc_id
  JOIN sizes sb ON shared.id_b = sb.doc_id
)
SELECT * FROM scored WHERE jaccard >= 0.5"""

  /** m7: perceptual media near-dups — the byte-level average-hash
    * spelled out relationally: per-doc body bytes via hex + unnest,
    * per-cell and global sums, one bit per cell by exact integer
    * cross-multiplication, string_agg in cell order as the signature,
    * equal-signature self-join (bucket-capped) with the digest flag.
    */
  /** The shared m7/m10 prelude: the rotated-mirror corpus, per-byte
    * values bucketed into 16 cells with exact sums/lengths, global
    * totals, and the full (doc, cell) scaffold.
    */
  private val MediaCellsCte: String = """base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
), corpus0 AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 700000,
         translate(text, 'abcdefghijklmnopqrstuvwxyz',
                   'bcdefghijklmnopqrstuvwxyza')
  FROM base WHERE doc_id % 7 = 0
), m AS (
  SELECT doc_id,
         lpad(hex(64 + doc_id % 192), 4, '0')
           || lpad(hex(64 + doc_id % 128), 4, '0') || text AS payload_str
  FROM corpus0
), s AS (
  SELECT doc_id, hex(substr(payload_str, 9)) AS hh,
         md5(payload_str) AS pmd5,
         CAST(length(hex(substr(payload_str, 9))) // 2 AS BIGINT) AS n,
         CAST((length(hex(substr(payload_str, 9))) // 2 + 15) // 16
              AS BIGINT) AS cw
  FROM m
), bv AS (
  SELECT doc_id, n, cw, hh,
         unnest(generate_series(0, CAST(n AS INTEGER) - 1)) AS j
  FROM s
), vals AS (
  SELECT doc_id, n, CAST(j // cw AS INTEGER) AS c,
         CAST(('0x' || substr(hh, CAST(j * 2 + 1 AS INTEGER), 2))
              AS BIGINT) AS v
  FROM bv
), cellsums AS (
  SELECT doc_id, c, SUM(v) AS cs, COUNT(*) AS cl FROM vals GROUP BY 1, 2
), tots AS (
  SELECT doc_id, SUM(v) AS tot, MAX(n) AS nn FROM vals GROUP BY 1
), scaffold AS (
  SELECT s.doc_id, g.c
  FROM s, (SELECT unnest(generate_series(0, 15)) AS c) g
)"""

  /** The equal-signature bucket pair tail shared by m7/m10. */
  private def sigPairsTail(sigCol: String): String = s""", sigd AS (
  SELECT sigs.doc_id, $sigCol, s.pmd5 FROM sigs JOIN s USING (doc_id)
), ok AS (
  SELECT $sigCol FROM sigd GROUP BY 1 HAVING COUNT(*) <= 64
), elig AS (
  SELECT sigd.doc_id, sigd.$sigCol, sigd.pmd5
  FROM sigd JOIN ok USING ($sigCol)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.$sigCol,
       a.pmd5 = b.pmd5 AS digest_match
FROM elig a JOIN elig b ON a.$sigCol = b.$sigCol
                       AND a.doc_id < b.doc_id"""

  val m7PerceptualDups: String = s"""WITH $MediaCellsCte, bits AS (
  SELECT sc.doc_id, sc.c,
         CASE WHEN COALESCE(cl, 0) > 0 AND cs * t.nn > t.tot * cl
              THEN '1' ELSE '0' END AS bit
  FROM scaffold sc
  LEFT JOIN cellsums USING (doc_id, c)
  LEFT JOIN tots t USING (doc_id)
), sigs AS (
  SELECT bits.doc_id, string_agg(bit, '' ORDER BY c) AS psig
  FROM bits GROUP BY 1
)${sigPairsTail("psig")}"""

  /** m10: gradient-hash (dHash) near-dups — the m7 bucket pair join
    * with the ADJACENT-cell signature: bit i = `mean_i > mean_{i+1}`
    * by exact cross-multiplication over the shared cell frame, 15
    * bits from 16 cells (empty cells emit '0').
    */
  val m10GradientDups: String = s"""WITH $MediaCellsCte, cellsf AS (
  SELECT sc.doc_id, sc.c, COALESCE(cs, 0) AS cs, COALESCE(cl, 0) AS cl
  FROM scaffold sc LEFT JOIN cellsums USING (doc_id, c)
), bits AS (
  SELECT a.doc_id, a.c,
         CASE WHEN a.cl > 0 AND b.cl > 0 AND a.cs * b.cl > b.cs * a.cl
              THEN '1' ELSE '0' END AS bit
  FROM cellsf a JOIN cellsf b ON a.doc_id = b.doc_id AND b.c = a.c + 1
), sigs AS (
  SELECT bits.doc_id, string_agg(bit, '' ORDER BY c) AS gsig
  FROM bits GROUP BY 1
)${sigPairsTail("gsig")}"""

  /** m8: temporal media alignment — the m7 corpus with the mirrors
    * additionally TRIMMED by one 32-char frame; per-frame 8-bit
    * perceptual signatures via the m7 byte pipeline grouped at the
    * (doc, frame) grain, 4-frame window keys through the shared
    * 64-bit hash lane, capped equal-key pairs, modal frame offset
    * with (count DESC, offset ASC) ties.
    */
  /** The m8/m9 shared frame-signature chain: from a `(doc_id, text)`
    * CTE, the synthCorpus byte twin → per-frame (32-byte, 8-cell)
    * perceptual signatures as `fsigs(doc_id, f, fsig)` — the m7 byte
    * pipeline at (doc, frame) grain, written once.
    */
  private def frameSigCtes(corpus: String): String = s"""m AS (
  SELECT doc_id,
         lpad(hex(64 + doc_id % 192), 4, '0')
           || lpad(hex(64 + doc_id % 128), 4, '0') || text AS payload_str
  FROM $corpus
), s AS (
  SELECT doc_id, hex(substr(payload_str, 9)) AS hh,
         CAST(length(hex(substr(payload_str, 9))) // 2 AS BIGINT) AS n
  FROM m
), bv AS (
  SELECT doc_id, n, hh,
         unnest(generate_series(0, CAST(n AS INTEGER) - 1)) AS j
  FROM s WHERE n > 0
), vals AS (
  SELECT doc_id,
         CAST(j // 32 AS INTEGER) AS f,
         CAST((j % 32)
              // ((LEAST(32, n - (j // 32) * 32) + 7) // 8)
              AS INTEGER) AS c,
         CAST(('0x' || substr(hh, CAST(j * 2 + 1 AS INTEGER), 2))
              AS BIGINT) AS v
  FROM bv
), cellsums AS (
  SELECT doc_id, f, c, SUM(v) AS cs, COUNT(*) AS cl
  FROM vals GROUP BY 1, 2, 3
), tots AS (
  SELECT doc_id, f, SUM(v) AS tot, COUNT(*) AS fl
  FROM vals GROUP BY 1, 2
), scaffold AS (
  SELECT t.doc_id, t.f, g.c
  FROM tots t, (SELECT unnest(generate_series(0, 7)) AS c) g
), bits AS (
  SELECT sc.doc_id, sc.f, sc.c,
         CASE WHEN COALESCE(cl, 0) > 0 AND cs * t.fl > t.tot * cl
              THEN '1' ELSE '0' END AS bit
  FROM scaffold sc
  LEFT JOIN cellsums USING (doc_id, f, c)
  LEFT JOIN tots t USING (doc_id, f)
), fsigs AS (
  SELECT doc_id, f, string_agg(bit, '' ORDER BY c) AS fsig
  FROM bits GROUP BY 1, 2
)"""

  val m8TemporalAlignment: String = s"""WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
), corpus0 AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 700000,
         translate(substr(text, 33),
                   'abcdefghijklmnopqrstuvwxyz',
                   'bcdefghijklmnopqrstuvwxyza')
  FROM base WHERE doc_id % 7 = 0
), ${frameSigCtes("corpus0")}, wk AS (
  SELECT doc_id, f AS fstart,
         fsig || '|' || lead(fsig, 1) OVER w
              || '|' || lead(fsig, 2) OVER w
              || '|' || lead(fsig, 3) OVER w AS wkstr,
         lead(fsig, 3) OVER w AS tl
  FROM fsigs
  WINDOW w AS (PARTITION BY doc_id ORDER BY f)
), wkeys AS (
  SELECT doc_id, fstart, ${h64("wkstr")} AS wkey
  FROM wk WHERE tl IS NOT NULL
), ok AS (
  SELECT wkey FROM wkeys GROUP BY 1 HAVING COUNT(*) <= 64
), elig AS (
  SELECT wkeys.doc_id, wkeys.fstart, wkeys.wkey
  FROM wkeys JOIN ok USING (wkey)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(b.fstart - a.fstart AS BIGINT) AS frame_offset,
         CAST(COUNT(*) AS BIGINT) AS n_aligned
  FROM elig a JOIN elig b USING (wkey)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3
)
SELECT id_a, id_b, frame_offset, n_aligned
FROM (
  SELECT *, row_number() OVER (PARTITION BY id_a, id_b
    ORDER BY n_aligned DESC, frame_offset ASC) AS rn
  FROM pairs) r
WHERE rn = 1"""

  /** m9: scene-cut detection — the shared frame-signature chain over
    * the PLAIN corpus, then per-doc signature deltas (exact
    * per-position compares over the 8-char bit strings), the ≥4-bit
    * cut verdict (COALESCE false on each doc's first frame), and the
    * running scene number.
    */
  val m9SceneCuts: String = s"""WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
), ${frameSigCtes("base")}, lagged AS (
  SELECT doc_id, CAST(f AS BIGINT) AS frame_no, fsig,
         lag(fsig) OVER (PARTITION BY doc_id ORDER BY f) AS prev
  FROM fsigs
), scored AS (
  SELECT doc_id, frame_no, fsig,
         CASE WHEN prev IS NULL THEN NULL
              ELSE CAST(list_sum(list_transform(generate_series(1, 8),
                     i -> CASE WHEN substr(fsig, CAST(i AS INTEGER), 1)
                                 <> substr(prev, CAST(i AS INTEGER), 1)
                               THEN 1 ELSE 0 END)) AS BIGINT) END
           AS sig_delta
  FROM lagged
), verdict AS (
  SELECT doc_id, frame_no, fsig, sig_delta,
         COALESCE(sig_delta >= 4, FALSE) AS is_cut
  FROM scored
)
SELECT doc_id, frame_no, fsig, sig_delta, is_cut,
       CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY frame_no
                    ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS scene_no
FROM verdict"""

  /** w7: attribution interval join — the plain-SQL form of the
    * stream-stream join's condition.
    */
  val w7AttributionJoin: String = """SELECT v.user_id,
       v.event_id AS from_id, v.ts AS from_ts,
       p.event_id AS to_id, p.ts AS to_ts
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 60 MINUTE"""

  /** x27: attribution credit — the w7 pairs with per-conversion
    * windows; (ts, id) tiebreaks pin both rank directions.
    */
  val x27AttributionCredit: String = """WITH pairs AS (
  SELECT v.user_id,
         v.event_id AS from_id, v.ts AS from_ts,
         p.event_id AS to_id, p.ts AS to_ts
  FROM events v JOIN events p
    ON v.user_id = p.user_id
   AND v.event_type = 'view' AND p.event_type = 'purchase'
   AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 60 MINUTE
)
SELECT user_id, from_id, from_ts, to_id, to_ts,
       COUNT(*) OVER (PARTITION BY to_id) AS n_touches,
       row_number() OVER (PARTITION BY to_id
                          ORDER BY from_ts ASC, from_id ASC) = 1
         AS is_first,
       row_number() OVER (PARTITION BY to_id
                          ORDER BY from_ts DESC, from_id DESC) = 1
         AS is_last,
       round(CAST(1.0 AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY to_id), 6) AS linear_credit
FROM pairs"""

  /** w6: top-3 trending event types per tumbling hour. */
  val w6Trending: String = """WITH c AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), r AS (
  SELECT window_start, event_type, n_events,
         CAST(row_number() OVER (PARTITION BY window_start
           ORDER BY n_events DESC, event_type ASC) AS BIGINT) AS rank
  FROM c
)
SELECT window_start, event_type, n_events, rank FROM r WHERE rank <= 3"""

  val w1HourlyByType: String = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type, COUNT(*) AS n_events,
       round(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2, 3"""

  val w2SlidingHourly: String = """WITH s AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts)
           - to_minutes(CAST(j * 30 AS BIGINT)) AS window_start,
         value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS j)
)
SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
       COUNT(*) AS n_events, round(SUM(value), 2) AS sum_value
FROM s GROUP BY 1, 2"""

  /** Spark session semantics: window = [first, last + gap); a new session
    * starts when the gap to the previous event is >= the gap duration.
    */
  val w3UserSessions: String = s"""WITH ${sessionCtes(", value")}
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '5 minutes' AS session_end,
       user_id, COUNT(*) AS n_events, round(SUM(value), 2) AS sum_value
FROM s GROUP BY user_id, sess"""

  /** x32: hourly concurrency curve over the w3 session intervals. The
    * oracle runs the textbook FLAT global window (fine at oracle
    * scale); the Spark side decomposes it into per-hour windows plus a
    * bucket-offset frame — equality proves the decomposition exact.
    * Ordering ties merge as RANGE-frame peers (both engines' default),
    * so the curve is order-free; running sums ride HUGEINT in DuckDB
    * and CAST back to BIGINT (the x20 discipline).
    */
  val x32Concurrency: String = s"""WITH ${sessionCtes("")}, sess_iv AS (
  SELECT MIN(ts) AS session_start,
         MAX(ts) + INTERVAL '5 minutes' AS session_end
  FROM s GROUP BY user_id, sess
), b AS (
  SELECT session_start AS ts, CAST(1 AS BIGINT) AS delta FROM sess_iv
  UNION ALL
  SELECT session_end AS ts, CAST(-1 AS BIGINT) AS delta FROM sess_iv
), r AS (
  SELECT ts, SUM(delta) OVER (ORDER BY ts, delta) AS running FROM b
)
SELECT date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_boundaries,
       CAST(MIN(running) AS BIGINT) AS min_concurrent,
       CAST(MAX(running) AS BIGINT) AS max_concurrent
FROM r GROUP BY 1"""

  /** t34: the t15 email/URL injection plus the extended shapes (IP,
    * phone, SSN-shaped id) on every 6th doc; counts on the raw text,
    * digest of the sequentially redacted text in the Spark side's
    * pattern order (URL, email, SSN, phone, IP).
    */
  val t34PiiRedact: String = {
    val email = TextAnalysis.EmailPattern
    val url = TextAnalysis.UrlPattern
    val ip = TextAnalysis.Ipv4Pattern
    val ssn = TextAnalysis.SsnPattern
    val phone = TextAnalysis.PhonePattern
    s"""WITH p0 AS (
  SELECT doc_id,
         ${PiiInjectExpr} AS text
  FROM documents
), p AS (
  SELECT doc_id,
         ${PiiStructuredInjectExpr}
  FROM p0
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '$ssn')) AS BIGINT) AS n_ids,
       CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(text, '$url', '<URL>', 'g'),
             '$email', '<EMAIL>', 'g'),
             '$ssn', '<ID>', 'g'),
             '$phone', '<PHONE>', 'g'),
             '$ip', '<IP>', 'g')) AS redacted_md5
FROM p"""
  }

  /** t35: Gopher rules — the stopword literal is generated from the
    * same [[TextAnalysis.LangMarkers]] list the Spark side reads, so
    * the two dialects cannot drift.
    */
  val t35GopherRules: String = {
    val stops = TextAnalysis.LangMarkers.toMap.apply("en")
      .map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
  SELECT doc_id, text, string_split($Norm, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CASE WHEN len(toks) > 0
              THEN CAST(list_aggregate(list_transform(toks, w -> len(w)),
                        'sum') AS DOUBLE) / len(toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks,
                        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / len(toks)
              ELSE 0.0 END AS alpha_frac,
         CASE WHEN len(toks) > 0
              THEN CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                        AS DOUBLE) / len(toks)
              ELSE 0.0 END AS symbol_ratio,
         CAST(len(list_intersect(toks, [$stops])) AS BIGINT) AS n_stop
  FROM t
)
SELECT doc_id, n_words,
       round(mean_len, 6) AS mean_word_len,
       round(alpha_frac, 6) AS alpha_word_frac,
       round(symbol_ratio, 6) AS symbol_ratio,
       n_stop AS n_stop_distinct,
       n_words >= 50 AS r_word_count,
       mean_len >= 3.0 AND mean_len <= 10.0 AS r_mean_len,
       alpha_frac >= 0.8 AS r_alpha,
       symbol_ratio < 0.1 AS r_symbol,
       n_stop >= 2 AS r_stop,
       (n_words >= 50 AND mean_len >= 3.0 AND mean_len <= 10.0
        AND alpha_frac >= 0.8 AND symbol_ratio < 0.1 AND n_stop >= 2)
         AS passes
FROM m"""
  }

  /** Shared v2-crawl CTE body for t37/t38 — mirrors
    * ExtQueries.corpusV2's drop/rewrite/revise/add mix.
    */
  private val V2Raw: String = s"""
  SELECT doc_id,
         CASE WHEN doc_id % 30 = 0
              THEN array_to_string(
                     list_reverse(string_split($Norm, ' ')), ' ')
              WHEN doc_id % 10 = 0 THEN text || ' revised v2'
              ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 8 = 0"""

  /** t37: snapshot diff — both sides digest before the full-outer
    * join.
    */
  val t37CorpusDiff: String = {
    val normOf = (e: String) =>
      s"lower(trim(regexp_replace($e, '\\s+', ' ', 'g')))"
    s"""WITH v1 AS (
  SELECT doc_id, md5(${normOf("COALESCE(text, '')")}) AS old_digest
  FROM documents
), v2raw AS ($V2Raw
), v2 AS (
  SELECT doc_id, md5(${normOf("COALESCE(text, '')")}) AS new_digest
  FROM v2raw
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN old_digest = new_digest THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_digest, new_digest
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id"""
  }

  /** t38: severity of the t37 changes — 3-shingle Jaccard between the
    * old and new normalized text of every changed doc.
    */
  val t38DiffSeverity: String = s"""WITH v2raw AS ($V2Raw
), a AS (
  SELECT doc_id, $Norm AS t1 FROM documents
), b AS (
  SELECT doc_id, $Norm AS t2 FROM v2raw
), ch AS (
  SELECT a.doc_id AS doc_id, t1, t2
  FROM a JOIN b USING (doc_id)
  WHERE md5(t1) <> md5(t2)
), sh AS (
  SELECT doc_id,
         ${sh3("string_split(t1, ' ')", "t1")} AS s1,
         ${sh3("string_split(t2, ' ')", "t2")} AS s2
  FROM ch
), sc AS (
  SELECT doc_id, ${jaccardExpr("s1", "s2")} AS jaccard FROM sh
)
SELECT doc_id, jaccard,
       CASE WHEN jaccard >= 0.5 THEN 'revised'
            ELSE 'rewritten' END AS severity
FROM sc"""

  /** t39: per-source report card — every per-doc signal (t3 quality,
    * t35 gates, t34 PII patterns) computed in one scan of the injected
    * corpus, rolled up by source. Mean quality via DECIMAL sums (the
    * x1/s3 order-free discipline); rates are integer ratios.
    */
  val t39SourceReport: String = {
    val email = TextAnalysis.EmailPattern
    val url = TextAnalysis.UrlPattern
    val ip = TextAnalysis.Ipv4Pattern
    val ssn = TextAnalysis.SsnPattern
    val phone = TextAnalysis.PhonePattern
    val stops = TextAnalysis.LangMarkers.toMap.apply("en")
      .map(s => s"'$s'").mkString(", ")
    s"""WITH p0 AS (
  SELECT doc_id, source,
         ${PiiInjectExpr} AS text
  FROM documents
), p AS (
  SELECT doc_id, source,
         ${PiiStructuredInjectExpr}
  FROM p0
), t AS (
  SELECT source, text, string_split($Norm, ' ') AS toks FROM p
), m AS (
  SELECT source,
         CAST(len(toks) AS BIGINT) AS n_tok,
         CAST(len(toks) AS DOUBLE) AS n_tok_d,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(
                     regexp_replace(text, '[^\\w\\s]', '', 'g'))
                   AS DOUBLE) / length(text)
              ELSE 0.0 END AS pr,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks,
                     tk -> tk IN ($stops))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sr,
         CASE WHEN len(toks) > 0
              THEN CAST(list_aggregate(list_transform(toks, w -> len(w)),
                     'sum') AS DOUBLE) / len(toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks,
                     w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / len(toks)
              ELSE 0.0 END AS alpha_frac,
         CASE WHEN len(toks) > 0
              THEN CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                        AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sym_ratio,
         CAST(len(list_intersect(toks, [$stops])) AS BIGINT) AS n_stop,
         (len(regexp_extract_all(text, '$email'))
          + len(regexp_extract_all(text, '$url'))
          + len(regexp_extract_all(text, '$ip'))
          + len(regexp_extract_all(text, '$ssn'))
          + len(regexp_extract_all(text, '$phone'))) > 0 AS pii
  FROM t
), d AS (
  SELECT source, n_tok,
         round(least(n_tok_d / 100.0, 1.0) * 0.5 + (1.0 - pr) * 0.3
               + least(sr * 5.0, 1.0) * 0.2, 6) AS q,
         CASE WHEN n_tok >= 50 AND mean_len >= 3.0 AND mean_len <= 10.0
                   AND alpha_frac >= 0.8 AND sym_ratio < 0.1
                   AND n_stop >= 2
              THEN 1 ELSE 0 END AS pass,
         CASE WHEN pii THEN 1 ELSE 0 END AS pii_i
  FROM m
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       round(CAST(SUM(CAST(q AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*),
             6) AS mean_quality,
       round(CAST(SUM(pass) AS DOUBLE) / COUNT(*), 6)
         AS gopher_pass_rate,
       round(CAST(SUM(pii_i) AS DOUBLE) / COUNT(*), 6) AS pii_rate
FROM d GROUP BY source"""
  }

  /** Shared t40/t41 CTEs: the URL-injected corpus and its per-doc
    * extracted hosts (group 1 of the host pattern per URL mention).
    */
  private val UrlCtes: String = {
    val url = TextAnalysis.UrlPattern
    val host = Web.HostPattern
    s"""WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' see http://site' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example/p' || doc_id
              ELSE text END AS text
  FROM documents
), hs AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '$url'),
           u -> regexp_extract(u, '$host', 1)) AS hosts
  FROM p
)"""
  }

  /** t40: per-domain doc/mention counts. */
  val t40DomainStats: String = UrlCtes + s""", h AS (
  SELECT doc_id, unnest(hosts) AS domain FROM hs
)
SELECT domain, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_urls
FROM h GROUP BY domain"""

  /** t41: blocklist filter — one null mention per URL-less doc mirrors
    * the Spark `explode_outer`.
    */
  val t41BlocklistFilter: String = {
    val blocked = ExtQueries.BlockedDomains
      .map(d => s"'$d'").mkString(", ")
    UrlCtes + s""", m AS (
  SELECT doc_id,
         unnest(CASE WHEN len(hosts) = 0 THEN [NULL] ELSE hosts END)
           AS domain
  FROM hs
)
SELECT doc_id,
       COUNT(domain) AS n_urls,
       CAST(SUM(CASE WHEN domain IN ($blocked) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blocked_urls,
       SUM(CASE WHEN domain IN ($blocked) THEN 1 ELSE 0 END) = 0 AS kept
FROM m GROUP BY doc_id"""
  }

  /** t43: fractional quality budget — the t3 quality score ranked by
    * percent_rank within each source; verdicts on the unrounded rank.
    */
  val t43QualityBudget: String = {
    val stops = TextAnalysis.LangMarkers.toMap.apply("en")
      .map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
  SELECT doc_id, source, text, string_split($Norm, ' ') AS toks
  FROM documents
), c AS (
  SELECT doc_id, source,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_char,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '',
              'g')) AS DOUBLE) AS punct,
         CAST(len(list_filter(toks, tk -> tk IN ($stops)))
              AS DOUBLE) AS stop_n
  FROM t
), q AS (
  SELECT doc_id, source,
         ${QScoreRound} AS q
  FROM c
), r AS (
  SELECT doc_id, source, q,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY q DESC, doc_id ASC) AS pr
  FROM q
)
SELECT doc_id, source, q AS quality_score,
       round(pr, 6) AS pct_rank, pr <= 0.5 AS kept
FROM r"""
  }

  /** t42: end-to-end curation decision — the t40 URL injection, the d1
    * duplicate injection, the dedup-keeper window, the t35 gates and
    * the t41 blocklist composed into one verdict per doc.
    */
  val t42CurationPipeline: String = {
    val url = TextAnalysis.UrlPattern
    val host = Web.HostPattern
    val stops = TextAnalysis.LangMarkers.toMap.apply("en")
      .map(s => s"'$s'").mkString(", ")
    val blocked = ExtQueries.BlockedDomains
      .map(d => s"'$d'").mkString(", ")
    s"""WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' see http://site' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example/p' || doc_id
              ELSE text END AS text
  FROM documents
), corpus AS (
  SELECT doc_id, text FROM p
  UNION ALL
  SELECT doc_id + 200000, text FROM p WHERE doc_id % 5 = 0
), k AS (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY md5($Norm)
                            ORDER BY doc_id) = 1 AS is_keeper,
         string_split($Norm, ' ') AS toks,
         list_transform(regexp_extract_all(text, '$url'),
           u -> regexp_extract(u, '$host', 1)) AS hosts
  FROM corpus
), m AS (
  SELECT doc_id, is_keeper,
         (CAST(len(toks) AS BIGINT) >= 50
          AND (CASE WHEN len(toks) > 0
                    THEN CAST(list_aggregate(list_transform(toks,
                           w -> len(w)), 'sum') AS DOUBLE) / len(toks)
                    ELSE 0.0 END) >= 3.0
          AND (CASE WHEN len(toks) > 0
                    THEN CAST(list_aggregate(list_transform(toks,
                           w -> len(w)), 'sum') AS DOUBLE) / len(toks)
                    ELSE 0.0 END) <= 10.0
          AND (CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks,
                           w -> regexp_matches(w, '[A-Za-z]')))
                         AS DOUBLE) / len(toks)
                    ELSE 0.0 END) >= 0.8
          AND (CASE WHEN len(toks) > 0
                    THEN CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                         AS DOUBLE) / len(toks)
                    ELSE 0.0 END) < 0.1
          AND CAST(len(list_intersect(toks, [$stops])) AS BIGINT) >= 2)
           AS passes_gopher,
         CAST(len(list_filter(hosts, h -> h IN ($blocked)))
              AS BIGINT) AS n_blocked_urls
  FROM k
)
SELECT doc_id, is_keeper, passes_gopher, n_blocked_urls,
       (is_keeper AND passes_gopher AND n_blocked_urls = 0) AS kept
FROM m"""
  }

  /** t36: corpus BPE encode — the frozen [[Bpe.DemoMerges]] table
    * unrolled into one `list_reduce` greedy left-to-right pass per
    * merge (generated from the same Scala constant, so SQL and Spark
    * cannot drift). The fold mirrors `Bpe.mergePair` exactly: merge
    * when the accumulator's last symbol is `a` and the next is `b`,
    * so "aaa" under (a,a) becomes [aa, a]. Per-level lambda variable
    * names are uniqued (s0/acc0/x0, …) — DuckDB nested lambdas shadow
    * otherwise.
    */
  val t36BpeEncode: String = {
    s"""WITH t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM documents
), e AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         flatten(list_transform(toks, w ->
           CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                ELSE $demoEncode END)) AS pieces
  FROM t
)
SELECT doc_id, n_words,
       CAST(len(pieces) AS BIGINT) AS n_tokens,
       md5(array_to_string(pieces, ' ')) AS tokens_md5
FROM e"""
  }

  /** A per-word encode fold: the given merge table unrolled into
    * nested list_reduce (one greedy left-to-right pass per merge,
    * mirroring `Bpe.mergePair`). Generated from the Scala constant so
    * SQL and Spark cannot drift. Per-level lambda variable names are
    * uniqued (s0/acc0/x0, …) — DuckDB nested lambdas shadow otherwise.
    */
  private def encodeUnroll(merges: Seq[(String, String)]): String = {
    val chars = "list_transform(generate_series(1, len(w)), " +
      "i -> substr(w, i, 1))"
    merges.zipWithIndex.foldLeft(chars) {
      case (inner, ((a, b), m)) =>
        s"""list_reduce(list_transform($inner, s$m -> [s$m]),
   (acc$m, x$m) -> CASE WHEN acc$m[-1] = '$a' AND x$m[1] = '$b'
     THEN list_concat(acc$m[1:len(acc$m)-1], ['${a + b}'])
     ELSE list_concat(acc$m, x$m) END)"""
    }
  }

  /** The t36 per-word encode fold (the DemoMerges table unrolled) —
    * shared with t51.
    */
  private lazy val demoEncode: String = encodeUnroll(Bpe.DemoMerges)

  /** t61: trained-then-frozen BPE encode — the t36 query shape with
    * the table [[graft.ext.Bpe.TrainedMerges]] that the PURE-Scala
    * trainer learns from the fixed [[graft.ext.Bpe.TrainWords]]
    * corpus at class init. The Spark side re-trains the same corpus
    * through the distributed word-frequency pass at query time, so a
    * trainer drift breaks this gate.
    */
  lazy val t61BpeTrainedEncode: String = {
    val enc = encodeUnroll(Bpe.TrainedMerges)
    s"""WITH t AS (
  SELECT doc_id, string_split($Norm, ' ') AS toks FROM documents
), e AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         flatten(list_transform(toks, w ->
           CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                ELSE $enc END)) AS pieces
  FROM t
)
SELECT doc_id, n_words,
       CAST(len(pieces) AS BIGINT) AS n_tokens,
       md5(array_to_string(pieces, ' ')) AS tokens_md5
FROM e"""
  }

  /** t51: per-language tokenizer fertility — the t36 encode fold with
    * language carried through, summed per language (CAST to BIGINT,
    * HUGEINT discipline), pinned double ratios at 6 dp.
    */
  val t51BpeFertility: String = s"""WITH t AS (
  SELECT lang, string_split($Norm, ' ') AS toks FROM documents
), e AS (
  SELECT lang, CAST(len(toks) AS BIGINT) AS n_words,
         CAST(len(flatten(list_transform(toks, w ->
           CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                ELSE $demoEncode END))) AS BIGINT) AS n_tokens,
         CAST(length(array_to_string(toks, ' ')) AS BIGINT) AS n_chars
  FROM t
), s AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_words) AS BIGINT) AS total_words,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM e GROUP BY 1
)
SELECT lang, n_docs, total_words, total_tokens, total_chars,
       CASE WHEN total_words > 0
            THEN round(CAST(total_tokens AS DOUBLE)
                       / CAST(total_words AS DOUBLE), 6) END AS fertility,
       CASE WHEN total_tokens > 0
            THEN round(CAST(total_chars AS DOUBLE)
                       / CAST(total_tokens AS DOUBLE), 6) END
         AS chars_per_token
FROM s"""

  /** t52: DSIR importance weights — hashed unigram+bigram bag models
    * (1024 buckets, add-1 smoothing) for the src0-src3 target slice vs
    * the candidate pool; per-doc average log-likelihood ratio, 9 dp
    * `ln` grain, DECIMAL term sums, top 100 by (weight DESC, doc_id).
    */
  val t52DsirWeights: String = s"""WITH t AS (
  SELECT doc_id, source, string_split($Norm, ' ') AS toks FROM documents
), ng AS (
  SELECT doc_id, source,
         unnest(list_concat(toks,
           CASE WHEN len(toks) >= 2
             THEN list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1])
             ELSE CAST([] AS VARCHAR[]) END)) AS ng
  FROM t
), feat AS (
  SELECT doc_id, source, ${h64("ng")} % 1024 AS b, COUNT(*) AS cnt
  FROM ng GROUP BY 1, 2, 3
), tgt AS (
  SELECT b, SUM(cnt) AS ct FROM feat
  WHERE source IN ('src0', 'src1', 'src2', 'src3') GROUP BY 1
), tn AS (
  SELECT COALESCE(SUM(ct), 0) AS nt FROM tgt
), rawb AS (
  SELECT b, SUM(cnt) AS cr FROM feat
  WHERE source NOT IN ('src0', 'src1', 'src2', 'src3') GROUP BY 1
), rn AS (
  SELECT SUM(cr) AS nr FROM rawb
), lam AS (
  SELECT b,
         CAST(round(ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE)
                       / CAST(nt + 1024 AS DOUBLE)), 9)
              AS DECIMAL(28,9))
       - CAST(round(ln(CAST(cr + 1 AS DOUBLE)
                       / CAST(nr + 1024 AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS lam
  FROM rawb LEFT JOIN tgt USING (b) CROSS JOIN tn CROSS JOIN rn
)
SELECT doc_id, source, CAST(SUM(cnt) AS BIGINT) AS n_ngrams,
       round(CAST(SUM(lam * CAST(cnt AS DECIMAL(9,0))) AS DOUBLE)
             / CAST(SUM(cnt) AS DOUBLE), 6) AS dsir_weight
FROM feat JOIN lam USING (b)
WHERE source NOT IN ('src0', 'src1', 'src2', 'src3')
GROUP BY 1, 2
ORDER BY dsir_weight DESC, doc_id
LIMIT 100"""

  /** x36: market-basket association rules. The oracle runs the same
    * Apriori-cut pair self-join; every ratio is a truncating HUGEINT
    * division in 1e-9 fixed point (the x31 device) CAST back to
    * BIGINT, so support/confidence/lift are exact integers in both
    * engines and the double columns divide identical longs.
    */
  val x36BasketRules: String = """WITH items AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
), nb AS (
  SELECT COUNT(DISTINCT b) AS n FROM items
), ic AS (
  SELECT i, COUNT(*) AS n_i FROM items GROUP BY 1 HAVING COUNT(*) >= 20
), fi AS (
  SELECT items.b, items.i FROM items JOIN ic USING (i)
), pc AS (
  SELECT lhs.i AS item_a, rhs.i AS item_b, COUNT(*) AS n_ab
  FROM fi lhs JOIN fi rhs ON lhs.b = rhs.b AND lhs.i < rhs.i
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT pc.item_a, pc.item_b,
       CAST(ia.n_i AS BIGINT) AS n_a,
       CAST(ib.n_i AS BIGINT) AS n_b,
       CAST(pc.n_ab AS BIGINT) AS n_ab,
       CAST(CAST(pc.n_ab AS HUGEINT) * 1000000000 // nb.n AS BIGINT)
         AS support_e9,
       CAST(CAST(CAST(pc.n_ab AS HUGEINT) * 1000000000 // nb.n
            AS BIGINT) AS DOUBLE) / 1000000000.0 AS support,
       CAST(CAST(pc.n_ab AS HUGEINT) * 1000000000 // ia.n_i AS BIGINT)
         AS conf_ab_e9,
       CAST(CAST(CAST(pc.n_ab AS HUGEINT) * 1000000000 // ia.n_i
            AS BIGINT) AS DOUBLE) / 1000000000.0 AS conf_ab,
       CAST(CAST(pc.n_ab AS HUGEINT) * 1000000000 // ib.n_i AS BIGINT)
         AS conf_ba_e9,
       CAST(CAST(CAST(pc.n_ab AS HUGEINT) * 1000000000 // ib.n_i
            AS BIGINT) AS DOUBLE) / 1000000000.0 AS conf_ba,
       CAST(CAST(pc.n_ab AS HUGEINT) * nb.n * 1000000000
            // (CAST(ia.n_i AS HUGEINT) * ib.n_i) AS BIGINT) AS lift_e9,
       CAST(CAST(CAST(pc.n_ab AS HUGEINT) * nb.n * 1000000000
            // (CAST(ia.n_i AS HUGEINT) * ib.n_i) AS BIGINT) AS DOUBLE)
         / 1000000000.0 AS lift
FROM pc
JOIN ic ia ON pc.item_a = ia.i
JOIN ic ib ON pc.item_b = ib.i
CROSS JOIN nb"""

  /** x37: Pareto frontier by textbook quadratic dominance — the
    * deliberately different algorithm (NOT EXISTS self-probe) whose
    * equality proves the Spark side's collapse + prefix-max scale path
    * implements the same frontier. No arithmetic: raw stored values.
    */
  val x37ParetoParts: String = """SELECT p.p_partkey, p.p_retailprice,
       p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))"""

  /** x38: bounded BFS — the oracle unrolls the frontier/visited loop
    * (f_h = expand(f_{h-1}) EXCEPT v_{h-1}), so every anti-join and
    * distinct in the Spark loop is cross-checked hop by hop. Exact
    * integer counts; zero rows materialize via the seeds × hops
    * scaffold on both sides.
    */
  val x38KhopReach: String = s"""WITH $ChainSeq, e AS (
  $ChainArcSel
), seeds AS (
  SELECT p_partkey AS seed FROM part WHERE p_partkey % 101 = 0
), v0 AS (
  SELECT seed, seed AS node FROM seeds
), f1 AS (
  SELECT DISTINCT v0.seed, e.dst AS node FROM v0 JOIN e ON v0.node = e.src
  EXCEPT SELECT seed, node FROM v0
), v1 AS (
  SELECT seed, node FROM v0 UNION SELECT seed, node FROM f1
), f2 AS (
  SELECT DISTINCT f1.seed, e.dst AS node FROM f1 JOIN e ON f1.node = e.src
  EXCEPT SELECT seed, node FROM v1
), v2 AS (
  SELECT seed, node FROM v1 UNION SELECT seed, node FROM f2
), f3 AS (
  SELECT DISTINCT f2.seed, e.dst AS node FROM f2 JOIN e ON f2.node = e.src
  EXCEPT SELECT seed, node FROM v2
), c AS (
  SELECT seed, 1 AS hop, COUNT(*) AS n FROM f1 GROUP BY 1
  UNION ALL SELECT seed, 2 AS hop, COUNT(*) AS n FROM f2 GROUP BY 1
  UNION ALL SELECT seed, 3 AS hop, COUNT(*) AS n FROM f3 GROUP BY 1
)
SELECT s.seed, h.hop, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_reached
FROM seeds s
CROSS JOIN (VALUES (1), (2), (3)) AS h(hop)
LEFT JOIN c ON c.seed = s.seed AND c.hop = h.hop"""

  /** x39: RFM segmentation. Quintile boundaries ride the x23
    * `quantile_cont` + round-6 kernel over identical customer-level
    * inputs (monetary is the DECIMAL(38,6) order-free sum rounded
    * BEFORE the percentile, both engines); scores count boundary
    * crossings; the CASE ladder is verbatim the Spark ladder.
    */
  val x39RfmSegments: String = """WITH ref AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_d FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), ref.ref_d)
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 6)
              AS DOUBLE) AS monetary
  FROM orders CROSS JOIN ref
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY o_custkey, ref.ref_d
), b AS (
  SELECT
    list_transform(quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]),
      x -> round(x, 6)) AS rb,
    list_transform(quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]),
      x -> round(x, 6)) AS fb,
    list_transform(quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]),
      x -> round(x, 6)) AS mb
  FROM cust
), scored AS (
  SELECT o_custkey, frequency, monetary,
         CAST(recency_days AS INTEGER) AS recency_days,
         6 - (1 + len(list_filter(b.rb, x -> recency_days >= x)))
           AS r_score,
         1 + len(list_filter(b.fb, x -> frequency >= x)) AS f_score,
         1 + len(list_filter(b.mb, x -> monetary >= x)) AS m_score
  FROM cust CROSS JOIN b
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
              THEN 'champion'
            WHEN f_score >= 4 THEN 'loyal'
            WHEN m_score >= 4 THEN 'big_spender'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
            WHEN r_score <= 2 THEN 'hibernating'
            ELSE 'regular' END AS segment
FROM scored"""

  /** t56: per-language Zipf fit — the oracle recomputes the identical
    * rank (freq DESC, token ASC pin), 9-dp ln terms, and the x28
    * moment device (DECIMAL(28,9) linear sums, DECIMAL(38,12)
    * double-product moments), so slope/intercept/R² divide identical
    * doubles.
    */
  val t56ZipfFit: String = ToksCte + s""", ex AS (
  SELECT lang, unnest(toks) AS tok FROM t
), counts AS (
  SELECT lang, tok, COUNT(*) AS freq FROM ex GROUP BY 1, 2
), ranked AS (
  SELECT lang, tok, freq,
         row_number() OVER (PARTITION BY lang
                            ORDER BY freq DESC, tok ASC) AS rnk
  FROM counts
), xy AS (
  SELECT lang,
         round(ln(CAST(rnk AS DOUBLE)), 9) AS x,
         round(ln(CAST(freq AS DOUBLE)), 9) AS y
  FROM ranked
), m AS (
  ${momentsCte("xy", Seq("lang"), "n_distinct_tokens")}
), tot AS (
  SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_tokens FROM counts
  GROUP BY 1
), s AS (
  SELECT m.lang, tot.n_tokens,
         CAST(m.n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
         CAST(m.n_distinct_tokens AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM m JOIN tot ON m.lang = tot.lang
), fit AS (
  SELECT lang, n_tokens, n_distinct_tokens, nd, sxd, syd,
         nd * sxyd - sxd * syd AS covn,
         nd * sxxd - sxd * sxd AS varx,
         nd * syyd - syd * syd AS vary
  FROM s
)
SELECT lang, n_tokens, n_distinct_tokens,
       ${fitExprs("zipf_slope", "zipf_intercept")}
FROM fit"""

  /** s11: k-NN majority-vote classification — the s1 ranking SQL plus
    * a vote rollup; (votes DESC, label ASC) pins tied predictions in
    * both engines.
    */
  val s11KnnClassify: String = s"""WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), n AS (
  SELECT vec_id, label, e, sqrt(${dotExpr("e", "e")}) AS nm FROM v
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         c.label AS nl,
         round(CASE WHEN q.nm * c.nm > 0
               THEN ${dotExpr("q.e", "c.e")} / (q.nm * c.nm) END, 6)
           AS cosine
  FROM n q CROSS JOIN n c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC NULLS LAST, neighbor_id ASC) AS rank
  FROM scored
), votes AS (
  SELECT query_id, nl, COUNT(*) AS n_votes
  FROM r WHERE rank <= 5 GROUP BY 1, 2
), win AS (
  SELECT query_id, nl, n_votes,
         row_number() OVER (PARTITION BY query_id
           ORDER BY n_votes DESC, nl ASC) AS vr
  FROM votes
)
SELECT w.query_id, q.label AS true_label, w.nl AS predicted_label,
       CAST(w.n_votes AS BIGINT) AS n_votes,
       w.nl = q.label AS correct
FROM win w JOIN v q ON w.query_id = q.vec_id
WHERE w.vr = 1"""

  /** x40: two-proportion z-test — per-user conversion flags, arm
    * totals, and the identical IEEE double expression chain; counts
    * CAST to BIGINT (DuckDB SUM widens to HUGEINT), rounds only at
    * the end.
    */
  val x40AbTest: String = """WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c0,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), a AS (
  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN user_id % 2 = 0 OR user_id % 2 = 1
                   THEN 0 ELSE 1 END) AS BIGINT) AS n_u,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c0 ELSE 0 END)
              AS BIGINT) AS ca0,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN c0 ELSE 0 END)
              AS BIGINT) AS cb0,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c1 ELSE 0 END)
              AS BIGINT) AS ca1,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN c1 ELSE 0 END)
              AS BIGINT) AS cb1,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c2 ELSE 0 END)
              AS BIGINT) AS ca2,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN c2 ELSE 0 END)
              AS BIGINT) AS cb2
  FROM u
), m AS (
  SELECT 'purchase' AS metric, n_a, n_b, n_u, ca0 AS ca, cb0 AS cb FROM a
  UNION ALL
  SELECT 'click', n_a, n_b, n_u, ca1, cb1 FROM a
  UNION ALL
  SELECT 'view', n_a, n_b, n_u, ca2, cb2 FROM a
)
SELECT metric, n_a AS n_control, n_b AS n_treatment,
       n_u AS n_unassigned,
       ca AS conv_control, cb AS conv_treatment,
       CASE WHEN n_a > 0
            THEN round(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
       END AS p_control,
       CASE WHEN n_b > 0
            THEN round(CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
       END AS p_treatment,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round(CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)
                       - CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
       END AS lift,
       CASE WHEN n_a > 0 AND n_b > 0
             AND (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) > 0
             AND (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) < 1
            THEN round((CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)
                        - CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE))
                       / sqrt((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
                              / (CAST(n_a AS DOUBLE)
                                 + CAST(n_b AS DOUBLE))
                              * (1.0 - (CAST(ca AS DOUBLE)
                                        + CAST(cb AS DOUBLE))
                                       / (CAST(n_a AS DOUBLE)
                                          + CAST(n_b AS DOUBLE)))
                              * (1.0 / CAST(n_a AS DOUBLE)
                                 + 1.0 / CAST(n_b AS DOUBLE))), 6)
       END AS z
FROM m"""

  /** s12: sign-LSH bucket label purity — the s4 hyperplane family at 8
    * planes over the raw labeled corpus; (count DESC, label ASC) pins
    * the majority; purity is the x31 truncating HUGEINT division.
    */
  val s12BucketPurity: String = s"""WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), b AS (
  SELECT label, ${bucketExpr("e", 8)} AS bucket FROM v
), counts AS (
  SELECT bucket, label, COUNT(*) AS c FROM b GROUP BY 1, 2
), tot AS (
  SELECT bucket, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY 1
), win AS (
  SELECT bucket, label, c,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY c DESC, label ASC) AS rn
  FROM counts
)
SELECT t.bucket, t.n, w.label AS majority_label,
       CAST(w.c AS BIGINT) AS n_majority,
       CAST(CAST(w.c AS HUGEINT) * 1000000000 // t.n AS BIGINT)
         AS purity_e9,
       CAST(CAST(CAST(w.c AS HUGEINT) * 1000000000 // t.n AS BIGINT)
            AS DOUBLE) / 1000000000.0 AS purity
FROM tot t JOIN win w ON t.bucket = w.bucket AND w.rn = 1"""

  /** x41: top session journeys — the w3 lag/gap sessionization, events
    * ordered by the same (ts, event_id) total order the Spark struct
    * sort uses, first-3 path, (n_sessions DESC, journey ASC) cut.
    */
  val x41TopJourneys: String = s"""WITH ${sessionCtes(", event_id, event_type")}, r AS (
  SELECT user_id, sess, event_type,
         row_number() OVER (PARTITION BY user_id, sess
                            ORDER BY ts, event_id) AS rn
  FROM s
), j AS (
  SELECT user_id, sess,
         string_agg(event_type, '>' ORDER BY rn) AS journey
  FROM r WHERE rn <= 3 GROUP BY 1, 2
)
SELECT journey, COUNT(*) AS n_sessions
FROM j GROUP BY 1
ORDER BY n_sessions DESC, journey ASC
LIMIT 20"""

  /** s13: IVF recall@5 — the s9 and s1 oracle queries composed as
    * derived tables (DuckDB allows WITH inside a parenthesized
    * subquery), joined on (query_id, neighbor_id); recall is the x31
    * truncating fixed-point division.
    */
  /** The recall@k tail shared by s13/s25 (Similarity.recallAtK's
    * twin): hits = |ann ∩ exact| per query, recall in the x31
    * fixed-point discipline. One generator so every "price the
    * approximate index" readout composes its two retrieval twins
    * instead of restating the arithmetic.
    */
  private def recallSql(annSql: String, exactSql: String,
                        k: Int): String = s"""WITH ann AS (
  SELECT query_id, neighbor_id FROM ($annSql) annq
), ex AS (
  SELECT query_id, neighbor_id FROM ($exactSql) exq
), hits AS (
  SELECT ex.query_id,
         CAST(COUNT(ann.neighbor_id) AS BIGINT) AS n_hits
  FROM ex LEFT JOIN ann
    ON ex.query_id = ann.query_id AND ex.neighbor_id = ann.neighbor_id
  GROUP BY 1
)
SELECT query_id, n_hits, $k AS k,
       CAST(CAST(n_hits AS HUGEINT) * 1000000000 // $k AS BIGINT)
         AS recall_e9,
       CAST(CAST(CAST(n_hits AS HUGEINT) * 1000000000 // $k AS BIGINT)
            AS DOUBLE) / 1000000000.0 AS recall
FROM hits"""

  val s13IvfRecall: String = recallSql(s9IvfTopK, s1CosineTopK, 5)

  /** s25: binary-code recall@5 — s24's Hamming retrieval priced
    * against the s1 exact kernel on the shared probe set.
    */
  val s25HammingRecall: String = recallSql(s24HammingTopK,
    s1CosineTopK, 5)

  /** v6: Benford first-digit audit — digits read off the exact
    * DECIMAL(38,6) string form (identical half-up cast + exact decimal
    * rendering in both engines), never from float formatting or a
    * cents-scaling that could carry across a power of ten; chi-square
    * terms as doubles over exact longs and the 9-dp expected share,
    * one round at the end.
    */
  val v6Benford: String = """WITH c AS (
  -- TRY_CAST, not CAST: Spark's cast-to-DECIMAL(38,6) overflows to
  -- NULL on magnitudes past ~1e32 (row silently excluded); DuckDB's
  -- CAST would raise instead — TRY_CAST makes both engines exclude
  -- overflow rows identically (harmless for o_totalprice, a
  -- robustness contract for wider columns)
  SELECT regexp_extract(CAST(TRY_CAST(o_totalprice AS DECIMAL(38,6))
           AS VARCHAR), '[1-9]', 0) AS d
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
), f AS (
  SELECT CAST(d AS INTEGER) AS digit FROM c WHERE d <> ''
), counts AS (
  SELECT digit, COUNT(*) AS n_obs FROM f GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM counts
), d AS (
  SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER) AS digit
)
SELECT d.digit,
       CAST(COALESCE(counts.n_obs, 0) AS BIGINT) AS n_obs,
       round(CAST(COALESCE(counts.n_obs, 0) AS DOUBLE)
             / CAST(tot.n AS DOUBLE), 6) AS obs_share,
       round(log10(1.0 + 1.0 / d.digit), 9) AS exp_share,
       round((CAST(COALESCE(counts.n_obs, 0) AS DOUBLE)
              - CAST(tot.n AS DOUBLE)
                * round(log10(1.0 + 1.0 / d.digit), 9))
             * (CAST(COALESCE(counts.n_obs, 0) AS DOUBLE)
                - CAST(tot.n AS DOUBLE)
                  * round(log10(1.0 + 1.0 / d.digit), 9))
             / (CAST(tot.n AS DOUBLE)
                * round(log10(1.0 + 1.0 / d.digit), 9)), 6)
         AS chi2_term
FROM d LEFT JOIN counts ON d.digit = counts.digit CROSS JOIN tot"""

  /** x42: cohort LTV — first-day cohorts, (cohort, offset) DECIMAL
    * revenue cells, a full scaffold through the corpus horizon, and
    * the per-cohort running sum over scaffold-distinct offsets.
    */
  val x42CohortLtv: String = """WITH fd AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1
), sz AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM fd GROUP BY 1
), hz AS (
  SELECT CAST(MAX(ts) AS DATE) AS maxd FROM events
), rev AS (
  SELECT fd.cohort_day,
         CAST(date_diff('day', fd.cohort_day, CAST(e.ts AS DATE))
              AS INTEGER) AS day_offset,
         SUM(CAST(e.value AS DECIMAL(18,6))) AS rv
  FROM events e JOIN fd USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
), scaf AS (
  SELECT sz.cohort_day, sz.cohort_size,
         CAST(unnest(generate_series(0,
           date_diff('day', sz.cohort_day, hz.maxd))) AS INTEGER)
           AS day_offset
  FROM sz CROSS JOIN hz
), j AS (
  SELECT s.cohort_day, s.day_offset, s.cohort_size,
         COALESCE(rev.rv, CAST(0 AS DECIMAL(18,6))) AS rv
  FROM scaf s LEFT JOIN rev
    ON s.cohort_day = rev.cohort_day AND s.day_offset = rev.day_offset
), c AS (
  SELECT *, SUM(rv) OVER (PARTITION BY cohort_day ORDER BY day_offset
    ROWS UNBOUNDED PRECEDING) AS cum
  FROM j
)
SELECT cohort_day, day_offset,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       round(CAST(rv AS DOUBLE), 6) AS revenue,
       round(CAST(cum AS DOUBLE), 6) AS cum_revenue,
       round(CAST(cum AS DOUBLE) / cohort_size, 6) AS ltv
FROM c"""

  /** t57: language-ID confusion matrix — the t4 oracle as a derived
    * table joined to the true lang; shares in the x31 truncating
    * fixed point.
    */
  val t57LangIdConfusion: String = s"""WITH p AS (
  SELECT doc_id, lang_pred FROM ($t4LangId) t4p
), cells AS (
  SELECT d.lang, p.lang_pred, COUNT(*) AS n_docs
  FROM documents d JOIN p USING (doc_id)
  GROUP BY 1, 2
), tot AS (
  SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS t FROM cells GROUP BY 1
)
SELECT c.lang, c.lang_pred, CAST(c.n_docs AS BIGINT) AS n_docs,
       CAST(CAST(c.n_docs AS HUGEINT) * 1000000000 // tot.t AS BIGINT)
         AS share_e9,
       c.lang = c.lang_pred AS is_correct,
       CAST(CAST(CAST(c.n_docs AS HUGEINT) * 1000000000 // tot.t
            AS BIGINT) AS DOUBLE) / 1000000000.0 AS share
FROM cells c JOIN tot ON c.lang = tot.lang"""

  /** x43: clamped balance — the oracle replays the LITERAL sequential
    * `max(0, prev + delta)` recursion step by step (recursive CTE over
    * per-key row numbers), so equality PROVES the Spark side's
    * reflection closed form `S_t − min(0, min S_k)`, not just
    * reproduces it.
    */
  val x43ClampedBalance: String = """WITH RECURSIVE d AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
         CASE WHEN l_linenumber % 2 = 0 THEN l_quantity
              ELSE -l_quantity END AS delta,
         row_number() OVER (PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
  FROM lineitem
), walk AS (
  SELECT l_partkey, l_orderkey, l_linenumber, delta, rn,
         greatest(0.0, delta) AS balance
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.l_partkey, d.l_orderkey, d.l_linenumber, d.delta, d.rn,
         greatest(0.0, walk.balance + d.delta) AS balance
  FROM walk JOIN d
    ON d.l_partkey = walk.l_partkey AND d.rn = walk.rn + 1
)
SELECT l_partkey, l_orderkey, l_linenumber, delta, balance
FROM walk"""

  /** x47: Markov transition matrix — the same (ts, event_id) total
    * order, successor pairs via lead, exact counts, 6-dp row
    * normalization over the tiny matrix frame.
    */
  val x47TransitionMatrix: String = """WITH p AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), c AS (
  SELECT prev_type, next_type, COUNT(*) AS n FROM p
  WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
         AS p
FROM c"""

  /** x49: per-user sequence likelihood under the corpus-fit Markov
    * matrix — the x47 pair chain, probabilities as IEEE divisions of
    * exact longs, 9-dp `ln` into DECIMAL (t31's discipline), bottom-20
    * users by 6-dp average with id ties.
    */
  private val SeqLikelihoodAgg: String = """WITH pr AS (
  SELECT user_id, event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL
), pairs AS (
  SELECT user_id, prev_type, next_type FROM pr
  WHERE next_type IS NOT NULL
), c AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n12
  FROM pairs GROUP BY 1, 2
), rt AS (
  SELECT prev_type, CAST(SUM(n12) AS BIGINT) AS n1 FROM c GROUP BY 1
), p AS (
  SELECT c.prev_type, c.next_type, n12, n1
  FROM c JOIN rt USING (prev_type)
), sc AS (
  SELECT user_id,
         CAST(round(ln(CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS contrib
  FROM pairs JOIN p USING (prev_type, next_type)
), agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         round(CAST(SUM(contrib) AS DOUBLE) / COUNT(*), 6)
           AS avg_logprob
  FROM sc GROUP BY 1
)
SELECT user_id, n_pairs, avg_logprob FROM agg"""

  val x49SequenceLikelihood: String = SeqLikelihoodAgg + """
ORDER BY avg_logprob ASC, user_id ASC
LIMIT 20"""

  /** w10: the streaming scorer's batch execution — x49's per-user
    * aggregate BEFORE its bottom-k cut (every scored user, no order).
    */
  val w10SequenceScore: String = SeqLikelihoodAgg

  /** x44: interval union — the same gaps-and-islands windows in SQL;
    * epoch-second integers end to end (DuckDB's `epoch()` is a DOUBLE
    * with fractional seconds — floor it to match Spark's
    * `unix_timestamp` truncation), HUGEINT sums CAST back.
    */
  val x44IntervalCoverage: String = """WITH base AS (
  SELECT user_id AS key, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts + INTERVAL '30 minutes')) AS BIGINT) AS e,
         event_id AS tb
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), o AS (
  SELECT *, max(e) OVER (PARTITION BY key ORDER BY s, e, tb
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM base
), op AS (
  SELECT *,
         CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS opn,
         CASE WHEN (pm IS NULL OR s > pm) AND pm IS NOT NULL
              THEN s - pm ELSE 0 END AS gap
  FROM o
), isl AS (
  SELECT *, SUM(opn) OVER (PARTITION BY key ORDER BY s, e, tb
    ROWS UNBOUNDED PRECEDING) AS island
  FROM op
), g AS (
  SELECT key, island, COUNT(*) AS n, MIN(s) AS i_s, MAX(e) AS i_e,
         MAX(gap) AS igap
  FROM isl GROUP BY 1, 2
), cov AS (
  SELECT key, CAST(SUM(n) AS BIGINT) AS n_intervals,
         COUNT(*) AS n_islands,
         CAST(SUM(i_e - i_s) AS BIGINT) AS covered_seconds,
         CAST(MAX(i_e) - MIN(i_s) AS BIGINT) AS span_seconds,
         CAST(MAX(igap) AS BIGINT) AS longest_gap_seconds
  FROM g GROUP BY 1
), mf AS (
  -- the operator's malformed complement; on this derived input
  -- (e = s + 30 min) an interval is malformed exactly when ts is null
  SELECT user_id AS key, COUNT(*) AS n_malformed FROM events
  WHERE user_id IS NOT NULL AND ts IS NULL GROUP BY 1
)
SELECT COALESCE(cov.key, mf.key) AS key,
       CAST(COALESCE(n_intervals, 0) AS BIGINT) AS n_intervals,
       CAST(COALESCE(n_islands, 0) AS BIGINT) AS n_islands,
       CAST(COALESCE(covered_seconds, 0) AS BIGINT) AS covered_seconds,
       CAST(COALESCE(span_seconds, 0) AS BIGINT) AS span_seconds,
       CAST(COALESCE(longest_gap_seconds, 0) AS BIGINT)
         AS longest_gap_seconds,
       CAST(COALESCE(n_malformed, 0) AS BIGINT) AS n_malformed
FROM cov FULL JOIN mf ON cov.key = mf.key"""

  /** v7: FD audit — per claimed dependency, the per-key variant count
    * (NULL dependents as their own class via an explicit flag) and the
    * one-row summary; exact integers.
    */
  private def fdSql(name: String, table: String, det: String,
                    dep: String): String = s"""SELECT '$name' AS fd,
       COUNT(*) AS n_keys,
       CAST(COALESCE(SUM(CASE WHEN v > 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_violating_keys,
       CAST(COALESCE(MAX(v), 0) AS BIGINT) AS max_variants,
       COALESCE(SUM(CASE WHEN v > 1 THEN 1 ELSE 0 END), 0) = 0 AS holds
FROM (
  SELECT $det, COUNT(DISTINCT $dep)
         + MAX(CASE WHEN $dep IS NULL THEN 1 ELSE 0 END) AS v
  FROM $table WHERE $det IS NOT NULL GROUP BY 1
) pk"""

  val v7FdAudit: String =
    fdSql("nation_to_region", "nation", "n_nationkey", "n_regionkey") +
      "\nUNION ALL\n" +
      fdSql("brand_to_type", "part", "p_brand", "p_type") +
      "\nUNION ALL\n" +
      fdSql("part_to_supplier", "lineitem", "l_partkey", "l_suppkey") +
      "\nUNION ALL\n" +
      fdSql("customer_to_priority", "orders", "o_custkey",
        "o_orderpriority")

  /** x45: conversion latency — first view to first subsequent
    * purchase per user, floored epoch seconds, x13 quantile kernel.
    */
  val x45ConversionLatency: String = """WITH fv AS (
  SELECT user_id, MIN(ts) AS vt FROM events
  WHERE event_type = 'view' GROUP BY 1
), fp AS (
  SELECT e.user_id, fv.vt, MIN(e.ts) AS pt
  FROM events e JOIN fv USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= fv.vt
  GROUP BY 1, 2
), lat AS (
  SELECT CAST(floor(epoch(pt)) AS BIGINT)
         - CAST(floor(epoch(vt)) AS BIGINT) AS latency_s
  FROM fp
), q AS (
  SELECT quantile_cont(latency_s, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qv
  FROM lat
)
SELECT 'all' AS cohort,
       unnest(CAST([0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[]))
         AS quantile,
       round(unnest(qv), 6) AS value
FROM q"""

  /** v9: drift timeline — per-month PSI of the status mix vs the
    * global mix; the x16 arithmetic (Laplace smoothing over the
    * global class set, 9-dp terms, DECIMAL(28,9) per-period sums) on
    * a categorical domain with a periods × classes scaffold.
    */
  val v9DriftTimeline: String = """WITH cells AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
         CAST(o_orderstatus AS VARCHAR) AS cls,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
), classes AS (
  SELECT cls, SUM(n) AS ng FROM cells GROUP BY 1
), per_period AS (
  SELECT period, SUM(n) AS n_rows FROM cells GROUP BY 1
), tot AS (
  SELECT SUM(ng) AS nt, COUNT(*) AS nc FROM classes
), scaffold AS (
  SELECT p.period, p.n_rows, c.cls, c.ng, COALESCE(cells.n, 0) AS n
  FROM per_period p
  CROSS JOIN classes c
  LEFT JOIN cells ON cells.period = p.period
                 AND cells.cls IS NOT DISTINCT FROM c.cls
), terms AS (
  SELECT period, n_rows, tot.nc,
         round((CAST(ng + 1 AS DOUBLE) / CAST(nt + nc AS DOUBLE)
                - CAST(n + 1 AS DOUBLE) / CAST(n_rows + nc AS DOUBLE))
               * ln((CAST(ng + 1 AS DOUBLE) / CAST(nt + nc AS DOUBLE))
                    / (CAST(n + 1 AS DOUBLE)
                       / CAST(n_rows + nc AS DOUBLE))), 9) AS term
  FROM scaffold CROSS JOIN tot
)
SELECT period,
       CAST(MAX(n_rows) AS BIGINT) AS n_rows,
       CAST(MAX(nc) AS BIGINT) AS n_classes,
       CAST(round(SUM(CAST(term AS DECIMAL(28,9))), 9) AS DOUBLE)
         AS psi
FROM terms GROUP BY 1"""

  /** x52: Kaplan–Meier conversion survival — subjects = first view →
    * first subsequent purchase (x45's pairing), non-converters
    * censored at the corpus max ts; per death time the at-risk
    * cumulative window, truncating 1e-9 fixed-point factors, and the
    * survival product REPLAYED as a left fold `acc · f // 1e9`
    * (`list_reduce` seeds with the first factor; the Spark fold's
    * 1e9 seed makes its first step the same value). A 9-dp double
    * fold diverged at .5-ulp products — hence integers.
    */
  val x52SurvivalCurve: String = """WITH fv AS (
  SELECT user_id, MIN(ts) AS vt FROM events
  WHERE event_type = 'view' GROUP BY 1
), fp AS (
  SELECT e.user_id, MIN(e.ts) AS pt
  FROM events e JOIN fv USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= fv.vt
  GROUP BY 1
), hz AS (
  SELECT MAX(ts) AS h FROM events
), subj AS (
  SELECT CASE WHEN fp.pt IS NOT NULL
              THEN CAST(floor(epoch(fp.pt)) AS BIGINT)
                   - CAST(floor(epoch(fv.vt)) AS BIGINT)
              ELSE CAST(floor(epoch(hz.h)) AS BIGINT)
                   - CAST(floor(epoch(fv.vt)) AS BIGINT) END
           AS duration_s,
         CASE WHEN fp.pt IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM fv LEFT JOIN fp USING (user_id) CROSS JOIN hz
), bydur AS (
  SELECT duration_s, COUNT(*) AS m, SUM(observed) AS d
  FROM subj WHERE duration_s IS NOT NULL AND duration_s >= 0
  GROUP BY 1
), cum AS (
  SELECT duration_s, m, d,
         COALESCE(SUM(m) OVER (ORDER BY duration_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS bef,
         SUM(m) OVER () AS total
  FROM bydur
), death AS (
  SELECT duration_s,
         CAST(total - bef AS BIGINT) AS n_risk,
         CAST(d AS BIGINT) AS n_events,
         CAST(m - d AS BIGINT) AS n_censored,
         CAST((total - bef - d) * 1000000000 // (total - bef)
              AS BIGINT) AS f
  FROM cum WHERE d >= 1
), surv AS (
  SELECT duration_s, n_risk, n_events, n_censored,
         list(f) OVER (ORDER BY duration_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
  FROM death
), folded AS (
  SELECT duration_s, n_risk, n_events, n_censored,
         list_reduce(fs, (acc, x) -> acc * x // 1000000000)
           AS survival_e9
  FROM surv
)
SELECT duration_s, n_risk, n_events, n_censored,
       CAST(survival_e9 AS BIGINT) AS survival_e9,
       CAST(CAST(survival_e9 AS BIGINT) AS DOUBLE) / 1000000000.0
         AS survival
FROM folded"""

  /** x51: inter-arrival cadence — per-user gaps in floored epoch
    * seconds (the x45 parity), exact mid-rank medians in milli-units
    * (`sum · 1000 // count` over the 1-or-2 middle order statistics),
    * the MAD's second median on already-milli deviations (the one
    * possible .5 truncating identically), regularity at MAD ≤ 10% of
    * median with ≥ 5 gaps.
    */
  val x51CadenceProfile: String = """WITH g0 AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
         - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL
), g AS (
  SELECT user_id, gap_s FROM g0 WHERE gap_s IS NOT NULL
), gm AS (
  SELECT user_id, gap_s,
         row_number() OVER (PARTITION BY user_id ORDER BY gap_s) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM g
), med AS (
  SELECT user_id,
         CAST(SUM(gap_s) * 1000 // COUNT(*) AS BIGINT)
           AS median_gap_milli
  FROM gm WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2
  GROUP BY 1
), d AS (
  SELECT g.user_id,
         abs(g.gap_s * 1000 - med.median_gap_milli) AS dev_milli
  FROM g JOIN med USING (user_id)
), dm AS (
  SELECT user_id, dev_milli,
         row_number() OVER (PARTITION BY user_id ORDER BY dev_milli)
           AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM d
), mad AS (
  SELECT user_id,
         CAST(SUM(dev_milli) // COUNT(*) AS BIGINT) AS mad_gap_milli
  FROM dm WHERE rn >= (n + 1) // 2 AND rn <= (n + 2) // 2
  GROUP BY 1
), c AS (
  SELECT user_id, CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_gaps
  FROM g GROUP BY 1
)
SELECT c.user_id, c.n_events, c.n_gaps,
       med.median_gap_milli, mad.mad_gap_milli,
       (c.n_gaps >= 5
        AND mad.mad_gap_milli * 10 <= med.median_gap_milli)
         AS is_regular
FROM c JOIN med USING (user_id) JOIN mad USING (user_id)"""

  /** The guarded daily collapse SHARED by the x53 and x57 oracles —
    * the DuckDB twin of [[graft.ext.Timeseries.dailySeries]]: per
    * (series, day) exact micro-unit value sums with the positivity
    * contract enforced by an `error()` arm, so a negative daily sum
    * fails BOTH twins of BOTH operators loudly (before r15, x57's
    * inlined daily CTE omitted the guard and the twins' failure
    * behavior diverged). A `def` so object-init order cannot null it.
    */
  private def guardedDailySql: String =
    """SELECT event_type AS series, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CASE WHEN COALESCE(SUM(CAST(value AS DECIMAL(18,6))) >= 0,
                            TRUE)
              THEN CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000
                        AS BIGINT)
              ELSE CAST(error('dailySeries: negative daily sum '
                     || 'violates the EWMA positivity contract')
                        AS BIGINT) END
           AS value_micro
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2"""

  /** x53: EWMA forecast baseline — daily sums ride DECIMAL(18,6) into
    * exact micro-units; the non-associative EWMA recurrence replays as
    * `list_reduce` over the day-ordered list (seeds with the first
    * element, matching Spark's `element_at(_vs, 1)` seed), every step
    * `(3x + 7·acc) // 10` in positive BIGINTs so truncating `div` and
    * flooring `//` agree; residual/verdicts compare exact integers.
    */
  val x53EwmaBaseline: String = s"""WITH daily AS (
  $guardedDailySql
), runs AS (
  SELECT series, day, n_events, value_micro,
         list(value_micro) OVER (PARTITION BY series ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vs
  FROM daily
), folded AS (
  SELECT series, day, n_events, value_micro,
         list_reduce(vs, (acc, x) -> (3 * x + 7 * acc) // 10)
           AS ewma_micro
  FROM runs
), lagged AS (
  SELECT series, day, n_events, value_micro, ewma_micro,
         lag(ewma_micro) OVER (PARTITION BY series ORDER BY day)
           AS prev
  FROM folded
)
SELECT series, day, n_events, value_micro,
       CAST(ewma_micro AS BIGINT) AS ewma_micro,
       CAST(CAST(ewma_micro AS BIGINT) AS DOUBLE) / 1000000.0 AS ewma,
       CAST(value_micro - prev AS BIGINT) AS residual_micro,
       (prev IS NOT NULL AND value_micro > prev * 2) AS is_spike,
       (prev IS NOT NULL AND value_micro * 2 < prev) AS is_dip
FROM lagged"""

  /** x68: Holt linear-trend forecast — the [[guardedDailySql]]
    * collapse plus the x68 magnitude guard (same error-arm parity as
    * the positivity contract), then the (level, trend) recurrence as
    * a per-row `list_reduce` over the day-ordered prefix with a
    * struct accumulator seeded (x₁, 0). Every step is the shared
    * offset floor division `(n + C·d) // d − C` (C = 4e17) so
    * truncating `//` and Spark's `div` agree on NEGATIVE trend
    * numerators too. The l′ term is LET-BOUND through a one-element
    * `list_transform` — writing it twice inside the struct literal
    * trips a DuckDB 1.0 lambda-CSE bug that silently reads a stale
    * accumulator (verified: fold of [100,130,160,200] returns
    * (149,5) duplicated vs the correct (150,8) let-bound).
    */
  val x68HoltTrend: String = {
    val C = "400000000000000000"
    val lStep = s"((3 * struct_extract(e, 'l') + " +
      s"7 * (struct_extract(acc, 'l') + struct_extract(acc, 'b'))) + " +
      s"$C * 10) // 10 - $C"
    val bStep = s"((2 * (lp - struct_extract(acc, 'l')) + " +
      s"8 * struct_extract(acc, 'b')) + $C * 10) // 10 - $C"
    s"""WITH daily0 AS (
  $guardedDailySql
), daily AS (
  SELECT series, day, n_events,
         CASE WHEN value_micro < 40000000000000000 THEN value_micro
              ELSE CAST(error('holtTrend: daily sum exceeds the '
                     || '4e16 fixed-point bound') AS BIGINT) END
           AS value_micro
  FROM daily0
), runs AS (
  SELECT series, day, n_events, value_micro,
         list(value_micro) OVER (PARTITION BY series ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vs
  FROM daily
), folded AS (
  SELECT series, day, n_events, value_micro,
         list_reduce(
           list_transform(vs, v -> {'l': v, 'b': CAST(0 AS BIGINT)}),
           (acc, e) -> list_transform([$lStep],
             lp -> {'l': lp, 'b': $bStep})[1]) AS st
  FROM runs
), lagged AS (
  SELECT series, day, n_events, value_micro,
         struct_extract(st, 'l') AS level_micro,
         struct_extract(st, 'b') AS trend_micro,
         lag(struct_extract(st, 'l')) OVER w AS pl,
         lag(struct_extract(st, 'b')) OVER w AS pb
  FROM folded WINDOW w AS (PARTITION BY series ORDER BY day)
)
SELECT series, day, n_events, value_micro,
       CAST(level_micro AS BIGINT) AS level_micro,
       CAST(trend_micro AS BIGINT) AS trend_micro,
       CAST(pl + pb AS BIGINT) AS forecast_micro,
       CAST(value_micro - (pl + pb) AS BIGINT) AS residual_micro,
       CAST(level_micro AS DOUBLE) / 1000000.0 AS level,
       CAST(trend_micro AS DOUBLE) / 1000000.0 AS trend
FROM lagged"""
  }

  /** x56 power-iteration chain: iteration i builds `p$i` from
    * `p${i - 1}` — per-edge `pi_e9 * n12 // n1` contributions summed
    * per destination state, then re-anchored on the full state list
    * (states with no inflow this round hold 0). Mass arriving at a
    * destination with no outgoing edges is DROPPED (it is not a
    * state), so — like the per-term truncation — absorption only
    * shaves Σπ, which the final `mass_e9` column reports.
    */
  private def x56Chain(iters: Int): String =
    (1 to iters).map { i =>
      s"""c$i AS (
  SELECT ed.next_type AS state, SUM(pi_e9 * n12 // n1) AS acc
  FROM ed JOIN p${i - 1} ON ed.prev_type = p${i - 1}.state
  GROUP BY 1
), p$i AS (
  SELECT st.state, COALESCE(c$i.acc, 0) AS pi_e9
  FROM st LEFT JOIN c$i ON st.state = c$i.state
)"""
    }.mkString(", ")

  /** x56: stationary event mix — x49's exact pair-count chain (the
    * x47 matrix as `n12`/`n1` longs, never pre-rounded
    * probabilities), then 8 power-iteration rounds in the x20 e9
    * fixed-point discipline: uniform seed `1e9 // |states|`, per-term
    * truncating `//` on positive operands (≡ Spark's `div`),
    * order-free integer sums per round. `mass_e9` reports the shave.
    */
  val x56StationaryMix: String = s"""WITH pr AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL
), c AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n12
  FROM pr WHERE next_type IS NOT NULL GROUP BY 1, 2
), rt AS (
  SELECT prev_type, CAST(SUM(n12) AS BIGINT) AS n1 FROM c GROUP BY 1
), ed AS (
  SELECT c.prev_type, c.next_type, n12, n1
  FROM c JOIN rt USING (prev_type)
), st AS (SELECT DISTINCT prev_type AS state FROM ed),
ns AS (SELECT COUNT(*) AS n FROM st),
p0 AS (SELECT state, 1000000000 // n AS pi_e9 FROM st CROSS JOIN ns),
${x56Chain(8)},
m AS (SELECT SUM(pi_e9) AS mass_e9 FROM p8)
SELECT p8.state AS event_type, CAST(p8.pi_e9 AS BIGINT) AS pi_e9,
       CAST(p8.pi_e9 AS DOUBLE) / 1000000000.0 AS pi,
       CAST(m.mass_e9 AS BIGINT) AS mass_e9
FROM p8 CROSS JOIN m"""

  /** m6: chunk-store savings — the m4 refcount query as a derived
    * table, one exact-integer rollup, x31 fixed-point ratio.
    */
  val m6DedupSavings: String = s"""SELECT
  CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
  CAST(COALESCE(SUM(n_refs), 0) AS BIGINT) AS n_chunk_refs,
  CAST(COALESCE(SUM(n_refs * chunk_bytes), 0) AS BIGINT)
    AS logical_bytes,
  CAST(COALESCE(SUM(chunk_bytes), 0) AS BIGINT) AS physical_bytes,
  CAST(COALESCE(SUM(n_refs * chunk_bytes), 0)
       - COALESCE(SUM(chunk_bytes), 0) AS BIGINT) AS saved_bytes,
  CASE WHEN COALESCE(SUM(n_refs * chunk_bytes), 0) > 0
       THEN CAST((CAST(COALESCE(SUM(n_refs * chunk_bytes), 0) AS HUGEINT)
                  - COALESCE(SUM(chunk_bytes), 0)) * 1000000000
                 // COALESCE(SUM(n_refs * chunk_bytes), 0) AS BIGINT)
  END AS savings_e9
FROM ($m4MediaChunkDedup) c"""

  /** x46: weighted PageRank — x20's unrolled fixed-point rounds with
    * the uniform out-degree split replaced by the weight-proportional
    * `rank_e9 * w // SUM(w)`; multiplicity of the raw chain is the
    * weight.
    */
  val x46WeightedPageRank: String = s"""WITH $ChainSeq, e AS (
  SELECT l_partkey AS src, nxt AS dst, COUNT(*) AS w
  FROM seq WHERE nxt IS NOT NULL AND l_partkey <> nxt
  GROUP BY 1, 2
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), nn AS (SELECT COUNT(*) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1),
r0 AS (
  SELECT node, 1000000000 // n AS rank_e9 FROM nodes CROSS JOIN nn
), ${prChain(3, r => s"$r.rank_e9 * e.w // outw.ow",
      "JOIN outw ON e.src = outw.src", x20Rank, "CROSS JOIN nn")}
${prReadout(x20Rank(3), "CROSS JOIN nn")}"""

  /** t58: contamination by source — the d8 profile as a derived table
    * joined to provenance; t23's rounded 0.2 flag threshold, x31
    * fixed-point source ratio.
    */
  val t58ContaminationBySource: String = s"""WITH prof AS (
  SELECT * FROM ($d8Decontamination) d8p
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN p.contamination_ratio >= 0.2
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_flagged_docs,
       CAST(SUM(p.n_shingles) AS BIGINT) AS n_shingles,
       CAST(SUM(p.n_contaminated) AS BIGINT) AS n_contaminated,
       CAST(CAST(SUM(p.n_contaminated) AS HUGEINT) * 1000000000
            // SUM(p.n_shingles) AS BIGINT) AS source_ratio_e9,
       MAX(p.contamination_ratio) AS worst_doc_ratio,
       CAST(CAST(CAST(SUM(p.n_contaminated) AS HUGEINT) * 1000000000
            // SUM(p.n_shingles) AS BIGINT) AS DOUBLE) / 1000000000.0
         AS source_ratio
FROM prof p JOIN documents d USING (doc_id)
GROUP BY 1"""

  /** t59: distinctive tokens — lift in 1e-9 fixed point via one
    * truncating HUGEINT division of exact products; (lift DESC, token
    * ASC) rank pin; min-count filter before ranking.
    */
  val t59DistinctiveTokens: String = s"""WITH t AS (
  SELECT doc_id, source, string_split($Norm, ' ') AS toks FROM documents
), ex AS (
  SELECT source, unnest(toks) AS tok FROM t
), counts AS (
  SELECT source, tok, COUNT(*) AS c_st FROM ex GROUP BY 1, 2
), ns AS (
  SELECT source, SUM(c_st) AS n_s FROM counts GROUP BY 1
), ct AS (
  SELECT tok, SUM(c_st) AS c_t FROM counts GROUP BY 1
), tot AS (
  SELECT SUM(c_st) AS n_total FROM counts
), lifted AS (
  SELECT counts.source, counts.tok, counts.c_st, ct.c_t,
         CAST(CAST(counts.c_st AS HUGEINT) * tot.n_total * 1000000000
              // (CAST(ns.n_s AS HUGEINT) * ct.c_t) AS BIGINT)
           AS lift_e9
  FROM counts
  JOIN ns ON counts.source = ns.source
  JOIN ct ON counts.tok = ct.tok
  CROSS JOIN tot
  WHERE counts.c_st >= 10
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
    ORDER BY lift_e9 DESC, tok ASC) AS rank
  FROM lifted
)
SELECT source, tok AS token,
       CAST(c_st AS BIGINT) AS n_in_source,
       CAST(c_t AS BIGINT) AS n_in_corpus,
       lift_e9,
       CAST(lift_e9 AS DOUBLE) / 1000000000.0 AS lift,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5"""

  /** s14: quantization error — the s5 code arithmetic re-run inline
    * (floor on identical doubles is bit-exact), squared errors in
    * DECIMAL(38,12) for order-free sums, one round at the end.
    */
  val s14QuantizationError: String = """WITH v AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), b AS (
  SELECT label, e,
         list_max(list_transform(e, x -> abs(x))) AS m
  FROM v
), per AS (
  SELECT label, unnest(e) AS x, m FROM b
), coded AS (
  SELECT label, x,
         CASE WHEN m > 0 THEN floor(x * 127.0 / m + 0.5) ELSE 0 END AS q,
         round(m / 127.0, 6) AS scale
  FROM per
), err AS (
  SELECT label, x - q * scale AS e FROM coded
)
SELECT label,
       COUNT(*) AS n_dims,
       round(CAST(SUM(CAST(e * e AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 9) AS mse,
       round(MAX(abs(e)), 9) AS max_abs_err
FROM err GROUP BY 1"""

  /** s16: IVF-PQ top-k — the s9 probe CTEs (lang cells, 6-dp cosine,
    * lang-asc ties) composed with the s15 codebook/encode CTEs
    * (int-label codewords, DECIMAL(38,12) subspace distances,
    * codeword-id ties); candidates are the probed cells' members, ADC
    * sums each candidate's 8 code lookups from the query's distance
    * table, rank on (adc asc, neighbor asc). The query side reuses
    * the corpus `cdist` rows (queries ARE corpus members vec_id < 20
    * — the same expression on the same vectors).
    */
  /** Unrolled Lloyd k-means as CTEs over an exploded `(vid, sub, dim,
    * x)` CTE `src` — the twin of [[Similarity]]'s `kmeansLoop`, one
    * CTE triple per iteration so the fixed-point arithmetic (6-dp
    * DECIMAL-mean update, DECIMAL(38,12)-exact assign, ties to the
    * smallest cluster id) is spelled out move for move, the x20 graph-
    * unroll pattern. `${tag}_cb$iters` is the trained codebook,
    * `${tag}_a$iters` the final assignment (dist kept).
    */
  private def kmeansCtes(tag: String, src: String, k: Int,
                         iters: Int): String = {
    val seed = s"'$tag' || '|' || CAST(sub AS VARCHAR) || '|' || " +
      "CAST(vid AS VARCHAR)"
    val init = s"""${tag}_a0 AS (
  SELECT DISTINCT vid, sub,
         CAST(${h64(seed)} % $k AS INTEGER) AS cw
  FROM $src)"""
    val iterCtes = (1 to iters).map { i =>
      s"""${tag}_cb$i AS (
  SELECT a.cw, e.dim,
         round(CAST(SUM(CAST(e.x AS DECIMAL(38,18))) AS DOUBLE)
               / COUNT(*), 6) AS c
  FROM $src e JOIN ${tag}_a${i - 1} a
    ON a.vid = e.vid AND a.sub = e.sub
  GROUP BY 1, 2
), ${tag}_d$i AS (
  SELECT e.vid, e.sub, cb.cw,
         SUM(CAST((e.x - cb.c) * (e.x - cb.c) AS DECIMAL(38,12))) AS dist
  FROM $src e JOIN ${tag}_cb$i cb ON cb.dim = e.dim
  GROUP BY 1, 2, 3
), ${tag}_a$i AS (
  SELECT vid, sub, cw, dist FROM (
    SELECT vid, sub, cw, dist,
           row_number() OVER (PARTITION BY vid, sub
                              ORDER BY dist, cw) AS rn
    FROM ${tag}_d$i) t
  WHERE rn = 1)"""
    }
    (init +: iterCtes).mkString(", ")
  }

  /** s18: the k-means training report — 8 clusters × 4 unrolled Lloyd
    * rounds over the embedding corpus, one row per (cluster, dim) with
    * the final member count and exact within-cluster sum of squares.
    */
  /** The coarse-quantizer k-means prelude: embedding explode (`kx`),
    * double-cast frame (`kme`), and the trained 8-cell chain — shared
    * by s18/s30 and the s20 sweep head.
    */
  private val KmTrainCtes: String = s"""kx AS (
  ${CoarseExplodeSel}
), kme AS (
  SELECT vid, sub, dim, CAST(x AS DOUBLE) AS x FROM kx
), ${kmeansCtes("km", "kme", 8, 4)}"""

  val s18KmeansTrain: String = s"""WITH ${VCte}, ${KmTrainCtes},
stats AS (
  SELECT cw, COUNT(*) AS n_members,
         round(CAST(SUM(dist) AS DOUBLE), 9) AS wcss
  FROM km_a4 GROUP BY 1
)
SELECT CAST(0 AS INTEGER) AS subspace,
       CAST(cb.cw AS INTEGER) AS cluster_id,
       CAST(cb.dim AS BIGINT) AS dim, cb.c AS centroid,
       s.n_members, s.wcss
FROM km_cb4 cb JOIN stats s ON s.cw = cb.cw"""

  /** s30: simplified-silhouette report over the SAME trained chain as
    * s18 — all-centroid exact distances are exactly the km_d4 frame,
    * rank 1 reproduces the stored assignment (same (dist, cw) tie),
    * rank 2 is the nearest-other term; a/b are 9-dp sqrts, s one 6-dp
    * round into DECIMAL(18,6), b COALESCEd to a when only one live
    * cluster exists so s degrades to 0, never NULL. The boundary
    * count compares the exact 6-dp decimal against 0.25.
    */
  val s30Silhouette: String = s"""WITH ${VCte}, ${KmTrainCtes},
ranked AS (
  SELECT vid, cw, dist,
         row_number() OVER (PARTITION BY vid ORDER BY dist, cw) AS rn
  FROM km_d4
), pair AS (
  SELECT vid,
         MAX(CASE WHEN rn = 1 THEN cw END) AS cluster_id,
         MAX(CASE WHEN rn = 1 THEN dist END) AS a2,
         MAX(CASE WHEN rn = 2 THEN dist END) AS b2
  FROM ranked WHERE rn <= 2 GROUP BY 1
), rt AS (
  SELECT vid, cluster_id,
         round(sqrt(CAST(a2 AS DOUBLE)), 9) AS ra,
         round(sqrt(CAST(COALESCE(b2, a2) AS DOUBLE)), 9) AS rb
  FROM pair
), pt AS (
  SELECT cluster_id,
         CASE WHEN greatest(ra, rb) > 0
              THEN CAST(round((rb - ra) / greatest(ra, rb), 6)
                        AS DECIMAL(18,6))
              ELSE CAST(0 AS DECIMAL(18,6)) END AS s
  FROM rt
)
SELECT CAST(cluster_id AS INTEGER) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette,
       CAST(MIN(s) AS DOUBLE) AS min_silhouette,
       CAST(SUM(CASE WHEN s < CAST(0.25 AS DECIMAL(18,6))
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boundary
FROM pt GROUP BY 1"""

  /** s26: k-means elbow sweep — one kmeansCtes chain per k (tags
    * `el2..el16` matching the Spark seedTags), per-k aggregates over
    * the final assignment: live clusters, exact-DECIMAL re-sum of the
    * 9-dp per-cluster WCSS (order-free), size extremes.
    */
  val s26KmeansElbow: String = {
    val ks = Seq(2, 4, 8, 16)
    val chains = ks.map(k => kmeansCtes(s"el$k", "kme", k, 4))
      .mkString(", ")
    val rows = ks.map { k =>
      s"""SELECT $k AS k,
       CAST(COUNT(*) AS BIGINT) AS n_live_clusters,
       CAST(SUM(n_members) AS BIGINT) AS n_vectors,
       round(CAST(SUM(CAST(wcss AS DECIMAL(28,9))) AS DOUBLE), 9)
         AS total_wcss,
       CAST(MAX(n_members) AS BIGINT) AS largest_cluster,
       CAST(MIN(n_members) AS BIGINT) AS smallest_cluster
FROM (SELECT cw, COUNT(*) AS n_members,
             round(CAST(SUM(dist) AS DOUBLE), 9) AS wcss
      FROM el${k}_a4 GROUP BY 1) st$k"""
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id % 4 = 0
), kx AS (
  ${CoarseExplodeSel}
), kme AS (
  SELECT vid, sub, dim, CAST(x AS DOUBLE) AS x FROM kx
), $chains
$rows"""
  }

  /** Unrolled power iteration for s21: one (score, weighted-sum,
    * norm, normalize) CTE quadruple per round over the centered
    * exploded frame `cent` — the kmeansCtes pattern for the
    * eigenvector fixed point (DECIMAL(38,18) sums, 9-dp step
    * doubles, 6-dp normalized components).
    */
  /** The s21 power-iteration chain, parameterized so s33 can run it
    * once per side of the deflation (`tag` prefixes every CTE name,
    * `centRel` is the centered frame it iterates over). Defaults
    * reproduce s21's original SQL byte-for-byte.
    */
  private def powerIterCtes(iters: Int, tag: String = "p",
                            centRel: String = "cent"): String = {
    val init = s"""${tag}v0 AS (
  SELECT dim, CAST(1.0 AS DOUBLE) AS vv FROM mu)"""
    val rounds = (1 to iters).map { i =>
      s"""${tag}s$i AS (
  SELECT vid,
         round(CAST(SUM(CAST(c * vv AS DECIMAL(38,18))) AS DOUBLE), 9)
           AS s
  FROM $centRel JOIN ${tag}v${i - 1} pv ON pv.dim = $centRel.dim
  GROUP BY 1
), ${tag}w$i AS (
  SELECT $centRel.dim,
         round(CAST(SUM(CAST(c * s AS DECIMAL(38,18))) AS DOUBLE), 9)
           AS w
  FROM $centRel JOIN ${tag}s$i USING (vid)
  GROUP BY 1
), ${tag}n$i AS (
  SELECT round(sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,18)))
                         AS DOUBLE)), 9) AS nrm
  FROM ${tag}w$i
), ${tag}v$i AS (
  SELECT dim, round(CASE WHEN nrm > 0 THEN w / nrm
                         ELSE 0.0 END, 6) AS vv
  FROM ${tag}w$i CROSS JOIN ${tag}n$i)"""
    }
    (init +: rounds).mkString(", ")
  }

  /** The centered-embedding-corpus prelude shared by the s21/s33/s34
    * eigen family: corpus explode, n, per-dim 6-dp mean, and the
    * centered frame under a caller-chosen name and materialization
    * (s21's single chain reads it twice — inline; s33/s34 iterate
    * whole chains over it — MATERIALIZED). One lane, three twins: a
    * prelude drift would silently split the family's arithmetic.
    */
  private def centPrelude(centName: String,
                          materialized: Boolean): String = {
    val mat = if (materialized) "MATERIALIZED " else ""
    s"""${VCte}, ${ExqCte}, exd AS (
  SELECT vid, dim, CAST(x AS DOUBLE) AS x FROM exq
), n1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v
), mu AS (
  SELECT dim,
         round(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
               / COUNT(*), 6) AS mu
  FROM exd GROUP BY 1
), $centName AS $mat(
  SELECT vid, exd.dim, (x - mu.mu) AS c
  FROM exd JOIN mu ON mu.dim = exd.dim
)"""
  }

  /** s33: All-but-the-Top removal report — the s21 chain (shared
    * [[powerIterCtes]] generator, tag `p`), the 9-dp projection
    * bridge deflating the corpus off PC1 (`cent2` MATERIALIZED — it
    * embeds the whole first chain and is read by the second), then
    * the same chain again (tag `q`) over the deflated frame, with
    * before/after eigen shares and the removed-variance fraction.
    */
  val s33AnisotropyRemoval: String = s"""WITH ${
    centPrelude("cent", materialized = true)}, ${powerIterCtes(6)},
ds AS (
  SELECT vid,
         round(CAST(SUM(CAST(c * vv AS DECIMAL(38,18))) AS DOUBLE), 9)
           AS s
  FROM cent JOIN pv6 pv ON pv.dim = cent.dim
  GROUP BY 1
), cent2 AS MATERIALIZED (
  SELECT cent.vid, cent.dim, round(c - s * vv, 9) AS c
  FROM cent JOIN ds USING (vid) JOIN pv6 pv ON pv.dim = cent.dim
), ${powerIterCtes(6, "q", "cent2")},
tr1 AS (
  SELECT CAST(SUM(CAST(c * c AS DECIMAL(38,18))) AS DOUBLE) AS tss1
  FROM cent
), tr2 AS (
  SELECT CAST(SUM(CAST(c * c AS DECIMAL(38,18))) AS DOUBLE) AS tss2
  FROM cent2
)
SELECT n AS n_vectors,
       round(p.nrm / n, 6) AS lambda1,
       round(CASE WHEN tss1 > 0 THEN p.nrm / tss1 ELSE 0.0 END, 6)
         AS var_share_before,
       round(q.nrm / n, 6) AS lambda2,
       round(CASE WHEN tss2 > 0 THEN q.nrm / tss2 ELSE 0.0 END, 6)
         AS var_share_after,
       round(CASE WHEN tss1 > 0 THEN (tss1 - tss2) / tss1
             ELSE 0.0 END, 6) AS removed_var_share
FROM n1 CROSS JOIN pn6 p CROSS JOIN qn6 q
CROSS JOIN tr1 CROSS JOIN tr2"""

  /** s34: rank-k All-but-the-Top — k+1 statically-unrolled
    * [[powerIterCtes]] chains (tags `k1..k{k+1}`), a 9-dp deflation
    * bridge between consecutive chains (the s33 projection), per-rank
    * trace and 6-dp top-PC-share CTEs, and one UNION ALL branch per
    * rank whose WHERE prefix re-encodes the Spark loop's stop policy
    * (rank r emits iff every earlier deflation left a next-PC share
    * ≥ `stop` — rank 1 is unconditional) over the SAME rounded shares
    * the Spark side collects, so the data-dependent row count cannot
    * diverge. Every centered frame is MATERIALIZED: each feeds a whole
    * iteration chain plus the traces, and DuckDB re-expands
    * per-reference CTEs (the Brandes/k-core OOM lesson).
    */
  private def allButTopKSql(k: Int, iters: Int, stop: String): String = {
    val chains = (1 to k + 1).map { r =>
      val defl = if (r == 1) "" else s"""k${r - 1}ds AS (
  SELECT vid,
         round(CAST(SUM(CAST(c * vv AS DECIMAL(38,18))) AS DOUBLE), 9)
           AS s
  FROM centK${r - 1} JOIN k${r - 1}v$iters pv
    ON pv.dim = centK${r - 1}.dim
  GROUP BY 1
), centK$r AS MATERIALIZED (
  SELECT centK${r - 1}.vid, centK${r - 1}.dim, round(c - s * vv, 9) AS c
  FROM centK${r - 1} JOIN k${r - 1}ds USING (vid)
  JOIN k${r - 1}v$iters pv ON pv.dim = centK${r - 1}.dim
), """
      defl + powerIterCtes(iters, s"k$r", s"centK$r")
    }.mkString(",\n")
    val scalars = (1 to k + 1).map { r =>
      s"""trK$r AS (
  SELECT CAST(SUM(CAST(c * c AS DECIMAL(38,18))) AS DOUBLE) AS tss
  FROM centK$r
), shK$r AS (
  SELECT round(CASE WHEN tss > 0 THEN nrm / tss ELSE 0.0 END, 6) AS sh
  FROM k${r}n$iters CROSS JOIN trK$r)"""
    }.mkString(",\n")
    val rows = (1 to k).map { r =>
      val policy = (2 to r).map(j => s" AND shK$j.sh >= $stop").mkString
      val policyJoins = (2 until r).map(j => s" CROSS JOIN shK$j").mkString
      s"""SELECT $r AS rank, n AS n_vectors,
       round(p.nrm / n, 6) AS lambda,
       shK$r.sh AS var_share,
       round(CASE WHEN t1.tss > 0 THEN (tr.tss - tn.tss) / t1.tss
             ELSE 0.0 END, 6) AS removed_var_share,
       shK${r + 1}.sh AS var_share_after
FROM n1 CROSS JOIN k${r}n$iters p CROSS JOIN shK$r
CROSS JOIN shK${r + 1}$policyJoins
CROSS JOIN trK$r tr CROSS JOIN trK${r + 1} tn CROSS JOIN trK1 t1
WHERE n > 0$policy"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${centPrelude("centK1", materialized = true)},
$chains,
$scalars
$rows"""
  }

  /** s34: the query-layer instantiation — k=3, stop 0.15, 4
    * iterations per chain (determinism holds at any iteration count;
    * the chain count is the cost knob).
    */
  val s34AllButTopK: String = allButTopKSql(3, 4, "0.15")

  /** s21: leading principal component by 6 unrolled power-iteration
    * rounds over the centered embedding corpus — per-dim mean and
    * unit PC1 component, Rayleigh eigenvalue and its variance share.
    */
  val s21TopPc: String = s"""WITH ${
    centPrelude("cent", materialized = false)}, ${powerIterCtes(6)},
tr AS (
  SELECT CAST(SUM(CAST(c * c AS DECIMAL(38,18))) AS DOUBLE) AS tss
  FROM cent
)
SELECT pv.dim AS dim, mu.mu AS mean_d, pv.vv AS pc1,
       round(nrm / n, 6) AS lambda1,
       round(CASE WHEN tss > 0 THEN nrm / tss ELSE 0.0 END, 6)
         AS var_share
FROM pv6 pv
JOIN mu ON mu.dim = pv.dim
CROSS JOIN pn6 CROSS JOIN tr CROSS JOIN n1"""

  /** One probe width's CTE chain for s20: filter the shared scored
    * candidate frame `sc` to probe rank ≤ np, rank top-5, score hits
    * against the exact set `ex2`, sum hits and candidates.
    */
  private def nprobeCtes(np: Int): String = s"""ann$np AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC NULLS LAST, neighbor_id ASC) AS rank
    FROM sc WHERE pr <= $np) t
  WHERE rank <= 5
), h$np AS (
  SELECT ex2.query_id,
         CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
  FROM ex2 LEFT JOIN ann$np a
    ON a.query_id = ex2.query_id AND a.neighbor_id = ex2.neighbor_id
  GROUP BY 1
), cd$np AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS cand
  FROM sc WHERE pr <= $np GROUP BY 1
), ag$np AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(n_hits) AS BIGINT) AS sum_hits,
         CAST(SUM(COALESCE(cand, 0)) AS BIGINT) AS n_candidates
  FROM h$np LEFT JOIN cd$np USING (query_id))"""

  /** s20: IVF tuning sweep — the trained 8-cell quantizer probed at
    * widths {1,2,4,8}, each width's recall@5 vs the exact cosine
    * top-5 and the corpus fraction its candidates touch, from ONE
    * scored frame carrying probe ranks (nested probe sets).
    */
  val s20IvfTuning: String = s"""WITH ${VCte}, exq AS (
  ${CoarseExplodeSel}
), kme AS (
  SELECT vid, sub, dim, CAST(x AS DOUBLE) AS x FROM exq
), ${kmeansCtes("km", "kme", 8, 4)},
cells AS (
  SELECT vid AS neighbor_id, cw AS cell FROM km_a4
), ${CentCnQCtes}, ${ProbeCte}, probed AS (
  SELECT query_id, cell, rn AS pr FROM (
    SELECT query_id, cell,
           row_number() OVER (PARTITION BY query_id
             ORDER BY csim DESC NULLS LAST, cell ASC) AS rn
    FROM probe) t
  WHERE rn <= 8
), cv AS (
  SELECT vec_id AS neighbor_id, e AS cvv,
         sqrt(${dotExpr("e", "e")}) AS cm
  FROM v
), sc AS (
  SELECT p.query_id, c2.neighbor_id, p.pr,
         round(CASE WHEN q.qn * c2.cm > 0
               THEN ${dotExpr("q.qv", "c2.cvv")} / (q.qn * c2.cm) END, 6)
           AS cosine
  FROM probed p
  JOIN cells cl ON cl.cell = p.cell
  JOIN cv c2 ON c2.neighbor_id = cl.neighbor_id
  JOIN q ON q.query_id = p.query_id
  WHERE p.query_id <> c2.neighbor_id
), ex2 AS (
  SELECT query_id, neighbor_id FROM ($s1CosineTopK) s1x
), nc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v
), ${Seq(1, 2, 4, 8).map(nprobeCtes).mkString(", ")}
SELECT nprobe, n_queries,
       CAST(CAST(sum_hits AS HUGEINT) * 1000000000
            // (n_queries * 5) AS BIGINT) AS mean_recall_e9,
       n_candidates,
       CAST(CAST(n_candidates AS HUGEINT) * 1000000000
            // (n_queries * (n - 1)) AS BIGINT) AS scanned_frac_e9,
       CAST(CAST(CAST(sum_hits AS HUGEINT) * 1000000000
            // (n_queries * 5) AS BIGINT) AS DOUBLE) / 1000000000.0
         AS mean_recall,
       CAST(CAST(CAST(n_candidates AS HUGEINT) * 1000000000
            // (n_queries * (n - 1)) AS BIGINT) AS DOUBLE) / 1000000000.0
         AS scanned_frac
FROM (${Seq(1, 2, 4, 8).map(np =>
        s"SELECT CAST($np AS INTEGER) AS nprobe, * FROM ag$np")
      .mkString(" UNION ALL ")}) u
CROSS JOIN nc"""

  /** One truncation width's CTE chain for s19: prefix-slice the
    * corpus, rerun the s1 ranking shape on the slice, score hits
    * against the full-width exact set `ex`, summarize with the s13
    * integer-e9 recall arithmetic.
    */
  private def truncWidthCtes(d: Int): String = s"""tn$d AS (
  SELECT vec_id, e[1:$d] AS e FROM v
), tm$d AS (
  SELECT vec_id, e, sqrt(${dotExpr("e", "e")}) AS nm FROM tn$d
), ts$d AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(CASE WHEN q.nm * c.nm > 0
               THEN ${dotExpr("q.e", "c.e")} / (q.nm * c.nm) END, 6)
           AS cosine
  FROM tm$d q CROSS JOIN tm$d c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
), tr$d AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC NULLS LAST, neighbor_id ASC) AS rank
    FROM ts$d) t
  WHERE rank <= 5
), th$d AS (
  SELECT ex.query_id,
         CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
  FROM ex LEFT JOIN tr$d a
    ON a.query_id = ex.query_id AND a.neighbor_id = ex.neighbor_id
  GROUP BY 1
), ta$d AS (
  SELECT CAST($d AS INTEGER) AS trunc_dim,
         CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(CAST(SUM(n_hits) AS HUGEINT) * 1000000000
              // (COUNT(*) * 5) AS BIGINT) AS mean_recall_e9,
         CAST(MIN(n_hits) AS BIGINT) AS min_hits
  FROM th$d)"""

  /** s19: truncated-dimension recall — each prefix width's cosine
    * top-5 scored against the full-width exact top-5 (s1's probe
    * set), one summary row per width, recall in exact e9 integers.
    */
  val s19TruncationRecall: String = s"""WITH ${VCte}, ex AS (
  SELECT query_id, neighbor_id FROM ($s1CosineTopK) s1ex
), ${Seq(8, 16, 32, 64).map(truncWidthCtes).mkString(", ")}
SELECT trunc_dim, n_queries, mean_recall_e9, min_hits,
       CAST(mean_recall_e9 AS DOUBLE) / 1000000000.0 AS mean_recall
FROM (${Seq(8, 16, 32, 64).map(d => s"SELECT * FROM ta$d")
      .mkString(" UNION ALL ")}) u"""

  /** d13: SemDeDup — the s2 injected corpus clustered by the s18
    * trainer (8 cells, 4 unrolled Lloyd rounds over the SAME seed
    * chain), then within-cluster pairwise cosine; a vector whose max
    * 6-dp cosine to a smaller-id cluster-mate reaches 0.95 is a
    * `drop`, the cluster's smallest id carries a NULL prior sim.
    */
  val d13Semdedup: String = s"""WITH ${VCte}, ${NearDupVecCorpusCte}, kx AS (
  SELECT vec_id AS vid, 0 AS sub,
         unnest(generate_series(0, len(e) - 1)) AS dim,
         unnest(e) AS x
  FROM corpus
), kme AS (
  SELECT vid, sub, dim, CAST(x AS DOUBLE) AS x FROM kx
), ${kmeansCtes("km", "kme", 8, 4)},
cl AS (
  SELECT c.vec_id, a.cw AS cluster_id, c.e,
         sqrt(${dotExpr("c.e", "c.e")}) AS nm
  FROM corpus c JOIN km_a4 a ON a.vid = c.vec_id
), prior AS (
  SELECT b.vec_id,
         MAX(round(CASE WHEN a.nm * b.nm > 0
             THEN ${dotExpr("a.e", "b.e")} / (a.nm * b.nm) END, 6))
           AS max_prior_sim
  FROM cl a JOIN cl b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  GROUP BY 1
)
SELECT c.vec_id, CAST(c.cluster_id AS INTEGER) AS cluster_id,
       CASE WHEN coalesce(p.max_prior_sim, -2.0) >= 0.95
            THEN 'drop' ELSE 'keep' END AS action,
       p.max_prior_sim
FROM cl c LEFT JOIN prior p ON p.vec_id = c.vec_id"""

  private def ivfPqAnnSql(k: Int): String = s"""WITH ${VCte}, ${ExqCte}, ${ExsCte}, ${ExcCte}, ${kmeansCtes("km", "exc", 8, 4)},
${kmeansCtes("pq", "exs", 32, 3)},
cells AS (
  SELECT vid AS neighbor_id, cw AS cell FROM km_a4
), codes AS (
  SELECT vid AS neighbor_id, sub, cw FROM pq_a3
), ${CentCnQCtes}, ${ProbeCte}, ${ProbedCte}, ${QexAdcCtes}, ${adcTailSql(k)}"""

  val s16IvfPqTopK: String = ivfPqAnnSql(5)

  /** s23: residual IVF-PQ top-5 — the s16 prelude (shared coarse
    * training), then the PQ loop re-trained on residuals
    * `x − centroid(cell(x))` via the same [[kmeansCtes]] generator
    * (tag `pqr` — the seed string must match the Spark loop's), query
    * ADC per (query, probed cell) on the query's residual in that
    * cell's frame, candidate lookup keyed by the neighbor's cell.
    */
  val s23IvfPqResidual: String = s"""WITH ${VCte}, ${ExqCte}, ${ExsCte}, ${ExcCte}, ${kmeansCtes("km", "exc", 8, 4)},
rescell AS (
  SELECT vid, cw AS cell FROM km_a4
), res AS (
  SELECT e.vid, e.sub, e.dim, e.x - cb.c AS x
  FROM exs e
  JOIN rescell rc ON rc.vid = e.vid
  JOIN km_cb4 cb ON cb.cw = rc.cell AND cb.dim = e.dim
), ${kmeansCtes("pqr", "res", 32, 3)},
cells AS (
  SELECT vid AS neighbor_id, cell FROM rescell
), codes AS (
  SELECT vid AS neighbor_id, sub, cw FROM pqr_a3
), ${CentCnQCtes}, ${ProbeCte}, ${ProbedCte}, qres AS (
  SELECT p.query_id, p.cell, e.sub, e.dim, e.x - cb.c AS x
  FROM probed p
  JOIN exs e ON e.vid = p.query_id
  JOIN km_cb4 cb ON cb.cw = p.cell AND cb.dim = e.dim
), adc AS (
  SELECT qr.query_id, qr.cell, qr.sub, pc.cw,
         SUM(CAST((qr.x - pc.c) * (qr.x - pc.c) AS DECIMAL(38,12)))
           AS dist
  FROM qres qr JOIN pqr_cb3 pc ON pc.dim = qr.dim
  GROUP BY 1, 2, 3, 4
), ${adcTailSql(5, perCell = true)}"""

  /** s22: two-stage retrieval — the s16 ADC pipeline at a 15-candidate
    * budget as a derived table, re-ranked by the exact 6-dp squared-L2
    * on the full-precision vectors (the s17 `sc` expression restricted
    * to the candidate set), top-5 with smaller-id ties.
    */
  val s22IvfPqRerank: String = {
    val l2 = "list_aggregate(list_transform(list_zip(q.e, c.e), " +
      "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')"
    s"""WITH cand AS (
  SELECT query_id, neighbor_id FROM (${ivfPqAnnSql(15)}) s22cand
), ve AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sc AS (
  SELECT cand.query_id, cand.neighbor_id, round($l2, 6) AS dist2
  FROM cand
  JOIN ve q ON q.vec_id = cand.query_id
  JOIN ve c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, dist2
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY dist2 ASC, neighbor_id ASC) AS rank
  FROM sc) r
WHERE rank <= 5"""
  }

  /** s17: IVF-PQ recall@5 — the s16 pipeline as a derived table
    * against the exact squared-L2 top-5 (same metric as the index,
    * 6-dp rounded distances, ascending rank with id ties), the s13
    * recall arithmetic on top.
    */
  /** Recall@5 of an ANN SQL against the exact squared-L2 top-5 over
    * the `vec_id < 20` probe set — the s17 harness, generalized so
    * every L2-metric index variant (s16 → s17, s27 → s28) prices its
    * approximation through the same twin.
    */
  private def l2RecallSql(annSql: String): String = {
    val l2 = "list_aggregate(list_transform(list_zip(q.e, c.e), " +
      "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')"
    s"""WITH ann AS (
  SELECT query_id, neighbor_id FROM ($annSql) annq
), ve AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sc AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round($l2, 6) AS dist2
  FROM ve q CROSS JOIN ve c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
), ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist2 ASC, neighbor_id ASC) AS rn
    FROM sc) r
  WHERE rn <= 5
), hits AS (
  SELECT ex.query_id,
         CAST(COUNT(ann.neighbor_id) AS BIGINT) AS n_hits
  FROM ex LEFT JOIN ann
    ON ex.query_id = ann.query_id AND ex.neighbor_id = ann.neighbor_id
  GROUP BY 1
)
SELECT query_id, n_hits, 5 AS k,
       CAST(CAST(n_hits AS HUGEINT) * 1000000000 // 5 AS BIGINT)
         AS recall_e9,
       CAST(CAST(CAST(n_hits AS HUGEINT) * 1000000000 // 5 AS BIGINT)
            AS DOUBLE) / 1000000000.0 AS recall
FROM hits"""
  }

  val s17IvfPqRecall: String = l2RecallSql(s16IvfPqTopK)

  /** One frozen-codebook ENCODE pass (the kmeansCtes d/a iteration
    * pair without the loop): every (vid, sub) in `src` to its nearest
    * codeword of a FINISHED codebook `cb` — exact DECIMAL(38,12) L2,
    * ties to the smallest codeword id, ≡ the Spark twin's
    * `pqNearestCodewords`.
    */
  private def assignCte(tag: String, src: String, cb: String): String =
    s"""${tag}_d AS (
  SELECT e.vid, e.sub, cb.cw,
         SUM(CAST((e.x - cb.c) * (e.x - cb.c) AS DECIMAL(38,12))) AS dist
  FROM $src e JOIN $cb cb ON cb.dim = e.dim
  GROUP BY 1, 2, 3
), ${tag}_a AS (
  SELECT vid, sub, cw FROM (
    SELECT vid, sub, cw,
           row_number() OVER (PARTITION BY vid, sub
                              ORDER BY dist, cw) AS rn
    FROM ${tag}_d) t
  WHERE rn = 1)"""

  /** s27: IVF-PQ with the FAISS train-on-sample / encode-full
    * lifecycle — both [[kmeansCtes]] chains run ONLY on the
    * `hash64('s27|' || vid) % 4 = 0` hash-sample (the t9 split
    * discipline), the full corpus is encoded against the frozen
    * `km_cb4`/`pq_cb3` codebooks via [[assignCte]], and the query
    * tail is the audited s16 shape verbatim.
    */
  private def ivfPqSampledAnnSql(k: Int): String = {
    val samp = s"${h64("'s27|' || CAST(vid AS VARCHAR)")} % 4 = 0"
    s"""WITH ${VCte}, ${ExqCte}, ${ExsCte}, ${ExcCte}, exs_t AS (
  SELECT vid, dim, x, sub FROM exs WHERE $samp
), exc_t AS (
  SELECT vid, sub, dim, x FROM exc WHERE $samp
), ${kmeansCtes("km", "exc_t", 8, 4)},
${kmeansCtes("pq", "exs_t", 32, 3)},
${assignCte("encc", "exc", "km_cb4")},
${assignCte("encp", "exs", "pq_cb3")},
cells AS (
  SELECT vid AS neighbor_id, cw AS cell FROM encc_a
), codes AS (
  SELECT vid AS neighbor_id, sub, cw FROM encp_a
), ${CentCnQCtes}, ${ProbeCte}, ${ProbedCte}, ${QexAdcCtes}, ${adcTailSql(k)}"""
  }

  val s27IvfPqSampled: String = ivfPqSampledAnnSql(5)

  /** s29: frozen-index increment assignment — both [[kmeansCtes]]
    * chains train on the `vid % 5 ≠ 4` corpus, the held-out fifth is
    * encoded against the frozen `km_cb4`/`pq_cb3` codebooks via
    * [[assignCte]] (≡ the Spark side's array-expression argmin: same
    * DECIMAL(38,12) distances, same (dist, cw) tie order), one row
    * per (vector, subspace) with the coarse cell repeated.
    */
  val s29IndexAssign: String = s"""WITH ${VCte}, ${ExqCte}, ${ExsCte}, ${ExcCte}, exs_t AS (
  SELECT vid, dim, x, sub FROM exs WHERE vid % 5 <> 4
), exc_t AS (
  SELECT vid, sub, dim, x FROM exc WHERE vid % 5 <> 4
), ${kmeansCtes("km", "exc_t", 8, 4)},
${kmeansCtes("pq", "exs_t", 32, 3)},
exs_b AS (
  SELECT vid, dim, x, sub FROM exs WHERE vid % 5 = 4
), exc_b AS (
  SELECT vid, sub, dim, x FROM exc WHERE vid % 5 = 4
), ${assignCte("bc", "exc_b", "km_cb4")},
${assignCte("bp", "exs_b", "pq_cb3")}
SELECT bp_a.vid AS vec_id, CAST(bc_a.cw AS BIGINT) AS cell,
       CAST(bp_a.sub AS BIGINT) AS subspace,
       CAST(bp_a.cw AS BIGINT) AS codeword
FROM bp_a JOIN bc_a ON bc_a.vid = bp_a.vid"""

  /** s28: recall@5 of the sampled-training index — prices what the
    * FAISS train-on-sample contract costs against exact squared-L2
    * (spoiler: nothing the full-corpus training wasn't already
    * losing; that is WHY the contract works).
    */
  val s28SampledRecall: String = l2RecallSql(s27IvfPqSampled)

  /** t62: CCNet perplexity tertile buckets — the t25 scoring chain as
    * CTEs, exact interpolated tertile boundaries rounded to 6 dp
    * (x23's quantile_cont parity), bucket by `>=` on pinned doubles,
    * per-source rollup with a window share over the tiny bucket frame.
    * The literal thirds round-trip to the same IEEE doubles Scala's
    * `i.toDouble / bins` produces.
    */
  val t62PerplexityBuckets: String = UnigramLmCtes + """, scored AS (
  SELECT doc_id,
         round(CAST(SUM(CAST(lp AS DECIMAL(28,9))
                        * CAST(cnt_d AS DECIMAL(9,0))) AS DOUBLE)
               / CAST(SUM(cnt_d) AS DOUBLE), 6) AS avg_logprob
  FROM dtf JOIN lm USING (token)
  GROUP BY 1
), ws AS (
  SELECT d.source, s.avg_logprob
  FROM documents d JOIN scored s USING (doc_id)
), b AS (
  SELECT list_transform(
           quantile_cont(avg_logprob,
             [0.3333333333333333, 0.6666666666666666]),
           x -> round(x, 6)) AS bounds
  FROM ws
), binned AS (
  SELECT source,
         CASE len(list_filter(b.bounds, x -> ws.avg_logprob >= x))
           WHEN 2 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END
           AS bucket,
         avg_logprob
  FROM ws CROSS JOIN b
), g AS (
  SELECT source, bucket, COUNT(*) AS n_docs,
         round(CAST(SUM(CAST(avg_logprob AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*), 6) AS avg_logprob
  FROM binned GROUP BY 1, 2
)
SELECT source, bucket, CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(n_docs AS DOUBLE)
             / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE), 6)
         AS share,
       avg_logprob
FROM g"""

  /** s15: product-quantization report — round-robin `dim % 8`
    * subspaces, per-label 6-dp DECIMAL-mean codebooks (the s3
    * centroid discipline), subvector SSEs as DECIMAL(38,12) sums so
    * the argmin comparison is exact (ties on codeword id), mse/max
    * rounded once at 9 dp.
    */
  val s15PqReport: String = """WITH ex AS (
  SELECT e.vec_id AS vid, e.label AS cw0,
         unnest(generate_series(0, len(e.embedding) - 1)) AS dim,
         unnest(e.embedding) AS x
  FROM embeddings e
), exs AS (
  SELECT vid, cw0, dim, CAST(x AS DOUBLE) AS x, dim % 8 AS sub FROM ex
), cb AS (
  SELECT cw0 AS cw, dim,
         round(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
               / COUNT(*), 6) AS c
  FROM exs GROUP BY 1, 2
), d AS (
  SELECT vid, sub, cw,
         SUM(CAST((x - c) * (x - c) AS DECIMAL(38,12))) AS dist,
         COUNT(*) AS nd
  FROM exs JOIN cb USING (dim) GROUP BY 1, 2, 3
), ch AS (
  SELECT vid, sub, cw, dist, nd FROM (
    SELECT vid, sub, cw, dist, nd,
           row_number() OVER (PARTITION BY vid, sub
                              ORDER BY dist, cw) AS rn
    FROM d) r WHERE rn = 1
)
SELECT CAST(sub AS INTEGER) AS subspace,
       COUNT(*) AS n_vecs,
       CAST(COUNT(DISTINCT cw) AS BIGINT) AS n_codewords_used,
       round(CAST(SUM(dist) AS DOUBLE) / CAST(SUM(nd) AS DOUBLE), 9)
         AS mse,
       round(CAST(MAX(dist) AS DOUBLE), 9) AS max_vec_sse
FROM ch GROUP BY 1"""

  /** t64: credit-card audit — the same injected corpus, candidates by
    * the shared 13–16-digit shape, Luhn checksum as pure integer
    * lambda arithmetic (odd-position digits as-is, even doubled and
    * digit-summed, total % 10), valid numbers folded out of the text
    * left-to-right via list_reduce seeded with the raw text.
    */
  val t64CcAudit: String = {
    val digit = "CAST(substr(cc, length(cc) - i + 1, 1) AS INTEGER)"
    s"""WITH p0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' card 4539578763621486'
              ELSE text END AS text
  FROM documents
), p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' acct 4111111111'
                   || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
              ELSE text END AS text
  FROM p0
), c AS (
  SELECT doc_id, COALESCE(text, '') AS t,
         regexp_extract_all(COALESCE(text, ''),
           '${TextAnalysis.CcCandidatePattern}', 0) AS cands
  FROM p
), v AS (
  SELECT doc_id, t, cands,
         list_filter(cands, cc -> list_aggregate(list_transform(
             generate_series(1, length(cc)), i ->
               CASE WHEN i % 2 = 1 THEN $digit
                    ELSE CASE WHEN $digit < 5 THEN $digit * 2
                         ELSE $digit * 2 - 9 END END), 'sum')
           % 10 = 0) AS valids
  FROM c
)
SELECT doc_id,
       CAST(len(cands) AS BIGINT) AS n_cc_candidates,
       CAST(len(valids) AS BIGINT) AS n_cc_valid,
       md5(list_reduce(list_prepend(t, valids),
         (acc, cc) -> regexp_replace(acc, '\\b' || cc || '\\b',
                                     '<CC>', 'g'))) AS redacted_md5
FROM v"""
  }

  /** t65: contrastive triplet mining — the t29 BM25 pipeline as a
    * derived table; positives at rank 1, hard negatives ranks 2–4,
    * the easy negative an anti-joined hash-argmin over corpus ids
    * (the same md5 lane both engines share).
    */
  val t65HardNegatives: String = {
    val h = h64("CAST(p.query_id AS VARCHAR) || '|' " +
      "|| CAST(d.doc_id AS VARCHAR)")
    val hb = h64("'t65b|' || CAST(doc_id AS VARCHAR)")
    val hq = h64("'t65q|' || CAST(query_id AS VARCHAR)")
    s"""WITH ranked AS (
  SELECT query_id, doc_id, rank FROM ($t29Bm25TopK) r29
), pos AS (
  SELECT query_id, doc_id AS positive_id, $hq % 16 AS b
  FROM ranked WHERE rank = 1
), hard AS (
  SELECT query_id, doc_id AS negative_id, rank AS negative_rank
  FROM ranked WHERE rank > 1 AND rank <= 4
), cut AS (
  SELECT doc_id, $hb % 16 AS b FROM documents
), easy0 AS (
  SELECT p.query_id, p.positive_id, d.doc_id, $h AS h
  FROM cut d JOIN pos p ON p.b = d.b
  WHERE NOT EXISTS (SELECT 1 FROM ranked r
                    WHERE r.query_id = p.query_id
                      AND r.doc_id = d.doc_id)
), easy AS (
  SELECT query_id, positive_id, doc_id AS negative_id,
         'easy' AS kind, CAST(NULL AS BIGINT) AS negative_rank
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY h, doc_id) AS rn
        FROM easy0) e
  WHERE rn = 1
)
SELECT pos.query_id, pos.positive_id, hard.negative_id,
       'hard' AS kind, hard.negative_rank
FROM pos JOIN hard USING (query_id)
UNION ALL
SELECT query_id, positive_id, negative_id, kind, negative_rank
FROM easy"""
  }

  /** t63: token-budget epoch allocation — the t26 weight chain (9-dp
    * sqrt over the token-mass share, DECIMAL(28,9) normalizer), a
    * floor-exact allocation at the 200k-token budget, 6-dp epochs,
    * and the flag comparing the ROUNDED value.
    */
  val t63EpochAllocation: String = s"""WITH s AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split($Norm, ' '))) AS BIGINT)
           AS available_tokens
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(SUM(available_tokens) AS BIGINT) AS t FROM s
), w AS (
  SELECT s.source, s.n_docs, s.available_tokens,
         round(sqrt(CAST(s.available_tokens AS DOUBLE)
                    / CAST(tot.t AS DOUBLE)), 9) AS rw
  FROM s CROSS JOIN tot
), nrm AS (
  SELECT SUM(CAST(rw AS DECIMAL(28,9))) AS nm FROM w
), a AS (
  SELECT source, n_docs, available_tokens,
         round(rw / CAST(nrm.nm AS DOUBLE), 9) AS weight
  FROM w CROSS JOIN nrm
), b AS (
  SELECT *, CAST(floor(weight * 200000.0) AS BIGINT)
              AS allocated_tokens
  FROM a
), c AS (
  SELECT *, round(CAST(allocated_tokens AS DOUBLE)
                  / CAST(available_tokens AS DOUBLE), 6) AS epochs
  FROM b
)
SELECT source, n_docs, available_tokens, weight, allocated_tokens,
       epochs, epochs > 4.0 AS over_repeated
FROM c"""

  /** t60: vocabulary growth — (token, min doc_id) in one aggregate,
    * bucket rollup, running sum over the tiny bucket frame; exact
    * integers, HUGEINT window sum CAST back.
    */
  val t60VocabGrowth: String = ToksCte + """, ex AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), fs AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM ex GROUP BY 1
), pb AS (
  SELECT CAST(floor(first_doc / 50.0) * 50 AS BIGINT)
           AS bucket_start_doc,
         COUNT(*) AS n_new_tokens
  FROM fs GROUP BY 1
)
SELECT CAST(bucket_start_doc / 50 AS BIGINT) AS bucket,
       bucket_start_doc,
       CAST(n_new_tokens AS BIGINT) AS n_new_tokens,
       CAST(SUM(n_new_tokens) OVER (ORDER BY bucket_start_doc
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_tokens
FROM pb"""
}

package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, max}
import graft.operators._
import graft.registry.RegShared._

/** Deduplication slice of the driver contract: exact, MinHash-LSH, SimHash, n-gram, SRP, embedding-cosine, semantic, substring, and clustering dedup with DuckDB oracles.
  *
  * Split out of SparkEntry (r11): entries and oracle SQL move verbatim;
  * SparkEntry concatenates the family maps. Column names stay identical
  * between `queries` and `oracleSql` (the driver sorts columns by name
  * before hashing).
  */
object DedupReg {

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> Dedup.exact _,
    "dedup_minhash_lsh" -> Dedup.minhashLsh _,
    "dedup_simhash" -> Dedup.simhash _,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccard _,
    "dedup_fuzzy_edit" -> ((s: SparkSession, dir: String) =>
      Dedup.fuzzyEditPairs(s, dir)),
    "dedup_substring_winnow" -> ((s: SparkSession, dir: String) =>
      Dedup.substringDupWinnow(s, dir)),
    "dedup_substring" -> ((s: SparkSession, dir: String) =>
      Dedup.substringDup(s, dir)),
    "dedup_containment" -> Dedup.containment _,
    "dedup_embedding_cosine" -> ((s: SparkSession, d: String) =>
      Dedup.embeddingCosineOn(plantedEmbeddings(s, d))),
    "dedup_cc" -> Cluster.dedupCc _,
    "dedup_canonical" -> Cluster.dedupCanonical _,
    "dedup_incremental" -> Dedup.incremental _,
    "dedup_srp_bands" -> Dedup.srpBands _,
    "dedup_embedding_srp" -> ((s: SparkSession, dir: String) =>
      Dedup.embeddingSrp(s, dir)),
    "dedup_semantic" -> ((s: SparkSession, dir: String) =>
      Dedup.semantic(s, dir)),
    "dedup_chunk" -> ((s: SparkSession, dir: String) =>
      TextAnalysis.chunkDedup(s, dir)),
  )

  private[graft] val simhashOracle: String = {
    val sums = (0 until 16)
      .map(b => s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val bits = (0 until 16)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        h AS (SELECT doc_id, ${phashSql("tok", 0)} AS h FROM tok),
        s AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
        SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM s ORDER BY doc_id"""
  }

  private[graft] val minhashOracle: String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tk AS (SELECT doc_id, t FROM tok WHERE len(t) >= 3),
        sh0 AS (SELECT doc_id, t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] AS shingle
                FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t)-1, 1))) AS pos FROM tk)),
        sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
        hs AS (SELECT doc_id, shingle,
                      ${graft.functions.PortableHash.phashWindowSql("md5(shingle)", 0)} AS h1,
                      ${graft.functions.PortableHash.phashWindowSql("md5(shingle)", 1)} AS h2,
                      ${graft.functions.PortableHash.phashWindowSql("md5(shingle)", 2)} AS h3,
                      ${graft.functions.PortableHash.phashWindowSql("md5(shingle)", 3)} AS h4
               FROM sh),
        sig AS (SELECT doc_id, min(h1) AS mh1, min(h2) AS mh2, min(h3) AS mh3,
                       min(h4) AS mh4, count(*) AS n_shingles
                FROM hs GROUP BY doc_id),
        bands AS (SELECT doc_id, n_shingles,
                         unnest(['1_' || mh1 || '_' || mh2,
                                 '2_' || mh3 || '_' || mh4]) AS bk FROM sig),
        cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                        l.n_shingles AS na, r.n_shingles AS nb
                 FROM bands l JOIN bands r ON l.bk = r.bk
                 WHERE l.doc_id < r.doc_id),
        inter AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS inter
                  FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle
                  WHERE sa.doc_id < sb.doc_id GROUP BY 1, 2)
        SELECT c.a, c.b, CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
               CAST(c.na + c.nb - coalesce(i.inter, 0) AS BIGINT) AS union_n,
               CAST((20000 * coalesce(i.inter, 0) + (c.na + c.nb - coalesce(i.inter, 0)))
                 // (2 * (c.na + c.nb - coalesce(i.inter, 0))) AS BIGINT) AS jaccard_e4
        FROM cand c LEFT JOIN inter i ON c.a = i.a AND c.b = i.b
        ORDER BY c.a, c.b"""

  private[graft] val ngramOracle: String =
    """WITH d AS (SELECT doc_id, lang, t, len(t) AS nt
                  FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
                  WHERE len(t) >= 2),
       g0 AS (SELECT doc_id, lang, nt - (nt % 20) AS len_bucket,
                     t[pos] || ' ' || t[pos+1] AS gram
              FROM (SELECT doc_id, lang, nt, t, unnest(range(1, nt)) AS pos FROM d)),
       g1 AS (SELECT DISTINCT doc_id, lang, len_bucket, gram FROM g0),
       dfg AS (SELECT lang, len_bucket, gram FROM g1
               GROUP BY 1, 2, 3 HAVING count(*) <= 100),
       kept AS (SELECT g1.* FROM g1
                JOIN dfg ON g1.lang = dfg.lang AND g1.len_bucket = dfg.len_bucket
                  AND g1.gram = dfg.gram),
       gs AS (SELECT doc_id, count(*) AS ng FROM kept GROUP BY 1),
       j AS (SELECT l.lang, l.doc_id AS a, r.doc_id AS b, count(*) AS inter
             FROM kept l JOIN kept r ON l.lang = r.lang AND l.len_bucket = r.len_bucket
               AND l.gram = r.gram
             WHERE l.doc_id < r.doc_id GROUP BY 1, 2, 3),
       f AS (SELECT j.lang, j.a, j.b, j.inter, ga.ng + gb.ng - j.inter AS union_n
             FROM j JOIN gs ga ON j.a = ga.doc_id JOIN gs gb ON j.b = gb.doc_id)
       SELECT lang, a, b, CAST(inter AS BIGINT) AS inter,
              CAST(union_n AS BIGINT) AS union_n,
              CAST((20000 * inter + union_n) // (2 * union_n) AS BIGINT) AS jaccard_e4
       FROM f WHERE (20000 * inter + union_n) // (2 * union_n) >= 500
       ORDER BY lang, a, b"""

  /** Shared SRP front-end CTEs: portable hyperplane signs → quantized
    * projections → mean-centered 16-bit signatures (must mirror
    * `Dedup.srpSignatures` bit-for-bit). */
  private[graft] val srpSigCtes: String =
    s"""hp AS (SELECT j, d,
           CASE WHEN ${phashSql("CAST(j AS VARCHAR) || '_' || CAST(d AS VARCHAR)", 7)} % 2 = 0
                THEN 1 ELSE -1 END AS s
         FROM (SELECT unnest(range(16)) AS j) jj
         CROSS JOIN (SELECT unnest(range(64)) AS d) dd),
       qp AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS q
         FROM (SELECT vec_id, embedding,
                 unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       dimsums AS (SELECT d, CAST(sum(q) AS BIGINT) AS sd, count(*) AS n
                   FROM qp GROUP BY 1),
       mu AS (SELECT hp.j,
           CAST(floor(CAST(CAST(sum(hp.s * ds.sd) AS BIGINT) AS DOUBLE)
                / CAST(min(ds.n) AS DOUBLE) + 0.5) AS BIGINT) AS cmu
         FROM hp JOIN dimsums ds ON hp.d = ds.d GROUP BY 1),
       projs AS (SELECT qp.vec_id, hp.j,
           CAST(sum(qp.q * hp.s) AS BIGINT) AS proj
         FROM qp JOIN hp ON qp.d = hp.d GROUP BY 1, 2),
       bits AS (SELECT p.vec_id, p.j,
           CASE WHEN p.proj >= mu.cmu THEN 1 ELSE 0 END AS bit
         FROM projs p JOIN mu ON p.j = mu.j),
       sig AS (SELECT vec_id,
           CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(j AS INTEGER))) AS BIGINT)
             AS srp16
         FROM bits GROUP BY 1)"""

  private[graft] val srpBandsOracle: String =
    s"""WITH $srpSigCtes
        SELECT s.vec_id, e.label, s.srp16,
               s.srp16 % 256 AS band1, s.srp16 // 256 AS band2
        FROM sig s JOIN (SELECT vec_id, label FROM embeddings) e
          USING (vec_id)
        ORDER BY s.vec_id"""

  private[graft] val embSrpOracle: String =
    s"""WITH $srpSigCtes,
        bands0 AS (SELECT vec_id, '1_' || CAST(srp16 % 256 AS VARCHAR) AS bk
                   FROM sig
                   UNION ALL
                   SELECT vec_id, '2_' || CAST(srp16 // 256 AS VARCHAR) FROM sig),
        bands AS (SELECT vec_id, bk FROM (
                    SELECT vec_id, bk,
                           count(*) OVER (PARTITION BY bk) AS bn
                    FROM bands0) WHERE bn <= 1000),
        cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
                 FROM bands l JOIN bands r
                   ON l.bk = r.bk AND l.vec_id < r.vec_id),
        qvs AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
                FROM embeddings),
        nn AS (SELECT vec_id, qv,
                 CAST(list_sum(list_transform(qv, u -> u * u)) AS BIGINT) AS nrm
               FROM qvs),
        v AS (SELECT cand.a, cand.b,
                CAST(floor(CAST(list_dot_product(CAST(la.qv AS DOUBLE[]),
                                                 CAST(rb.qv AS DOUBLE[])) AS DOUBLE)
                  / (sqrt(la.nrm) * sqrt(rb.nrm)) * 1000000) AS BIGINT) AS cos_e6
              FROM cand
              JOIN nn la ON cand.a = la.vec_id
              JOIN nn rb ON cand.b = rb.vec_id)
        SELECT a, b, cos_e6 FROM v WHERE cos_e6 >= 350000 ORDER BY a, b"""

  /** Mirror of `Dedup.semantic`: IVF cells from the shared assignment
    * CTEs, within-cell quantized cosine, remove b of every (a<b) pair
    * over the threshold. */
  // dedup_semantic clusters with the TRAINED ⌈√N⌉-cell Lloyd quantizer
  // (k grows with the corpus — the SemDeDup scaling rule), not the
  // label column
  private[graft] val semanticOracle: String =
    s"""WITH ${SimReg.lloydCtes("CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)")},
        cellof AS (SELECT vec_id, cell FROM asgk WHERE arn = 1),
        qvs AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
                FROM embeddings),
        nn AS (SELECT vec_id, qv,
                 CAST(list_sum(list_transform(qv, u -> u * u)) AS BIGINT) AS nrm
               FROM qvs),
        pr AS (SELECT l.vec_id AS a, r.vec_id AS b,
                 CAST(floor(CAST(list_dot_product(CAST(la.qv AS DOUBLE[]),
                                                  CAST(rb.qv AS DOUBLE[])) AS DOUBLE)
                   / (sqrt(la.nrm) * sqrt(rb.nrm)) * 1000000) AS BIGINT) AS cos_e6
               FROM cellof l JOIN cellof r
                 ON l.cell = r.cell AND l.vec_id < r.vec_id
               JOIN nn la ON la.vec_id = l.vec_id
               JOIN nn rb ON rb.vec_id = r.vec_id),
        removed AS (SELECT DISTINCT b AS vec_id FROM pr WHERE cos_e6 >= 350000)
        SELECT c.vec_id, c.cell,
               (removed.vec_id IS NOT NULL) AS removed
        FROM cellof c LEFT JOIN removed ON c.vec_id = removed.vec_id
        ORDER BY c.vec_id"""

  /** VERIFICATION-HARNESS corpus for the embedding-cosine gate: the
    * synthetic embeddings have no natural pairs above cosine 0.90 at
    * small SF (max ≈ 0.475 at sf0.01), which would make the oracle
    * hash-match two EMPTY results — vacuous. So the HARNESS (not the
    * operator — VERDICT r6 advice: a library operator must never
    * fabricate rows for its callers) plants deterministic near-dups:
    * every 100th vector cloned with each coordinate shifted +0.01
    * (double add, cast back to float — bit-identical in both engines;
    * cos(x, x+δ·1) ≈ 0.999 for unit-scale vectors). Clone ids start at
    * max(vec_id)+1 — derived, not a fixed constant, so they can never
    * collide with genuine ids at any corpus size. The offset joins in
    * as a 1-row aggregate (no driver-side collect). */
  private[graft] def plantedEmbeddings(s: SparkSession, d: String): DataFrame = {
    val base = graft.core.Tables(s, d).embeddings
      .select(col("label"), col("vec_id"), col("embedding"))
    val off = base.agg(max(col("vec_id")).as("_off")) // 1 row, broadcast
    val clones = base.filter(col("vec_id") % 100 === 0)
      .crossJoin(off)
      .select(col("label"),
        (col("vec_id") + col("_off") + lit(1L)).as("vec_id"),
        expr("transform(embedding, x -> cast(double(x) + 0.01d as float))")
          .as("embedding"))
    base.unionByName(clones)
  }

  private[graft] val embCosineOracle: String =
    """WITH b AS (SELECT label, vec_id, embedding FROM embeddings),
       pl AS (SELECT label, vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS vec_id,
                     list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) + 0.01 AS FLOAT)) AS embedding
              FROM b WHERE vec_id % 100 = 0),
       u AS (SELECT * FROM b UNION ALL SELECT * FROM pl),
       e AS (SELECT vec_id, label,
           list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
           FROM u),
       n AS (SELECT vec_id, label, qv,
                    CAST(list_sum(list_transform(qv, u -> u * u)) AS BIGINT) AS nrm FROM e),
       p AS (SELECT l.label, l.vec_id AS a, r.vec_id AS b,
                    CAST(list_dot_product(CAST(l.qv AS DOUBLE[]), CAST(r.qv AS DOUBLE[])) AS BIGINT) AS dot,
                    l.nrm AS an, r.nrm AS bn
             FROM n l JOIN n r ON l.label = r.label AND l.vec_id < r.vec_id),
       s AS (SELECT label, a, b, CAST(floor(CAST(dot AS DOUBLE)
               / (sqrt(CAST(an AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) * 1000000.0) AS BIGINT)
               AS cos_e6 FROM p)
       SELECT label, a, b, cos_e6 FROM s WHERE cos_e6 >= 900000
       ORDER BY 1, 2, 3"""

  private[graft] val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      s"""WITH d AS (SELECT doc_id, md5($normSql) AS fp FROM documents)
         SELECT doc_id, fp,
                min(doc_id) OVER (PARTITION BY fp) AS keeper_id,
                count(*) OVER (PARTITION BY fp) AS n_copies,
                doc_id != min(doc_id) OVER (PARTITION BY fp) AS is_dup
         FROM d ORDER BY doc_id""",
    "dedup_minhash_lsh" -> minhashOracle,
    "dedup_simhash" -> simhashOracle,
    "dedup_ngram_jaccard" -> ngramOracle,
    // ground truth, not a candidate-filter mirror: every pair within
    // edit distance 4 (the length prefilter is implied by the metric —
    // |len(a)-len(b)| > maxEd forces dist > maxEd)
    "dedup_fuzzy_edit" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
         FROM d a JOIN d b
           ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 4
         WHERE levenshtein(a.text, b.text) <= 4
         ORDER BY doc_a, doc_b""",
    "dedup_substring" ->
      """WITH w AS (SELECT doc_id,
                unnest([md5(substring(text, i, 40))
                        for i in range(1, greatest(length(text) - 39, 1) + 1)])
                  AS gram
              FROM documents),
         gd AS (SELECT gram, count(DISTINCT doc_id) AS n_docs
                FROM w GROUP BY 1),
         per AS (SELECT w.doc_id, count(*) AS n_win,
                        CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS dup_win
                 FROM w JOIN gd USING (gram) GROUP BY 1)
         SELECT doc_id, n_win, dup_win,
                CAST((20000 * dup_win + n_win) // (2 * n_win) AS BIGINT)
                  AS dup_frac_e4,
                (20000 * dup_win + n_win) // (2 * n_win) >= 2000 AS dup_heavy
         FROM per ORDER BY doc_id""",
    // winnowed form: same statistics over the content-gated 1/8 window
    // sample (digest starts '0'/'8') — selection is on the digest, so a
    // shared window is selected in both docs or neither. The gate is
    // md5-prefix by MEASUREMENT: both cheap pre-gates (window-string
    // char mix, text-offset char mix) lost their x100 A/Bs — see
    // Dedup.substringDupWinnow's doc for the walk-cost mechanism
    "dedup_substring_winnow" ->
      """WITH w AS (SELECT doc_id,
                unnest([md5(substring(text, i, 40))
                        for i in range(1, greatest(length(text) - 39, 1) + 1)])
                  AS h
              FROM documents),
         sel AS (SELECT doc_id, h AS gram FROM w
                 WHERE substr(h, 1, 1) IN ('0', '8')),
         gd AS (SELECT gram, count(DISTINCT doc_id) AS n_docs
                FROM sel GROUP BY 1),
         per AS (SELECT sel.doc_id, count(*) AS n_win,
                        CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS dup_win
                 FROM sel JOIN gd USING (gram) GROUP BY 1)
         SELECT d.doc_id,
                CAST(COALESCE(per.n_win, 0) AS BIGINT) AS n_win,
                CAST(COALESCE(per.dup_win, 0) AS BIGINT) AS dup_win,
                CAST(CASE WHEN COALESCE(per.n_win, 0) = 0 THEN 0
                     ELSE (20000 * per.dup_win + per.n_win)
                            // (2 * per.n_win) END AS BIGINT) AS dup_frac_e4,
                CASE WHEN COALESCE(per.n_win, 0) = 0 THEN FALSE
                     ELSE (20000 * per.dup_win + per.n_win)
                            // (2 * per.n_win) >= 2000 END AS dup_heavy
         FROM documents d LEFT JOIN per USING (doc_id)
         ORDER BY doc_id""",
    "dedup_containment" ->
      """WITH d AS (SELECT doc_id, lang, t, len(t) AS nt
                    FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
                          FROM documents)
                    WHERE len(t) >= 3),
         g0 AS (SELECT doc_id, lang,
                       t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] AS shingle
                FROM (SELECT doc_id, lang, nt, t,
                             unnest(range(1, nt - 1)) AS pos FROM d)),
         g1 AS (SELECT DISTINCT doc_id, lang, shingle FROM g0),
         dfs AS (SELECT lang, shingle FROM g1
                 GROUP BY 1, 2 HAVING count(*) <= 100),
         kept AS (SELECT g1.* FROM g1
                  JOIN dfs ON g1.lang = dfs.lang AND g1.shingle = dfs.shingle),
         nsh AS (SELECT doc_id, count(*) AS ns FROM kept GROUP BY 1),
         j AS (SELECT l.lang, l.doc_id AS a, r.doc_id AS b, count(*) AS inter
               FROM kept l JOIN kept r
                 ON l.lang = r.lang AND l.shingle = r.shingle
               WHERE l.doc_id < r.doc_id GROUP BY 1, 2, 3),
         f AS (SELECT j.lang, j.a, j.b, j.inter, ga.ns AS na, gb.ns AS nb
               FROM j JOIN nsh ga ON j.a = ga.doc_id
                      JOIN nsh gb ON j.b = gb.doc_id)
         SELECT lang, a, b, CAST(inter AS BIGINT) AS inter,
                CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
                CAST((20000 * inter + na) // (2 * na) AS BIGINT) AS cont_a_e4,
                CAST((20000 * inter + nb) // (2 * nb) AS BIGINT) AS cont_b_e4
         FROM f
         WHERE (20000 * inter + na) // (2 * na) >= 8000
            OR (20000 * inter + nb) // (2 * nb) >= 8000
         ORDER BY lang, a, b""",
    "dedup_embedding_cosine" -> embCosineOracle,
    "dedup_srp_bands" -> srpBandsOracle,
    "dedup_embedding_srp" -> embSrpOracle,
    "dedup_cc" -> {
      val mh = minhashOracle
      s"""WITH RECURSIVE mh AS (SELECT a, b FROM ($mh)),
          ed AS (SELECT a AS src, b AS dst FROM mh
                 UNION SELECT b AS src, a AS dst FROM mh),
          v AS (SELECT DISTINCT src AS id FROM ed),
          walk(id, label) AS (
            SELECT id, id FROM v
            UNION
            SELECT ed.dst, walk.label FROM walk JOIN ed ON ed.src = walk.id),
          cc AS (SELECT id, min(label) AS component FROM walk GROUP BY 1),
          sz AS (SELECT component, count(*) AS n_members FROM cc GROUP BY 1)
          SELECT cc.id AS doc_id, cc.component, sz.n_members
          FROM cc JOIN sz USING (component) ORDER BY doc_id"""
    },
    "dedup_canonical" -> {
      val mh = minhashOracle
      // same recursive hash-min walk as dedup_cc, then: every document
      // (LEFT JOIN — singletons are their own component) and one
      // representative per component by (diversity DESC, doc_id)
      s"""WITH RECURSIVE mh AS (SELECT a, b FROM ($mh)),
          ed AS (SELECT a AS src, b AS dst FROM mh
                 UNION SELECT b AS src, a AS dst FROM mh),
          v AS (SELECT DISTINCT src AS id FROM ed),
          walk(id, label) AS (
            SELECT id, id FROM v
            UNION
            SELECT ed.dst, walk.label FROM walk JOIN ed ON ed.src = walk.id),
          cc AS (SELECT id, min(label) AS component FROM walk GROUP BY 1),
          q AS (SELECT doc_id,
                  len(string_split(text, ' ')) AS n_tokens,
                  len(list_distinct(string_split(text, ' '))) AS n_distinct
                FROM documents),
          lab AS (SELECT q.doc_id,
                    coalesce(cc.component, q.doc_id) AS component,
                    CAST((20000 * n_distinct + n_tokens) // (2 * n_tokens)
                      AS BIGINT) AS diversity_e4
                  FROM q LEFT JOIN cc ON cc.id = q.doc_id),
          reps AS (SELECT component, doc_id AS keep_id FROM (
                     SELECT component, doc_id,
                            row_number() OVER (PARTITION BY component
                              ORDER BY diversity_e4 DESC, doc_id) AS rn
                     FROM lab) WHERE rn = 1),
          sz AS (SELECT component, count(*) AS n_members FROM lab GROUP BY 1)
          SELECT lab.doc_id, lab.component, sz.n_members, reps.keep_id,
                 lab.doc_id = reps.keep_id AS kept
          FROM lab JOIN sz USING (component) JOIN reps USING (component)
          ORDER BY doc_id"""
    },
    "dedup_incremental" -> {
      val b = phashSql("CAST(doc_id AS VARCHAR)", 21)
      s"""WITH fp AS (SELECT doc_id,
             md5($normSql) AS fp, $b % 5 AS b FROM documents),
          i AS (SELECT * FROM fp WHERE b = 4)
          SELECT i.fp, min(i.doc_id) AS keep_id, count(*) AS n_copies
          FROM i WHERE NOT EXISTS (SELECT 1 FROM fp e
                                   WHERE e.b < 4 AND e.fp = i.fp)
          GROUP BY i.fp ORDER BY keep_id"""
    },
    "dedup_semantic" -> semanticOracle,
    // zero-overlap chunk hashes, first occurrence kept corpus-wide
    "dedup_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents),
         c AS (SELECT doc_id, toks,
                 unnest(range(0, CASE WHEN n <= 20 THEN 1
                                      ELSE 1 + (n - 20 + 19) // 20 END))
                   AS chunk_id
               FROM d),
         s AS (SELECT doc_id, chunk_id,
                 md5(array_to_string(
                   toks[chunk_id * 20 + 1 : chunk_id * 20 + 20], ' ')) AS h
               FROM c),
         r AS (SELECT doc_id, chunk_id,
                 row_number() OVER (PARTITION BY h
                   ORDER BY doc_id, chunk_id) AS rn
               FROM s)
         SELECT doc_id, count(*) AS n_chunks,
                CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_kept,
                CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dropped
         FROM r GROUP BY 1 ORDER BY 1""",
  )
}

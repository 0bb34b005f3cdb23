package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the `embeddings(vec_id, embedding float[64],
  * label)` table.
  *
  * - Brute-force cosine top-k is the exact baseline: broadcast the
  *   (small) query set against the full table — one scan, no shuffle of
  *   the big side, per-partition local top-k then global top-k via the
  *   rank window.
  * - The IVF variant prunes to the query's coarse partition (here the
  *   `label` column stands in for the nearest-centroid assignment): at
  *   scale the bucket equi-join touches 1/k of the data — the path that
  *   survives 100 TB.
  *
  * Numerics: embeddings are quantized to exact integers
  * (floor(x·10⁴ + 0.5)), so dot products and norms are
  * order-independent integer sums (all < 2⁵³); the final cosine is one
  * deterministic double expression. This keeps results bit-identical
  * across engines/partitionings — a float fold would not be.
  */
object Similarity {

  private[operators] def topk(spark: SparkSession, dir: String, k: Int,
      sameLabelOnly: Boolean): DataFrame = {
    val base = Tables(spark, dir).embeddings
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val joined =
      if (sameLabelOnly)
        base.join(broadcast(queries), col("label") === col("q_label"))
      else
        base.crossJoin(broadcast(queries))
    val scored = joined
      .filter(col("vec_id") =!= col("qid"))
      // native codegen'd expression (graft.functions.CosineSimQ) — the
      // interpreted aggregate(zip_with(...)) fold costs ~10× more
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"), col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Exact brute-force cosine top-10 for 5 query vectors. */
  def cosineTopk(spark: SparkSession, dir: String): DataFrame =
    topk(spark, dir, 10, sameLabelOnly = false)

  /** IVF-pruned ANN: top-5 within the query's coarse bucket (label). */
  /** Per-label embedding centroids: quantize each component to e4
    * integers (the proven float-parity path), posexplode to
    * (label, dim) pairs, integer-sum in ONE shuffle, divide once at the
    * end (exact-integer IEEE division — bit-equal on every engine).
    * This is the IVF training step: the centroids are the coarse
    * quantizer [[annIvf]] probes. */
  def centroids(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.core.Tables(spark, dir)
    t.embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
      .withColumn("centroid_e4",
        col("sum_q").cast("double") / col("n").cast("double"))
      .orderBy(col("label"), col("dim"))
  }

  /** kNN majority-vote classification over the verified top-k neighbor
    * lists: predicted label = most voted among the 10 nearest (count
    * desc, best-rank asc, label asc — fully pinned), checked against
    * the query's own label. The eval loop a curation pipeline runs to
    * validate its embedding space. */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.core.Tables(spark, dir)
    val lab = t.embeddings.select(col("vec_id"), col("label"))
    val votes = cosineTopk(spark, dir)
      .join(lab.select(col("vec_id").as("nid"), col("label").as("nlabel")),
        Seq("nid"))
      .groupBy(col("qid"), col("nlabel"))
      .agg(count(lit(1)).as("votes"), min(col("rn")).as("best_rn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("best_rn"), col("nlabel"))
    votes
      .withColumn("vr", row_number().over(w))
      .filter(col("vr") === 1)
      .join(lab.select(col("vec_id").as("qid"), col("label").as("true_label")),
        Seq("qid"))
      .select(col("qid"), col("nlabel").as("predicted_label"),
        col("votes"), col("true_label"),
        (col("nlabel") === col("true_label")).as("correct"))
      .orderBy(col("qid"))
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    topk(spark, dir, 5, sameLabelOnly = true)

  /** TRUE IVF cell assignment: every vector goes to its nearest
    * centroid by exact integer squared distance (argmin; cell-asc
    * tie-break). The centroid is the half-up-rounded e4 integer mean —
    * `floor(s/n + 0.5)` over exact integers is bit-identical IEEE on
    * every engine — so distances are small exact longs at ANY corpus
    * size and the argmin can never flip on a ulp.
    *
    * Plan: the k×64 centroid table is constant-size → broadcast; the
    * (vector-dim × centroid) expansion aggregates map-side into one
    * (vec_id, cell) shuffle — the canonical N·d·k IVF assignment cost,
    * sharded by vector. */
  /** Full centroid ranking per vector (vec_id, cell, dist2, crn) —
    * crn=1 is the argmin home cell; crn ≤ nprobe are the multi-probe
    * candidate cells. Shared by [[ivfAssign]] and
    * [[annIvfMultiprobe]]. */
  def ivfAssignRanked(spark: SparkSession, dir: String): DataFrame = {
    val qe = qe4(spark, dir)
    rankedAgainst(qe, labelCentroids(qe))
  }

  /** (vec_id, label, dim, q): embeddings e4-quantized, one row per
    * coordinate — the shared front of the label-seeded IVF family. */
  private[graft] def qe4(spark: SparkSession, dir: String): DataFrame = {
    val q4 = "CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)"
    Tables(spark, dir).embeddingsSpread
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim").cast("long").as("dim"),
        expr(q4).as("q"))
  }

  /** Label-seeded centroid table (cell, dim, c) — the half-up integer
    * mean per (label, dim). k·d rows, bounded by the label alphabet. */
  private[graft] def labelCentroids(qe: DataFrame): DataFrame =
    qe.groupBy(col("label").as("cell"), col("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("cell"), col("dim"),
        expr("CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)")
          .as("c"))

  /** Rank every vector in `qe` against every centroid in `cents`
    * (vec_id, cell, dist2, crn): exact-integer squared distance,
    * (dist2, cell) tie-break. `cents` is k·d — bounded by
    * construction — hence the static broadcast. */
  private[graft] def rankedAgainst(qe: DataFrame, cents: DataFrame): DataFrame = {
    val dists = qe.select(col("vec_id"), col("dim"), col("q"))
      .join(broadcast(cents), Seq("dim"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist2"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cell"))
    dists.withColumn("crn", row_number().over(w))
  }

  /** r16: argmin on the row via the kernel (same (dist2, cell)
    * tie-break as the crn = 1 rank — `KernelEquivalenceSpec`); the
    * N·d·k dim-join, its aggregate exchange, and the per-vector
    * window sort are gone. `cell` casts back to the label alphabet's
    * int32 so the declared schema is unchanged. */
  def ivfAssign(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddingsSpread
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centPack(labelCentroids(qe4(spark, dir)))))
      .select(col("vec_id"), graft.functions.ArgminCellQ
        .argminCellQ(col("embedding"), col("cells"), col("cvecs")).as("m"))
      .select(col("vec_id"), col("m.cell").cast("int").as("cell"),
        col("m.dist2").as("dist2"))
      .orderBy(col("vec_id"))

  /** Product-quantization ANN (ADC — asymmetric distance computation,
    * Jégou et al., the standard 100 TB memory-compression path): the
    * 64-dim space splits into 8 subspaces of 8 dims; each subspace gets
    * its own codebook (here: per-label subspace centroids — half-up e4
    * integer means, the deterministic stand-in for a per-subspace
    * kmeans); every vector is ENCODED as its 8 nearest sub-centroids
    * (argmin of exact integer squared distance, code-asc tie-break).
    * A query never touches raw corpus vectors again: its exact distance
    * to every (subspace, code) centroid forms a constant-size lookup
    * table, and the approximate distance to a corpus vector is the sum
    * of 8 table lookups over that vector's codes.
    *
    * Plan shape at scale: the codebook (8×k×8 values) and the query
    * distance tables (|Q|×8×k rows) are constant-size → broadcast; the
    * corpus contributes only its (vec, sub, code) triples — 8 small
    * ints per vector, the 32× compression PQ exists for — and the ADC
    * "lookup" is a broadcast equi-join on (sub, code) followed by one
    * map-side-combined sum per (query, vector). No shuffle ever carries
    * an embedding. */
  def pqAdc(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val t = Tables(spark, dir)
    val q4 = "CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)"
    // embeddingsSpread (ADVICE r11 #1): the N·d·8 subDist expansion
    // below runs in-stage over this scan — on the raw single-split
    // table one task would own the whole blowup
    val qe = t.embeddingsSpread
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim").cast("long").as("dim"),
        expr(q4).as("q"))
      .withColumn("sub", expr("dim div 8"))
    val cb = qe
      .groupBy(col("sub"), col("label").as("code"), col("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("sub"), col("code"), col("dim"),
        expr("CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)")
          .as("c"))
    // r16: the corpus-side encode runs ON the row via the PqEncodeQ
    // kernel (same integers, same code-asc tie-break as the old
    // per-(vec, sub) window argmin — `KernelEquivalenceSpec`), so the
    // N·d·|codes| subDist expansion now runs ONLY for the |Q|=5 query
    // vectors' lookup tables. posexplode's position IS the subspace
    // (codes are dim-ordered).
    val codes = t.embeddingsSpread
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cbPack(cb)))
      .select(col("vec_id"), graft.functions.PqEncodeQ.pqEncodeQ(
        col("embedding"), col("cb_codes"), col("cb_cvecs"), 8).as("carr"))
      .select(col("vec_id"), posexplode(col("carr")).as(Seq("sub", "code")))
      .select(col("vec_id"), col("sub").cast("long").as("sub"), col("code"))
    val qdist = qe.filter(col("vec_id") < 5)
      .join(broadcast(cb), Seq("sub", "dim"))
      .groupBy(col("vec_id"), col("sub"), col("code"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
      .select(col("vec_id").as("qid"), col("sub"), col("code"), col("d2"))
    val adc = codes.join(broadcast(qdist), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_dist2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist2"), col("vec_id"))
    adc.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("adc_dist2"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** (vec_id, dim, q): every embedding exploded to its e4-quantized
    * integer coordinates — the input shape of the Lloyd iterations. */
  private[graft] def quantized(spark: SparkSession, dir: String): DataFrame =
    quantizedOf(Tables(spark, dir).embeddingsSpread)

  /** [[quantized]] over any (vec_id, embedding) frame — the grow-aware
    * index maintenance path feeds deltas and merged snapshots here. */
  private[graft] def quantizedOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)").as("q"))

  /** Nearest-centroid assignment of every vector in `qe` against
    * `cents` (cell, dim, c): exact integer squared distance, argmin
    * with cell-asc tie-break. The centroid side is k·d rows, and the
    * hint policy follows where k came from: a CALLER-FIXED small k
    * (sim_ivf_kmeans k=8, view_kmeans_det k=4) bounds the side by
    * construction — it broadcasts, like the SRP hyperplane table.
    * [[kmeansAssign]]'s DEFAULT k=⌈√N⌉ GROWS with the corpus
    * (N=10¹⁰, d=768 → ~80M rows), so that path carries NO static hint:
    * AQE broadcasts from measured size while it fits and falls back to
    * a shuffle join when it doesn't — the same no-data-dependent-hints
    * rule PlanSpec enforces on the dedup pipelines. (Post-
    * localCheckpoint the static planner sees UNKNOWN stats and plans a
    * sort-merge join until runtime — measured 4× on the fixed-k bench
    * queries — which is why the bounded case states its bound.)
    * The expansion aggregates map-side into one (vec_id, cell) shuffle
    * (the canonical N·d·k IVF assignment cost, sharded by vector). */
  private def assignTo(qe: DataFrame, cents: DataFrame,
      boundedK: Boolean = false): DataFrame = {
    val centSide = if (boundedK) broadcast(cents) else cents
    val dists = qe.join(centSide, Seq("dim"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist2"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cell"))
    dists.withColumn("arn", row_number().over(w)).filter(col("arn") === 1)
      .select(col("vec_id"), col("cell"), col("dist2"))
  }

  /** Deterministic fixed-iteration Lloyd k-means over e4-quantized
    * integer coordinates — the TRAINED coarse quantizer whose k is a
    * PARAMETER, independent of any label column (VERDICT r5 #3: the
    * SemDeDup scale argument needs k ∝ √N, which a label-count
    * quantizer cannot deliver).
    *
    * Every step is oracle-expressible and bit-identical cross-engine:
    *  - init: the k vectors ranking first by (portable salted hash of
    *    vec_id, vec_id) seed the centroids — hash-seeded, data-
    *    independent of the label column, and a distributed top-k
    *    (TakeOrdered), never a full sort;
    *  - assign: exact integer squared distances (all < 2⁵³), argmin
    *    with cell-asc tie-break — can never flip on a ulp;
    *  - update: centroid = floor(Σq/n + 0.5), the half-up integer mean
    *    (exact-integer IEEE division, identical everywhere). A cell
    *    that loses all members vanishes in both engines.
    *
    * Returns the trained centroids (cell, dim, c). Each round's
    * centroid table is k·d rows — localCheckpoint truncates the
    * iteration's lineage at metadata size, so the final plan does not
    * re-derive round i-1 inside round i. */
  private def lloydCentroids(qe: DataFrame, k: Int, iters: Int,
      boundedK: Boolean = false): DataFrame = {
    val hashOrder = Seq(
      graft.functions.PortableHash.phash(col("vec_id").cast("string"), 11).asc,
      col("vec_id").asc)
    val seedIds = qe.select(col("vec_id")).distinct()
      .orderBy(hashOrder: _*).limit(k)
    val wSeed = Window.orderBy(hashOrder: _*) // over k rows only
    val seeds0 = seedIds
      .withColumn("cell", (row_number().over(wSeed) - 1).cast("long"))
    // default k=⌈√N⌉ seeds are corpus-proportional → no static hint;
    // a caller-fixed k is bounded by construction → broadcast
    val seeds = if (boundedK) broadcast(seeds0) else seeds0
    var cents = qe.join(seeds, Seq("vec_id"))
      .select(col("cell"), col("dim"), col("q").as("c"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val asg = assignTo(qe, cents, boundedK).select(col("vec_id"), col("cell"))
      cents = qe.join(asg, Seq("vec_id"))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .select(col("cell"), col("dim"),
          expr("CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)")
            .as("c"))
        .localCheckpoint()
    }
    cents
  }

  /** Final (vec_id, cell, dist2) assignment under the Lloyd-trained
    * quantizer. `k <= 0` picks k = ⌈√N⌉ — the SemDeDup rule that keeps
    * E[|cell|²] linear in N, now the IMPLEMENTED behavior (the count
    * is one scalar, metadata not data).
    *
    * Broadcast decision for the default path: k and d are DRIVER-KNOWN
    * scalars here (the ⌈√N⌉ rule already paid the count; d is one
    * limit-1 read), so the exact centroid-table volume k·d·24B is
    * computable at plan time — the centroid side broadcasts only under
    * a fixed 32 MB bound, a size-PROVEN broadcast rather than a blind
    * data-dependent hint (N=10¹⁰, d=768 → k·d ≈ 7.7e7 rows ≈ 1.8 GB →
    * over the bound → shuffle join, as it must). */
  def kmeansAssign(spark: SparkSession, dir: String, k: Int = 0,
      iters: Int = 2): DataFrame = {
    // one job for both scalars: N decides k, (k, d) decide the proven
    // broadcast bound
    val nd = Tables(spark, dir).embeddings
      .agg(count(lit(1)).as("n"),
        max(size(col("embedding"))).cast("long").as("d"))
      .head
    val kk =
      if (k > 0) k
      else math.ceil(math.sqrt(nd.getLong(0).toDouble)).toInt
    // the proven k·d·24B ≤ 32MB bound applies to BOTH paths: k is a
    // public parameter, so a caller-supplied k is NOT bounded by
    // construction — a large k must fall back to the shuffle join just
    // like a large ⌈√N⌉ (the d read costs one limit-1-style aggregate
    // that the default path already pays).
    val bounded = kk.toLong * nd.getLong(1) * 24L <= (32L << 20)
    if (bounded) {
      // r16: fast-kernel training + on-row final assignment (the
      // kernel returns (cell, dist2) — [[assignTo]]'s exact argmin
      // columns, `KernelEquivalenceSpec`). The N·d quantized
      // checkpoint the relational path pins is never materialized;
      // Lloyd re-reads the persisted NARROW frame instead.
      val embT = Tables(spark, dir).embeddingsSpread
        .select(col("vec_id"), col("embedding")).persist()
      val cents = lloydCentroidsFast(embT, kk, iters).localCheckpoint()
      embT.unpersist(blocking = false)
      Tables(spark, dir).embeddingsSpread
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(centPack(cents)))
        .select(col("vec_id"), graft.functions.ArgminCellQ
          .argminCellQ(col("embedding"), col("cells"), col("cvecs")).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"),
          col("m.dist2").as("dist2"))
        .orderBy(col("vec_id"))
    } else {
      // materialize the quantized input ONCE — Lloyd re-reads it every
      // round (seed join, per-iteration assign + update, final
      // assign); spark.ml's KMeans caches its input for the same
      // reason. 8 B × N·d, transient, a fraction of the corpus itself.
      val qe = quantized(spark, dir).localCheckpoint()
      assignTo(qe, lloydCentroids(qe, kk, iters, bounded), bounded)
        .orderBy(col("vec_id"))
    }
  }

  /** Oracle-able twin of the spark.ml `view_kmeans` (D11's optional
    * clustering): fixed-init fixed-iteration Lloyd over the same 2-D
    * points (embedding[0], embedding[1]), k=4 — per-cluster size and
    * exact-integer-division mean coordinates (e4 units). The spark.ml
    * variant stays as the library cross-check; this one hash-verifies
    * against DuckDB. */
  def viewKmeansDet(spark: SparkSession, dir: String, k: Int = 4,
      iters: Int = 2): DataFrame = {
    val qe2 = quantized(spark, dir).filter(col("dim") < 2)
    val asg = assignTo(qe2, lloydCentroids(qe2, k, iters, boundedK = true),
        boundedK = true)
      .select(col("vec_id"), col("cell"))
    qe2.join(asg, Seq("vec_id"))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .groupBy(col("cell"))
      .agg(max(col("n")).as("n"), // same n every dim
        sum(when(col("dim") === 0, col("s").cast("double") / col("n").cast("double"))
          .otherwise(lit(0.0))).as("cx_e4"),
        sum(when(col("dim") === 1, col("s").cast("double") / col("n").cast("double"))
          .otherwise(lit(0.0))).as("cy_e4"))
      .orderBy(col("cell"))
  }

  /** Multi-probe IVF ANN — the standard recall lever single-probe IVF
    * lacks: the query searches its `nprobe` NEAREST cells (by exact
    * centroid distance rank), not just its home cell, trading
    * nprobe× candidate work for recall. Measured here (sf0.01,
    * near-uniform synthetic embeddings, recall@5 vs brute force):
    * nprobe=1 → 0.16, nprobe=3 → 0.52 — the knob is the point.
    * Members still live only in their argmin cell, so the corpus side
    * is unchanged; only the query's probe list (|Q|·nprobe rows,
    * broadcast with the query vectors) grows. */
  def annIvfMultiprobe(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    val t = Tables(spark, dir)
    val cents = labelCentroids(qe4(spark, dir)).localCheckpoint()
    // r16: membership on the scan row via the kernel — the corpus-wide
    // rank + join-back is gone; the probe RANKING below only ever
    // touches the |Q|=5 query vectors
    val base = withArgminCell(
      t.embeddingsSpread.select(col("vec_id"), col("embedding")), cents)
    val ranked = rankedAgainst(qe4(spark, dir).filter(col("vec_id") < 5), cents)
    val queries = ranked
      .filter(col("vec_id") < 5 && col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
      .join(t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb")),
        Seq("qid"))
    val scored = base.join(broadcast(queries), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Recall@k of the IVF ANN path against the brute-force ground
    * truth — "measure, don't guess" applied to retrieval QUALITY, not
    * just speed: an ANN index whose recall nobody measured is a wrong-
    * answers generator with good latency. Per query: how many of
    * [[annIvfTrue]]'s top-k appear in the exact top-k ([[topk]], no
    * label blocking). Both sides are already-verified small results
    * (k rows per query), so the comparison is metadata-sized; the
    * recall ratio is an exact e6 integer. A query whose probed cell
    * holds fewer than k true neighbors scores honestly low — that IS
    * the single-probe trade-off this measures. */
  def annRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallOf(spark, dir, annIvfTrue(spark, dir, k), k)

  /** Recall@k of [[annIvfMultiprobe]] — the measured other end of the
    * nprobe dial (see that method's numbers). */
  def annRecallMultiprobe(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame =
    recallOf(spark, dir, annIvfMultiprobe(spark, dir, k, nprobe), k)

  /** Auto-tuned nprobe — the recall/cost dial resolved from a TARGET
    * instead of a hard-coded probe count: calibrate mean recall@k of
    * the multi-probe path on the query sample against exact search
    * (the standard IVF tuning loop — calibration touches the query
    * sample's candidates, never the corpus), walking nprobe up until
    * the target is met. Per-query monotonicity (more probes never lose
    * a hit — `AnalyticsSamplingSpec`) makes the first nprobe meeting
    * the target THE answer; no backtracking.
    *
    * Measured curve (recall@5): sf0.01, structureless embeddings —
    * the honest worst case — nprobe=1 → 0.16, nprobe=3 → 0.52; the
    * 10× replica with real cluster structure: nprobe=1 → 0.52,
    * nprobe=3 → 0.84 (BASELINE.md). With the default 0.5 target the
    * dial lands nprobe≈3 on structureless data and nprobe=1 once
    * cells align with real structure — it adapts instead of paying
    * 3× candidates unconditionally.
    *
    * Returns (chosen nprobe, the measured (nprobe, mean recall_e6)
    * curve walked to get there). */
  def autoNprobe(spark: SparkSession, dir: String, k: Int = 5,
      targetE6: Long = 500000L, maxProbe: Int = 8): (Int, Seq[(Int, Long)]) = {
    val curve = Seq.newBuilder[(Int, Long)]
    var p = 1
    while (p <= maxProbe) {
      val meanE6 = annRecallMultiprobe(spark, dir, k, p)
        .agg(expr("sum(recall_e6) div count(1)").as("m"))
        .head().getLong(0)
      curve += ((p, meanE6))
      if (meanE6 >= targetE6) return (p, curve.result())
      p += 1
    }
    (maxProbe, curve.result())
  }

  private[graft] def recallOf(spark: SparkSession, dir: String,
      approxDf: DataFrame, k: Int): DataFrame =
    recallVs(approxDf,
      topk(spark, dir, k, sameLabelOnly = false), k)

  /** Recall@k of `approxDf` against an arbitrary exact ground truth —
    * the shared tail of every recall query; the unfiltered paths pass
    * the brute-force [[topk]], the filtered path the
    * predicate-constrained variant (recall against the WRONG ground
    * truth is the classic filtered-ANN measurement error: an
    * unfiltered baseline makes any filtered serve look bad in
    * proportion to selectivity, revealing nothing). */
  private def recallVs(approxDf: DataFrame, exactDf: DataFrame,
      k: Int): DataFrame = {
    val approx = approxDf.select(col("qid"), col("nid"))
    val exact = exactDf.select(col("qid"), col("nid"))
    val hits = approx.join(exact, Seq("qid", "nid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_e6", expr(s"(1000000 * n_hits) div $k"))
      .orderBy(col("qid"))
  }

  /** ANN over the TRUE IVF cells: the query probes the cell its vector
    * is assigned to and ranks the cell's members by exact cosine —
    * [[annIvf]]'s shape with the label stand-in replaced by the real
    * trained quantizer ([[ivfAssign]]). */
  def annIvfTrue(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val assign = ivfAssign(spark, dir).select(col("vec_id"), col("cell"))
    val base = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding")).join(assign, Seq("vec_id"))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("cell").as("q_cell"))
    val scored = base.join(broadcast(queries), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** A standing IVF-ANN index — the vector twin of [[TextAnalysis]]'s
    * FTS index: cell-clustered postings (cell, vec_id, embedding) in
    * tx-table format with a per-file Bloom bitmap on `cell`, plus the
    * centroid table (cell, dim, c) pinned at build time. Serving
    * reads ONLY the probed cells' files; the corpus is never
    * re-clustered per query. `stats` is the √N family's pinned
    * per-label selectivity histogram root ("" for the families that
    * don't pin one). */
  final case class IvfIndex(postings: String, centroids: String,
      stats: String = "")

  /** The index layout IS the durable artifact, not JVM state (VERDICT
    * r12 gap 3): every companion-table root is written to a manifest
    * file inside the postings root (underscore-prefixed — invisible to
    * Spark's readers, like the tx log itself), so a session that holds
    * only the postings path can reconstruct the full handle —
    * including the selectivity histogram — instead of silently falling
    * back to per-serve corpus aggregates. */
  private val IndexManifest = "_graft_index_manifest"

  /** A manifest that cannot be loaded — missing file (not an index
    * root, or a pre-manifest build) or a torn/partial write missing a
    * required key. Typed and named so a cold-session loader fails with
    * the index root in hand instead of a bare NoSuchElementException
    * (VERDICT r13 task 8). */
  final class IndexManifestError(val root: String, detail: String)
    extends RuntimeException(s"index manifest at $root: $detail")

  /** Written atomically (temp + rename in the same directory): a crash
    * mid-write leaves either the previous manifest or none — never a
    * half-written file a loader would misread as a torn index. */
  private[graft] def writeIndexManifest(postingsRoot: String,
      entries: (String, String)*): Unit = {
    val root = java.nio.file.Paths.get(postingsRoot)
    val tmp = root.resolve(IndexManifest + ".tmp")
    val fin = root.resolve(IndexManifest)
    val body = entries.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(tmp,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, fin,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private[graft] def readIndexManifest(postingsRoot: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(postingsRoot, IndexManifest)
    if (!java.nio.file.Files.exists(p))
      throw new IndexManifestError(postingsRoot,
        "manifest file missing — not an index root, or a build that predates manifests")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(p).asScala
      .filter(_.contains('='))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
      .toMap
  }

  /** Required-key lookup with the typed torn-manifest failure. */
  private[graft] def manifestKey(m: Map[String, String], root: String,
      key: String): String =
    m.getOrElse(key, throw new IndexManifestError(root,
      s"required key '$key' missing (torn or partial manifest; " +
        s"keys present: ${m.keys.toSeq.sorted.mkString(", ")})"))

  /** Family guard for the loaders: loading the WRONG family's postings
    * root must fail typed, not construct a structurally mismatched
    * handle — every builder stamps its family into the manifest, and a
    * loader handed e.g. a PQ root would otherwise find a `centroids`
    * key and happily register code-carrying postings as exact ones.
    * Lenient when the key is absent (pre-r14 layouts). */
  private[graft] def requireFamily(m: Map[String, String], root: String,
      expected: String): Unit =
    m.get("family").filter(_ != expected).foreach { got =>
      throw new IndexManifestError(root,
        s"family mismatch: manifest says '$got', loader expects '$expected'")
    }

  /** Reconstruct (and re-register) a standing √N index handle from its
    * on-disk layout alone — the COLD-SESSION path: a fresh JVM that
    * knows only where the postings live gets back the same handle the
    * building session held, pinned histogram included, so its filtered
    * serves estimate selectivity from the histogram point read rather
    * than recomputing the corpus aggregate. */
  def loadIvfSqrt(spark: SparkSession, dir: String,
      postingsRoot: String): IvfIndex = {
    val m = readIndexManifest(postingsRoot)
    requireFamily(m, postingsRoot, "ivf_sqrt")
    val idx = IvfIndex(postingsRoot,
      manifestKey(m, postingsRoot, "centroids"), m.getOrElse("stats", ""))
    ivfStanding.put(dir + "#sqrt", idx)
    idx
  }

  /** Cold-session loaders for the remaining standing families (VERDICT
    * r13 task 4) — same contract as [[loadIvfSqrt]]: a fresh JVM that
    * holds only the postings root reconstructs the exact handle the
    * building session registered (companion roots from the manifest,
    * never re-derived), so serving reads the standing layout instead
    * of silently rebuilding it.
    *
    * Lifetime caveat: these loaders read whatever layout sits at the
    * given root. A DEPLOYMENT pins its tx tables at durable paths (the
    * README "swap points" contract) and the loaders then survive any
    * restart; the test/bench builds here write under [[Scratch]]
    * roots, which a clean JVM exit deletes — so in-repo the cold
    * session is simulated by dropping the registration
    * ([[dropStandingForTest]]), not by cycling the JVM. */
  def loadIvf(spark: SparkSession, dir: String,
      postingsRoot: String): IvfIndex = {
    val m = readIndexManifest(postingsRoot)
    requireFamily(m, postingsRoot, "ivf")
    val idx = IvfIndex(postingsRoot, manifestKey(m, postingsRoot, "centroids"))
    ivfStanding.put(dir, idx)
    idx
  }

  def loadIvfSample(spark: SparkSession, dir: String,
      postingsRoot: String): IvfIndex = {
    val m = readIndexManifest(postingsRoot)
    requireFamily(m, postingsRoot, "ivf_sample")
    val idx = IvfIndex(postingsRoot, manifestKey(m, postingsRoot, "centroids"))
    ivfStanding.put(dir + "#sample", idx)
    idx
  }

  def loadIvfSq8(spark: SparkSession, dir: String,
      postingsRoot: String): IvfSq8Index = {
    val m = readIndexManifest(postingsRoot)
    requireFamily(m, postingsRoot, "ivf_sq8")
    val idx = IvfSq8Index(postingsRoot,
      manifestKey(m, postingsRoot, "centroids"),
      manifestKey(m, postingsRoot, "stats"))
    ivfSq8Standing.put(dir, idx)
    idx
  }

  def loadIvfSq8Sample(spark: SparkSession, dir: String,
      postingsRoot: String): IvfSq8Index = {
    val m = readIndexManifest(postingsRoot)
    requireFamily(m, postingsRoot, "ivf_sq8#sample")
    val idx = IvfSq8Index(postingsRoot,
      manifestKey(m, postingsRoot, "centroids"),
      manifestKey(m, postingsRoot, "stats"))
    ivfSq8Standing.put(dir + "#sample", idx)
    idx
  }

  def loadIvfPq(spark: SparkSession, dir: String,
      postingsRoot: String): IvfPqIndex = {
    val m = readIndexManifest(postingsRoot)
    requireFamily(m, postingsRoot, "ivf_pq")
    val idx = IvfPqIndex(postingsRoot,
      manifestKey(m, postingsRoot, "centroids"),
      manifestKey(m, postingsRoot, "codebook"))
    ivfPqStanding.put(dir, idx)
    idx
  }

  def loadIvfPqSample(spark: SparkSession, dir: String,
      postingsRoot: String): IvfPqIndex = {
    val m = readIndexManifest(postingsRoot)
    requireFamily(m, postingsRoot, "ivf_pq#sample")
    val idx = IvfPqIndex(postingsRoot,
      manifestKey(m, postingsRoot, "centroids"),
      manifestKey(m, postingsRoot, "codebook"))
    ivfPqStanding.put(dir + "#sample", idx)
    idx
  }

  /** Test hook: forget every standing vector-index registration for
    * `dir` (simulates the cold session the load* functions exist for)
    * without touching disk. */
  private[graft] def dropStandingForTest(dir: String): Unit = {
    Seq(dir, dir + "#sqrt", dir + "#sample").foreach(ivfStanding.remove)
    Seq(dir, dir + "#sample").foreach(ivfSq8Standing.remove)
    Seq(dir, dir + "#sample").foreach(ivfPqStanding.remove)
    ()
  }

  /** Standing IVF index registry: corpus dir → index. Process-scoped
    * like the FTS registry (README "swap points") — a deployment pins
    * the tx tables at real paths and this becomes a catalog lookup;
    * the serving plan is unchanged by that swap. */
  private val ivfStanding =
    new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]()

  /** One pass over the corpus into the standing postings + centroid
    * tables: train the quantizer, assign every vector to its argmin
    * cell, lay the postings out cell-range-partitioned so a probe's
    * point read touches a contiguous file subset, Bloom bitmap on
    * `cell` per file. Registers and returns the index (last build
    * wins). */
  private def buildIvfIndex(spark: SparkSession, dir: String): IvfIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val cents = labelCentroids(qe4(spark, dir)).localCheckpoint()
    val pDir = Scratch.fresh("tx_ivf")
    // r16: argmin cell computed ON the scan row against the broadcast
    // centroid pack — the former N·d·k dim-join + window + join-back
    // (two corpus-sized exchanges) collapse into one codegen pass
    TxTable(spark, pDir).append(
      withArgminCell(Tables(spark, dir).embeddingsSpread
          .select(col("vec_id"), col("embedding")), cents)
        .select(col("cell"), col("vec_id"), col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh("tx_ivf_cents")
    TxTable(spark, cDir).append(cents)
    writeIndexManifest(pDir, "family" -> "ivf", "centroids" -> cDir)
    val idx = IvfIndex(pDir, cDir)
    ivfStanding.put(dir, idx)
    idx
  }

  /** Get-or-build the standing IVF index (idempotent; Bench warms it
    * so `sim_ann_indexed` times the point-read serving path — what a
    * deployment pays per query). */
  def ensureIvf(spark: SparkSession, dir: String): IvfIndex = {
    val hit = ivfStanding.get(dir)
    if (hit != null) hit else buildIvfIndex(spark, dir)
  }

  /** The BUILD half as its own declared query — owns the quantizer
    * training and the two tx commits, and returns the cell-population
    * audit (count, total, min/max occupancy: the balance signal that
    * decides whether cells need splitting at scale). Always builds
    * fresh and re-registers the standing index. */
  def ivfBuild(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildIvfIndex(spark, dir)
    TxTable(spark, idx.postings).read()
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_vecs"),
        min(col("n")).cast("long").as("min_cell_pop"),
        max(col("n")).cast("long").as("max_cell_pop"))
  }

  /** Incremental IVF maintenance + serve, as one verified lifecycle —
    * the production pattern every vector store follows: the quantizer
    * is trained ONCE (here on the base corpus, vec_id % 10 != 9);
    * appends assign new vectors against those PINNED centroids and
    * never re-train, so existing cell membership — and every
    * previously served answer — is immutable, and the append touches
    * only the delta. Builds the base postings, commits the delta as a
    * second tx append (cell-clustered, Bloom on `cell`), then serves
    * multi-probe ANN from the merged snapshot. The oracle recomputes
    * the same pinned-centroid semantics (centroids from the base
    * subset, every vector assigned against them), so a drifted
    * assignment — accidentally re-training on append — fails the
    * gate. */
  def ivfAppendServe(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val qe = qe4(spark, dir)
    val isDelta = pmod(col("vec_id"), lit(10L)) === 9L
    // quantizer pinned at build: centroids from the BASE subset only,
    // checkpointed once so build, append, and serve share one frame
    val cents = labelCentroids(qe.filter(!isDelta)).localCheckpoint()
    // r16: each commit's argmin runs ON the scan row (guide §2.4) —
    // the former per-commit N·d·k dim-join + window rank + corpus
    // join-back (two exchanges per commit) are gone
    def commit(tx: TxTable, pred: Column): Unit = tx.append(
      withArgminCell(Tables(spark, dir).embeddingsSpread
          .select(col("vec_id"), col("embedding")).filter(pred), cents)
        .select(col("cell"), col("vec_id"), col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val tx = TxTable(spark, Scratch.fresh("tx_ivf_inc"))
    commit(tx, !isDelta) // base build
    commit(tx, isDelta) // delta append, centroids pinned
    // serve from the merged snapshot, probes ranked on the same
    // pinned centroid table
    val probes = rankedAgainst(qe.filter(col("vec_id") < 5), cents)
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val queries = probes.join(
      Tables(spark, dir).embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb")),
      Seq("qid"))
    val scored = tx.readWhereIn("cell", cellIds)
      .join(broadcast(queries), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Ranked nearest-centroid assignment — [[assignTo]] without the
    * argmin filter: every (vec_id, cell) pair with its exact integer
    * squared distance and per-vector rank `crn`. The multiprobe
    * front-end of the trained-quantizer family (crn = 1 is membership,
    * crn ≤ nprobe is the probe list). Hint policy follows the caller's
    * k-provenance, exactly as in [[assignTo]]. */
  private def rankedTo(qe: DataFrame, cents: DataFrame,
      boundedK: Boolean = false): DataFrame = {
    val centSide = if (boundedK) broadcast(cents) else cents
    val dists = qe.select(col("vec_id"), col("dim"), col("q"))
      .join(centSide, Seq("dim"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist2"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cell"))
    dists.withColumn("crn", row_number().over(w))
  }

  /** The √N-rule coarse quantizer as one shared front: quantized
    * coordinates (checkpointed once — Lloyd re-reads them every
    * round), the Lloyd-trained k=⌈√N⌉ centroid table, and the proven
    * broadcast bound for that k (k·d·24 B ≤ 32 MB; at N=10¹⁰, d=768
    * the bound fails and every join below falls back to shuffle, as
    * it must). This is the scale path BASELINE.md's round-8 vector
    * measurements call for: with k ∝ √N the probed corpus fraction is
    * nprobe/√N — it SHRINKS as the corpus grows — where any fixed k
    * leaves serving Θ(nprobe/k · N) forever. */
  /** Centroid table (cell, dim, c) → one row per cell with the
    * dim-ordered quantized vector — the broadcast side of the codegen
    * assignment kernel. k rows; the HOF transform is interpreted but
    * touches only k·d elements once. */
  private def centRows(cents: DataFrame): DataFrame =
    cents.groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)")
        .as("cvec"))

  /** The whole centroid table as ONE row (cells sorted asc, cvecs
    * aligned) — the broadcast side of the [[graft.functions
    * .ArgminCellQ]] row-level assignment kernel. k·d longs total,
    * bounded-k callers only. Cell ids canonicalize to BIGINT (the
    * kernel's cell type; label-seeded alphabets are int32 — same
    * values, same asc order, and the TxTable Bloom probes hash the
    * canonical string so int/long width never changes pruning). */
  private def centPack(cents: DataFrame): DataFrame =
    centRows(cents)
      .agg(expr("array_sort(collect_list(struct(CAST(cell AS BIGINT) AS cell, cvec)))")
        .as("p"))
      .select(expr("transform(p, s -> s.cell)").as("cells"),
        expr("transform(p, s -> s.cvec)").as("cvecs"))

  /** Adds the argmin `cell` column ON the embedding row (guide §2.4:
    * the crossJoin against the one-row [[centPack]] is a broadcast of
    * k·d longs, the kernel runs inside the row's codegen stage, and
    * the former min_by exchange + (vec_id → cell) join-back both
    * disappear). Exact integers, (dist2, cell) tie-break — proven
    * bit-identical to the relational argmin (`KernelEquivalenceSpec`). */
  private[graft] def withArgminCell(rows: DataFrame, cents: DataFrame): DataFrame =
    rows.crossJoin(broadcast(centPack(cents)))
      .withColumn("cell", graft.functions.ArgminCellQ
        .argminCellQ(col("embedding"), col("cells"), col("cvecs"))
        .getField("cell"))
      .drop("cells", "cvecs")

  /** Ranked nearest-centroid assignment as N·k SCORED ROWS: embeddings
    * cross the broadcast per-cell centroid vectors, the native
    * [[graft.functions.Dist2Q]] computes each exact integer squared
    * distance in a whole-stage-codegen loop, and the (dist2, cell)
    * window ranks per vector. This is the bounded-k fast path — the
    * relational dim-join ([[rankedTo]]) materializes N·d·k rows
    * through a hash aggregate for the same answer (measured 55.7 s vs
    * ~4 s on the 10× replica's 142-cell training) but carries no
    * broadcast, so it remains the over-bound fallback. */
  private def rankedByDist(emb: DataFrame, cents: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centRows(cents)))
      .withColumn("dist2",
        graft.functions.Dist2Q.dist2Q(col("embedding"), col("cvec")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cell"))
    scored.select(col("vec_id"), col("cell"), col("dist2"))
      .withColumn("crn", row_number().over(w))
  }

  /** MEMBERSHIP (vec_id, cell) under the proven-bound hint policy —
    * for build-side callers, which only ever need the argmin, never
    * the full rank (probe ranking always runs over the |Q| query
    * vectors alone): the bounded path runs the map-side-combining
    * [[argminByDist]] kernel (no N·k window sort), the over-bound
    * path the hint-free dim-join. Same integers, same tie-break. */
  private def memberCells(spark: SparkSession, dir: String, cents: DataFrame,
      bounded: Boolean): DataFrame =
    if (bounded)
      argminByDist(Tables(spark, dir).embeddingsSpread
        .select(col("vec_id"), col("embedding")), cents)
    else rankedTo(quantized(spark, dir), cents)
      .filter(col("crn") === 1).select(col("vec_id"), col("cell"))

  /** The corpus rows WITH their argmin `cell` attached — the builders'
    * postings input. Bounded-k computes the cell ON the scan row via
    * [[withArgminCell]] (r16, guide §2.4: the former corpus-sized
    * (vec_id → cell) join-back exchange is gone — one spread exchange,
    * the kernel, then the range partition); the over-bound path keeps
    * the relational assignment + join. `extra` columns (e.g. `label`)
    * ride along on the scan row. */
  private def memberRows(spark: SparkSession, dir: String, cents: DataFrame,
      bounded: Boolean, extra: Column*): DataFrame = {
    val base = Tables(spark, dir).embeddingsSpread
      .select((col("vec_id") +: col("embedding") +: extra): _*)
    if (bounded) withArgminCell(base, cents)
    else base.join(memberCells(spark, dir, cents, bounded = false),
      Seq("vec_id"))
  }

  /** Deterministic Lloyd training with the codegen kernels — identical
    * integers to [[lloydCentroids]] (same hash-seeded init, same argmin
    * tie-break, same half-up integer means), only the physical shape
    * changes. Bounded-k callers only (seeds and centroids broadcast).
    * Reads ONLY the narrow (vec_id, embedding) frame — the N·d-row
    * quantized explode the relational form shuffles every round is
    * never materialized (r16, guide §2.3/§2.4). */
  private def lloydCentroidsFast(emb: DataFrame, k: Int,
      iters: Int): DataFrame = {
    val hashOrder = Seq(
      graft.functions.PortableHash.phash(col("vec_id").cast("string"), 11).asc,
      col("vec_id").asc)
    val seedIds = emb.select(col("vec_id")).distinct()
      .orderBy(hashOrder: _*).limit(k)
    val wSeed = Window.orderBy(hashOrder: _*) // over k rows only
    val seeds0 = seedIds
      .withColumn("cell", (row_number().over(wSeed) - 1).cast("long"))
    val cents0 = emb.join(broadcast(seeds0), Seq("vec_id"))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("cell"), col("dim").cast("long").as("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)").as("c"))
    lloydFrom(emb, cents0, iters)
  }

  /** Lloyd iterations from GIVEN initial centroids (cell, dim, c) —
    * the shared tail of hash-seeded training and the grow-aware
    * rebuild (which seeds from the outgrown index's pinned centroids
    * so cluster structure carries over instead of restarting cold).
    *
    * r16 shape (guide §2.3 "aggregate before you shuffle"): per round,
    * the [[graft.functions.ArgminCellQ]] kernel computes each vector's
    * cell ON the row (no assignment exchange, no join back to the
    * quantized explode) and [[graft.functions.SumVecQ]] folds each
    * partition's members into k partial (sums, cnts) array rows before
    * the exchange — the round's ONE shuffle carries k·partitions array
    * rows instead of the N·d scalar rows the relational form moved
    * through two exchanges. Same integers (`KernelEquivalenceSpec`):
    * exact Long sums per dimension, half-up integer mean. */
  private def lloydFrom(emb: DataFrame, cents0: DataFrame,
      iters: Int): DataFrame = {
    var cents = cents0.localCheckpoint()
    for (_ <- 1 to iters) {
      cents = withArgminCell(emb, cents)
        .groupBy(col("cell"))
        .agg(graft.functions.SumVecQ.column(col("embedding")).as("sv"))
        .select(col("cell"), posexplode(col("sv.sums")).as(Seq("dim", "s")),
          col("sv.cnts").as("cnts"))
        .select(col("cell"), col("dim").cast("long").as("dim"),
          expr("CAST(floor(CAST(s AS DOUBLE) / CAST(cnts[dim] AS DOUBLE) + 0.5) AS BIGINT)")
            .as("c"))
        .localCheckpoint()
    }
    cents
  }

  private[graft] def sqrtQuantizer(spark: SparkSession, dir: String)
      : (DataFrame, Boolean) = {
    val nd = Tables(spark, dir).embeddings
      .agg(count(lit(1)).as("n"),
        max(size(col("embedding"))).cast("long").as("d"))
      .head
    val kk = math.ceil(math.sqrt(nd.getLong(0).toDouble)).toInt
    val bounded = kk.toLong * nd.getLong(1) * 24L <= (32L << 20)
    // persist (NOT localCheckpoint) the training input: Lloyd re-reads
    // it iters+1 times, but the block must be FREEABLE — a
    // localCheckpoint block can neither be evicted safely (lineage is
    // truncated) nor unpersisted through the DataFrame API, so
    // repeated √N trainings in one JVM would pin block-manager memory
    // until exit (measured: a 10× bench run with the leaked blocks ran
    // unrelated queries 10-20× slower from heap pressure). r16: the
    // fast path pins the NARROW (vec_id, embedding) frame — N rows of
    // one float array, roughly a sixth of the N·d quantized explode
    // the relational fallback needs.
    val input =
      (if (bounded) Tables(spark, dir).embeddingsSpread
         .select(col("vec_id"), col("embedding"))
       else quantized(spark, dir))
        .persist()
    // eager: the k·d-row centroid checkpoint materializes the whole
    // training against the hot cache and cuts its lineage...
    val cents =
      (if (bounded) lloydCentroidsFast(input, kk, 2)
       else lloydCentroids(input, kk, 2, boundedK = false))
        .localCheckpoint()
    // ...so the training input frees immediately; callers' final
    // assignment runs the codegen kernel over a fresh narrow scan
    // instead of holding the training blocks hostage
    input.unpersist(blocking = false)
    (cents, bounded)
  }

  /** Exact-cosine top-k of each probe list's member cells — the shared
    * back half of every cell-partitioned ANN path: join the probe list
    * (qid, q_cell — |Q|·nprobe rows, metadata-sized by definition, the
    * broadcast side together with the |Q| query vectors) against the
    * member rows (cell, vec_id, embedding), score with the codegen'd
    * [[graft.functions.CosineSimQ]], rank within query. */
  private def topkByCell(spark: SparkSession, dir: String,
      members: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val queries = probes.join(
      Tables(spark, dir).embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb")),
      Seq("qid"))
    val scored = members
      .join(broadcast(queries), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Multi-probe ANN under the √N-cell TRAINED quantizer — the scale
    * path the fixed-k measurements point at (BASELINE.md r8): members
    * live in their argmin cell among k=⌈√N⌉ Lloyd cells, the query
    * probes its nprobe nearest, so the candidate set is
    * nprobe/⌈√N⌉ of the corpus — a fraction that SHRINKS as the
    * corpus grows (nprobe·√N candidates total), against Θ(N) for any
    * quantizer whose k is pinned. Same deterministic Lloyd as
    * [[kmeansAssign]] (hash-seeded init, exact-integer argmin,
    * half-up integer means), so every step stays oracle-expressible.
    */
  def annIvfSqrtK(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    val (cents, bounded) = sqrtQuantizer(spark, dir)
    // membership computed ON the scan row (r16 kernel); the probe
    // RANKING (crn ≤ nprobe) only ever touches the |Q|=5 query
    // vectors, so the corpus-sized window sort of the former shared
    // ranked table is gone (r10)
    val members = memberRows(spark, dir, cents, bounded)
    val probes = (if (bounded)
        rankedByDist(Tables(spark, dir).embeddings
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")), cents)
      else rankedTo(quantized(spark, dir).filter(col("vec_id") < 5), cents))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    topkByCell(spark, dir, members, probes, k)
  }

  /** Multi-probe ANN served FROM THE STANDING INDEX — semantically
    * identical to [[annIvfMultiprobe]] (same probe ranking, same
    * exact-cosine scoring; an index never changes the answer — it
    * shares that query's oracle), but the per-query work is one
    * Bloom-pruned point read of the probed cells' postings instead of
    * a corpus re-cluster: probe ranking touches the build-pinned k·d
    * centroid table, and the |Q|·nprobe probe-cell ids — the IVF
    * analogue of the FTS query's term list, metadata-sized by
    * definition — drive the postings read. Per-query cost scales with
    * the probed cells' population, not the corpus. */
  def annIndexed(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    import graft.lake.TxTable
    val idx = ensureIvf(spark, dir)
    val cents = TxTable(spark, idx.centroids).read()
    val qe = qe4(spark, dir).filter(col("vec_id") < 5)
    val probes = rankedAgainst(qe, cents).filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val members = TxTable(spark, idx.postings).readWhereIn("cell", cellIds)
    val queries = probes.join(
      Tables(spark, dir).embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb")),
      Seq("qid"))
    val scored = members
      .join(broadcast(queries), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** One pass into a standing √N-cell index: train the ⌈√N⌉ Lloyd
    * quantizer, lay the postings out cell-range-partitioned with a
    * Bloom bitmap on `cell`, pin the centroid table. Identical
    * mechanics to [[buildIvfIndex]] — the index machinery is
    * orthogonal to the quantizer, which is the point: swapping the
    * fixed-k quantizer for the √N rule changes ONLY the cell
    * alphabet, and turns the served fraction from nprobe/k (constant)
    * into nprobe/√N (shrinking). Registered under its own key so the
    * fixed-k and √N indices coexist in one session. */
  private def buildIvfSqrtIndex(spark: SparkSession, dir: String): IvfIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val (cents, bounded) = sqrtQuantizer(spark, dir)
    val pDir = Scratch.fresh("tx_ivf_sqrt")
    // `label` rides along in the postings row: attribute columns live
    // IN the index cells so a filtered serve ([[annFilteredSqrt]])
    // never joins back to the corpus at query time — at 100 TB the
    // metadata-fetch join would dwarf the probe itself
    TxTable(spark, pDir).append(
      memberRows(spark, dir, cents, bounded, col("label"))
        .select(col("cell"), col("vec_id"), col("embedding"), col("label"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh("tx_ivf_sqrt_cents")
    TxTable(spark, cDir).append(cents)
    // pin the per-label selectivity histogram BESIDE the index
    // (VERDICT r11 task 7, the FTS pinned-corpus-stats pattern): one
    // linear aggregate at build time, |labels| rows, so the adaptive
    // filtered serve estimates any label-predicate's selectivity from
    // a metadata-sized point read instead of re-aggregating the corpus
    // per query. Refresh policy = recompute at (re)build, which is the
    // only time this index's corpus changes.
    val sDir = Scratch.fresh("tx_ivf_sqrt_stats")
    TxTable(spark, sDir).append(
      Tables(spark, dir).embeddings
        .groupBy(col("label")).agg(count(lit(1)).as("n")))
    // the histogram root lives IN the index layout (manifest beside
    // the postings), not in JVM state — a cold session reloads the
    // full handle from disk ([[loadIvfSqrt]], VERDICT r12 gap 3)
    writeIndexManifest(pDir, "family" -> "ivf_sqrt",
      "centroids" -> cDir, "stats" -> sDir)
    val idx = IvfIndex(pDir, cDir, sDir)
    ivfStanding.put(dir + "#sqrt", idx)
    idx
  }

  /** Get-or-build the standing √N-cell IVF index (Bench warms it so
    * `sim_ann_indexed_sqrt` times the point-read serving path). */
  def ensureIvfSqrt(spark: SparkSession, dir: String): IvfIndex = {
    val hit = ivfStanding.get(dir + "#sqrt")
    if (hit != null) hit else buildIvfSqrtIndex(spark, dir)
  }

  /** The √N-index BUILD as its own declared query: owns the quantizer
    * training and both tx commits, returns the cell-population audit.
    * n_cells here GROWS with the corpus (⌈√N⌉) — the audit row is the
    * measurable witness of the scale rule, where [[ivfBuild]]'s stays
    * pinned at the label alphabet. */
  def ivfBuildSqrt(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildIvfSqrtIndex(spark, dir)
    TxTable(spark, idx.postings).read()
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_vecs"),
        min(col("n")).cast("long").as("min_cell_pop"),
        max(col("n")).cast("long").as("max_cell_pop"))
  }

  /** Multi-probe ANN served from the STANDING √N index — the
    * composition of the two scale levers, and the serving path that
    * actually survives a growing corpus: per-query candidates are
    * nprobe/⌈√N⌉ of the postings (shrinking fraction, [[annIvfSqrtK]])
    * AND the read is a Bloom-pruned point read of just the probed
    * cells' files ([[annIndexed]]'s mechanics). Probe ranking touches
    * the build-pinned centroid table only — ⌈√N⌉·d rows, read from
    * its tx table with stats known to the planner, so no static hint
    * is needed or given (the √N side GROWS with the corpus; AQE keeps
    * broadcasting it while it measures small and stops when it
    * doesn't — the PlanSpec rule). Deterministic Lloyd ⇒ identical
    * centroids to a fresh [[annIvfSqrtK]] train, so the index never
    * changes the answer and the two paths share one oracle. */
  def annIndexedSqrt(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    import graft.lake.TxTable
    val idx = ensureIvfSqrt(spark, dir)
    val cents = TxTable(spark, idx.centroids).read()
    // the build-pinned centroid table is k·d rows — metadata-sized, so
    // counting it to prove the broadcast bound costs one point read
    val bounded = cents.count() * 24L <= (32L << 20)
    val probes = (if (bounded)
        rankedByDist(Tables(spark, dir).embeddings
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")), cents)
      else rankedTo(quantized(spark, dir).filter(col("vec_id") < 5), cents))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val members = TxTable(spark, idx.postings).readWhereIn("cell", cellIds)
    topkByCell(spark, dir, members, probes, k)
  }

  /** Predicate-FILTERED ANN from the standing √N index — vector search
    * with a WHERE clause (pgvector's `WHERE … ORDER BY embedding`,
    * ES kNN `filter`), the form every retrieval deployment actually
    * runs: top-k nearest AMONG the members satisfying a metadata
    * predicate (here `label % 2 = 1` — the odd-labeled half).
    *
    * Pre-filter inside the probed cells: the attribute was written
    * INTO the postings rows at build ([[buildIvfSqrtIndex]]), so the
    * serve is probe → Bloom point read → predicate on the postings
    * row → exact-cosine top-k — no join back to the corpus, and the
    * predicate prunes BEFORE the distance kernel runs. Post-filtering
    * a plain top-k would instead return < k (or wrong) rows whenever
    * the filter is selective — the classic filtered-ANN failure. Probe
    * ranking is unfiltered (cell geometry doesn't depend on the
    * predicate), so this shares the quantizer — and the recall
    * properties — of [[annIndexedSqrt]]. */
  def annFilteredSqrt(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3,
      pred: Column = pmod(col("label"), lit(2)) === 1): DataFrame = {
    import graft.lake.TxTable
    val idx = ensureIvfSqrt(spark, dir)
    val cents = TxTable(spark, idx.centroids).read()
    val bounded = cents.count() * 24L <= (32L << 20)
    val probes = (if (bounded)
        rankedByDist(Tables(spark, dir).embeddings
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")), cents)
      else rankedTo(quantized(spark, dir).filter(col("vec_id") < 5), cents))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val members = TxTable(spark, idx.postings).readWhereIn("cell", cellIds)
      .filter(pred)
    topkByCell(spark, dir, members, probes, k)
  }

  /** The nprobe-widening rule for filtered ANN, as a number a spec can
    * pin: to hold the UNFILTERED design point's candidate count under
    * a predicate of selectivity s = n_match/N, the probe list must
    * grow 1/s× — candidates in probed cells thin out in proportion to
    * s (the starvation law `FilteredAnnSpec` measured), so
    * nprobe = min(maxProbe, ⌈baseNprobe · N / n_match⌉), exact integer
    * ceiling. Selectivity comes from ONE aggregate over the corpus
    * label column (column-pruned scan; a deployment caches this per
    * predicate next to the index's cell populations — it changes only
    * on append, never per query). */
  def adaptiveNprobe(spark: SparkSession, dir: String, baseNprobe: Int = 3,
      maxProbe: Int = 8,
      pred: Column = col("label") === 1): Int = {
    val r = selectivityFrame(spark, dir, pred).head
    val n = r.getLong(0)
    val nm = math.max(r.getLong(1), 1L)
    math.min(maxProbe.toLong, (baseNprobe.toLong * n + nm - 1L) / nm).toInt
  }

  /** The (n, n_match) selectivity aggregate behind [[adaptiveNprobe]],
    * exposed as a frame so `AdaptiveStatsSpec` can pin its plan: when
    * the standing √N index has pinned its per-label histogram
    * ([[buildIvfSqrtIndex]]) AND the predicate references only the
    * `label` column — the one key the histogram groups by — the
    * estimate is a weighted sum over that |labels|-row tx table, NO
    * corpus scan at serve time (r11 task 7). Any OTHER predicate (the
    * public pred: Column contract admits every embeddings column —
    * ADVICE r12 flagged the histogram path for silently narrowing it)
    * keeps the full-row corpus aggregate, as does an unbuilt index or
    * a cold session without [[loadIvfSqrt]]: same exact counts either
    * way — the cache can never change an answer, only the plan. */
  private[graft] def selectivityFrame(spark: SparkSession, dir: String,
      pred: Column): DataFrame = {
    import graft.lake.TxTable
    val idx = ivfStanding.get(dir + "#sqrt")
    val cached = if (idx == null || idx.stats.isEmpty) None else {
      // expose ONLY `label` to the predicate (the count column is
      // renamed away): a label-only predicate analyzes and takes the
      // histogram path; any other reference fails analysis here and
      // falls through — never a silent mis-estimate against the
      // histogram's own columns
      val hist = TxTable(spark, idx.stats).read()
        .select(col("label"), col("n").as("__hist_n"))
      // frame construction analyzes eagerly — an unresolvable (non-
      // label) predicate throws right here and takes the fallback
      try Some(hist.agg(sum(col("__hist_n")).cast("long").as("n"),
        sum(when(pred, col("__hist_n")).otherwise(0L)).cast("long").as("nm")))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    cached.getOrElse(
      Tables(spark, dir).embeddings
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(pred, 1L).otherwise(0L)).cast("long").as("nm")))
  }

  /** Predicate-filtered ANN with the ADAPTIVE probe width — the coded
    * form of the fix `FilteredAnnSpec` demonstrated as prose (VERDICT
    * r10 task 6): the serve estimates the predicate's selectivity and
    * widens nprobe by [[adaptiveNprobe]]'s rule, so a ~10%-selective
    * filter probes maxProbe cells (recall equal to fixed nprobe=8 by
    * construction) while a permissive filter stays at baseNprobe and
    * never pays the widened probe fan-out. Serving mechanics are
    * [[annFilteredSqrt]] verbatim at the chosen width. */
  def annFilteredAdaptive(spark: SparkSession, dir: String, k: Int = 5,
      baseNprobe: Int = 3, maxProbe: Int = 8,
      pred: Column = col("label") === 1): DataFrame = {
    // ensure first so the selectivity estimate reads the histogram
    // pinned beside the index, not a per-serve corpus aggregate
    ensureIvfSqrt(spark, dir)
    annFilteredSqrt(spark, dir, k,
      adaptiveNprobe(spark, dir, baseNprobe, maxProbe, pred), pred)
  }

  /** Recall@k of the adaptive filtered serve vs the brute-force exact
    * top-k AMONG the predicate's survivors — the measured witness that
    * the widening recovers the starved recall at selective predicates
    * (compare [[annFilteredRecall]] at the same predicate and fixed
    * baseNprobe). */
  def annFilteredAdaptiveRecall(spark: SparkSession, dir: String,
      k: Int = 5, baseNprobe: Int = 3, maxProbe: Int = 8,
      pred: Column = col("label") === 1): DataFrame = {
    val base = Tables(spark, dir).embeddings
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val scored = base.filter(pred)
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    val exact = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"))
    recallVs(annFilteredAdaptive(spark, dir, k, baseNprobe, maxProbe, pred),
      exact, k)
  }

  /** Recall@k of the FILTERED serve ([[annFilteredSqrt]]) against the
    * brute-force exact top-k AMONG THE PREDICATE'S SURVIVORS — the
    * missing quality number VERDICT r9 named (task 7): filtered ANN's
    * classic failure is probe starvation, where a selective predicate
    * empties the probed cells' candidate lists while matching members
    * sit in unprobed cells, and no unfiltered recall query can see it
    * (the probe geometry is identical; only the SURVIVING candidate
    * count changes). Measured sweep at sf0.1 (nprobe=3, k=5,
    * `FilteredAnnSpec`): selectivity 1/2 → recall ≈ the unfiltered
    * ceiling; 1/8 → measurably below it; widening nprobe restores it —
    * the standard production fix (raise nprobe under selective
    * filters), here demonstrated by the spec rather than asserted. */
  def annFilteredRecall(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3,
      pred: Column = pmod(col("label"), lit(2)) === 1): DataFrame = {
    val base = Tables(spark, dir).embeddings
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val scored = base.filter(pred)
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    val exact = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"))
    recallVs(annFilteredSqrt(spark, dir, k, nprobe, pred), exact, k)
  }

  // ----------------------------------------------------------------
  // Sample-trained √N quantizer: cap the N^1.5 training term.
  // ----------------------------------------------------------------

  /** Deterministic hash-gated training sample for the √N quantizer —
    * the standard cure for Lloyd's iters·N·k training term (FAISS
    * trains IVF coarse quantizers on a bounded sample for exactly this
    * reason; BASELINE.md prices the full-train term at 136.9 s /
    * x100): keep the vectors whose portable salted hash of `vec_id`
    * is ≡ 0 (mod max(1, ⌊N/(8k)⌋)) — an expected 8·k = 8·⌈√N⌉ of
    * them — train the SAME deterministic Lloyd on just those, and let
    * the full corpus be assigned once at build. Per-iteration cost
    * drops from N·k = N^1.5 to |S|·k ≈ 8k² = 8N (linear), leaving the
    * single final assignment as the only N·k term. The gate is exact
    * integer arithmetic over the cross-engine
    * [[graft.functions.PortableHash]], so the sample — and every
    * centroid trained from it — is bit-identical in the DuckDB
    * oracle. mod = 1 (small N) degenerates to full training. */
  /** The deterministic training-sample gate shared by every
    * sample-trained build AND its `n_sample` audit witness (ADVICE
    * r12): one definition of (k = ⌈√N⌉, mod = ⌊N/(8k)⌋, salted-hash
    * predicate) so the quantizer, the grow rebuilds, and the three
    * build audits can never silently diverge — before this helper the
    * gate was re-derived in five places, and an edit to any one would
    * have made the audit report a different gate than the one actually
    * used. Exact integer arithmetic over the cross-engine
    * [[graft.functions.PortableHash]] (seed 7), so the sample is
    * bit-identical in the DuckDB oracle. */
  private[graft] def sampleGate(n: Long): (Int, Long, Column) = {
    val kk = math.ceil(math.sqrt(n.toDouble)).toInt
    val mod = math.max(1L, n / (8L * kk))
    val pred = graft.functions.PortableHash
      .phash(col("vec_id").cast("string"), 7) % mod === 0
    (kk, mod, pred)
  }

  /** The gated sample's measured size, as the one-row audit column the
    * three sample-build queries cross-join in — computed from the SAME
    * [[sampleGate]] the quantizer trains through. */
  private def sampleGateAudit(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir).embeddings.count()
    val (_, _, pred) = sampleGate(n)
    Tables(spark, dir).embeddings.filter(pred)
      .agg(count(lit(1)).as("n_sample"))
  }

  private[graft] def sampleQuantizer(spark: SparkSession, dir: String)
      : (DataFrame, Boolean) = {
    val nd = Tables(spark, dir).embeddings
      .agg(count(lit(1)).as("n"),
        max(size(col("embedding"))).cast("long").as("d"))
      .head
    val n = nd.getLong(0)
    val (kk, _, gate) = sampleGate(n)
    // the gated sample inherits the raw scan's single input split, and
    // every training argmin crosses it k ways in-stage — spread the
    // 8·⌈√N⌉ survivors once (metadata-sized exchange) so the Lloyd
    // iterations parallelize like the full-corpus paths do
    val sample = Tables(spark, dir).embeddings
      .filter(gate)
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val bounded = kk.toLong * nd.getLong(1) * 24L <= (32L << 20)
    // persist (NOT localCheckpoint) for the same freeable-block reason
    // as [[sqrtQuantizer]] — though here the pinned input is the
    // 8·⌈√N⌉-row sample, not the corpus: the sample bound is the point
    val sampleT = sample.persist()
    val cents =
      (if (bounded) lloydCentroidsFast(sampleT, kk, 2)
       else lloydCentroids(quantizedOf(sampleT), kk, 2, boundedK = false))
        .localCheckpoint()
    sampleT.unpersist(blocking = false)
    (cents, bounded)
  }

  /** Argmin cell of every vector, computed ON the embedding row by the
    * [[graft.functions.ArgminCellQ]] codegen kernel (r16, guide §2.4):
    * where the r10 form materialized N·k scored rows through a
    * crossJoin and folded them back with a min_by exchange, the kernel
    * loops the broadcast [[centPack]] per row inside the scan's
    * whole-stage-codegen — zero Exchange. Same exact integers, same
    * (dist2, cell) tie-break (`KernelEquivalenceSpec`). Build-side
    * kernel only: serving probes keep the window form (they need
    * crn ≤ nprobe over a tiny |Q|). */
  private[graft] def argminByDist(emb: DataFrame, cents: DataFrame): DataFrame =
    withArgminCell(emb.select(col("vec_id"), col("embedding")), cents)
      .select(col("vec_id"), col("cell"))

  /** One pass into the standing SAMPLE-trained √N index — identical
    * layout and serving mechanics to [[buildIvfSqrtIndex]] (the index
    * machinery is orthogonal to the quantizer), but training reads
    * only the hash-gated sample and the full-corpus argmin runs
    * through the map-side-combining [[argminByDist]] kernel. The cell
    * alphabet DIFFERS from the full-trained index (different training
    * set ⇒ different centroids), so this family carries its own
    * oracle rather than sharing [[annIvfSqrtK]]'s. */
  private def buildIvfSampleIndex(spark: SparkSession, dir: String): IvfIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val (cents, bounded) = sampleQuantizer(spark, dir)
    val pDir = Scratch.fresh("tx_ivf_sample")
    TxTable(spark, pDir).append(
      memberRows(spark, dir, cents, bounded, col("label"))
        .select(col("cell"), col("vec_id"), col("embedding"), col("label"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh("tx_ivf_sample_cents")
    TxTable(spark, cDir).append(cents)
    writeIndexManifest(pDir, "family" -> "ivf_sample", "centroids" -> cDir)
    val idx = IvfIndex(pDir, cDir)
    ivfStanding.put(dir + "#sample", idx)
    idx
  }

  /** Get-or-build the standing sample-trained √N index (Bench warms
    * it so `sim_ann_indexed_sample` times the point-read path). */
  def ensureIvfSample(spark: SparkSession, dir: String): IvfIndex = {
    val hit = ivfStanding.get(dir + "#sample")
    if (hit != null) hit else buildIvfSampleIndex(spark, dir)
  }

  /** The sample-trained build as its own declared query: owns the
    * sample gate, the bounded Lloyd training, and both tx commits.
    * Returns [[ivfBuildSqrt]]'s cell-population audit extended with
    * `n_sample` — the measured training-set size, the witness that
    * the N^1.5 term was actually capped (n_sample ≈ 8·⌈√N⌉ ≪ n_vecs
    * once N outgrows 64·... the mod>1 regime). */
  def ivfBuildSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildIvfSampleIndex(spark, dir)
    val nSample = sampleGateAudit(spark, dir)
    TxTable(spark, idx.postings).read()
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_vecs"),
        min(col("n")).cast("long").as("min_cell_pop"),
        max(col("n")).cast("long").as("max_cell_pop"))
      .crossJoin(broadcast(nSample))
  }

  /** Multi-probe ANN served from the standing sample-trained index —
    * [[annIndexedSqrt]]'s serving mechanics (build-pinned centroid
    * probe ranking, Bloom-pruned point read of the probed cells) over
    * the sample-trained cell alphabet. */
  def annIndexedSample(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    import graft.lake.TxTable
    val idx = ensureIvfSample(spark, dir)
    val cents = TxTable(spark, idx.centroids).read()
    val bounded = cents.count() * 24L <= (32L << 20)
    val probes = (if (bounded)
        rankedByDist(Tables(spark, dir).embeddings
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")), cents)
      else rankedTo(quantized(spark, dir).filter(col("vec_id") < 5), cents))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val members = TxTable(spark, idx.postings).readWhereIn("cell", cellIds)
    topkByCell(spark, dir, members, probes, k)
  }

  /** Recall@k of the sample-trained serving path vs the brute-force
    * exact top-k — the number that prices what sample training COSTS
    * in quality: compared against [[annSqrtRecall]] (the full-trained
    * probe-limited ceiling at the same nprobe), the delta is the
    * centroid-quality loss from training on 8·⌈√N⌉ vectors instead of
    * N. The build-cost claim (linear training) is only honest next to
    * this measured parity. */
  def annSampleRecall(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame =
    recallOf(spark, dir, annIndexedSample(spark, dir, k, nprobe), k)

  /** The standing VECTOR index's churn lifecycle as one verified
    * query — the IVF twin of [[graft.operators.TextAnalysis.ftsChurn]]
    * (VERDICT r8 task 3, vector side): the corpus arrives as `slices`
    * separate commits (each assigned against the BUILD-PINNED √N
    * quantizer and appended cell-clustered — fragmenting the postings
    * to slices × files), `TxTable.compact` rewrites the fragments into
    * `targetFiles` cell-range-clustered files with fresh Bloom bitmaps
    * (restoring [[buildIvfSqrtIndex]]'s layout), and the multi-probe
    * serve runs one Bloom-pruned point read of the compacted snapshot.
    *
    * Deterministic Lloyd + pinned centroids ⇒ every vector lands in
    * the same cell it would at a one-shot build, so neither the
    * incremental commits nor the compaction can change an answer:
    * this query shares [[annIvfSqrtK]]'s oracle. The layout claims
    * (bounded file count, restored bitmaps, real pruning) are
    * asserted by `IvfChurnSpec`. */
  def ivfChurn(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3, slices: Int = 10, targetFiles: Int = 8): DataFrame = {
    import graft.core.Scratch
    val (posts, ct) = ivfChurnTables(spark, dir, slices, targetFiles,
      Scratch.fresh("tx_ivf_churn"), Scratch.fresh("tx_ivf_churn_cents"))
    val cents = ct.read()
    val bounded = cents.count() * 24L <= (32L << 20)
    val probes = (if (bounded)
        rankedByDist(Tables(spark, dir).embeddings
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")), cents)
      else rankedTo(quantized(spark, dir).filter(col("vec_id") < 5), cents))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    topkByCell(spark, dir, posts.readWhereIn("cell", cellIds), probes, k)
  }

  /** The churn lifecycle's table half, shared with the spec that
    * asserts the post-compaction layout: train the √N quantizer once,
    * pin it, append `slices` micro-batch commits of assigned vectors
    * (the assignment is persisted across the loop — each slice is the
    * SAME pinned-quantizer assignment a per-arrival delta would get,
    * without re-running the kernel per slice), then compact both the
    * fragmented postings and the centroid table back to build layout. */
  private[graft] def ivfChurnTables(spark: SparkSession, dir: String,
      slices: Int, targetFiles: Int, postingsRoot: String,
      centroidsRoot: String): (graft.lake.TxTable, graft.lake.TxTable) = {
    import graft.lake.TxTable
    val (cents, bounded) = sqrtQuantizer(spark, dir)
    val rows = memberRows(spark, dir, cents, bounded, col("label"))
      .select(col("cell"), col("vec_id"), col("embedding"), col("label"))
      .persist()
    val posts = TxTable(spark, postingsRoot)
    val ct = TxTable(spark, centroidsRoot)
    ct.append(cents)
    try {
      for (i <- 0 until slices)
        posts.append(
          rows.filter(pmod(col("vec_id"), lit(slices)) === i)
            .repartitionByRange(2, col("cell")),
          bloomCols = Seq("cell"))
    } finally rows.unpersist(blocking = false)
    posts.compact(targetFiles, bloomCols = Seq("cell"),
      clusterBy = Seq("cell"))
    (posts, ct)
  }

  /** SQ8 scalar-quantized candidate generation + exact rerank — the
    * memory-bound serving trick every production vector store ships
    * (FAISS `SQ8`, Lucene int8 HNSW): compress each float dim to an
    * 8-bit code against the GLOBAL [min,max] range, score candidates
    * with the pure-integer code dot product (4 B → 1 B per dim = 4×
    * less memory bandwidth per scanned vector — at 100 TB the scan IS
    * the cost), keep the top `candK` per query, and rerank only those
    * with the exact e4-integer cosine. Quantization is exact integer
    * arithmetic end-to-end: `code = ((q - mn) * 255) div (mx - mn)`
    * over e4-quantized inputs, so codes — and therefore the candidate
    * sets — are bit-identical on every engine; no float ulp can flip a
    * candidate in or out.
    *
    * Plan: the [mn,mx] range is ONE aggregate row (broadcast by the
    * 1-row cross join), the 5×d query-code table broadcasts (bounded
    * by construction), the corpus side aggregates map-side into one
    * (qid, vec_id) shuffle, and the exact rerank touches only
    * 5·candK rows. */
  def sq8Rerank(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 20): DataFrame = {
    val qe = quantized(spark, dir)
    val range = qe.agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
    val codes = qe.crossJoin(broadcast(range))
      .select(col("vec_id"), col("dim"),
        expr("((q - mn) * 255) div greatest(mx - mn, 1)").as("code"),
        col("mn"), col("mx"))
    val qCodes = codes.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("dim").as("qdim"),
        col("code").as("qcode"))
    // rank by the DECODED dot (affine shift undone — see [[annIvfSq8]]
    // for the degeneracy of the raw code dot): with s = mx - mn,
    //   s²·Σc·qc + 255·mn·s·(Σc + Σqc) + d·(255·mn)²
    val cand = codes
      .join(broadcast(qCodes),
        col("dim") === col("qdim") && col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(expr(
        """CAST(greatest(max(mx) - max(mn), 1) * greatest(max(mx) - max(mn), 1)
                 * sum(code * qcode)
             + 255 * max(mn) * greatest(max(mx) - max(mn), 1)
                 * (sum(code) + sum(qcode))
             + count(*) * (255 * max(mn)) * (255 * max(mn)) AS BIGINT)""")
        .as("sq8_dot"))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(col("sq8_dot").desc, col("vec_id"))
    val top = cand.withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= candK)
      .select(col("qid"), col("vec_id").as("nid"), col("sq8_dot"))
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val rer = top
      .join(emb.select(col("vec_id").as("nid"), col("embedding").as("n_emb")),
        Seq("nid"))
      .join(broadcast(emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))),
        Seq("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("nid"))
    rer.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sq8_dot"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  // ----------------------------------------------------------------
  // IVF-SQ8: the composed standing index — √N Lloyd cells carrying
  // SQ8 compact codes IN the postings, exact rerank on survivors only.
  // ----------------------------------------------------------------

  /** The composed standing ANN index: cell-clustered postings
    * (cell, vec_id, codes, embedding) under the ⌈√N⌉ Lloyd quantizer,
    * where `codes` is the SQ8 scalar quantization of the vector
    * against the build-pinned GLOBAL [mn,mx] range ([[sq8Rerank]]'s
    * exact-integer encoding), plus the pinned centroid table and the
    * one-row range stats table. This is the at-scale ANN serving
    * layout every production vector store converges on (FAISS
    * `IVF…,SQ8`): probe 1/√N of the cells, scan their 1-byte-per-dim
    * codes (4× less memory bandwidth than floats — at 100 TB the scan
    * IS the cost), exact-rerank only the candK survivors. */
  final case class IvfSq8Index(postings: String, centroids: String,
      stats: String)

  private val ivfSq8Standing =
    new java.util.concurrent.ConcurrentHashMap[String, IvfSq8Index]()

  /** (vec_id, codes): every vector's dim-ordered SQ8 code array
    * against the broadcast one-row [mn,mx] range — exact integer
    * `((q - mn) * 255) div greatest(mx - mn, 1)` per element, so the
    * arrays (and every candidate set scored from them) are
    * bit-identical cross-engine. One N·d → N aggregate, build-time
    * only. */
  private def sq8Codes(qe: DataFrame, range: DataFrame): DataFrame =
    qe.crossJoin(broadcast(range))
      .select(col("vec_id"), col("dim"),
        expr("((q - mn) * 255) div greatest(mx - mn, 1)").as("code"))
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, code))), s -> s.code)")
        .as("codes"),
        // Σcode rides along from build time: the decoded-dot affine
        // correction needs it per posting, and computing it in the
        // serving scan would run the interpreted aggregate() HOF per
        // candidate row — the same interpreted-eval trap the r9
        // substring fix removed (ADVICE r9)
        sum(col("code")).as("code_sum"))

  /** One pass into the composed standing index: train the ⌈√N⌉
    * quantizer (deterministic Lloyd — identical centroids to
    * [[ensureIvfSqrt]]'s, so the cell alphabet is shared), pin the
    * global SQ8 range, encode every vector, and lay the postings out
    * cell-range-partitioned with codes AND exact vectors side by side
    * (codes serve candidate generation; the exact column serves only
    * the candK rerank and column-prunes out of the scoring scan).
    * Bloom bitmap on `cell` drives the probe point reads. */
  private def buildIvfSq8Index(spark: SparkSession, dir: String): IvfSq8Index =
    buildIvfSq8IndexWith(spark, dir, key = "", scratch = "tx_ivf_sq8",
      sqrtQuantizer)

  /** [[buildIvfSq8Index]] with the quantizer as a parameter — the
    * index machinery (range pin, direct encode, 3-commit layout) is
    * orthogonal to how the centroids were trained, which is the point
    * of the r11 composition: the SAMPLE-trained quantizer (linear
    * training, [[sampleQuantizer]]) drops into the same standing-index
    * lifecycle the full-trained one uses. Registered under
    * `dir + key` so both indices coexist in one session. */
  private def buildIvfSq8IndexWith(spark: SparkSession, dir: String,
      key: String, scratch: String,
      quant: (SparkSession, String) => (DataFrame, Boolean)): IvfSq8Index = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val (cents, bounded) = quant(spark, dir)
    val qe = quantized(spark, dir)
    val range = qe.agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
      .localCheckpoint() // one row, pinned: build and serve must agree
    // corpus-side encode as ONE narrow array projection against the
    // DRIVER-SCALAR pinned range (the range row is already
    // materialized above): same exact integers as [[sq8Codes]]'s
    // posexplode→shuffle→collect_list route, with no N·d exchange at
    // all — at x100 that exchange was the SQ8 build's measured bound
    // after the argmin fix (160 s vs the √N build's 102 s, same
    // training). transform() here is the interpreted HOF, but it runs
    // integer arithmetic once per element in a single build-time
    // pass — cheap where the substring case (string alloc per
    // element, per window) was not. Queries (|Q|=5) keep sq8Codes.
    val r0 = range.head()
    val mnv = r0.getAs[Long]("mn")
    val sv = math.max(r0.getAs[Long]("mx") - mnv, 1L)
    val encode = expr(
      s"""transform(embedding, x ->
            ((CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT) - ${mnv}L)
              * 255) div ${sv}L)""")
    val pDir = Scratch.fresh(scratch)
    TxTable(spark, pDir).append(
      memberRows(spark, dir, cents, bounded)
        .withColumn("codes", encode)
        .withColumn("code_sum", expr("aggregate(codes, 0L, (a, x) -> a + x)"))
        .select(col("cell"), col("vec_id"), col("codes"), col("code_sum"),
          col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh(scratch + "_cents")
    TxTable(spark, cDir).append(cents)
    val sDir = Scratch.fresh(scratch + "_stats")
    TxTable(spark, sDir).append(range)
    writeIndexManifest(pDir, "family" -> ("ivf_sq8" + key),
      "centroids" -> cDir, "stats" -> sDir)
    val idx = IvfSq8Index(pDir, cDir, sDir)
    ivfSq8Standing.put(dir + key, idx)
    idx
  }

  /** Get-or-build the standing IVF-SQ8 index (Bench warms it so
    * `sim_ann_ivfsq8` times the point-read + code-scan serving path). */
  def ensureIvfSq8(spark: SparkSession, dir: String): IvfSq8Index = {
    val hit = ivfSq8Standing.get(dir)
    if (hit != null) hit else buildIvfSq8Index(spark, dir)
  }

  /** Get-or-build the SAMPLE-trained composed index (Bench warms it so
    * `sim_ann_ivfsq8_sample` times the serving path alone). */
  def ensureIvfSq8Sample(spark: SparkSession, dir: String): IvfSq8Index = {
    val hit = ivfSq8Standing.get(dir + "#sample")
    if (hit != null) hit
    else buildIvfSq8IndexWith(spark, dir, key = "#sample",
      scratch = "tx_ivf_sq8_smp", sampleQuantizer)
  }

  /** The SAMPLE-trained IVF-SQ8 build as its own declared query — the
    * r11 composition of the two proven build-cost levers: gate-sampled
    * Lloyd training (linear instead of N^1.5, [[sampleQuantizer]]) and
    * the direct SQ8 encode against the pinned range (no N·d exchange,
    * [[buildIvfSq8IndexWith]]), with the one full-corpus argmin pass
    * through the map-side-combining [[argminByDist]] kernel as the
    * only N·k term. Same 3-commit layout as [[ivfSq8Build]]; the audit
    * row extends its (cell population, pinned range) columns with
    * `n_sample` — the measured witness that training stayed capped. */
  def ivfSq8BuildSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildIvfSq8IndexWith(spark, dir, key = "#sample",
      scratch = "tx_ivf_sq8_smp", sampleQuantizer)
    val nSample = sampleGateAudit(spark, dir)
    val range = TxTable(spark, idx.stats).read()
    TxTable(spark, idx.postings).read()
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_vecs"),
        min(col("n")).cast("long").as("min_cell_pop"),
        max(col("n")).cast("long").as("max_cell_pop"))
      .crossJoin(broadcast(range))
      .crossJoin(broadcast(nSample))
  }

  /** Recall@k of the sample-trained composed serve ([[annIvfSq8Sample]])
    * vs the brute-force exact top-k — prices all three approximations
    * together (sampled centroids, probed-cell candidate loss, 8-bit
    * code ranking before the rerank); read against
    * [[annSampleRecall]] (same centroids, uncompressed candidates) the
    * delta isolates what the codes cost on this alphabet. */
  def annIvfSq8SampleRecall(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 20, nprobe: Int = 3): DataFrame =
    recallOf(spark, dir, annIvfSq8Sample(spark, dir, k, candK, nprobe), k)

  /** The IVF-SQ8 BUILD as its own declared query: owns the quantizer
    * training, the SQ8 range pin, and all three tx commits; returns
    * the cell-population audit extended with the pinned code range —
    * the two build-time decisions (cell alphabet, quantization range)
    * a deployment monitors for drift. */
  def ivfSq8Build(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildIvfSq8Index(spark, dir)
    val range = TxTable(spark, idx.stats).read()
    TxTable(spark, idx.postings).read()
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_vecs"),
        min(col("n")).cast("long").as("min_cell_pop"),
        max(col("n")).cast("long").as("max_cell_pop"))
      .crossJoin(broadcast(range))
  }

  /** Multi-probe ANN served from the composed IVF-SQ8 index — the
    * VERDICT-r8 composition that turns four green parts into the
    * actual at-scale serving stack. Per query:
    *  1. rank probe cells on the build-pinned centroid table
    *     ([[annIndexedSqrt]]'s mechanics — nprobe/⌈√N⌉ of the corpus,
    *     a fraction that SHRINKS as N grows);
    *  2. Bloom-pruned point read of the probed cells' postings,
    *     projecting ONLY (cell, vec_id, codes) — the exact-vector
    *     column stays unread in the scoring scan (1 B/dim vs 4 B/dim
    *     memory bandwidth, the SQ8 point);
    *  3. score candidates with the DECODED integer dot (the codegen'd
    *     [[graft.functions.DotQ]] kernel plus the exact affine
    *     correction — see the body comment), keep candK per query;
    *  4. exact-rerank ONLY the survivors with [[graft.functions
    *     .CosineSimQ]] against vectors fetched from the SAME probed
    *     cells (5·candK rows — never a corpus join).
    * Codes are exact integers against the pinned range, so candidate
    * sets are bit-identical cross-engine and the whole path shares one
    * oracle with the unindexed algebra. */
  def annIvfSq8(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 20, nprobe: Int = 3): DataFrame =
    annIvfSq8From(spark, dir, ensureIvfSq8(spark, dir), k, candK, nprobe)

  /** Multi-probe SQ8-compressed ANN served from the SAMPLE-trained
    * composed index — same serving mechanics as [[annIvfSq8]] (the
    * serve never knows how its centroids were trained), over the
    * sample-trained cell alphabet. Different training set ⇒ different
    * cells ⇒ its own oracle, like the uncompressed sample family. */
  def annIvfSq8Sample(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 20, nprobe: Int = 3): DataFrame =
    annIvfSq8From(spark, dir, ensureIvfSq8Sample(spark, dir), k, candK, nprobe)

  private[graft] def annIvfSq8From(spark: SparkSession, dir: String,
      idx: IvfSq8Index, k: Int, candK: Int, nprobe: Int): DataFrame = {
    import graft.lake.TxTable
    val cents = TxTable(spark, idx.centroids).read()
    val range = TxTable(spark, idx.stats).read()
    // build-pinned centroid table is k·d rows — metadata-sized, so
    // counting it to prove the broadcast bound costs one point read
    val bounded = cents.count() * 24L <= (32L << 20)
    val probes = (if (bounded)
        rankedByDist(Tables(spark, dir).embeddings
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")), cents)
      else rankedTo(quantized(spark, dir).filter(col("vec_id") < 5), cents))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val postings = TxTable(spark, idx.postings).readWhereIn("cell", cellIds)
    // query codes against the PINNED range — |Q| rows, broadcast;
    // Σqcode precomputed here once per query, not per candidate row
    val qCodes = sq8Codes(
      quantized(spark, dir).filter(col("vec_id") < 5), range)
      .select(col("vec_id").as("qid"), col("codes").as("qcodes"),
        col("code_sum").as("qcode_sum"))
    val queries = probes.join(qCodes, Seq("qid"))
    // Candidates rank on the DECODED dot product, not the raw code
    // dot. code = (q - mn)·255 div s (s = mx - mn) centers every code
    // near 127 for roughly zero-centered embeddings, so the raw code
    // dot Σc_v·c_q is dominated by 127·Σc_v — it ranks candidates by
    // their coordinate SUM, uncorrelated with the query (measured:
    // recall@5 ≈ 0.04 at sf0.1). Undoing the affine shift recovers the
    // true dot: with dec_i = c_i·s + 255·mn ≈ 255·q_i,
    //   Σdec(v)·dec(q) = s²·dotQ + 255·mn·s·(Σc_v + Σc_q) + d·(255·mn)²
    // — exact integer arithmetic end-to-end (|score| ≤ ~1e15 ≪ 2⁶³),
    // so candidate sets stay bit-identical cross-engine, and for
    // unit-norm embeddings the ranking ≈ cosine (measured recall@5
    // 0.52 at sf0.1, equal to the uncompressed probe path's).
    val r0 = range.head()
    val mnv = r0.getAs[Long]("mn")
    val sv = math.max(r0.getAs[Long]("mx") - mnv, 1L)
    val tv = 255L * mnv
    // scoring scan is pure codegen arithmetic: the DotQ kernel plus
    // the build-time Σcode / broadcast-side Σqcode columns — no
    // interpreted aggregate() HOF runs per candidate row (ADVICE r9)
    val cand = postings
      .select(col("cell"), col("vec_id"), col("codes"), col("code_sum"))
      .join(broadcast(queries), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sq8_dot",
        lit(sv) * lit(sv) *
          graft.functions.DotQ.dotQ(col("codes"), col("qcodes"))
          + lit(tv) * lit(sv) * (col("code_sum") + col("qcode_sum"))
          + size(col("codes")).cast("long") * lit(tv) * lit(tv))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(col("sq8_dot").desc, col("vec_id"))
    val top = cand.withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= candK)
      .select(col("qid"), col("vec_id").as("nid"), col("sq8_dot"))
    // exact rerank: survivors' vectors come from the SAME probed-cell
    // point read (column-pruned to the exact column), never the corpus
    val rer = top
      .join(postings.select(col("vec_id").as("nid"),
        col("embedding").as("n_emb")), Seq("nid"))
      .join(broadcast(Tables(spark, dir).embeddings
        .filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))),
        Seq("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("nid"))
    rer.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sq8_dot"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Recall@k of the composed IVF-SQ8 serving path ([[annIvfSq8]])
    * against the brute-force exact top-k — the one number that prices
    * BOTH of the composed index's approximations together: candidate
    * loss from probing nprobe/⌈√N⌉ cells AND ranking loss from
    * cutting to candK on the 8-bit code dot before the exact rerank.
    * Same measured-not-guessed contract as [[annRecall]]: an index
    * whose recall nobody measured is a wrong-answers generator with
    * good latency. */
  /** Recall@k of the EXACT √N-cell probe path ([[annIvfSqrtK]]) — the
    * probe-limited ceiling every compressed variant of this index is
    * graded against: [[annIvfSq8Recall]] minus this number is the
    * ranking loss the 8-bit codes cost (measured 0 after the
    * decoded-dot fix), while this number vs 1.0 is pure candidate
    * loss from the nprobe/⌈√N⌉ dial. */
  def annSqrtRecall(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame =
    recallOf(spark, dir, annIvfSqrtK(spark, dir, k, nprobe), k)

  def annIvfSq8Recall(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 20, nprobe: Int = 3): DataFrame =
    recallOf(spark, dir, annIvfSq8(spark, dir, k, candK, nprobe), k)

  // ----------------------------------------------------------------
  // IVF-PQ: the composed standing index at the higher-compression
  // point on the same curve as IVF-SQ8 — √N Lloyd cells carrying
  // 8-byte PQ codes, ADC candidate scoring, exact rerank on survivors.
  // ----------------------------------------------------------------

  /** Standing IVF-PQ index: cell-clustered postings
    * (cell, vec_id, codes, embedding) under the ⌈√N⌉ Lloyd quantizer,
    * where `codes` is the vector's 8-subspace product-quantization
    * encoding ([[pqAdc]]'s per-label subspace codebooks — argmin of
    * exact integer subspace distance), plus the pinned centroid table
    * and the pinned codebook. Where SQ8 stores 1 B/dim (4×
    * compression), PQ stores 8 codes for 64 dims (~32×): the scoring
    * scan reads 8 small ints per candidate and the query's
    * constant-size distance table does the rest — the FAISS `IVF…,PQ8`
    * layout. */
  final case class IvfPqIndex(postings: String, centroids: String,
      codebook: String)

  private val ivfPqStanding =
    new java.util.concurrent.ConcurrentHashMap[String, IvfPqIndex]()

  /** Per-(subspace, label) codebook over e4 coords — half-up integer
    * means, the deterministic stand-in for per-subspace kmeans
    * ([[pqAdc]]'s construction, (d/dimsPerSub)·|labels|·dimsPerSub
    * rows, bounded). dimsPerSub=8 on d=64 is the default 8-subspace
    * (~32×) point; dimsPerSub=4 the 16-subspace (~16×) frontier
    * variant — more subspaces = finer quantization = better ADC
    * ranking at proportionally more code bytes per candidate. */
  private[graft] def pqCodebook(qe: DataFrame, dimsPerSub: Int = 8): DataFrame =
    qe.withColumn("sub", expr(s"dim div $dimsPerSub"))
      .groupBy(col("sub"), col("label").as("code"), col("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("sub"), col("code"), col("dim"),
        expr("CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)")
          .as("c"))

  /** One pass into the standing IVF-PQ index: train the ⌈√N⌉
    * quantizer (same deterministic Lloyd ⇒ same cell alphabet as the
    * √N/SQ8 indices), pin the PQ codebook, encode every vector as its
    * 8 argmin sub-centroids (map-side-combining `min_by` — the r10
    * argmin kernel, no N·8·k window sort), and lay the postings out
    * cell-range-partitioned with codes AND exact vectors side by side
    * (codes serve ADC candidate generation; the exact column serves
    * only the candK rerank and column-prunes out of the scoring
    * scan). */
  private def buildIvfPqIndex(spark: SparkSession, dir: String): IvfPqIndex =
    buildIvfPqIndexWith(spark, dir, key = "", scratch = "tx_ivf_pq",
      sqrtQuantizer)

  /** [[buildIvfPqIndex]] with the coarse quantizer as a parameter —
    * the same composition seam [[buildIvfSq8IndexWith]] opened for the
    * SQ8 family (r11): the PQ index machinery (codebook pin, `min_by`
    * encode, 3-commit layout) is orthogonal to how the cell alphabet
    * was trained, so the SAMPLE-trained quantizer (linear training,
    * [[sampleQuantizer]]) drops in unchanged. The PQ CODEBOOK stays a
    * full-corpus aggregate either way — per-(sub, label) means are ONE
    * linear N·d pass (same cost class as the SQ8 family's full-corpus
    * [mn,mx] range pin), so sampling it would save nothing asymptotic
    * while forking the code alphabet; the N^1.5 term this composition
    * removes is Lloyd's iters·N·k coarse training alone. */
  private[graft] def buildIvfPqIndexWith(spark: SparkSession, dir: String,
      key: String, scratch: String,
      quant: (SparkSession, String) => (DataFrame, Boolean),
      dimsPerSub: Int = 8): IvfPqIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val (cents, bounded) = quant(spark, dir)
    val cb = pqCodebook(qe4(spark, dir), dimsPerSub).localCheckpoint() // bounded, pinned
    // r16 (guide §2.3/§2.4): cell AND codes both computed ON the scan
    // row ([[memberRows]] + [[withPqCodes]]) — the former N·d·|codes|
    // subDist join, its two aggregate exchanges, the collect_list
    // pack, and both join-backs are all gone.
    val pDir = Scratch.fresh(scratch)
    TxTable(spark, pDir).append(
      withPqCodes(memberRows(spark, dir, cents, bounded), cb, dimsPerSub)
        .select(col("cell"), col("vec_id"), col("codes"), col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh(scratch + "_cents")
    TxTable(spark, cDir).append(cents)
    val bDir = Scratch.fresh(scratch + "_cb")
    TxTable(spark, bDir).append(cb)
    writeIndexManifest(pDir, "family" -> ("ivf_pq" + key),
      "centroids" -> cDir, "codebook" -> bDir)
    val idx = IvfPqIndex(pDir, cDir, bDir)
    ivfPqStanding.put(dir + key, idx)
    idx
  }

  /** Get-or-build the standing IVF-PQ index (Bench warms it so
    * `sim_ann_ivfpq` times the point-read + ADC serving path). */
  def ensureIvfPq(spark: SparkSession, dir: String): IvfPqIndex = {
    val hit = ivfPqStanding.get(dir)
    if (hit != null) hit else buildIvfPqIndex(spark, dir)
  }

  /** Get-or-build the SAMPLE-trained IVF-PQ index (Bench warms it so
    * `sim_ann_ivfpq_sample` times the ADC serving path alone). */
  def ensureIvfPqSample(spark: SparkSession, dir: String): IvfPqIndex = {
    val hit = ivfPqStanding.get(dir + "#sample")
    if (hit != null) hit
    else buildIvfPqIndexWith(spark, dir, key = "#sample",
      scratch = "tx_ivf_pq_smp", sampleQuantizer)
  }

  /** The SAMPLE-trained IVF-PQ build as its own declared query
    * (VERDICT r11 task 2) — the same two proven build-cost levers the
    * SQ8 family composed in r11, applied to the PQ index:
    * gate-sampled Lloyd coarse training (linear instead of N^1.5,
    * [[sampleQuantizer]]) under the unchanged PQ machinery (linear
    * full-corpus codebook aggregate, `min_by` encode, 3-commit
    * layout), leaving the full-corpus argmin assignment and the
    * encode as the only N-proportional passes. The audit row extends
    * [[ivfPqBuild]]'s (cell populations, cb_rows) with `n_sample` —
    * the measured witness that coarse training stayed capped. */
  def ivfPqBuildSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildIvfPqIndexWith(spark, dir, key = "#sample",
      scratch = "tx_ivf_pq_smp", sampleQuantizer)
    val nSample = sampleGateAudit(spark, dir)
    val cbRows = TxTable(spark, idx.codebook).read()
      .agg(count(lit(1)).as("cb_rows"))
    TxTable(spark, idx.postings).read()
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_vecs"),
        min(col("n")).cast("long").as("min_cell_pop"),
        max(col("n")).cast("long").as("max_cell_pop"))
      .crossJoin(broadcast(cbRows))
      .crossJoin(broadcast(nSample))
  }

  /** The IVF-PQ build as its own declared query: owns the quantizer
    * training, the codebook pin, the `min_by` encode, and all three
    * tx commits; returns the cell-population audit extended with the
    * codebook row count — the build-time decision (code alphabet
    * size) a deployment monitors alongside the cell alphabet. */
  def ivfPqBuild(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildIvfPqIndex(spark, dir)
    val cbRows = TxTable(spark, idx.codebook).read()
      .agg(count(lit(1)).as("cb_rows"))
    TxTable(spark, idx.postings).read()
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_vecs"),
        min(col("n")).cast("long").as("min_cell_pop"),
        max(col("n")).cast("long").as("max_cell_pop"))
      .crossJoin(broadcast(cbRows))
  }

  /** Multi-probe ANN served from the standing IVF-PQ index — the ADC
    * form of [[annIvfSq8]]'s composition. Per query:
    *  1. rank probe cells on the build-pinned centroid table
    *     (nprobe/⌈√N⌉ of the corpus, shrinking as N grows);
    *  2. Bloom-pruned point read of the probed cells' postings,
    *     projecting ONLY (cell, vec_id, codes) — 8 small ints per
    *     candidate, the 32× compression the scoring scan pays for;
    *  3. ADC: the query's exact distance to every (sub, code)
    *     centroid is a constant-size table (|Q|·8·|codes| rows,
    *     broadcast); a candidate's approximate distance is the sum of
    *     8 table lookups over its codes (posexplode + broadcast
    *     equi-join + map-side-combined sum). Keep candK per query;
    *  4. exact-rerank ONLY the survivors against vectors from the
    *     SAME probed-cell read.
    * Codebook, codes, and distance tables are exact integers, so
    * candidate sets are bit-identical cross-engine. */
  /** candK default = 100 BY MEASUREMENT (r12 frontier sweep,
    * `tools.PqFrontier` + BASELINE.md): at 8 subspaces the ADC ranking
    * loss goes to ZERO at candK=100 — recall equals the nprobe=3
    * probe-limited ceiling — while candK=20 (the r11 default) left a
    * 20% relative recall gap. The dial is rerank-side only: scan bytes
    * (8 B/candidate, ~32× compression) are unchanged, and the exact
    * rerank grows to |Q|·100 rows — still metadata-sized. The
    * 16-subspace variant reaches the same ceiling at candK=50 but
    * doubles every candidate's scan bytes; 8 subspaces stays the
    * default. */
  def annIvfPq(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 100, nprobe: Int = 3): DataFrame =
    annIvfPqFrom(spark, dir, ensureIvfPq(spark, dir), k, candK, nprobe)

  /** Multi-probe ADC ANN served from the SAMPLE-trained IVF-PQ index —
    * same serving mechanics as [[annIvfPq]] (the serve never knows how
    * its coarse cells were trained), over the sample-trained cell
    * alphabet. Different training set ⇒ different cells ⇒ its own
    * oracle, mirroring the SQ8 sample family. */
  def annIvfPqSample(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 100, nprobe: Int = 3): DataFrame =
    annIvfPqFrom(spark, dir, ensureIvfPqSample(spark, dir), k, candK, nprobe)

  private[graft] def annIvfPqFrom(spark: SparkSession, dir: String,
      idx: IvfPqIndex, k: Int, candK: Int, nprobe: Int,
      dimsPerSub: Int = 8): DataFrame = {
    import graft.lake.TxTable
    val cents = TxTable(spark, idx.centroids).read()
    val bounded = cents.count() * 24L <= (32L << 20)
    val probes = (if (bounded)
        rankedByDist(Tables(spark, dir).embeddings
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")), cents)
      else rankedTo(quantized(spark, dir).filter(col("vec_id") < 5), cents))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val postings = TxTable(spark, idx.postings).readWhereIn("cell", cellIds)
    // query distance table against the PINNED codebook: |Q|·8·|codes|
    // rows — metadata-sized, broadcast with the probe list
    val cb = TxTable(spark, idx.codebook).read()
    val qd = qe4(spark, dir).filter(col("vec_id") < 5)
      .withColumn("sub", expr(s"dim div $dimsPerSub"))
      .join(broadcast(cb), Seq("sub", "dim"))
      .groupBy(col("vec_id"), col("sub"), col("code"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
      .select(col("vec_id").as("qid"), col("sub"), col("code"), col("d2"))
    val cand = postings
      .select(col("cell"), col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .withColumn("sub", col("sub").cast("long"))
      .join(broadcast(probes), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(qd), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_dist2"))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist2"), col("vec_id"))
    val top = cand.withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= candK)
      .select(col("qid"), col("vec_id").as("nid"), col("adc_dist2"))
    val rer = top
      .join(postings.select(col("vec_id").as("nid"),
        col("embedding").as("n_emb")), Seq("nid"))
      .join(broadcast(Tables(spark, dir).embeddings
        .filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))),
        Seq("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("nid"))
    rer.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("adc_dist2"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Recall@k of the IVF-PQ serve vs the brute-force exact top-k —
    * prices the probed-cell candidate loss plus the 8-byte ADC
    * ranking loss before the rerank; read against [[annSqrtRecall]]
    * (same cells, exact candidates) the delta is what PQ's 32×
    * compression costs in candidate quality. */
  def annIvfPqRecall(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 100, nprobe: Int = 3): DataFrame =
    recallOf(spark, dir, annIvfPq(spark, dir, k, candK, nprobe), k)

  /** Recall@k of the sample-trained IVF-PQ serve vs the brute-force
    * exact top-k — prices all three approximations together (sampled
    * coarse centroids, probed-cell candidate loss, ADC ranking loss);
    * read against [[annIvfPqRecall]] at the same nprobe/candK, the
    * delta isolates what sample training costs on this index family
    * (measured 0 for the SQ8 twin in r11). */
  def annIvfPqSampleRecall(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 100, nprobe: Int = 3): DataFrame =
    recallOf(spark, dir, annIvfPqSample(spark, dir, k, candK, nprobe), k)

  // ----------------------------------------------------------------
  // Grow-aware √N index maintenance: auto re-bucket under appends.
  // ----------------------------------------------------------------

  /** Handle on a grow-aware √N IVF index: postings + pinned-centroid
    * tx tables and the pinned cell count k. Immutable — maintenance
    * returns a NEW handle (a rebuild retires the old roots), so a
    * reader holding the old handle keeps a consistent snapshot. */
  final case class IvfGrowIndex(postings: String, centroids: String, k: Int)

  /** Train a fresh ⌈√N⌉-cell index over `emb` (vec_id, embedding) —
    * the grow-aware lifecycle's t=0. Same deterministic Lloyd as
    * [[ensureIvfSqrt]]; postings cell-range-partitioned, Bloom on
    * `cell`. */
  def ivfGrowInit(spark: SparkSession, emb: DataFrame): IvfGrowIndex = {
    val e = emb.select(col("vec_id"), col("embedding")).persist()
    val k = math.ceil(math.sqrt(e.count().toDouble)).toInt
    val cents = lloydCentroidsFast(e, k, 2).localCheckpoint()
    val idx = writeGrowIndex(spark, e, cents, k)
    e.unpersist(blocking = false)
    idx
  }

  private def writeGrowIndex(spark: SparkSession, emb: DataFrame,
      cents: DataFrame, k: Int): IvfGrowIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val pDir = Scratch.fresh("tx_ivf_grow")
    TxTable(spark, pDir).append(
      withArgminCell(emb.select(col("vec_id"), col("embedding")), cents)
        .select(col("cell"), col("vec_id"), col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh("tx_ivf_grow_cents")
    TxTable(spark, cDir).append(cents)
    IvfGrowIndex(pDir, cDir, k)
  }

  /** Append `delta` vectors to a grow-aware index, RE-BUCKETING when
    * the corpus outgrows the pinned cell alphabet.
    *
    * The cheap path assigns the delta against the PINNED centroids
    * (touches only the delta — [[ivfAppendServe]]'s semantic) and
    * commits it into the existing postings. The REBUILD TRIGGER is
    * N > (k·growthFactor)²: the pinned k has fallen behind ⌈√N⌉ by
    * more than `growthFactor`, so the probed fraction nprobe/k has
    * drifted a factor growthFactor above the nprobe/√N design point.
    * A rebuild retrains k′ = ⌈√N⌉ Lloyd cells seeded by SPLITTING THE
    * PINNED ALPHABET PROPORTIONALLY: each old cell contributes
    * ⌈k′·pop/N⌋ seeds (largest-remainder allocation), picked as
    * hash-ranked MEMBER VECTORS of that cell — so dense cells split
    * into several and cluster structure carries over instead of
    * restarting cold. Seeding from members, not from the old centroid
    * means, matters: a mean is central in high-dimensional space, so
    * mixing mean-seeds with point-seeds makes every new cell collapse
    * to a singleton (measured on the sf0.01 corpus: 11 of 11 new
    * cells degenerate); all-point seeding keeps the alphabet
    * balanced. Postings + centroids rewrite under fresh roots.
    * Amortization is geometric: rebuild i processes N_i ≈
    * growthFactor²·N_{i-1} rows, so total rebuild work over any
    * append sequence is O(N_final · gf²/(gf²−1)) — a constant factor
    * over one build, the textbook doubling argument.
    *
    * Returns the (possibly new) handle; `ivfProbedFraction` measures
    * the property this maintains — probed fraction non-increasing as
    * the corpus grows ([[IvfGrowSpec]]). */
  def ivfGrowAppend(spark: SparkSession, idx: IvfGrowIndex,
      delta: DataFrame, growthFactor: Double = 2.0): IvfGrowIndex = {
    import graft.lake.TxTable
    val cents = TxTable(spark, idx.centroids).read()
    val d = delta.select(col("vec_id"), col("embedding"))
    val tx = TxTable(spark, idx.postings)
    tx.append(
      withArgminCell(d, cents)
        .select(col("cell"), col("vec_id"), col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val n = tx.read().count()
    val threshold = (idx.k.toDouble * growthFactor) *
      (idx.k.toDouble * growthFactor)
    if (n.toDouble <= threshold) idx
    else {
      // re-bucket: k' = ceil(sqrt(N)) cells, seeded by splitting the
      // pinned alphabet proportionally to cell population
      val kNew = math.ceil(math.sqrt(n.toDouble)).toInt
      val emb = tx.read().select(col("vec_id"), col("embedding"))
        .localCheckpoint() // pin the merged snapshot for the rebuild
      // current assignment under the pinned centroids: the merged
      // postings already carry it (argmin cell at commit time)
      val memberNow = tx.read().select(col("vec_id"), col("cell"))
      val pops = memberNow.groupBy(col("cell"))
        .agg(count(lit(1)).as("pop"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq // k rows
      val seats = allocSeats(pops, kNew)
      import spark.implicits._
      val seatDf = broadcast(seats.toSeq.toDF("cell", "seats"))
      val hashOrder = Seq(
        graft.functions.PortableHash.phash(col("vec_id").cast("string"), 11).asc,
        col("vec_id").asc)
      val wCell = Window.partitionBy(col("cell")).orderBy(hashOrder: _*)
      val picked = memberNow
        .withColumn("r", row_number().over(wCell))
        .join(seatDf, Seq("cell"))
        .filter(col("r") <= col("seats"))
      val wAll = Window.orderBy(col("cell"), col("r")) // over k' rows only
      val seeds = picked
        .withColumn("newcell", (row_number().over(wAll) - 1).cast("long"))
        .select(col("vec_id"), col("newcell"))
      val cents0 = emb.join(broadcast(seeds), Seq("vec_id"))
        .select(col("newcell").as("cell"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("cell"), col("dim").cast("long").as("dim"),
          expr("CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)").as("c"))
      val centsNew = lloydFrom(emb, cents0, 2).localCheckpoint()
      writeGrowIndex(spark, emb, centsNew, kNew)
    }
  }

  /** Largest-remainder seat allocation of `k` rebuild seeds across the
    * old cells, proportional to population and capped by it (a cell
    * cannot seed more members than it has). Deterministic: remainder
    * desc, cell asc. Driver-side over k rows — metadata, not data. */
  private[operators] def allocSeats(pops: Seq[(Long, Long)],
      k: Int): Map[Long, Int] = {
    val n = pops.map(_._2).sum.toDouble
    val base = pops.map { case (c, p) =>
      val ideal = k * p / n
      (c, p, math.min(p, ideal.toLong).toInt, ideal - math.floor(ideal))
    }
    val seats = scala.collection.mutable.Map(base.map(t => t._1 -> t._3): _*)
    var rem = k - seats.values.sum
    while (rem > 0) {
      val cands = base.filter { case (c, p, _, _) => seats(c) < p }
        .sortBy { case (c, _, _, f) => (-f, c) }
      if (cands.isEmpty) rem = 0 // k > N cannot happen (k = ceil(sqrt(N)))
      else cands.take(rem).foreach { case (c, _, _, _) =>
        seats(c) += 1; rem -= 1
      }
    }
    seats.toMap
  }

  /** Mean probed corpus fraction for `queries` (vec_id, embedding) at
    * `nprobe` — the scale property the grow-aware maintenance keeps:
    * Σ(probed cells' population) / N per query, averaged. Constant
    * between rebuilds (appends distribute over the fixed alphabet),
    * dropping to ≈ nprobe/⌈√N⌉ at each re-bucket. */
  def ivfProbedFraction(spark: SparkSession, idx: IvfGrowIndex,
      queries: DataFrame, nprobe: Int = 3): Double =
    probedFractionAt(spark, idx.postings, idx.centroids, queries, nprobe)

  /** [[ivfProbedFraction]] over raw table roots — shared with the
    * composed-index grow lifecycles ([[ivfSq8GrowAppend]],
    * [[ivfPqGrowAppend]]), whose handles carry more tables but obey
    * the same probed-fraction law. */
  private def probedFractionAt(spark: SparkSession, postingsDir: String,
      centroidsDir: String, queries: DataFrame, nprobe: Int): Double = {
    import graft.lake.TxTable
    val cents = TxTable(spark, centroidsDir).read()
    val posts = TxTable(spark, postingsDir).read()
    val pop = posts.groupBy(col("cell")).agg(count(lit(1)).as("pop"))
    val n = posts.count().toDouble
    val probes = rankedByDist(
        queries.select(col("vec_id"), col("embedding")), cents)
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell"))
    val perQuery = probes.join(pop, Seq("cell"))
      .groupBy(col("qid")).agg(sum(col("pop")).as("probed"))
      .agg(avg(col("probed"))).head().getDouble(0)
    perQuery / n
  }

  // ----------------------------------------------------------------
  // Grow-aware maintenance for the COMPOSED standing indexes
  // (VERDICT r11 task 5): the SQ8-sample and PQ-sample indexes gain
  // the same append/trigger/rebuild lifecycle the exact √N index has.
  // ----------------------------------------------------------------

  /** Handle on a grow-aware SAMPLE-trained IVF-SQ8 index: postings +
    * pinned centroids + pinned SQ8 range, and the pinned cell count k.
    * Immutable, like [[IvfGrowIndex]] — a rebuild returns a NEW handle
    * under fresh roots. */
  final case class IvfSq8GrowIndex(postings: String, centroids: String,
      stats: String, k: Int)

  /** [[sampleQuantizer]] over an arbitrary (vec_id, embedding) frame —
    * the grow lifecycles train on merged snapshots, not the fixed
    * corpus table. Returns (centroids, k). Linear: the Lloyd
    * iterations read only the hash-gated 8·⌈√N⌉ sample; rebuilds under
    * this quantizer are therefore CHEAP enough that the composed grow
    * path retrains from the gate instead of seeding from the outgrown
    * alphabet ([[ivfGrowAppend]]'s proportional-split machinery exists
    * to amortize full Lloyd's N^1.5 — sample training has no such term
    * to amortize). */
  private def sampleQuantizerOf(emb: DataFrame): (DataFrame, Int) = {
    val e = emb.select(col("vec_id"), col("embedding"))
    val nd = e.agg(count(lit(1)).as("n"),
      max(size(col("embedding"))).cast("long").as("d")).head
    val n = nd.getLong(0)
    val (kk, _, gate) = sampleGate(n)
    val sample = e
      .filter(gate)
      .repartition(e.sparkSession.sparkContext.defaultParallelism,
        col("vec_id"))
    // same broadcast budget as [[sampleQuantizer]] (ADVICE r12): the
    // fast kernel's argmin broadcasts the full k·d centroid table,
    // which on a large grow rebuild is an unbounded static broadcast —
    // past the 32 MB proof it falls back to the shuffled-join Lloyd
    val bounded = kk.toLong * nd.getLong(1) * 24L <= (32L << 20)
    val sampleT = sample.persist()
    val cents =
      (if (bounded) lloydCentroidsFast(sampleT, kk, 2)
       else lloydCentroids(quantizedOf(sampleT), kk, 2, boundedK = false))
        .localCheckpoint()
    sampleT.unpersist(blocking = false)
    (cents, kk)
  }

  /** The SQ8 encode expression against a DRIVER-PINNED (mn, s) range —
    * shared by the grow init (fresh range) and append (range read back
    * from the pinned stats table): exact integers, never clamped, so a
    * delta vector outside the pinned range still encodes and decodes
    * consistently (the affine decode is linear — no saturation point
    * exists to corrupt). */
  private[graft] def sq8EncodeExpr(mnv: Long, sv: Long): Column = expr(
    s"""transform(embedding, x ->
          ((CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT) - ${mnv}L)
            * 255) div ${sv}L)""")

  private def writeSq8GrowIndex(spark: SparkSession, emb: DataFrame,
      cents: DataFrame, k: Int): IvfSq8GrowIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val range = quantizedOf(emb)
      .agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
      .localCheckpoint()
    val r0 = range.head()
    val mnv = r0.getAs[Long]("mn")
    val sv = math.max(r0.getAs[Long]("mx") - mnv, 1L)
    val pDir = Scratch.fresh("tx_sq8_grow")
    TxTable(spark, pDir).append(
      withArgminCell(emb.select(col("vec_id"), col("embedding")), cents)
        .withColumn("codes", sq8EncodeExpr(mnv, sv))
        .withColumn("code_sum", expr("aggregate(codes, 0L, (a, x) -> a + x)"))
        .select(col("cell"), col("vec_id"), col("codes"), col("code_sum"),
          col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh("tx_sq8_grow_cents")
    TxTable(spark, cDir).append(cents)
    val sDir = Scratch.fresh("tx_sq8_grow_stats")
    TxTable(spark, sDir).append(range)
    IvfSq8GrowIndex(pDir, cDir, sDir, k)
  }

  /** Train a fresh sample-quantized SQ8 index over `emb`
    * (vec_id, embedding) — the composed grow lifecycle's t=0. */
  def ivfSq8GrowInit(spark: SparkSession, emb: DataFrame): IvfSq8GrowIndex = {
    val e = emb.select(col("vec_id"), col("embedding"))
    val (cents, kk) = sampleQuantizerOf(e)
    writeSq8GrowIndex(spark, e, cents, kk)
  }

  /** Append `delta` vectors to a grow-aware SQ8 index. The cheap path
    * assigns the delta against the PINNED centroids and encodes it
    * against the PINNED range — both build-time artifacts stay
    * immutable, so every previously served answer is unchanged and the
    * append touches only the delta. The rebuild trigger is
    * [[ivfGrowAppend]]'s law, N > (k·growthFactor)²; a rebuild
    * RE-TRAINS the codebooks the task named — fresh gate-sampled
    * centroids AND a fresh [mn,mx] range over the merged corpus — and
    * rewrites postings under new roots (geometric amortization, same
    * doubling argument). */
  def ivfSq8GrowAppend(spark: SparkSession, idx: IvfSq8GrowIndex,
      delta: DataFrame, growthFactor: Double = 2.0): IvfSq8GrowIndex = {
    import graft.lake.TxTable
    val cents = TxTable(spark, idx.centroids).read()
    val r0 = TxTable(spark, idx.stats).read().head()
    val mnv = r0.getAs[Long]("mn")
    val sv = math.max(r0.getAs[Long]("mx") - mnv, 1L)
    val d = delta.select(col("vec_id"), col("embedding"))
    val tx = TxTable(spark, idx.postings)
    tx.append(
      withArgminCell(d, cents)
        .withColumn("codes", sq8EncodeExpr(mnv, sv))
        .withColumn("code_sum", expr("aggregate(codes, 0L, (a, x) -> a + x)"))
        .select(col("cell"), col("vec_id"), col("codes"), col("code_sum"),
          col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val n = tx.read().count()
    val threshold = (idx.k.toDouble * growthFactor) *
      (idx.k.toDouble * growthFactor)
    if (n.toDouble <= threshold) idx
    else {
      val emb = tx.read().select(col("vec_id"), col("embedding"))
        .localCheckpoint() // pin the merged snapshot for the rebuild
      val (cents2, k2) = sampleQuantizerOf(emb)
      writeSq8GrowIndex(spark, emb, cents2, k2)
    }
  }

  /** Probed fraction of a grow-aware SQ8 index — same law, same
    * measurement, as [[ivfProbedFraction]]. */
  def ivfSq8ProbedFraction(spark: SparkSession, idx: IvfSq8GrowIndex,
      queries: DataFrame, nprobe: Int = 3): Double =
    probedFractionAt(spark, idx.postings, idx.centroids, queries, nprobe)

  /** Handle on a grow-aware SAMPLE-trained IVF-PQ index: postings +
    * pinned centroids + pinned per-(sub, code) codebook. */
  final case class IvfPqGrowIndex(postings: String, centroids: String,
      codebook: String, k: Int)

  /** One-row flattened codebook pack (codes sorted asc; per-code
    * FULL-LENGTH dim-ordered quantized centroid vectors) — the
    * broadcast side of the [[graft.functions.PqEncodeQ]] encode
    * kernel. |codes|·d longs, bounded by the code alphabet. */
  private def cbPack(cb: DataFrame): DataFrame =
    cb.groupBy(col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)")
        .as("cvec"))
      // code canonicalizes to BIGINT like [[centPack]]'s cell: the
      // label-seeded alphabet is int32 and the kernel reads longs
      .agg(expr("array_sort(collect_list(struct(CAST(code AS BIGINT) AS code, cvec)))")
        .as("p"))
      .select(expr("transform(p, s -> s.code)").as("cb_codes"),
        expr("transform(p, s -> s.cvec)").as("cb_cvecs"))

  /** Adds the PQ `codes` column ON the embedding row (r16, guide
    * §2.3/§2.4): where the relational encode materialized N·d·|codes|
    * subDist rows through two aggregate exchanges, a collect_list
    * pack, and a join-back, the [[graft.functions.PqEncodeQ]] kernel
    * loops the broadcast [[cbPack]] per row inside the scan's codegen
    * stage — zero Exchange. Same integers, same code-asc tie-break
    * (`KernelEquivalenceSpec`). */
  private[graft] def withPqCodes(rows: DataFrame, cb: DataFrame,
      dimsPerSub: Int): DataFrame =
    rows.crossJoin(broadcast(cbPack(cb)))
      .withColumn("codes", graft.functions.PqEncodeQ.pqEncodeQ(
        col("embedding"), col("cb_codes"), col("cb_cvecs"), dimsPerSub))
      .drop("cb_codes", "cb_cvecs")

  /** PQ encode of `emb` (vec_id, embedding) against a PINNED codebook
    * — [[withPqCodes]] projected to (vec_id, codes). The grow append
    * and the streamed-PQ maintenance run this over deltas only. */
  private[graft] def pqEncodeAgainst(emb: DataFrame, cb: DataFrame,
      dimsPerSub: Int = 8): DataFrame =
    withPqCodes(emb.select(col("vec_id"), col("embedding")), cb, dimsPerSub)
      .select(col("vec_id"), col("codes"))

  /** `emb` is (vec_id, embedding, label): the label rides INTO the
    * postings row — like [[buildIvfSqrtIndex]]'s attribute column — so
    * a rebuild can retrain the per-(sub, label) codebook from the
    * merged snapshot without a corpus join. */
  private def writePqGrowIndex(spark: SparkSession, emb: DataFrame,
      cents: DataFrame, cb: DataFrame, k: Int): IvfPqGrowIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val pDir = Scratch.fresh("tx_pq_grow")
    TxTable(spark, pDir).append(
      withPqCodes(withArgminCell(
          emb.select(col("vec_id"), col("embedding"), col("label")), cents),
        cb, dimsPerSub = 8)
        .select(col("cell"), col("vec_id"), col("codes"), col("label"),
          col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val cDir = Scratch.fresh("tx_pq_grow_cents")
    TxTable(spark, cDir).append(cents)
    val bDir = Scratch.fresh("tx_pq_grow_cb")
    TxTable(spark, bDir).append(cb)
    IvfPqGrowIndex(pDir, cDir, bDir, k)
  }

  /** Train a fresh sample-quantized PQ index over `emb`
    * (vec_id, embedding, label) — labels seed the per-subspace
    * codebook, exactly as in [[buildIvfPqIndexWith]]. */
  def ivfPqGrowInit(spark: SparkSession, emb: DataFrame): IvfPqGrowIndex = {
    val (cents, kk) = sampleQuantizerOf(emb)
    val qe = quantizedOf(emb)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
    writePqGrowIndex(spark, emb, cents, pqCodebook(qe).localCheckpoint(), kk)
  }

  /** Append `delta` (vec_id, embedding, label) to a grow-aware PQ
    * index: assign + PQ-encode against the PINNED centroids/codebook;
    * rebuild (fresh sample centroids, fresh codebook, full re-encode)
    * when N > (k·growthFactor)². */
  def ivfPqGrowAppend(spark: SparkSession, idx: IvfPqGrowIndex,
      delta: DataFrame, growthFactor: Double = 2.0): IvfPqGrowIndex = {
    import graft.lake.TxTable
    val cents = TxTable(spark, idx.centroids).read()
    val cb = TxTable(spark, idx.codebook).read()
    val d = delta.select(col("vec_id"), col("embedding"), col("label"))
    val tx = TxTable(spark, idx.postings)
    tx.append(
      withPqCodes(withArgminCell(d, cents), cb, dimsPerSub = 8)
        .select(col("cell"), col("vec_id"), col("codes"), col("label"),
          col("embedding"))
        .repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))
    val n = tx.read().count()
    val threshold = (idx.k.toDouble * growthFactor) *
      (idx.k.toDouble * growthFactor)
    if (n.toDouble <= threshold) idx
    else {
      // rebuild: merged snapshot (labels live in the postings rows),
      // fresh gate-sampled centroids, fresh per-(sub, label) codebook,
      // full re-encode under new roots — geometric amortization
      val emb = tx.read()
        .select(col("vec_id"), col("embedding"), col("label"))
        .localCheckpoint()
      val (cents2, k2) = sampleQuantizerOf(emb)
      val qe = quantizedOf(emb.select(col("vec_id"), col("embedding")))
        .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      writePqGrowIndex(spark, emb, cents2,
        pqCodebook(qe).localCheckpoint(), k2)
    }
  }

  /** Probed fraction of a grow-aware PQ index. */
  def ivfPqProbedFraction(spark: SparkSession, idx: IvfPqGrowIndex,
      queries: DataFrame, nprobe: Int = 3): Double =
    probedFractionAt(spark, idx.postings, idx.centroids, queries, nprobe)
}

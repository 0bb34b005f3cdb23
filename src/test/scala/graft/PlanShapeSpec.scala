package graft

import graft.tools.PlanShape

/** EXPLAIN-diff regression guard (round-9 stretch 8): the physical-
  * plan SHAPE of the driver bench's most expensive batch queries,
  * pinned as upper bounds. A refactor that silently adds an exchange,
  * degrades a broadcast join to a sort-merge join, or introduces a
  * nested-loop join moves a number here and fails — turning the
  * "plans you'd want at 100×" bar into a machine check instead of a
  * per-round manual `.explain` audit.
  *
  * Bounds are the measured values at sf0.001 (tools/PlanShape prints
  * them — run it when a plan legitimately changes and re-pin). Upper
  * bounds, not equalities: fewer exchanges / more broadcasts is an
  * improvement and must not fail the guard. */
class PlanShapeSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  /** The pins are the plans of a FRESH session. Earlier suites in the
    * shared-JVM run leave `.cache()`/`.persist()`ed subtrees (minhash
    * shingle digests, SQ8 quantized frames) in the session-wide
    * CacheManager; cache substitution swaps a parquet scan's size
    * stats for an in-memory estimate, which can legitimately flip a
    * broadcast join to SMJ and shift exchange counts — a property of
    * the TEST ordering, not of the plans this guard pins. Dropping all
    * cached data first makes the guard order-independent (later suites
    * merely recompute; caches here are performance, never semantics). */
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sharedState.cacheManager.clearCache()
  }

  /** name -> (max hash exchanges, max sort-merge joins, max broadcast
    * nested-loop joins). */
  // The increase on every documents-exploding dedup entry (vs the r9
  // first pins) is the documentsSpread exchange: expansion-heavy
  // operators repartition the compact source rows to session
  // parallelism before the 100-300×/doc explode
  // (Tables.documentsSpread — the x100 single-input-split lesson,
  // BASELINE.md r9). The pre-execution plan prints that exchange once
  // PER REFERENCE to the spread scan (minhash's signature + both
  // intersection sides, PassJoin's segs/probes/verify); the subtrees
  // are identical, so Spark's ReuseExchange collapses them to one
  // shuffle of corpus-size bytes at runtime.
  private val pinned: Map[String, (Int, Int, Int)] = Map(
    // LSH candidates → connected components → rep pick: 3 real stages
    "dedup_canonical" -> (7, 3, 0),
    // SRP banding: hyperplane cross (constant 1024 rows) + band join
    "dedup_embedding_srp" -> (11, 1, 4),
    // single-pass window table: spread + ONE window shuffle, no self-join
    "dedup_substring" -> (4, 0, 0),
    // PassJoin: spread (3 refs) + segment equi-join + banded verify
    "dedup_fuzzy_edit" -> (3, 0, 0),
    "dedup_minhash_lsh" -> (12, 1, 0),
    // bounded bigram model broadcast into the corpus scan
    "text_lm_score" -> (4, 0, 0),
    "dedup_ngram_jaccard" -> (9, 0, 0),
    // shingle → 64-bit sign-agg → hamming buckets: spread + one exchange
    "dedup_simhash" -> (2, 0, 0),
    // r16: corpus-side encode is the on-row PqEncodeQ kernel against
    // the ONE-ROW broadcast codebook pack (the allowed NLJ); the
    // N·d·|codes| subDist expansion remains only for the |Q|=5 query
    // lookup tables
    "sim_pq_adc" -> (8, 0, 1),
    // 1-row corpus-stats cross join (the allowed NLJ) + top-k window
    "text_bm25_search" -> (4, 0, 1))

  pinned.foreach { case (name, (maxEx, maxSmj, maxNlj)) =>
    test(s"$name plan shape stays within the pinned bounds") {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val m = PlanShape.metrics(plan)
      assert(m("exchanges") <= maxEx,
        s"$name: ${m("exchanges")} hash exchanges (pinned $maxEx) — a new shuffle appeared")
      assert(m("smj") <= maxSmj,
        s"$name: ${m("smj")} sort-merge joins (pinned $maxSmj) — a broadcast degraded")
      assert(m("bnlj") <= maxNlj,
        s"$name: ${m("bnlj")} nested-loop joins (pinned $maxNlj)")
    }
  }

  /** Serving + churn family (round-10 task 6): these queries' plan
    * shape IS the product — the whole point of a standing index is
    * that the serve reads probed cells, not the corpus. The extra
    * pinned dimension is the parquet SCAN count: a regression that
    * silently turns a Bloom-pruned point read into a corpus scan may
    * not add an exchange at all (a scan is exchange-free), but it
    * cannot avoid adding a FileScan. Bounds measured at sf0.001 via
    * tools/PlanShape (the ensure* build runs eagerly inside the query
    * constructor, so the captured plan is the SERVE alone).
    * (maxEx, maxSmj, maxNlj, maxScans). */
  private val servingPinned: Map[String, (Int, Int, Int, Int)] = Map(
    // probe rank (bhj) + Bloom point read + rerank join; the smj is
    // the candK-bounded rerank pair at static-plan time (AQE converts
    // at runtime when it measures small)
    "sim_ann_ivfsq8" -> (4, 1, 2, 7),
    "sim_ann_indexed_sqrt" -> (3, 0, 1, 4),
    "sim_ann_indexed_sample" -> (3, 0, 1, 4),
    "sim_ann_indexed" -> (3, 0, 0, 4),
    "sim_ann_filtered" -> (3, 0, 1, 4),
    // FTS point read: ONE postings scan + the top-k window exchange
    "text_bm25_indexed" -> (1, 0, 0, 1),
    // churn serves from the compacted snapshot — same shape law as
    // the one-shot builds' serves
    "sim_ivf_churn" -> (3, 0, 1, 4),
    "text_fts_churn" -> (2, 0, 0, 2))

  servingPinned.foreach { case (name, (maxEx, maxSmj, maxNlj, maxScans)) =>
    test(s"$name serving plan stays a point read (pinned shape + scan count)") {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val m = PlanShape.metrics(plan)
      assert(m("exchanges") <= maxEx,
        s"$name: ${m("exchanges")} hash exchanges (pinned $maxEx) — a new shuffle appeared")
      assert(m("smj") <= maxSmj,
        s"$name: ${m("smj")} sort-merge joins (pinned $maxSmj) — a broadcast degraded")
      assert(m("bnlj") <= maxNlj,
        s"$name: ${m("bnlj")} nested-loop joins (pinned $maxNlj)")
      assert(m("scans") <= maxScans,
        s"$name: ${m("scans")} parquet scans (pinned $maxScans) — a point read grew a corpus scan")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The cached-selectivity contract behind the adaptive filtered serve
  * (VERDICT r11 task 7): once the standing √N index has pinned its
  * per-label histogram, estimating a predicate's selectivity must be a
  * point read of that metadata-sized table — NOT a corpus aggregate
  * per serve — and the cache must never change the computed probe
  * width (same exact counts either way). */
class AdaptiveStatsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("selectivity estimate reads the pinned histogram, not the corpus") {
    Similarity.ensureIvfSqrt(spark, sf) // pins the stats beside the index
    val plan = Similarity.selectivityFrame(spark, sf, col("label") === 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"selectivity estimate still scans the corpus:\n$plan")
    assert(plan.contains("tx_ivf_sqrt_stats"),
      s"selectivity estimate does not read the pinned stats table:\n$plan")
  }

  test("cached estimate computes the same probe width as the corpus aggregate") {
    Similarity.ensureIvfSqrt(spark, sf)
    // corpus-truth recomputation of the widening rule, bypassing the cache
    val t = graft.core.Tables(spark, sf).embeddings
    val r = t.agg(count(lit(1)).as("n"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("nm")).head
    val n = r.getLong(0)
    val nm = math.max(r.getLong(1), 1L)
    val expected = math.min(8L, (3L * n + nm - 1L) / nm).toInt
    assert(Similarity.adaptiveNprobe(spark, sf) === expected)
    // a permissive predicate must stay at the base width through the
    // same cached path (the never-pay-the-fan-out half of the law)
    assert(Similarity.adaptiveNprobe(spark, sf,
      pred = col("label") >= 0) === 3)
  }
}

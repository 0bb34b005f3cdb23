package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev-only measurement harness for the IVF-PQ recall/compression
  * frontier (VERDICT r11 task 3): the ADC candidate loss was priced at
  * ONE point (candK=20, 8 subspaces → recall 0.32 vs the 0.40 probe
  * ceiling at sf0.01) — this sweeps the two dials a deployment
  * actually tunes and prints one JSON row per configuration:
  *
  *  - candK ∈ {20, 50, 100}: how many ADC-ranked candidates survive
  *    into the exact rerank. Serve cost grows ~linearly in candK on
  *    the rerank join; recall can only grow (the rerank is exact, so
  *    more candidates can never rank a true neighbor lower).
  *  - subspaces ∈ {8, 16} (dimsPerSub 8 / 4 on d=64): code bytes per
  *    candidate — 8 B (~32× compression vs 4 B/dim floats) or 16 B
  *    (~16×). Finer subspaces quantize less per code, so the ADC
  *    ranking is closer to the true distance.
  *
  * The probe ceiling (exact candidates at the same nprobe=3,
  * `annSqrtRecall`) is printed alongside: a configuration whose
  * recall reaches the ceiling has zero ADC loss — past that point
  * extra candK/subspace bytes buy nothing and the dial should stop.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.PqFrontier
  */
object PqFrontier {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables(spark, sfDir).embeddings.count() // warm

    def meanRecall(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("sum(recall_e6) div count(1)")).head().getLong(0)

    // probe-limited ceiling: exact candidates, same nprobe
    val ceiling = meanRecall(Similarity.annSqrtRecall(spark, sfDir, 5, 3))
    println(s"""{"metric":"pq_frontier_ceiling","recall_e6":$ceiling,"nprobe":3}""")

    for (dps <- Seq(8, 4)) {
      val subs = 64 / dps
      // one build per subspace count (the codebook + codes differ);
      // candK is serve-time only — all candK points share the build
      val idx = Similarity.buildIvfPqIndexWith(spark, sfDir,
        key = s"#frontier$subs", scratch = s"tx_ivf_pq_f$subs",
        Similarity.sqrtQuantizer, dimsPerSub = dps)
      for (candK <- Seq(20, 50, 100)) {
        val t0 = System.nanoTime()
        val rec = meanRecall(Similarity.recallOf(spark, sfDir,
          Similarity.annIvfPqFrom(spark, sfDir, idx, 5, candK, 3, dps), 5))
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"metric":"pq_frontier","subspaces":$subs,"code_bytes":$subs,"candk":$candK,"recall_e6":$rec,"serve_plus_recall_sec":${f"$sec%.2f"}}""")
      }
    }
    spark.stop()
  }
}

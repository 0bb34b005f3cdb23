package graft.tools

/** Dev diagnostic: print the physical-plan shape (exchange count, join
  * strategy counts, scan count) for a set of declared queries — the
  * numbers PlanShapeSpec pins. Run it when a plan legitimately changes
  * to read off the new expected shape.
  *
  *   SPARK_GRAFT_SHAPE_QUERIES=a,b,c sbt "runMain graft.tools.PlanShape"
  */
object PlanShape {
  def metrics(plan: String): Map[String, Int] = Map(
    "exchanges" -> "Exchange hashpartitioning".r.findAllIn(plan).length,
    "rangeExchanges" -> "Exchange rangepartitioning".r.findAllIn(plan).length,
    "singleExchanges" -> "Exchange SinglePartition".r.findAllIn(plan).length,
    "smj" -> "SortMergeJoin".r.findAllIn(plan).length,
    "bhj" -> "BroadcastHashJoin".r.findAllIn(plan).length,
    "bnlj" -> "BroadcastNestedLoopJoin".r.findAllIn(plan).length,
    "scans" -> "FileScan parquet".r.findAllIn(plan).length)

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // default list = the driver-bench tail's most expensive batch
    // queries plus the standing-index serving/churn family — for the
    // serving queries the SHAPE (and especially the scan count) is the
    // product: PlanShapeSpec pins all of these, scans included for the
    // serves, because a point read degrading to a corpus scan may add
    // no exchange at all
    val names = sys.env.get("SPARK_GRAFT_SHAPE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("dedup_canonical", "dedup_embedding_srp",
        "dedup_substring", "dedup_fuzzy_edit", "dedup_minhash_lsh",
        "text_lm_score", "dedup_ngram_jaccard", "dedup_simhash",
        "sim_pq_adc", "text_bm25_search",
        "sim_ann_ivfsq8", "sim_ann_indexed_sqrt", "sim_ann_indexed_sample",
        "sim_ann_indexed", "sim_ann_filtered", "text_bm25_indexed",
        "sim_ivf_churn", "text_fts_churn"))
    val spark = graft.core.Sessions.local(4)
    names.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      val m = metrics(p)
      println(s"$n -> " + m.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(", "))
    }
    spark.stop()
  }
}

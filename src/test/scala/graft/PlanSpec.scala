package graft

/** Regression guard for the scale properties SCALE.md promises: these
  * assertions fail if a refactor silently drops a broadcast, loses
  * filter pushdown, or adds a second shuffle to the enrichment window
  * pipeline. */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dimension chain joins broadcast (no fact-side shuffle join)") {
    val p = executedPlan("j_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("threshold filter is pushed into the parquet scan") {
    val p = executedPlan("p_filter_threshold")
    assert(p.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,0.1)]")
      || p.contains("GreaterThan(value,0.1)"))
  }

  test("scans are column-pruned (q1 reads only the referenced columns)") {
    val p = executedPlan("q1_agg")
    assert(p.contains("l_returnflag") && p.contains("l_quantity"))
    assert(!p.contains("l_shipdate")) // unreferenced column must not be read
  }

  test("entity enrichment shares one exchange across its window specs") {
    val plan = graft.operators.DomainBridge.vehicleEnrich(spark, sf)
      .queryExecution.executedPlan.toString
    // the lag/lead/full-frame windows over tracker order must stack on a
    // single hashpartitioning exchange of the events scan, not one each;
    // the only other entity-key-only exchange allowed is the mode
    // branch's rank window (its counts aggregate is keyed tracker+lane)
    val exchanges = "Exchange hashpartitioning\\(tracker_id#\\d+, \\d+\\)".r
      .findAllIn(plan).length
    assert(exchanges <= 2, s"window pipeline shuffles $exchanges times on the entity key")
  }

  test("brute-force similarity broadcasts the query side") {
    val p = executedPlan("sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }
}

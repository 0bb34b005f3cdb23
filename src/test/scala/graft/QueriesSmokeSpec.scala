package graft

/** Smoke: every declared query runs and returns rows at sf0.001, and the
  * flagship entry is non-empty (the driver's t1 gate). */
class QueriesSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has oracle SQL (no rows-only queries)") {
    // policy (COVERAGE.md D11): non-oracle-able library paths live in
    // specs, not in `queries` — e.g. spark.ml KMeans is ViewsSpec-only
    // with the hash-verified `view_kmeans_det` twin declared instead
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      assert(fn(spark, sf).count() >= 0)
    }
  }
}

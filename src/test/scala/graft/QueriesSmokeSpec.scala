package graft

/** Smoke: every declared query runs and returns rows at sf0.001, and the
  * flagship entry is non-empty (the driver's t1 gate). */
class QueriesSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has oracle SQL or is explicitly rows-only") {
    // rows-only: non-SQL-expressible ops (driver records a weaker check)
    val rowsOnly = Set("view_kmeans")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
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

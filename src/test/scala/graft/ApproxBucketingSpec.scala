package graft

import org.apache.spark.sql.functions._

/** The approximate-at-scale paths (SCALE.md: swap-in replacements for
  * exact quantiles/distincts past single-node memory) verified against
  * their exact twins, and bucketed co-located joins — the zero-shuffle
  * join layout a 100 TB fact-fact join uses. */
class ApproxBucketingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within its error bound of exact") {
    val t = graft.core.Tables(spark, sf)
    val r = t.events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx tracks the exact p50/p90 within tolerance") {
    val t = graft.core.Tables(spark, sf)
    val exact = graft.operators.Analytics.aQuantiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("p50_cents"),
        r.getAs[Long]("p90_cents"))).toMap
    val approx = t.events
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("c"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("c"), lit(0.9), lit(1000)).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    approx.foreach { case (et, (p50, p90)) =>
      val (e50, e90) = exact(et)
      // values span ~0..49000 cents; 2% relative tolerance
      assert(math.abs(p50 - e50) <= e50 * 0.02 + 100, s"$et p50 $p50 vs $e50")
      assert(math.abs(p90 - e90) <= e90 * 0.02 + 100, s"$et p90 $p90 vs $e90")
    }
  }

  test("bucketed tables join without any shuffle exchange") {
    val t = graft.core.Tables(spark, sf)
    val wh = new java.io.File("target/tmp/bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    t.orders.select(col("o_custkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").mode("overwrite")
      .saveAsTable("b_orders")
    t.customer.select(col("c_custkey"), col("c_mktsegment"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").mode("overwrite")
      .saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join itself needs NO Exchange; the only
    // allowed exchange is the final small aggregation
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it still computes the right thing
    val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBuckets === direct)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("portable HLL estimates within its error bound at high cardinality") {
    import graft.operators.ApproxDistinct
    // 60 000 distinct keys — well past the linear-counting switch
    // (2.5·m = 640), so this exercises the raw harmonic-sum estimator,
    // where σ = 1.04/√256 ≈ 6.5%; assert 3σ
    val df = spark.range(0, 60000)
      .selectExpr("'g' AS grp", "CAST(id AS STRING) AS v")
    val est = ApproxDistinct.hllEstimate(
      ApproxDistinct.hllSketch(df, Seq("grp"), "v"), Seq("grp"))
      .head().getAs[Long]("est")
    assert(math.abs(est - 60000.0) / 60000.0 <= 0.20, s"est=$est")
  }

  test("HLL sketch merge: union of partial sketches equals sketch of union") {
    import graft.operators.ApproxDistinct
    val a = spark.range(0, 3000)
      .selectExpr("'g' AS grp", "CAST(id AS STRING) AS v")
    val b = spark.range(2000, 5000) // overlapping key space
      .selectExpr("'g' AS grp", "CAST(id AS STRING) AS v")
    val merged = ApproxDistinct.hllSketch(a, Seq("grp"), "v")
      .union(ApproxDistinct.hllSketch(b, Seq("grp"), "v"))
      .groupBy(col("grp"), col("reg"))
      .agg(max(col("mrho")).cast("int").as("mrho"))
    val whole = ApproxDistinct.hllSketch(a.union(b), Seq("grp"), "v")
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
    // and the merged estimate sees the union's cardinality (5 000)
    val est = ApproxDistinct.hllEstimate(merged, Seq("grp"))
      .head().getAs[Long]("est")
    assert(math.abs(est - 5000.0) / 5000.0 <= 0.20, s"est=$est")
  }

  test("CMS never under-counts and stays near exact at uniform spread") {
    import graft.operators.FreqSketch
    val r = FreqSketch.aCmsFreq(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (est, exact) = (row.getAs[Long]("est_count"),
        row.getAs[Long]("exact_count"))
      assert(est >= exact, s"CMS under-counted: est=$est exact=$exact")
    }
    // the 2-nibble cells are uniform: the MEDIAN overcount must be far
    // below the ~3x medians the power-of-two-modded phash produced
    val overs = r.map(row => row.getAs[Long]("est_count")
      - row.getAs[Long]("exact_count")).sorted
    assert(overs(overs.length / 2) <= 20,
      s"median overcount ${overs(overs.length / 2)} — cells not uniform?")
  }

  test("CMS sketches over disjoint splits merge by cell-wise sum") {
    import graft.operators.FreqSketch
    val t = graft.core.Tables(spark, sf)
    val (a, b) = (t.events.filter(col("event_id") % 2 === 0),
      t.events.filter(col("event_id") % 2 === 1))
    val merged = FreqSketch.cmsSketch(a, "user_id")
      .union(FreqSketch.cmsSketch(b, "user_id"))
      .groupBy(col("r"), col("cell")).agg(sum(col("c")).as("c"))
    val whole = FreqSketch.cmsSketch(t.events, "user_id")
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity}

/** Round-8 tail additions: Q13 outer-join distribution, the
  * Bloom-style runtime-filter join, and SQ8 quantized vector serving —
  * each checked against an independently-computed exact twin (the
  * DuckDB oracles check cross-engine parity; these check the
  * SEMANTICS against a different in-JVM formulation). */
class RelationalSq8Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q13: distribution covers every customer exactly once and keeps zeros") {
    val t = graft.core.Tables(spark, sf)
    val dist = Relational.q13CustDistribution(spark, sf).collect()
    val nCustomers = t.customer.count()
    assert(dist.map(_.getAs[Long]("custdist")).sum == nCustomers,
      "every customer lands in exactly one count bucket")
    // independent twin: inner-join counts + anti-join zeros
    val inner = t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    val nZero = t.customer
      .join(inner, Seq("c_custkey"), "left_anti").count()
    val zeroBucket = dist.find(_.getAs[Long]("c_count") == 0L)
      .map(_.getAs[Long]("custdist")).getOrElse(0L)
    assert(zeroBucket == nZero,
      s"zero-order customers: dist says $zeroBucket, anti-join says $nZero")
  }

  test("bloom-pruned join returns exactly the unpruned join's result") {
    val t = graft.core.Tables(spark, sf)
    val pruned = Relational.jBloomPrune(spark, sf).collect().toSeq
    val plain = t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.nation.filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
          .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("s_suppkey"))
      .limit(20).collect().toSeq
    assert(pruned == plain,
      "the bucket filter must be semantics-preserving (FPs die in the join)")
    // and with a 1-bucket "filter" (everything collides → pure FP path)
    val degenerate = Relational.jBloomPrune(spark, sf, nBuckets = 1)
      .collect().toSeq
    assert(degenerate == plain, "an all-pass filter changes nothing")
  }

  test("sq8 rerank with a wide-open candidate cut recovers exact top-k") {
    val n = graft.core.Tables(spark, sf).embeddings.count().toInt
    val wide = Similarity.sq8Rerank(spark, sf, k = 5, candK = n)
      .select(col("qid"), col("nid"), col("cos_e6"), col("rn"))
      .collect().toSeq
    val exact = Similarity.cosineTopk(spark, sf)
      .filter(col("rn") <= 5)
      .collect().toSeq
    assert(wide == exact,
      "exact rerank over ALL candidates must equal brute-force cosine top-5")
  }

  test("sq8 codes stay in [0,255] and the default cut keeps candK per query") {
    val res = Similarity.sq8Rerank(spark, sf).collect()
    assert(res.length == 5 * 5, "5 queries x top-5")
    res.foreach { r =>
      val dot = r.getAs[Long]("sq8_dot")
      // DECODED dot: each dec255 element is bounded by 255·|q|max
      // (|q| ≤ 1e4 for unit-norm inputs), so |Σdec·dec| ≤ d·(255·1e4)²
      val cap = 64L * 255 * 255 * 10000L * 10000L
      assert(dot >= -cap && dot <= cap, s"sq8 decoded dot $dot out of range")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Sampling, TextAnalysis}

/** Invariants for the OLAP, sampling, and TF-IDF operators on the
  * sf0.001 tables (the oracle checks exact values at sf0.01; these
  * check the LAWS that must hold at any scale). */
class AnalyticsSamplingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("rollup grand total equals the sum of detail rows") {
    val rows = Analytics.aRollup(spark, sf).collect()
    val detail = rows.filter(r =>
      r.getString(0) != "_all" && r.getString(1) != "_all")
    val grand = rows.filter(r =>
      r.getString(0) == "_all" && r.getString(1) == "_all")
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_rows") ===
      detail.map(_.getAs[Long]("n_rows")).sum)
    assert(grand.head.getAs[Long]("sum_qty") ===
      detail.map(_.getAs[Long]("sum_qty")).sum)
  }

  test("cube emits all four grouping combinations consistently") {
    val rows = Analytics.aCube(spark, sf).collect()
    def n(p: org.apache.spark.sql.Row => Boolean): Long =
      rows.filter(p).map(_.getAs[Long]("n")).sum
    val total = n(r => r.getString(0) == "_all" && r.getLong(1) == -1L)
    assert(total === n(r => r.getString(0) != "_all" && r.getLong(1) == -1L))
    assert(total === n(r => r.getString(0) == "_all" && r.getLong(1) != -1L))
    assert(total === n(r => r.getString(0) != "_all" && r.getLong(1) != -1L))
  }

  test("quantiles pick real members with p50 <= p90") {
    Analytics.aQuantiles(spark, sf).collect().foreach { r =>
      val (p50, p90) = (r.getAs[Long]("p50_cents"), r.getAs[Long]("p90_cents"))
      assert(p50 <= p90)
    }
  }

  test("rank suite: nth_value null before row 3, quartiles in range") {
    Analytics.wRankSuite(spark, sf).collect().foreach { r =>
      val rn = r.getAs[Long]("rn")
      val third = Option(r.getAs[java.lang.Long]("third_cents"))
      assert(if (rn < 3) third.isEmpty else third.nonEmpty)
      val q = r.getAs[Long]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = r.getAs[Double]("pr")
      assert(pr >= 0.0 && pr <= 1.0)
    }
  }

  test("hash split partitions every doc and is rerun-stable") {
    val a = Sampling.sampleSplit(spark, sf).collect()
    val b = Sampling.sampleSplit(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    val total = a.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.core.Tables(spark, sf).documents.count()
    assert(total === docs)
  }

  test("balanced sample caps every class and is rerun-stable") {
    val out = Sampling.sampleBalanced(spark, sf, cap = 5)
    val a = out.collect()
    assert(a.toSeq === Sampling.sampleBalanced(spark, sf, cap = 5).collect().toSeq)
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 5))
    val langTotals = graft.core.Tables(spark, sf).documents
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(n === math.min(5L, langTotals(lang)))
    }
  }

  test("tfidf emits at most 3 strictly rank-ordered terms per doc") {
    val rows = TextAnalysis.tfidf(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRn = rs.sortBy(_.getAs[Long]("rn"))
      assert(byRn.map(_.getAs[Long]("rn")).toSeq === (1L to rs.length))
      val scores = byRn.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Laws for the token-budget cut and the leakage-safe split on
  * sf0.001 (the oracle pins exact values at sf0.01). */
class BudgetLeakageSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("token-budget cut equals the single-window greedy prefix") {
    // the operator computes the running total shard-decomposed; the
    // law: identical to the one-window form it refuses to run
    val t = graft.core.Tables(spark, sf)
    val docs = t.documents
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("h", graft.functions.PortableHash.phash(
        col("doc_id").cast("string"), Sampling.budgetSalt))
      .withColumn("shard",
        pmod(col("h"), lit(Sampling.shuffleShards.toLong)))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("shard"), col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgets = docs.groupBy(col("lang"))
      .agg(sum(col("n_toks")).as("tt"))
      .withColumn("budget",
        expr(s"(tt * ${Sampling.budgetPermille}) div 1000"))
    val expected = docs.withColumn("cum", sum(col("n_toks")).over(w))
      .join(budgets, Seq("lang"))
      .filter(col("cum") <= col("budget"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks_kept"),
        sum(col("doc_id")).as("id_checksum"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = Sampling.sampleTokenBudget(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(expected(lang) === ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("toks_kept"), r.getAs[Long]("id_checksum"))),
        s"lang $lang diverged from the single-window form")
      assert(r.getAs[Long]("toks_kept") <= r.getAs[Long]("budget_toks"))
    }
  }

  test("leakage-safe split never straddles a dedup component") {
    val t = graft.core.Tables(spark, sf)
    val stamped = Sampling.leakageSafeStamped(spark, sf)
    val straddlers = stamped.groupBy(col("component"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddlers === 0L)
    // and the audit accounts for every document exactly once
    val audit = Sampling.sampleLeakageSafe(spark, sf).collect()
    val corpus = t.documents.count()
    assert(audit.map(_.getAs[Long]("n_docs")).sum === corpus)
    assert(audit.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "dev", "test")))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Skew-mitigation patterns (SCALE.md "Skew" knob).
  *
  * When a grouping key is pathologically hot (one camera stuck on one
  * tracker, one event_type dominating), a single reducer owns the hot
  * key. Two-phase salted aggregation splits each key into `salts`
  * sub-keys for the partial aggregate, then combines — the hot key's
  * work spreads over `salts` reducers. AQE's skew-join splitting covers
  * joins; this covers aggregations, which AQE does not rebalance.
  */
object Skew {

  /** Two-phase salted sum/count per key. Phase 1 groups by
    * (key, salt(row)) — map-side partials spread the hot key; phase 2
    * combines the per-salt partials. Results are identical to a direct
    * groupBy (sums of exact integers commute). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      salts: Int): DataFrame = {
    val salted = df.groupBy(key.as("k"), pmod(crc32(monotonicallyIncreasingSalt()), lit(salts)).as("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
    salted.groupBy(col("k"))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }

  /** Deterministic per-row salt source: a content-free spread column.
    * spark_partition_id is partition-stable and cheap; the salt only
    * needs to spread rows, not be reproducible across runs (the final
    * combine is order/partition independent). */
  private def monotonicallyIncreasingSalt(): Column =
    spark_partition_id().cast("string").cast("binary")

  /** Oracle-checkable demonstration over the (15-key, heavily skewed)
    * events table: salted two-phase totals per event_type, exact
    * integer cents so the result is bit-equal to a direct aggregation. */
  def skewSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val withCents = t.events.withColumn("c", round(col("value") * 100).cast("long"))
    saltedSumCount(withCents, col("event_type"), col("c"), salts = 8)
      .select(col("k").as("event_type"), col("total").as("sum_cents"), col("n"))
      .orderBy(col("event_type"))
  }
}

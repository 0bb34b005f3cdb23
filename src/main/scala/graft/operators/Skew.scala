package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Skew-mitigation patterns (SCALE.md "Skew" knob).
  *
  * Algebraic aggregates (sum/count/min/max) don't need salting — map-
  * side partial aggregation already collapses each partition to one row
  * per key before the shuffle. Salting matters for NON-algebraic
  * aggregations, where the hot key's full value stream otherwise lands
  * on one reducer. The canonical case is exact count-distinct: two
  * phases, value-hash sub-keys — each sub-key holds a disjoint slice of
  * the value space, so per-slice distinct counts add up exactly.
  */
object Skew {

  /** Exact two-phase distinct count per key. Phase 1 groups by
    * (key, hash(value) % salts) and counts distinct values inside each
    * disjoint hash slice — the hot key's distinct-set state spreads over
    * `salts` reducers; phase 2 sums the per-slice counts (exact, because
    * the slices partition the value space). */
  def saltedDistinct(df: DataFrame, key: Column, value: Column,
      salts: Int): DataFrame = {
    df.groupBy(key.as("k"), pmod(crc32(value.cast("string")), lit(salts)).as("_slice"))
      .agg(countDistinct(value).as("_pdist"), count(lit(1)).as("_pcnt"))
      .groupBy(col("k"))
      .agg(sum(col("_pdist")).as("n_distinct"), sum(col("_pcnt")).as("n"))
  }

  /** Oracle-checkable demonstration over the (5-key, heavily skewed)
    * events table: distinct users per event_type via salted two-phase
    * distinct — exactly equal to a direct count(DISTINCT ...). */
  def skewSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    saltedDistinct(t.events, col("event_type"), col("user_id"), salts = 8)
      .select(col("k").as("event_type"), col("n_distinct"), col("n"))
      .orderBy(col("event_type"))
  }
}

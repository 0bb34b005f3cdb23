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

  /** Salted equi-join — the replicate-and-salt pattern for a fact→dim
    * join whose key distribution is too hot for one reducer (the
    * manual form of what AQE's skew-join split does at runtime;
    * having it as an operator matters when the skew is KNOWN up front
    * or the engine's heuristics don't fire — e.g. a pre-shuffled
    * bucketed fact). The fact side salts each ROW deterministically
    * (hash of a caller-chosen unique column — never `rand()`, which
    * would break retry/replay determinism); the dim side replicates
    * `salts`× via one narrow literal-array explode (dim-sized × R,
    * never fact-sized). The join key becomes (key, salt), so a hot
    * key's rows spread over `salts` reducers while every fact row
    * still meets its dim row exactly once: the join result is
    * row-identical to the unsalted join, by construction. */
  def saltedJoin(fact: DataFrame, saltSrc: Column, dim: DataFrame,
      key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(crc32(saltSrc.cast("string")), lit(salts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Oracle-checkable demonstration: events⨝customer through the
    * salted join, aggregated per market segment — exactly equal to
    * the plain join's aggregate (salting is a layout choice, never a
    * semantic). */
  def skewSaltedJoin(spark: SparkSession, dir: String,
      salts: Int = 8): DataFrame = {
    val t = Tables(spark, dir)
    val fact = t.events.select(col("user_id"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("val_cents"))
    val dim = t.customer.select(col("c_custkey").as("user_id"),
      col("c_mktsegment").as("seg"))
    saltedJoin(fact, col("event_id"), dim, "user_id", salts)
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        sum(col("val_cents")).cast("long").as("sum_cents"))
      .orderBy(col("seg"))
  }
}

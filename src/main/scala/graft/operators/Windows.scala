package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Window-function re-expressions of the reference's driver-side Python
  * computations (SURVEY.md §2.6 D1-D9). The reference collects per-entity
  * arrays to the driver and loops in Python
  * (`advanced_preprocessing.py:111-148`); here every computation is a
  * single distributed pass: one shuffle on the entity key, then
  * lag/lead/cumulative-sum windows — no collect(), scales with
  * executors instead of driver memory.
  *
  * `events(user_id, ts, event_type, value)` stands in for the
  * frame-grained detection stream: user_id = tracker_id, ts =
  * frame timestamp, event_type = categorical state (lane/direction),
  * value = numeric measure (speed).
  */
object Windows {

  private def byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** D1 mode with deterministic Counter-compatible tie-break: most
    * frequent event_type per user; ties broken by lexicographic value
    * (count desc, value asc). One shuffle + tiny window over counts. */
  def d1Mode(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("event_type"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_event"), col("cnt").as("mode_count"))
      .orderBy(col("user_id"))
  }

  /** D2 sequential change count (`lane_changes` semantics,
    * `advanced_preprocessing_vehicle.py:104-106`): per user ordered by
    * time, count rows whose event_type differs from the previous one. */
  def d2ChangeCount(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("prev_type").isNotNull && col("prev_type") =!= col("event_type"), 1)
          .otherwise(0)).as("n_changes"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** D3 pairwise time deltas attributed to the previous state
    * (`time_spent_per_direction`, `advanced_preprocessing_vehicle.py:109-120`):
    * each event holds its state until the next event; sum held time per
    * (user, state) in exact integer microseconds. */
  def d3TimePerState(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("next_us").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("next_us") - unix_micros(col("ts"))).as("held_micros"),
        count(lit(1)).as("n_intervals"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** D4 trajectory metrics (`total_distance`/`movement_angles`,
    * `advanced_preprocessing_vehicle.py:122-139`): per-step euclidean
    * distance in (Δseconds, Δvalue) space summed per user. */
  def d4Trajectory(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val stepped = t.events
      .withColumn("prev_value", lag(col("value"), 1).over(byUser))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("prev_us").isNotNull)
      .withColumn("dv", col("value") - col("prev_value"))
      .withColumn("dt", (unix_micros(col("ts")) - col("prev_us")).cast("double") / lit(1000000.0))
    stepped.groupBy(col("user_id"))
      .agg(
        round(sum(sqrt(col("dv") * col("dv") + col("dt") * col("dt"))), 2).as("total_distance"),
        count(lit(1)).as("n_steps"))
      .orderBy(col("user_id"))
  }

  /** D5 sample standard deviation (`speed_variation`,
    * `advanced_preprocessing_vehicle.py:140`): per (user, event_type);
    * 0.0 when n<2 like the reference.
    *
    * Computed from exact integer cent moments (`value` is 2-decimal
    * data): Σc and Σc² are exact BIGINTs regardless of partition/
    * accumulation order, so the derived double expression is bit-equal
    * across engines — native stddev_samp/avg over doubles is
    * order-of-summation dependent and flakes at round() boundaries. */
  def d5Stddev(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = round(col("value") * 100).cast("long")
    t.events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(c).as("sc"), sum(c * c).as("sc2"))
      .select(
        col("user_id"), col("event_type"),
        when(col("n") > 1,
          round(sqrt(greatest(
            (col("sc2").cast("double") - col("sc").cast("double") * col("sc") / col("n"))
              / (col("n") - 1), lit(0.0))) / 100.0, 4))
          .otherwise(lit(0.0)).as("value_stddev"),
        // integer half-up rounding of sc*100/n: Spark's round() on doubles
        // goes through the shortest decimal repr (BigDecimal.valueOf) and
        // disagrees with binary-value rounding on .xxxx5 rationals.
        (expr("(200 * sc + n) div (2 * n)").cast("double") / 10000.0).as("value_avg"),
        col("n"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** D6 first-matching-timestamp (`restricted_area_entry_time`,
    * `advanced_preprocessing_people.py:126-133`): earliest 'error' event
    * per user, null-safe. D7 duration (`duration_seconds`) alongside. */
  def d6d7FirstMatchDuration(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "error", unix_micros(col("ts")))).as("first_error_us"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_micros"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** D8 boolean resolution aggregates (`advanced_preprocessing_safety.py:63-78`):
    * any-true, count-of-violations, count-if over thresholds. */
  def d8BoolAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "error", 1).otherwise(0)).as("had_error"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_errors"),
        sum(when(col("value") > 100.0, 1).otherwise(0)).as("n_high_value"),
        min(when(col("event_type") === "purchase", 1).otherwise(0)).as("all_purchase"))
      .orderBy(col("user_id"))
  }

  /** D9 sessionization (`advanced_preprocessing_parkingLot.py:46-123`):
    * the reference loops one filter+collect job per slot; here a single
    * window pass — change-flag via lag, session id via cumulative sum,
    * then two hash aggregations. Gap rule: >30 min opens a new session. */
  def d9Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val gapMicros = 1800L * 1000000L
    val ev = t.events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMicros, 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val sessions = ev.groupBy(col("user_id"), col("sess_id"))
      .agg(
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("sess_micros"),
        count(lit(1)).as("sess_events"))
    sessions.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("sess_micros")).as("total_sess_micros"),
        max(col("sess_events")).as("max_sess_events"))
      .orderBy(col("user_id"))
  }

  /** A5-style deterministic entity rollup: first/last pinned by explicit
    * frame order via window first_value/last_value (the reference's bare
    * `first()`/`last()` over unordered groups is nondeterministic —
    * SURVEY §2.5 A5). */
  def a5EntityRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.events
      .withColumn("first_type", first(col("event_type")).over(byUser))
      .withColumn("last_type", last(col("event_type")).over(w))
      .groupBy(col("user_id"))
      .agg(
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sc"),
        round(max(col("value")), 2).as("value_max"),
        round(min(col("value")), 2).as("value_min"),
        first(col("first_type")).as("initial_type"),
        first(col("last_type")).as("final_type"))
      // exact cents + integer half-up rounding → deterministic avg
      .select(col("user_id"), col("first_us"), col("last_us"), col("n_events"),
        (expr("(200 * sc + n_events) div (2 * n_events)").cast("double") / 10000.0)
          .as("value_avg"),
        col("value_max"), col("value_min"), col("initial_type"), col("final_type"))
      .orderBy(col("user_id"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** OLAP analytics surface beyond the reference's single-level hash
  * aggregations (SURVEY §2.5 notes "no grouping sets / cube / rollup /
  * distinct-agg anywhere" — the serving layer of a lake engine needs
  * them, so they are first-class here).
  *
  * Scale notes: rollup/cube/grouping-sets run as a single Expand +
  * partial/final hash aggregate in Spark — one shuffle regardless of
  * the number of grouping sets. Pivot is given its value list
  * explicitly (no driver-side distinct collect — mandatory at 100 TB).
  * Exact quantiles use per-group row_number windows; at extreme scale
  * swap in `percentile_approx` — the column set and callers stay the
  * same.
  */
object Analytics {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** ROLLUP (returnflag, linestatus): detail rows + per-flag subtotals +
    * grand total in one Expand+agg pass. Null grouping keys are mapped
    * to a `_all` sentinel on both engines (avoids cross-engine
    * GROUPING() portability trouble). */
  def aRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("price_cents"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("_all")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("_all")).as("linestatus"),
        col("sum_qty"), col("price_cents"), col("n_rows"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** CUBE (event_type, user cohort): all 4 grouping combinations. */
  def aCube(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("cohort", pmod(col("user_id"), lit(10L)))
      .cube(col("event_type"), col("cohort"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
      .select(
        coalesce(col("event_type"), lit("_all")).as("event_type"),
        coalesce(col("cohort"), lit(-1L)).as("cohort"),
        col("n"), col("sum_cents"))
      .orderBy(col("event_type"), col("cohort"))
  }

  /** Explicit GROUPING SETS via the SQL surface (Spark SQL over a temp
    * view — the engine's `spark.sql` entry point). */
  def aGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("cohort", pmod(col("user_id"), lit(10L)))
      .createOrReplaceTempView("graft_gs_events")
    spark.sql(
      """SELECT coalesce(event_type, '_all') AS event_type,
                coalesce(cohort, -1L) AS cohort,
                count(1) AS n,
                sum(cast(round(value * 100) AS BIGINT)) AS sum_cents
         FROM graft_gs_events
         GROUP BY GROUPING SETS ((event_type), (cohort), ())
         ORDER BY event_type, cohort""")
  }

  /** Event types present in the synthetic events table. Pivot values
    * must be declared statically: `pivot(col)` without values runs a
    * driver-side distinct collect — a non-starter on a 100 TB fact
    * table. */
  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT event_type → one count column per type, per user. */
  def aPivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .orderBy(col("user_id"))
  }

  /** Exact p50/p90 per event_type on integer cents via row_number over a
    * per-group sort (index = ceil(p·n), 1-based — deterministic and
    * identical on both engines; interpolation-free). */
  def aQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = t.events.select(
      col("event_type"), cents(col("value")).as("c"), col("event_id"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("c"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    c.withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("c"))).as("p50_cents"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("c"))).as("p90_cents"))
      .orderBy(col("event_type"))
  }

  /** Event-time RANGE frame: events within the trailing hour of each
    * row (value-based frame, not row-count) — the sliding-window shape
    * rate limiting and rolling metrics use. Emitted for the first 5
    * rows per user to keep output bounded. */
  def wRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), cents(col("value")).as("c"))
    val frame = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    val rn = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev.select(col("user_id"), col("event_id"), col("us"),
        count(lit(1)).over(frame).as("n_trailing_1h"),
        sum(col("c")).over(frame).as("cents_trailing_1h"),
        row_number().over(rn).as("rn"))
      .filter(col("rn") <= 5)
      .select(col("user_id"), col("rn").cast("long").as("rn"),
        col("event_id"), col("n_trailing_1h"), col("cents_trailing_1h"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Exact correlation/covariance per group from integer moments —
    * order-independent, unlike built-in streaming corr/covar whose
    * double accumulation depends on partition order. Per-row products
    * fit a long (y² ≤ ~1.1e14); the SUMS are decimal(38,0) (DuckDB:
    * HUGEINT), so nothing overflows at any realistic scale — Σy² in
    * raw cents would blow past int64 just above sf0.1. Both engines
    * convert the identical exact integer to double once, in the final
    * formulas; zero-variance groups yield NULL corr (pinned — double
    * semantics at 0 denominators differ across engines). */
  def aCorrCov(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dec = "decimal(38,0)"
    val c = t.lineitem.select(col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      cents(col("l_extendedprice")).as("y"))
    c.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sx2"),
        sum((col("y") * col("y")).cast(dec)).as("sy2"))
      .withColumn("covar_pop", expr(
        "(cast(sxy as double) - cast(sx as double) * cast(sy as double) / n) / n"))
      .withColumn("dx", expr(
        "n * cast(sx2 as double) - cast(sx as double) * cast(sx as double)"))
      .withColumn("dy", expr(
        "n * cast(sy2 as double) - cast(sy as double) * cast(sy as double)"))
      .withColumn("corr", when(col("dx") === 0.0 || col("dy") === 0.0, lit(null))
        .otherwise(
          expr("(n * cast(sxy as double) - cast(sx as double) * cast(sy as double))")
            / (sqrt(col("dx")) * sqrt(col("dy")))))
      .select(col("l_returnflag"), col("n"), col("covar_pop"), col("corr"))
      .orderBy(col("l_returnflag"))
  }

  /** Ranking-window suite: row_number / dense_rank / ntile / percent_rank
    * / cume_dist / nth_value in one window pass (top-5 rows per user by
    * cents). percent_rank and cume_dist are exact rational divisions of
    * identical integer ranks — bit-equal across engines. */
  def wRankSuite(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = t.events.select(
      col("user_id"), col("event_id"), cents(col("value")).as("c"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("c").desc, col("event_id"))
    val wVal = Window.partitionBy(col("user_id")).orderBy(col("c").desc)
    c.select(
        col("user_id"), col("event_id"), col("c"),
        row_number().over(w).cast("long").as("rn"),
        dense_rank().over(wVal).cast("long").as("drank"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("c"), 3).over(w).as("third_cents"))
      .filter(col("rn") <= 5)
      .orderBy(col("user_id"), col("rn"))
  }
}

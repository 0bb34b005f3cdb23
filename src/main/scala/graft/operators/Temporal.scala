package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Temporal join operators Spark lacks natively: as-of join and
  * interval/range join, each implemented with the composition strategy
  * (SURVEY builder guidance: compose existing ops before reaching for a
  * custom SparkStrategy).
  *
  * - As-of is the union + ordered carry-forward form: ONE shuffle on the
  *   join key, no per-row probe, no range condition at all — the
  *   canonical 100 TB plan (a naive `t1.ts >= t2.ts` join is a
  *   broadcast-nested-loop and dies at scale).
  * - Range join blocks both sides into fixed-width buckets and
  *   equi-joins on the bucket id, turning the inequality predicate into
  *   a residual filter after a hash join.
  */
object Temporal {

  /** As-of join: for every purchase event, the most recent click of the
    * same user at or before it (ties at the same microsecond count as
    * "before" — the click sorts first).
    *
    * Plan shape: union(clicks, purchases) → single hash-partition on
    * user_id → one window sort → `last(_, ignoreNulls)` carry-forward.
    */
  def jAsof(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), lit(0).as("kind"),
        col("event_id"), col("us").as("c_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), lit(1).as("kind"),
        col("event_id"), lit(null).cast("long").as("c_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.union(purchases)
      .withColumn("click_us", last(col("c_us"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(
        col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("click_us"), (col("us") - col("click_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Interval/range join: events against overlapping value bands
    * [i·40, i·40+80). Each band is exploded into the fixed-width buckets
    * it covers; events join on their bucket (broadcast — the band table
    * is tiny BY CONSTRUCTION), and the exact containment predicate runs
    * as a post-join filter. No nested-loop join anywhere in the plan. */
  def jRange(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bands = spark.range(0, 12).select(
      col("id").as("band_id"),
      (col("id") * 4000L).as("lo_c"),
      (col("id") * 4000L + 8000L).as("hi_c"))
    val bandBuckets = bands.withColumn("bucket",
      explode(sequence(expr("lo_c div 8000"), expr("(hi_c - 1) div 8000"))))
    val ev = t.events
      .select(round(col("value") * 100).cast("long").as("c"))
      .withColumn("bucket", expr("c div 8000"))
    ev.join(broadcast(bandBuckets), Seq("bucket"))
      .filter(col("c") >= col("lo_c") && col("c") < col("hi_c"))
      .groupBy(col("band_id"), col("lo_c"), col("hi_c"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"))
      .orderBy(col("band_id"))
  }
}

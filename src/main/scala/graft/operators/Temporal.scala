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

  /** Generic left as-of join: every `left` row gains the `payload`
    * columns of the latest `right` row with the same `key` and
    * `right.ts <= left.ts` (nulls when no such row exists).
    *
    * Plan shape: union both sides → ONE hash-partition on the key → one
    * window sort → a single `last(struct, ignoreNulls)` carry-forward of
    * the WHOLE payload struct (one window function regardless of payload
    * width, and a NULL payload value on the latest matching right row is
    * carried as NULL — true as-of semantics — instead of falling back to
    * an older non-null value as a per-column carry would). Ties at the
    * same timestamp count as "before" (the right side sorts first). If
    * the right side has several rows at the same (key, ts) the carried
    * payload among them is unspecified — dedupe the right side first
    * when that matters.
    *
    * Requirements: `payload` names must not clash with left columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftCols = left.columns.toSeq
    val l2 = payload.foldLeft(left.withColumn("_kind", lit(1))) { (df, p) =>
      df.withColumn(p, lit(null).cast(rightTypes(p)))
    }
    val extraLeft = leftCols.filterNot(c => c == key || c == ts)
    val r2 = extraLeft.foldLeft(
      right.select((Seq(key, ts) ++ payload).map(col): _*)
        .withColumn("_kind", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(leftTypes(c)))
    }
    val cols = (leftCols :+ "_kind") ++ payload
    val unioned = l2.select(cols.map(col): _*).union(r2.select(cols.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Right rows wrap their payload in a non-null struct; the struct is
    // what gets carried, so NULL fields inside the latest match survive.
    val carried = unioned
      .withColumn("_carry",
        when(col("_kind") === 0, struct(payload.map(col): _*)))
      .withColumn("_c", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
    payload.foldLeft(carried) { (df, p) =>
      df.withColumn(p, col("_c").getField(p))
    }.drop("_kind", "_carry", "_c")
  }

  /** As-of join over the events table: for every purchase event, the
    * most recent click of the same user at or before it. */
  def jAsof(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("us").as("c_us"))
    asofJoin(purchases, clicks, "user_id", "us", Seq("c_us"))
      .select(
        col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("c_us").as("click_us"), (col("us") - col("c_us")).as("gap_us"))
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

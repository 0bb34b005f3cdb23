package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}
import graft.core.Tables

/** Remaining SURVEY.md §2 inventory coverage: global wraps (A2), map
  * explode (G4/G5 via the F9 to_json/from_json coercion), the
  * Kibana-style date histogram and per-bucket top-N (A12), running
  * window sums, JSON round-trip (S1-ish codec surface), and set ops.
  */
object Coverage {

  /** A2: global single-row wrap (`groupBy().agg(...)` over everything —
    * the reference's frame_detections global collect). */
  def a2GlobalWrap(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      min(unix_micros(col("ts"))).as("first_us"),
      max(unix_micros(col("ts"))).as("last_us"))
  }

  /** G4/G5 + F9: dynamic-key JSON coerced to a real map, exploded to
    * key/value rows (`basic_preprocessing_parkingLot.py:32-47`). */
  def fMapExplode(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .select(explode(col("m")).as(Seq("key", "value")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .orderBy(col("key"))
  }

  /** A12: Kibana date-histogram — events per hour per type. */
  def a12DateHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hour_us"), col("event_type"))
  }

  /** A12: the DENSE date histogram — Elasticsearch's `date_histogram`
    * default (`min_doc_count: 0`) emits EVERY bucket in the bounds,
    * zero-count buckets included, which is what Kibana draws gaps
    * from; a plain groupBy silently drops them. The dense grid is
    * (hours × types) — metadata-sized next to the events themselves —
    * so the zero-fill joins are AQE-broadcast from measured sizes (no
    * static hints — bucket counts grow with the time span, the same
    * data-dependent-hint rule PlanSpec enforces on the dedup stack);
    * the only data-sized shuffle is the same per-bucket count the
    * sparse histogram pays. */
  def a12DateHistogramDense(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.events
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hours = counts.agg(min(col("hour_us")).as("lo"),
        max(col("hour_us")).as("hi"))
      .select(explode(expr("sequence(lo, hi, 3600000000)")).as("hour_us"))
    val types = counts.select(col("event_type")).distinct()
    hours.crossJoin(types)
      .join(counts, Seq("hour_us", "event_type"), "left")
      .select(col("hour_us"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("hour_us"), col("event_type"))
  }

  /** A12: per-bucket top-N (top-2 events by value per user), the
    * rank-window form of Kibana's "top hits". */
  def a12TopnPerUser(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("user_id"), col("rn").cast("long").as("rn"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Running cumulative window sum (exact integer cents), sampled at the
    * 10th event per user. */
  def dRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("c", round(col("value") * 100).cast("long"))
      .withColumn("running_cents",
        sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 10)
      .select(col("user_id"), col("running_cents"))
      .orderBy(col("user_id"))
  }

  /** S1-adjacent codec surface: to_json → get_json_object round trip
    * preserves values. */
  def s1JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("j", to_json(struct(col("doc_id"), col("lang"))))
      .withColumn("back_lang", get_json_object(col("j"), "$.lang"))
      .withColumn("back_id", get_json_object(col("j"), "$.doc_id").cast("long"))
      .groupBy(col("back_lang"))
      .agg(count(lit(1)).as("n"), sum(col("back_id")).as("sum_ids"))
      .orderBy(col("back_lang"))
  }

  /** A12/streaming-shape: tumbling event-time window aggregation via
    * `window()` — the batch twin of the Structured Streaming plan in
    * `graft.streaming.StreamIngest.windowedCounts`. */
  def a12TimeWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n"), col("sum_cents"))
      .orderBy(col("w_start_us"), col("event_type"))
  }

  /** Multimodal byte metrics over synthesized binary assets (the
    * SQL-only path of graft.multimodal) — binary length, chunk count,
    * content digest. */
  def mmByteMetrics(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("content"))
      .select(col("asset_id"),
        length(col("content")).cast("long").as("n_bytes"),
        (floor((length(col("content")) - 1) / 256) + 1).cast("long").as("n_chunks"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("asset_id"))
  }

  /** Set operations (absent in the reference — SQL-layer completeness):
    * union + distinct over two key domains. */
  def uUnionKeys(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val u = t.customer.select(col("c_custkey").as("k"))
      .union(t.supplier.select(col("s_suppkey").as("k")))
    u.agg(count(lit(1)).as("n_total"), countDistinct(col("k")).as("n_distinct"))
  }

  /** Ordered funnel (view → click → purchase): each stage counts users
    * whose FIRST qualifying event strictly follows their previous
    * stage's anchor time — the product-analytics funnel, not a bag-of-
    * events intersection. Three per-user conditional min-aggregates,
    * each one equi-key shuffle on user_id; stage rows + exact e4
    * conversion ratios. Scale: per-user state is three timestamps, so
    * the plan is insensitive to events-per-user skew (no windows, no
    * collect_list). */
  def aFunnel(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = t.events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("us") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("us") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase"))
    val n1 = s1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
    val n2 = s2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click"))
    val n3 = s3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase"))
    val stages = n1.unionByName(n2).unionByName(n3)
    val first = n1.select(col("n").as("n_first"))
    stages.crossJoin(broadcast(first))
      .withColumn("conv_from_first_e4",
        expr("(20000 * n + n_first) div (2 * n_first)"))
      .select(col("stage"), col("n").as("n_users"),
        col("conv_from_first_e4"))
      .orderBy(col("stage"))
  }

  /** Daily retention cohorts: users grouped by their first-signup day,
    * counted distinct per (cohort_day, day_offset) for offsets 0-7.
    * Two equi-key shuffles (per-user anchor, then the cohort rollup);
    * cohort×offset output is calendar-bounded regardless of corpus
    * size. */
  def aRetention(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val e = t.events.select(col("user_id"), col("event_type"),
      to_date(col("ts")).as("day"))
    val cohorts = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.select(col("user_id"), col("day")).distinct()
      .join(cohorts, Seq("user_id"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset").between(0, 7))
      // epoch-day integers dodge cross-engine date-dtype artifacts
      // (same policy as fDateSuite)
      .groupBy(unix_date(col("cohort_day")).cast("long").as("cohort_epoch_day"),
        col("day_offset").cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_epoch_day"), col("day_offset"))
  }
}

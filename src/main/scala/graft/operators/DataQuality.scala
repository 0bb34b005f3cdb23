package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Single-pass data-quality metrics over the document corpus — the
  * Deequ/Great-Expectations shape a 100 TB ingest gate needs: every
  * metric of a profile comes out of ONE shuffle (one groupBy, all
  * aggregates as map-side partials), and every expectation of a suite
  * out of ONE global aggregate. Rules are CASE-sums (codegen'd), never
  * per-rule scans — N expectations cost the same scan as one.
  */
object DataQuality {

  /** Per-language profile: volume, emptiness, source diversity, and
    * length stats, plus a deterministic half-up mean (exact integer
    * arithmetic — the cross-engine discipline every float-adjacent
    * metric in this repo follows). */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .groupBy(coalesce(col("lang"), lit("unknown")).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("n_empty_text"),
        countDistinct(col("source")).cast("long").as("n_sources"),
        min(col("n_chars")).cast("long").as("min_chars"),
        max(col("n_chars")).cast("long").as("max_chars"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .withColumn("avg_chars_4dp", // integer half-up at 4 decimals
        expr("(20000 * sum_chars + n_docs) div (2 * n_docs)")
          .cast("double") / 10000.0)
      .orderBy(col("lang"))
  }

  /** Expectation suite as one global aggregate: row count, key
    * uniqueness, null/format/consistency violation counts. A zero in
    * every violation column is the passing gate; the counts (not
    * booleans) are returned so a failing run says how bad. */
  def dqExpectations(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("doc_id"))).cast("long")
        .as("n_dup_ids"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("n_null_ids"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
      sum(when(col("lang").isNotNull && !col("lang").rlike("^[a-z]{2}$"), 1L)
        .otherwise(0L)).as("n_bad_lang"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
      sum(when(col("text").isNotNull && col("n_chars").isNotNull &&
          col("n_chars") =!= length(col("text")), 1L)
        .otherwise(0L)).as("n_len_mismatch"))
  }

  /** Distribution drift under a processing step — "did my quality gate
    * change the language mix?", the per-release audit every training
    * pipeline runs. Before-vs-after class counts come out of ONE scan
    * (after = conditional sum, not a second pass); totals come from a
    * window over the per-class aggregate (bounded by the class count —
    * languages here), never a cross join. Shares are exact e6
    * integers; `drift_e6` is the per-class absolute share shift, whose
    * half-sum across classes is the total variation distance between
    * the two distributions. */
  def dqDrift(spark: SparkSession, dir: String,
      minChars: Long = 300L): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    t.documents
      .groupBy(coalesce(col("lang"), lit("unknown")).as("lang"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("n_chars") >= minChars, 1L).otherwise(0L))
          .as("n_gated"))
      .withColumn("t_all", sum(col("n_all")).over(w))
      .withColumn("t_gated", sum(col("n_gated")).over(w))
      .withColumn("share_all_e6", expr("(1000000 * n_all) div t_all"))
      .withColumn("share_gated_e6",
        expr("(1000000 * n_gated) div t_gated"))
      .withColumn("drift_e6",
        abs(col("share_all_e6") - col("share_gated_e6")))
      .select(col("lang"), col("n_all"), col("n_gated"),
        col("share_all_e6"), col("share_gated_e6"), col("drift_e6"))
      .orderBy(col("lang"))
  }

  /** Winsorization audit: per event type, the exact p1/p99 member
    * values (row_number index pick — interpolation-free, engine-
    * portable) and the pre/post sums of clipping every value into
    * [p1, p99], with clipped-row counts both sides. The outlier-
    * robustness gate a metrics pipeline runs before aggregating raw
    * values. Scale: the per-type rank sort shards by type (same
    * per-group-sort caveat as the exact-quantile family — swap the
    * thresholds to percentile_approx for few giant groups, columns
    * unchanged); the clip pass is one equi-join on the tiny per-type
    * threshold table. */
  def dqWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = t.events.select(col("event_type"),
      round(col("value") * 100).cast("long").as("c"), col("event_id"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("c"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val thr = c.withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 99) div 100"), col("c")))
          .as("p01_c"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("c")))
          .as("p99_c"))
    c.join(thr, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(col("p01_c")).as("p01_c"),
        max(col("p99_c")).as("p99_c"),
        sum(col("c")).as("sum_raw_c"),
        sum(greatest(col("p01_c"), least(col("p99_c"), col("c"))))
          .as("sum_clip_c"),
        sum(when(col("c") < col("p01_c"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("c") > col("p99_c"), 1L).otherwise(0L)).as("n_hi"))
      .orderBy(col("event_type"))
  }
}

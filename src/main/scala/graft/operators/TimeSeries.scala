package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Time-series regularization: per-entity gap-filling with linear
  * interpolation — the resample step every downstream model/forecast
  * pipeline wants a dense grid for.
  *
  * Shape at scale: the observed series aggregates with one shuffle;
  * each entity's hour spine generates from its own (lo, hi) bounds
  * (`sequence` + explode — no driver loop, no global spine blow-up for
  * sparse entities); the fill is two window passes over data
  * partitioned by entity. Nothing is quadratic and nothing leaves the
  * entity's partition after the one left join.
  *
  * Numeric determinism for the oracle: observed values are integer
  * cents; interpolation works on the per-entity hour INDEX (≤ ~10³)
  * instead of epoch micros, so Δv·Δidx stays ≤ ~10⁹ — exact in a
  * double — and the interpolated value floor(prev + Δv·k / gap) is
  * bit-identical in Spark and DuckDB. (Integer `div` is NOT used: it
  * truncates toward zero in Spark but floors in DuckDB, and Δv can be
  * negative.)
  */
object TimeSeries {

  private val HourUs = 3600000000L

  /** Dense per-user hourly series: observed hours keep their exact
    * cents sum, missing hours interpolate linearly between the
    * nearest observed neighbors. Spine endpoints are each user's own
    * min/max observed hour, so prev/next always exist. */
  def gapFillInterpolate(spark: SparkSession, dir: String,
      maxUser: Int = 25): DataFrame = {
    val ev = Tables(spark, dir).events.filter(col("user_id") < maxUser)
    val present = ev
      .groupBy(col("user_id"),
        unix_micros(date_trunc("hour", col("ts"))).as("h_us"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val spine = present.groupBy(col("user_id"))
      .agg(min(col("h_us")).as("lo"), max(col("h_us")).as("hi"))
      .select(col("user_id"), col("lo"),
        explode(expr(s"sequence(lo, hi, $HourUs)")).as("h_us"))
      .withColumn("idx", ((col("h_us") - col("lo")) / HourUs).cast("long"))
      .drop("lo")
    val joined = spine.join(present, Seq("user_id", "h_us"), "left")
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("idx"))
      .rowsBetween(0, Window.unboundedFollowing)
    val obsIdx = when(col("v").isNotNull, col("idx"))
    joined
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pi", last(obsIdx, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("ni", first(obsIdx, ignoreNulls = true).over(wNext))
      .withColumn("cents", when(col("v").isNotNull, col("v"))
        .otherwise(col("pv") + expr(
          """CAST(floor(CAST((nv - pv) * (idx - pi) AS DOUBLE)
            |           / CAST(ni - pi AS DOUBLE)) AS BIGINT)""".stripMargin)))
      .withColumn("src", when(col("v").isNotNull, lit("obs"))
        .otherwise(lit("interp")))
      .select(col("user_id"), col("h_us"), col("cents"), col("src"))
      .orderBy(col("user_id"), col("h_us"))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Gap-fill/interpolation invariants beyond the value-level oracle:
  * grid density, observed-row fidelity, and interpolants bounded by
  * their segment endpoints. */
class TimeSeriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("gap-fill emits one row per hour from each user's lo to hi") {
    val r = graft.operators.TimeSeries.gapFillInterpolate(spark, sf)
    val perUser = r.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        ((max(col("h_us")) - min(col("h_us"))) / 3600000000L + 1)
          .cast("long").as("span"))
    assert(perUser.filter(col("n") =!= col("span")).isEmpty)
    // grid is exact: every h_us is a whole hour offset from the min
    assert(r.filter(pmod(col("h_us"), lit(3600000000L)) =!= 0).isEmpty)
  }

  test("observed rows carry the exact cents sum; interpolants stay in segment range") {
    val r = graft.operators.TimeSeries.gapFillInterpolate(spark, sf)
      .localCheckpoint()
    val t = graft.core.Tables(spark, sf)
    val raw = t.events.filter(col("user_id") < 25)
      .groupBy(col("user_id"),
        unix_micros(date_trunc("hour", col("ts"))).as("h_us"))
      .agg(sum(round(col("value") * 100).cast("long")).as("raw_cents"))
    val obs = r.filter(col("src") === "obs")
      .join(raw, Seq("user_id", "h_us"), "full")
    assert(obs.filter(col("cents").isNull || col("raw_cents").isNull
      || col("cents") =!= col("raw_cents")).isEmpty)
    // every interpolated value lies within [min, max] of the two
    // nearest observed neighbors — linear interpolation can't overshoot
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("h_us"))
    val obsV = when(col("src") === "obs", col("cents"))
    val bounded = r
      .withColumn("pv", last(obsV, ignoreNulls = true)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("nv", first(obsV, ignoreNulls = true)
        .over(w.rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .filter(col("src") === "interp")
      .filter(col("cents") < least(col("pv"), col("nv"))
        || col("cents") > greatest(col("pv"), col("nv")))
    assert(bounded.isEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.enrich.{Enrich, Sessionization}

/** Bridges the synthetic `events` table into detection-shaped rows and
  * runs the PRODUCTION domain operators on them — so `Enrich.vehicle`
  * and `Sessionization.slotRollup` themselves (not just analogous
  * queries) are hash-verified against the DuckDB oracle at volume.
  *
  * Only the deterministic projection of each output is exposed:
  * integer counts, window-pinned firsts/lasts, modes, and exact
  * integer-valued time sums. Float averages/stddevs are exercised by
  * the golden-fixture specs instead (their ulp behavior is
  * summation-order dependent by nature).
  */
object DomainBridge {

  /** events → flattened vehicle detections: user=tracker, event order =
    * frame order, event_type = lane, value = speed/position. */
  private def vehicleShaped(t: Tables): DataFrame =
    t.events.select(
      col("user_id").as("tracker_id"),
      col("event_id").as("frame_number"),
      lit("car").as("class_name"),
      lit("grey").as("vehicle_color"),
      (col("value") / 500.0).as("confidence"),
      col("value").as("speed"),
      (col("value") > 400.0).as("stopped"),
      col("event_type").as("lane"),
      when(pmod(col("user_id"), lit(2)) === 0, "Up").otherwise("Down").as("direction"),
      (col("value") > 250.0).as("line_crossing"),
      (col("event_type") === "error").as("red_light_violation"),
      col("value").as("center_x"),
      (col("value") * 2.0).as("center_y"))

  /** Production `Enrich.vehicle` on 100k bridged rows, deterministic
    * columns only. */
  def vehicleEnrich(spark: SparkSession, dir: String): DataFrame =
    Enrich.vehicle(vehicleShaped(Tables(spark, dir)))
      .select(
        col("tracker_id"), col("vehicle_type"), col("frame_count"),
        col("duration_seconds"), col("stopped_duration"),
        col("lane_changes"), col("initial_lane"), col("final_lane"),
        col("most_common_lane"), col("direction_changes"),
        col("line_crossing_count"), col("red_light_violation_count"))
      .orderBy(col("tracker_id"))

  /** events → slot observations: integer-valued "seconds" (epoch micros
    * as double) keep every sum exact. */
  private[operators] def slotShaped(t: Tables): DataFrame =
    t.events.select(
      col("event_id").as("frame_number"),
      unix_micros(col("ts")).cast("double").as("timestamp_sec"),
      col("user_id").cast("string").as("slot_id"),
      (col("value") > 100.0).as("occupied"),
      array(lit(0.0)).as("bbox"))

  /** Production `Sessionization.slotRollup` on bridged rows. */
  def slotSessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionization.slotRollup(slotShaped(Tables(spark, dir)))
      .select(
        col("slot_id"),
        col("became_free"), col("became_occupied"),
        col("total_occupied_seconds"), col("total_free_seconds"),
        col("slot_status"),
        size(col("parking_sessions")).cast("long").as("n_parking_sessions"))
      .orderBy(col("slot_id"))
}

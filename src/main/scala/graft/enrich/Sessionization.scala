package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parking-slot sessionization (SURVEY.md §2.6 D9,
  * `advanced_preprocessing_parkingLot.py:46-123`).
  *
  * The reference runs one `filter(slot_id == sid)` + collect job *per
  * slot* — O(slots) scans with driver-side state loops. Here it is a
  * single distributed pass: change-flag via lag, session id via
  * cumulative sum, then two hash aggregations. Scales to any number of
  * slots/cameras because the only shuffle is on `slot_id`.
  */
object Sessionization {

  /** Coerce the dynamic-key `slots` struct to a real map and explode to
    * one row per (frame, slot) — F9/F10/G5: the to_json/from_json
    * round-trip is the standard trick for structs whose field names are
    * data (`basic_preprocessing_parkingLot.py:32-47`). */
  def explodeSlots(frames: DataFrame): DataFrame = {
    val slotType = MapType(StringType,
      StructType(Seq(
        StructField("occupied", BooleanType),
        StructField("bbox", ArrayType(DoubleType)))))
    frames
      .withColumn("_slots_map", from_json(to_json(col("slots")), slotType))
      .select(col("frame_number"), col("timestamp_sec"),
        explode(col("_slots_map")).as(Seq("slot_id", "slot")))
      .select(col("frame_number"), col("timestamp_sec"), col("slot_id"),
        col("slot.occupied").as("occupied"), col("slot.bbox").as("bbox"))
  }

  /** Per-slot state sessions: each row belongs to a session of constant
    * occupancy state; sessions carry entry/exit time and duration. */
  def sessions(slotRows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("slot_id")).orderBy(col("timestamp_sec"))
    val run = Window.partitionBy(col("slot_id")).orderBy(col("timestamp_sec"))
      .rowsBetween(Window.unboundedPreceding, 0)
    slotRows
      .withColumn("_prev", lag(col("occupied"), 1).over(w))
      .withColumn("_changed",
        when(col("_prev").isNull || col("_prev") =!= col("occupied"), 1).otherwise(0))
      .withColumn("session_id", sum(col("_changed")).over(run))
      .groupBy(col("slot_id"), col("session_id"))
      .agg(
        first(col("occupied")).as("occupied"),
        min(col("timestamp_sec")).as("entry_time"),
        max(col("timestamp_sec")).as("exit_time"),
        count(lit(1)).as("n_frames"))
  }

  /** Per-slot rollup (SURVEY §2.8 Parking slot): transition counts,
    * occupied/free time totals, free percentage, final state, and the
    * ordered parking-session list. Durations attribute each observation
    * interval to the state at its start; the tail session extends to the
    * last observed timestamp (`advanced_preprocessing_parkingLot.py:88-95`). */
  def slotRollup(slotRows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("slot_id")).orderBy(col("timestamp_sec"))
    val stateTimed = slotRows
      .withColumn("_next_ts", lead(col("timestamp_sec"), 1).over(w))
      .withColumn("_held", coalesce(col("_next_ts") - col("timestamp_sec"), lit(0.0)))
      .withColumn("_prev", lag(col("occupied"), 1).over(w))
    val totals = stateTimed.groupBy(col("slot_id")).agg(
      sum(when(col("occupied"), col("_held")).otherwise(0.0)).as("total_occupied_seconds"),
      sum(when(!col("occupied"), col("_held")).otherwise(0.0)).as("total_free_seconds"),
      sum(when(col("_prev").isNotNull && col("_prev") && !col("occupied"), 1)
        .otherwise(0)).as("became_free"),
      sum(when(col("_prev").isNotNull && !col("_prev") && col("occupied"), 1)
        .otherwise(0)).as("became_occupied"),
      max(struct(col("timestamp_sec"), col("occupied"))).as("_last"))
    val sess = sessions(slotRows)
    val parkingSessions = sess.filter(col("occupied"))
      .groupBy(col("slot_id"))
      .agg(expr(
        """transform(
             sort_array(collect_list(struct(entry_time, exit_time))),
             s -> struct(s.entry_time AS entry_time, s.exit_time AS exit_time,
                         s.exit_time - s.entry_time AS duration))""")
        .as("parking_sessions"))
    totals
      .withColumn("slot_status",
        when(col("_last.occupied"), "occupied").otherwise("free"))
      .withColumn("free_percentage",
        when(col("total_occupied_seconds") + col("total_free_seconds") > 0,
          col("total_free_seconds")
            / (col("total_occupied_seconds") + col("total_free_seconds")) * 100.0)
          .otherwise(lit(0.0)))
      .drop("_last")
      .join(parkingSessions, Seq("slot_id"), "left")
      .withColumn("parking_sessions",
        coalesce(col("parking_sessions"), expr("array()")))
      .orderBy(col("slot_id"))
  }

  /** The reference's NESTED slot-document shape (SURVEY §2.8 Parking:
    * `advanced_preprocessing_parkingLot.py:104-122`) — transition
    * counts and time totals regrouped under `state_transitions` /
    * `time_metrics` structs around the session list. A pure projection
    * over [[slotRollup]]. */
  def slotDocuments(rollup: DataFrame): DataFrame =
    rollup.select(
      col("slot_id"),
      col("slot_status"),
      struct(col("became_free"), col("became_occupied"))
        .as("state_transitions"),
      struct(col("total_occupied_seconds"), col("total_free_seconds"),
        col("free_percentage")).as("time_metrics"),
      col("parking_sessions"))

  /** Top-level parking_config summary (SURVEY §2.8 Parking:
    * `advanced_preprocessing.py:299-316`): slot totals plus the final
    * frame's occupancy state. */
  def configSummary(slotRows: DataFrame): DataFrame = {
    val lastState = slotRows
      .groupBy(col("slot_id"))
      .agg(max(struct(col("timestamp_sec"), col("occupied"))).as("_last"))
      .select(col("slot_id"), col("_last.occupied").as("occupied"))
    lastState.agg(
      count(lit(1)).as("total_slots"),
      sum(when(!col("occupied"), 1).otherwise(0)).as("free_slots"),
      sum(when(col("occupied"), 1).otherwise(0)).as("final_occupancy"))
  }

  /** Full parking advanced stage: wrapped frames → slot rollups. */
  def apply(frames: DataFrame): DataFrame = slotRollup(explodeSlots(frames))
}

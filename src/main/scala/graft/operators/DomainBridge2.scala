package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.enrich.Enrich

/** Second set of production-operator bridges: `Enrich.people` and
  * `Enrich.safety` through the DuckDB oracle gate (see DomainBridge for
  * the pattern — deterministic projections only). */
object DomainBridge2 {

  /** events → people-shaped detections: modes with exclusion, restricted
    * flags, first-match timestamps all exercised at volume. */
  private def peopleShaped(t: Tables): DataFrame =
    t.events.select(
      col("user_id").as("tracker_id"),
      col("event_id").as("frame_number"),
      (col("value") / 500.0).as("confidence"),
      // "Unknown" rows exercise the mode-exclusion path (D1)
      when(col("event_type") === "view", "Unknown")
        .otherwise(col("event_type")).as("gender"),
      concat(lit("bag_"), pmod(col("user_id"), lit(3))).as("carrying"),
      (pmod(col("event_id"), lit(50)) === 0).cast("int").cast("long").as("age"),
      (col("event_type") === "error").as("in_restricted_area"),
      (col("value") > 480.0).as("entered_restricted"))

  def peopleEnrich(spark: SparkSession, dir: String): DataFrame =
    Enrich.people(peopleShaped(Tables(spark, dir)))
      .select(col("tracker_id"), col("age"), col("gender"), col("carrying"),
        col("entered_restricted_area"),
        col("restricted_area_entry_time"),
        col("first_detection"), col("last_detection"),
        col("duration_seconds"), col("frame_count"))
      .orderBy(col("tracker_id"))

  /** events → safety-shaped detections: boolean resolution + violation
    * counts (D8) at volume. */
  private def safetyShaped(t: Tables): DataFrame =
    t.events.select(
      col("user_id").as("tracker_id"),
      col("event_id").as("frame_number"),
      when(col("value") > 250.0, "Safe").otherwise("Unsafe").as("safety_status"),
      (col("value") > 100.0).as("hardhat"),
      (col("value") > 200.0).as("mask"),
      (col("value") > 300.0).as("safety_vest"),
      array(col("event_type")).as("missing_items"),
      array(col("value"), col("value"), col("value") + 10.0, col("value") + 10.0)
        .as("bbox"),
      (col("value")).as("center_x"),
      (col("value") * 2.0).as("center_y"))

  /** events → retail-shaped product detections (attributes constant per
    * product so the reference's unpinned first() stays deterministic).
    * Price and stock are exact binary fractions (1/32 steps and whole
    * units — the raw value column is 2-decimal, hence inexact) so the
    * ES view's `avg(price)` / `avg(stock_level)` accumulate exactly in
    * ANY partition order. */
  private[operators] def retailShaped(t: Tables): DataFrame =
    t.events.select(
      concat(lit("p"), pmod(col("user_id"), lit(7))).as("product_id"),
      col("event_id").as("frame_number"),
      concat(lit("name_"), pmod(col("user_id"), lit(7))).as("product_name"),
      concat(lit("cat_"), pmod(col("user_id"), lit(7))).as("category"),
      lit("aisle").as("location"),
      (round(col("value") * 4) / 32.0).as("price"),
      round(col("value")).as("stock_level"),
      (col("value") > 450.0).as("picked_by_customer"),
      date_format(col("ts"), "yyyy-MM-dd").as("expiry_date"))

  def retailEnrich(spark: SparkSession, dir: String): DataFrame =
    Enrich.retail(retailShaped(Tables(spark, dir)))
      .select(col("product_id"), col("product_name"), col("category"),
        col("location"), col("picked_by_customer"),
        array_join(col("unique_expiry_dates"), ",").as("unique_expiry_dates"),
        col("frame_appearances"))
      .orderBy(col("product_id"))

  def safetyEnrich(spark: SparkSession, dir: String): DataFrame =
    Enrich.safety(safetyShaped(Tables(spark, dir)))
      .select(col("tracker_id"), col("initial_safety_status"),
        col("safety_status"), col("hardhat"), col("mask"), col("safety_vest"),
        col("total_frames"), col("duration_frames"),
        col("hardhat_violations"), col("mask_violations"),
        col("safety_vest_violations"), col("total_unsafe_frames"),
        col("most_common_missing_item"), col("bbox_count"))
      .orderBy(col("tracker_id"))

  /** events → school-event-shaped detections (A8: flatten of role
    * arrays, alert-mode with first-seen tie-break, stddev of
    * per-detection durations). Confidence/duration values are
    * binary-exact constants per entity so double averages stay
    * bit-deterministic under any summation order. */
  private[operators] def schoolShaped(t: Tables): DataFrame =
    t.events.select(
      col("user_id").as("event_id"),
      col("event_id").as("frame_number"),
      concat(lit("type_"), pmod(col("user_id"), lit(4))).as("event_type"),
      concat(lit("loc_"), pmod(col("user_id"), lit(5))).as("location"),
      lit("note").as("notes"),
      (pmod(col("user_id"), lit(8)).cast("double") * 0.125).as("confidence"),
      pmod(col("user_id"), lit(4)).cast("double").as("duration_seconds"),
      (col("value") > 480.0).as("response_required"),
      concat(lit("p"), pmod(col("event_id"), lit(7))).as("involved_person_id"),
      array(concat(lit("r"), pmod(col("event_id"), lit(3))),
        concat(lit("r"), pmod(col("event_id"), lit(5)))).as("person_roles"),
      col("event_type").as("alert_level"),
      (col("value") > 250.0).as("multiple_persons_involved"))

  /** S8/D12 people ES-record reshaping (`processing_people.py:57-64`)
    * through the oracle: the enriched people rollup with the key
    * flattened to people_id and first/last detection renamed to
    * entry/exit time. */
  def peopleEs(spark: SparkSession, dir: String): DataFrame =
    graft.views.Views.peopleEsRecords(
        Enrich.people(peopleShaped(Tables(spark, dir))))
      .select(col("people_id"), col("age"), col("gender"), col("carrying"),
        col("entered_restricted_area"), col("restricted_area_entry_time"),
        col("entry_time"), col("exit_time"),
        col("duration_seconds"), col("frame_count"))
      .orderBy(col("people_id"))

  /** S8/D12 frame-grained safety ES records
    * (`processing_safety.py:122-137`) over the safety-shaped
    * detections; arrays serialized for the checker (bbox as exact
    * integer cents). */
  def safetyEs(spark: SparkSession, dir: String): DataFrame =
    graft.views.Views.safetyEsRecords(
        // mask becomes nullable here so the reference's `mask is not
        // None` PRESENCE semantics is actually exercised (true/null,
        // not a constant true)
        safetyShaped(Tables(spark, dir)) // center_x carries the raw value
          .withColumn("mask", when(col("center_x") > 200.0, lit(true))))
      .select(col("tracker_id"), col("frame_number"),
        col("wearing_hardhat"), col("wearing_mask"),
        col("wearing_safety_vest"), col("safety_status"),
        array_join(col("missing_items"), ",").as("missing_items"),
        array_join(transform(col("bbox"),
          x => round(x * 100).cast("long").cast("string")), ",")
          .as("bbox_cents"))
      .orderBy(col("tracker_id"), col("frame_number"))

  /** events → legacy vehicle-detection shape
    * (`processing_vehicle.py:31-46`): the categorical attributes VARY
    * within a tracker so the majority vote is actually exercised;
    * confidence/speed are exact binary fractions / small integers so
    * double averages are summation-order independent. */
  private def vehicleLegacyShaped(t: Tables): DataFrame =
    t.events.select(
      col("user_id").as("tracker_id"),
      col("event_id").as("frame_number"),
      pmod(col("event_id"), lit(3)).as("class_id"),
      concat(lit("vt_"), pmod(col("event_id"), lit(4))).as("vehicle_type"),
      concat(lit("c_"), pmod(col("event_id"), lit(5))).as("vehicle_color"),
      when(col("value") > 250.0, "north").otherwise("south")
        .as("vehicle_direction"),
      concat(lit("lane_"), pmod(col("event_id"), lit(3))).as("vehicle_lane"),
      (pmod(col("user_id"), lit(8)).cast("double") * 0.125).as("confidence"),
      pmod(col("event_id"), lit(50)).cast("double").as("vehicle_speed"))

  /** D12 legacy vehicle majority-vote flattening
    * (`processing_vehicle.py:31-77`) through the oracle. */
  def vehicleLegacy(spark: SparkSession, dir: String): DataFrame =
    graft.views.Views.vehicleLegacyRecords(
        vehicleLegacyShaped(Tables(spark, dir)))
      .orderBy(col("tracker_id"))

  def schoolEnrich(spark: SparkSession, dir: String): DataFrame =
    Enrich.school(schoolShaped(Tables(spark, dir)))
      .select(col("event_id"), col("event_type"), col("location"),
        col("notes"), col("start_time"), col("end_time"),
        col("duration_seconds"), col("frame_occurrences"),
        col("avg_confidence"), col("avg_event_duration"),
        col("event_duration_stddev"), col("response_required"),
        array_join(col("involved_persons"), ",").as("involved_persons"),
        array_join(col("unique_roles"), ",").as("unique_roles"),
        col("most_common_alert_level"), col("most_common_role"),
        col("multiple_persons_involved"))
      .orderBy(col("event_id"))
}

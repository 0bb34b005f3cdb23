package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.enrich.{Enrich, Sessionization}
import graft.views.Views

/** Bridges the synthetic `events` table into detection-shaped rows and
  * runs the PRODUCTION domain operators on them — so `Enrich.vehicle`,
  * `Sessionization.slotRollup`, and the ten S8 sender views themselves
  * (not just analogous queries) are hash-verified against the DuckDB
  * oracle at volume.
  *
  * One config-driven object (r8/r9 carried stretch: formerly
  * DomainBridge/2/3 — three files repeating the stamp/flatten
  * scaffolding). Every bridge is the same two-combinator pipeline:
  *
  *  - [[rolled]]: shape the events scan, run a production operator
  *    chain, finish with a deterministic projection + order;
  *  - [[stamped]]: same, through a provenance-stamped ES view under
  *    the pinned harness clock ([[FixedMicros]]), with `@timestamp`
  *    flattened to `ts_us` for the hash compare.
  *
  * Only deterministic projections are exposed: integer counts,
  * window-pinned firsts/lasts, modes, exact integer-valued time sums,
  * and doubles that are exact binary fractions by construction. Float
  * averages/stddevs over inexact values are exercised by the
  * golden-fixture specs instead (their ulp behavior is
  * summation-order dependent by nature). Struct/array view outputs
  * are flattened or serialized in the PROJECTION only — the views
  * themselves return the reference's nested record shapes.
  */
object DomainBridges {

  /** 2023-11-14T22:13:20Z — the deterministic harness clock. */
  val FixedMicros: Long = 1700000000000000L
  val FixedDate: String = "2023-11-14"

  private def tsUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", unix_micros(col("@timestamp")))
      .drop("@timestamp")

  /** Production-rollup bridge: events → `shape` → `op` → `finish`
    * (deterministic projection + order). */
  private def rolled(shape: Tables => DataFrame, op: DataFrame => DataFrame)(
      finish: DataFrame => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => finish(op(shape(Tables(s, dir))))

  /** Stamped-view bridge: events → `shape` → `op` → provenance-stamped
    * ES view (pinned clock) → ts_us flatten → `finish`. */
  private def stamped(shape: Tables => DataFrame, op: DataFrame => DataFrame,
      view: (DataFrame, String, Option[Long]) => DataFrame, src: String)(
      finish: DataFrame => DataFrame): (SparkSession, String) => DataFrame =
    rolled(shape, d => tsUs(view(op(d), src, Some(FixedMicros))))(finish)

  // ---------------------------------------------------------------
  // Event shapes — one per domain; the per-domain content that makes
  // each production operator's paths actually fire at volume.
  // ---------------------------------------------------------------

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

  /** events → slot observations: integer-valued "seconds" (epoch micros
    * as double) keep every sum exact. */
  private[operators] def slotShaped(t: Tables): DataFrame =
    t.events.select(
      col("event_id").as("frame_number"),
      unix_micros(col("ts")).cast("double").as("timestamp_sec"),
      col("user_id").cast("string").as("slot_id"),
      (col("value") > 100.0).as("occupied"),
      array(lit(0.0)).as("bbox"))

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
  private def retailShaped(t: Tables): DataFrame =
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

  /** events → school-event-shaped detections (A8: flatten of role
    * arrays, alert-mode with first-seen tie-break, stddev of
    * per-detection durations). Confidence/duration values are
    * binary-exact constants per entity so double averages stay
    * bit-deterministic under any summation order. */
  private def schoolShaped(t: Tables): DataFrame =
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

  /** events → animal-detection shape (`processing_animal.py:60-64`
    * merges every detection field): categorical class, confidence as an
    * exact binary fraction, bbox center. */
  private def animalShaped(t: Tables): DataFrame =
    t.events.select(
      col("event_id").as("frame_number"),
      col("user_id").as("tracker_id"),
      concat(lit("animal_"), pmod(col("user_id"), lit(6))).as("animal_type"),
      (pmod(col("event_id"), lit(16)).cast("double") * 0.0625).as("confidence"),
      col("value").as("center_x"),
      (col("value") * 2.0).as("center_y"))

  /** events → geolocation-detection shape: lat/lon as exact binary
    * fractions of the integer value column. */
  private def geoShaped(t: Tables): DataFrame =
    t.events.select(
      col("event_id").as("frame_number"),
      col("user_id").as("tracker_id"),
      (col("value") * 0.125).as("latitude"),
      (col("value") * 0.25 - 64.0).as("longitude"),
      col("event_type").as("zone"))

  /** events → pose-frame shape (`processing_pose.py:40-48`): action,
    * confidence, and a keypoint array of exact doubles. */
  private def poseShaped(t: Tables): DataFrame =
    t.events.select(
      col("event_id").as("frame_number"),
      concat(lit("act_"), pmod(col("user_id"), lit(5))).as("action"),
      (pmod(col("event_id"), lit(8)).cast("double") * 0.125).as("confidence"),
      array(col("value"), col("value") * 2.0, col("value") * 0.5)
        .as("keypoints"))

  /** events → common-detection records wrapped in `frame_data` — so the
    * bridge exercises the reference's unwrap path, not just the
    * pass-through. */
  private def commonShaped(t: Tables): DataFrame =
    t.events.select(
      struct(
        col("event_id").as("frame_number"),
        col("event_type").as("object_class"),
        (pmod(col("user_id"), lit(32)).cast("double") * 0.03125)
          .as("confidence")).as("frame_data"))

  // ---------------------------------------------------------------
  // Rollup bridges (production Enrich/Sessionization operators).
  // ---------------------------------------------------------------

  /** Production `Enrich.vehicle` on 100k bridged rows, deterministic
    * columns only. */
  val vehicleEnrich: (SparkSession, String) => DataFrame =
    rolled(vehicleShaped, Enrich.vehicle)(_
      .select(
        col("tracker_id"), col("vehicle_type"), col("frame_count"),
        col("duration_seconds"), col("stopped_duration"),
        col("lane_changes"), col("initial_lane"), col("final_lane"),
        col("most_common_lane"), col("direction_changes"),
        col("line_crossing_count"), col("red_light_violation_count"))
      .orderBy(col("tracker_id")))

  /** Production `Sessionization.slotRollup` on bridged rows. */
  val slotSessionize: (SparkSession, String) => DataFrame =
    rolled(slotShaped, Sessionization.slotRollup)(_
      .select(
        col("slot_id"),
        col("became_free"), col("became_occupied"),
        col("total_occupied_seconds"), col("total_free_seconds"),
        col("slot_status"),
        size(col("parking_sessions")).cast("long").as("n_parking_sessions"))
      .orderBy(col("slot_id")))

  val peopleEnrich: (SparkSession, String) => DataFrame =
    rolled(peopleShaped, Enrich.people)(_
      .select(col("tracker_id"), col("age"), col("gender"), col("carrying"),
        col("entered_restricted_area"),
        col("restricted_area_entry_time"),
        col("first_detection"), col("last_detection"),
        col("duration_seconds"), col("frame_count"))
      .orderBy(col("tracker_id")))

  val safetyEnrich: (SparkSession, String) => DataFrame =
    rolled(safetyShaped, Enrich.safety)(_
      .select(col("tracker_id"), col("initial_safety_status"),
        col("safety_status"), col("hardhat"), col("mask"), col("safety_vest"),
        col("total_frames"), col("duration_frames"),
        col("hardhat_violations"), col("mask_violations"),
        col("safety_vest_violations"), col("total_unsafe_frames"),
        col("most_common_missing_item"), col("bbox_count"))
      .orderBy(col("tracker_id")))

  val retailEnrich: (SparkSession, String) => DataFrame =
    rolled(retailShaped, Enrich.retail)(_
      .select(col("product_id"), col("product_name"), col("category"),
        col("location"), col("picked_by_customer"),
        array_join(col("unique_expiry_dates"), ",").as("unique_expiry_dates"),
        col("frame_appearances"))
      .orderBy(col("product_id")))

  val schoolEnrich: (SparkSession, String) => DataFrame =
    rolled(schoolShaped, Enrich.school)(_
      .select(col("event_id"), col("event_type"), col("location"),
        col("notes"), col("start_time"), col("end_time"),
        col("duration_seconds"), col("frame_occurrences"),
        col("avg_confidence"), col("avg_event_duration"),
        col("event_duration_stddev"), col("response_required"),
        array_join(col("involved_persons"), ",").as("involved_persons"),
        array_join(col("unique_roles"), ",").as("unique_roles"),
        col("most_common_alert_level"), col("most_common_role"),
        col("multiple_persons_involved"))
      .orderBy(col("event_id")))

  // ---------------------------------------------------------------
  // View bridges (S8/D12 ES-record reshaping through the oracle).
  // ---------------------------------------------------------------

  /** S8/D12 people ES-record reshaping (`processing_people.py:57-64`)
    * through the oracle: the enriched people rollup with the key
    * flattened to people_id and first/last detection renamed to
    * entry/exit time. */
  val peopleEs: (SparkSession, String) => DataFrame =
    rolled(peopleShaped, d => Views.peopleEsRecords(Enrich.people(d)))(_
      .select(col("people_id"), col("age"), col("gender"), col("carrying"),
        col("entered_restricted_area"), col("restricted_area_entry_time"),
        col("entry_time"), col("exit_time"),
        col("duration_seconds"), col("frame_count"))
      .orderBy(col("people_id")))

  /** S8/D12 frame-grained safety ES records
    * (`processing_safety.py:122-137`) over the safety-shaped
    * detections; arrays serialized for the checker (bbox as exact
    * integer cents). */
  val safetyEs: (SparkSession, String) => DataFrame =
    rolled(safetyShaped,
      // mask becomes nullable here so the reference's `mask is not
      // None` PRESENCE semantics is actually exercised (true/null,
      // not a constant true); center_x carries the raw value
      d => Views.safetyEsRecords(
        d.withColumn("mask", when(col("center_x") > 200.0, lit(true)))))(_
      .select(col("tracker_id"), col("frame_number"),
        col("wearing_hardhat"), col("wearing_mask"),
        col("wearing_safety_vest"), col("safety_status"),
        array_join(col("missing_items"), ",").as("missing_items"),
        array_join(transform(col("bbox"),
          x => round(x * 100).cast("long").cast("string")), ",")
          .as("bbox_cents"))
      .orderBy(col("tracker_id"), col("frame_number")))

  /** D12 legacy vehicle majority-vote flattening
    * (`processing_vehicle.py:31-77`) through the oracle. */
  val vehicleLegacy: (SparkSession, String) => DataFrame =
    rolled(vehicleLegacyShaped, Views.vehicleLegacyRecords)(
      _.orderBy(col("tracker_id")))

  val animalEs: (SparkSession, String) => DataFrame =
    stamped(animalShaped, identity,
      Views.animalEsRecords, "animal_refined.json")(
      _.orderBy(col("frame_number"), col("tracker_id")))

  val geoEs: (SparkSession, String) => DataFrame =
    stamped(geoShaped, identity,
      Views.geolocationEsRecords, "geolocation_refined.json")(
      _.orderBy(col("frame_number"), col("tracker_id")))

  /** The view output itself carries the nested `keypoints` array (the
    * reference's record shape); the declared query flattens it to
    * `kp_x/kp_y/kp_z` scalars for the hash compare — same convention as
    * [[parkingEs]]'s struct flattening. */
  val poseEs: (SparkSession, String) => DataFrame =
    stamped(poseShaped, identity, Views.poseEsRecords, "pose_refined.json")(_
      .select(col("ts_us"), col("source_file"), col("processing_date"),
        col("processing_version"), col("frame_number"), col("action"),
        col("confidence"),
        element_at(col("keypoints"), 1).as("kp_x"),
        element_at(col("keypoints"), 2).as("kp_y"),
        element_at(col("keypoints"), 3).as("kp_z"))
      .orderBy(col("frame_number"), col("action")))

  /** Parking: the real production chain — slot observations →
    * `Sessionization.slotRollup` → nested `slotDocuments` → stamped ES
    * records — with the nested structs flattened in the projection for
    * the hash compare (the view output itself is nested). */
  val parkingEs: (SparkSession, String) => DataFrame =
    stamped(slotShaped,
      d => Sessionization.slotDocuments(Sessionization.slotRollup(d)),
      Views.parkingEsRecords, "parking_refined.json")(_
      .select(col("ts_us"), col("source_file"), col("processing_date"),
        col("processing_version"), col("slot_id"), col("slot_status"),
        col("state_transitions.became_free").as("became_free"),
        col("state_transitions.became_occupied").as("became_occupied"),
        col("time_metrics.total_occupied_seconds").as("total_occupied_seconds"),
        col("time_metrics.total_free_seconds").as("total_free_seconds"),
        size(col("parking_sessions")).cast("long").as("n_parking_sessions"))
      .orderBy(col("slot_id")))

  /** School: the full production chain — school-shaped detections →
    * `Enrich.school` rollup → stamped `datalake-school-data` records —
    * with the map/array outputs serialized in the projection for the
    * hash compare (the view output keeps the nested shapes): the
    * alert-level distribution as canonical JSON, person/role sets
    * comma-joined. */
  val schoolEs: (SparkSession, String) => DataFrame =
    stamped(schoolShaped, Enrich.school,
      Views.schoolEsRecords, "school_refined.json")(_
      .select(col("ts_us"), col("source_file"), col("processing_date"),
        col("processing_version"), col("detection_id"),
        col("event_type"), col("location"), col("notes"),
        col("start_time"), col("end_time"), col("duration_seconds"),
        col("frame_occurrences"), col("avg_confidence"),
        col("avg_event_duration"), col("event_duration_stddev"),
        col("response_required"), col("most_common_alert_level"),
        to_json(col("alert_level_distribution")).as("alert_level_distribution"),
        array_join(col("involved_persons"), ",").as("involved_persons"),
        array_join(col("unique_roles"), ",").as("unique_roles"),
        col("most_common_role"), col("multiple_persons_involved"))
      .orderBy(col("detection_id")))

  /** Retail: retail-shaped detections → `Enrich.retail` rollup →
    * stamped `datalake-retail-data` records; expiry-date set
    * comma-joined in the projection. `average_price` /
    * `average_stock_level` are exact by construction (binary-fraction
    * prices, integral stock), so the double averages hash identically
    * in any partition order. */
  val retailEs: (SparkSession, String) => DataFrame =
    stamped(retailShaped, Enrich.retail,
      Views.retailEsRecords, "retail_refined.json")(_
      .select(col("ts_us"), col("source_file"), col("processing_date"),
        col("processing_version"), col("detection_id"),
        col("product_name"), col("category"), col("location"),
        col("average_price"), col("average_stock_level"),
        col("picked_by_customer"),
        array_join(col("unique_expiry_dates"), ",").as("unique_expiry_dates"),
        col("frame_appearances"))
      .orderBy(col("detection_id")))

  val commonEs: (SparkSession, String) => DataFrame =
    stamped(commonShaped, identity,
      Views.commonEsRecords, "common_refined.json")(
      _.orderBy(col("frame_number"), col("object_class"), col("confidence")))
}

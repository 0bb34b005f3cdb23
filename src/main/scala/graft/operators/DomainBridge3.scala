package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.enrich.Sessionization
import graft.views.Views

/** Third bridge set: the pass-through "stamp-only" serving views (S8 —
  * the five domains whose sender indexes refined records verbatim under
  * a provenance stamp: animal, geolocation, pose, parking, common)
  * driven through the DuckDB oracle gate. The clock is pinned
  * (`FixedMicros`) so `@timestamp`/`processing_date` hash identically
  * in both engines; struct/array outputs are flattened or serialized
  * in the PROJECTION only — the views themselves return the
  * reference's nested record shapes. */
object DomainBridge3 {

  /** 2023-11-14T22:13:20Z — the deterministic harness clock. */
  val FixedMicros: Long = 1700000000000000L
  val FixedDate: String = "2023-11-14"

  private def tsUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", unix_micros(col("@timestamp")))
      .drop("@timestamp")

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

  def animalEs(spark: SparkSession, dir: String): DataFrame =
    tsUs(Views.animalEsRecords(animalShaped(Tables(spark, dir)),
        "animal_refined.json", Some(FixedMicros)))
      .orderBy(col("frame_number"), col("tracker_id"))

  /** events → geolocation-detection shape: lat/lon as exact binary
    * fractions of the integer value column. */
  private def geoShaped(t: Tables): DataFrame =
    t.events.select(
      col("event_id").as("frame_number"),
      col("user_id").as("tracker_id"),
      (col("value") * 0.125).as("latitude"),
      (col("value") * 0.25 - 64.0).as("longitude"),
      col("event_type").as("zone"))

  def geoEs(spark: SparkSession, dir: String): DataFrame =
    tsUs(Views.geolocationEsRecords(geoShaped(Tables(spark, dir)),
        "geolocation_refined.json", Some(FixedMicros)))
      .orderBy(col("frame_number"), col("tracker_id"))

  /** events → pose-frame shape (`processing_pose.py:40-48`): action,
    * confidence, and a keypoint array of exact doubles. */
  private def poseShaped(t: Tables): DataFrame =
    t.events.select(
      col("event_id").as("frame_number"),
      concat(lit("act_"), pmod(col("user_id"), lit(5))).as("action"),
      (pmod(col("event_id"), lit(8)).cast("double") * 0.125).as("confidence"),
      array(col("value"), col("value") * 2.0, col("value") * 0.5)
        .as("keypoints"))

  /** The view output itself carries the nested `keypoints` array (the
    * reference's record shape); the declared query flattens it to
    * `kp_x/kp_y/kp_z` scalars for the hash compare — same convention as
    * [[parkingEs]]'s struct flattening. */
  def poseEs(spark: SparkSession, dir: String): DataFrame =
    tsUs(Views.poseEsRecords(poseShaped(Tables(spark, dir)),
        "pose_refined.json", Some(FixedMicros)))
      .select(col("ts_us"), col("source_file"), col("processing_date"),
        col("processing_version"), col("frame_number"), col("action"),
        col("confidence"),
        element_at(col("keypoints"), 1).as("kp_x"),
        element_at(col("keypoints"), 2).as("kp_y"),
        element_at(col("keypoints"), 3).as("kp_z"))
      .orderBy(col("frame_number"), col("action"))

  /** Parking: the real production chain — slot observations →
    * `Sessionization.slotRollup` → nested `slotDocuments` → stamped ES
    * records — with the nested structs flattened in the projection for
    * the hash compare (the view output itself is nested). */
  def parkingEs(spark: SparkSession, dir: String): DataFrame =
    tsUs(Views.parkingEsRecords(
        Sessionization.slotDocuments(Sessionization.slotRollup(
          DomainBridge.slotShaped(Tables(spark, dir)))),
        "parking_refined.json", Some(FixedMicros)))
      .select(col("ts_us"), col("source_file"), col("processing_date"),
        col("processing_version"), col("slot_id"), col("slot_status"),
        col("state_transitions.became_free").as("became_free"),
        col("state_transitions.became_occupied").as("became_occupied"),
        col("time_metrics.total_occupied_seconds").as("total_occupied_seconds"),
        col("time_metrics.total_free_seconds").as("total_free_seconds"),
        size(col("parking_sessions")).cast("long").as("n_parking_sessions"))
      .orderBy(col("slot_id"))

  /** School: the full production chain — school-shaped detections →
    * `Enrich.school` rollup → stamped `datalake-school-data` records —
    * with the map/array outputs serialized in the projection for the
    * hash compare (the view output keeps the nested shapes): the
    * alert-level distribution as canonical JSON, person/role sets
    * comma-joined. */
  def schoolEs(spark: SparkSession, dir: String): DataFrame =
    tsUs(Views.schoolEsRecords(
        graft.enrich.Enrich.school(DomainBridge2.schoolShaped(Tables(spark, dir))),
        "school_refined.json", Some(FixedMicros)))
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
      .orderBy(col("detection_id"))

  /** Retail: retail-shaped detections → `Enrich.retail` rollup →
    * stamped `datalake-retail-data` records; expiry-date set
    * comma-joined in the projection. `average_price` /
    * `average_stock_level` are exact by construction (binary-fraction
    * prices, integral stock), so the double averages hash identically
    * in any partition order. */
  def retailEs(spark: SparkSession, dir: String): DataFrame =
    tsUs(Views.retailEsRecords(
        graft.enrich.Enrich.retail(DomainBridge2.retailShaped(Tables(spark, dir))),
        "retail_refined.json", Some(FixedMicros)))
      .select(col("ts_us"), col("source_file"), col("processing_date"),
        col("processing_version"), col("detection_id"),
        col("product_name"), col("category"), col("location"),
        col("average_price"), col("average_stock_level"),
        col("picked_by_customer"),
        array_join(col("unique_expiry_dates"), ",").as("unique_expiry_dates"),
        col("frame_appearances"))
      .orderBy(col("detection_id"))

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

  def commonEs(spark: SparkSession, dir: String): DataFrame =
    tsUs(Views.commonEsRecords(commonShaped(Tables(spark, dir)),
        "common_refined.json", Some(FixedMicros)))
      .orderBy(col("frame_number"), col("object_class"), col("confidence"))
}

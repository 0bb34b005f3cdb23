package graft.schema

import org.apache.spark.sql.types._

/** Explicit read schemas for the raw per-domain JSON layouts
  * (SURVEY §4.2: "skip inference"): the JSON reader otherwise runs a
  * full inference pass over every object before the real scan — a 2×
  * I/O tax the reference pays on every upload. Field shapes mirror the
  * emitters ([[DomainConfig]] documents the provenance per domain);
  * extra fields in a document are simply dropped by the reader and
  * malformed documents land in `_corrupt_record`
  * ([[graft.lake.Lake.readJsonArray]]).
  */
object DomainSchemas {

  /** vehicle frame-array layout (`basic_preprocessing_vehicle.py:17-73`
    * field census). */
  val vehicleFrames: StructType = StructType(Seq(
    StructField("frame_number", LongType),
    StructField("timestamp", StringType),
    StructField("congestion_level", StringType),
    StructField("traffic_light", StringType),
    StructField("detections", ArrayType(StructType(Seq(
      StructField("tracker_id", LongType),
      StructField("confidence", DoubleType),
      StructField("bbox", ArrayType(DoubleType)),
      StructField("vehicle_type", StringType),
      StructField("vehicle_color", StringType),
      StructField("vehicle_speed", DoubleType),
      StructField("vehicle_direction", StringType),
      StructField("vehicle_lane", StringType),
      StructField("stopped", BooleanType),
      StructField("red_light_violation", BooleanType),
      StructField("line_crossing", BooleanType)))))))

  /** school event layout (`school/basic_preprocessing_school.py`). */
  val schoolFrames: StructType = StructType(Seq(
    StructField("frame_number", LongType),
    StructField("timestamp", StringType),
    StructField("detections", ArrayType(StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("timestamp", StringType),
      StructField("location", StringType),
      StructField("notes", StringType),
      StructField("confidence", DoubleType),
      StructField("duration_seconds", DoubleType),
      StructField("response_required", BooleanType),
      StructField("involved_person_id", StringType),
      StructField("person_roles", ArrayType(StringType)),
      StructField("alert_level", StringType),
      StructField("multiple_persons_involved", BooleanType)))))))

  /** safety frame-array layout with a `people` detection array
    * (`basic_preprocessing_safety.py`). */
  val safetyFrames: StructType = StructType(Seq(
    StructField("frame_number", LongType),
    StructField("people", ArrayType(StructType(Seq(
      StructField("tracker_id", LongType),
      StructField("safety_status", StringType),
      StructField("hardhat", BooleanType),
      StructField("mask", BooleanType),
      StructField("safety_vest", BooleanType),
      StructField("missing_items", ArrayType(StringType)),
      StructField("bbox", ArrayType(DoubleType)),
      StructField("center_x", DoubleType),
      StructField("center_y", DoubleType)))))))

  val byName: Map[String, StructType] = Map(
    "vehicle" -> vehicleFrames,
    "school" -> schoolFrames,
    "safety" -> safetyFrames)
}

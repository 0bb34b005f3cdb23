package graft.schema

/** Per-domain configuration registry for the video-analytics lake.
  *
  * Replaces the reference's if/elif dispatch + per-processor column
  * probing (`Preprocess_Json_Data/registry.py:11-53`,
  * `basic_preprocessing_vehicle.py:51-73`) with declarative config: the
  * generic normalize/enrich pipelines are driven entirely from here, so
  * per-domain code shrinks to configuration plus the few true specials
  * (parking's dynamic-key slot map, people's empty-frame join).
  *
  * @param wrapped       input is a single JSON object wrapping a
  *                      `frame_detections` array (people/parking) vs a
  *                      top-level frame array (`registry.py` wrapped flag)
  * @param detectionsCol name of the per-frame detection array
  * @param entityKey     grouping key for advanced preprocessing; None →
  *                      no advanced stage (pose/geolocation pass-through,
  *                      `Preprocess_Json_Data/main.py:284`)
  * @param synthesizeId  build a spatial-bucket id for untracked
  *                      detections (animal/common,
  *                      `advanced_preprocessing_animal.py:18-28`)
  * @param renames       field-variant normalization map
  *                      (`basic_preprocessing_vehicle.py:62-73`)
  * @param defaults      default values applied as
  *                      coalesce(col, lit(v).cast(t))
  *                      (`preprocessing/common.py:24-35`)
  * @param timestampCols string timestamp columns to strip-and-parse
  *                      ("yyyy-MM-dd HH:mm:ss", +05:30/" UTC" suffixes)
  * @param frameCols     frame-level (non-detection) columns to carry
  */
final case class DomainConfig(
    name: String,
    wrapped: Boolean,
    detectionsCol: String,
    entityKey: Option[String],
    synthesizeId: Boolean = false,
    renames: Map[String, String] = Map.empty,
    defaults: Map[String, (String, String)] = Map.empty,
    timestampCols: Seq[String] = Seq.empty,
    frameCols: Seq[String] = Seq("frame_number", "timestamp"))

object DomainConfig {

  /** vehicle — frame-array; rename vehicle_* variants; rich defaults
    * (`basic_preprocessing_vehicle.py:17-73`). */
  val vehicle: DomainConfig = DomainConfig(
    name = "vehicle", wrapped = false, detectionsCol = "detections",
    entityKey = Some("tracker_id"),
    renames = Map(
      "vehicle_speed" -> "speed", "vehicle_type" -> "class_name",
      "vehicle_direction" -> "direction", "vehicle_lane" -> "lane",
      "frame" -> "frame_number"),
    defaults = Map(
      "class_name" -> ("unknown", "string"),
      "vehicle_color" -> ("unknown", "string"),
      "direction" -> ("Unknown", "string"),
      "lane" -> ("Unknown", "string"),
      "speed" -> ("0.0", "double"),
      "stopped" -> ("false", "boolean"),
      "red_light_violation" -> ("false", "boolean"),
      "line_crossing" -> ("false", "boolean"),
      "confidence" -> ("0.0", "double")),
    timestampCols = Seq("vehicle_entry_time", "vehicle_exit_time",
      "red_light_violation_time", "line_crossing_violation_time"),
    frameCols = Seq("frame_number", "congestion_level", "traffic_light"))

  /** people — wrapped document, sentinel default timestamps, empty-frame
    * preservation (`basic_preprocessing_people.py:12-28,149-163`). */
  val people: DomainConfig = DomainConfig(
    name = "people", wrapped = true, detectionsCol = "detections",
    entityKey = Some("tracker_id"),
    defaults = Map(
      "class_name" -> ("person", "string"),
      "gender" -> ("Unknown", "string"),
      "carrying" -> ("Unknown", "string"),
      "age" -> ("0", "int"),
      "confidence" -> ("0.0", "double"),
      "in_restricted_area" -> ("false", "boolean"),
      "entered_restricted" -> ("false", "boolean"),
      "entry_time" -> ("2101-01-29 17:53:46", "string"),
      "exit_time" -> ("2101-01-29 17:53:46", "string")),
    timestampCols = Seq("timestamp", "entry_time", "exit_time"))

  /** safety — frame-array with `people` detection array
    * (`basic_preprocessing_safety.py`). */
  val safety: DomainConfig = DomainConfig(
    name = "safety", wrapped = false, detectionsCol = "people",
    entityKey = Some("tracker_id"),
    defaults = Map(
      "safety_status" -> ("Unknown", "string"),
      "hardhat" -> ("false", "boolean"),
      "mask" -> ("false", "boolean"),
      "safety_vest" -> ("false", "boolean")),
    frameCols = Seq("frame_number"))

  /** pose — frame-array `pose_data`, no advanced stage
    * (`basic_preprocessing_pose.py`, excluded at `main.py:284`). */
  val pose: DomainConfig = DomainConfig(
    name = "pose", wrapped = false, detectionsCol = "pose_data",
    entityKey = None,
    renames = Map("frame" -> "frame_number"),
    frameCols = Seq("frame_number"))

  /** animal — frame-array, synthesized id from spatial bucket
    * (`advanced_preprocessing_animal.py:18-28`). */
  val animal: DomainConfig = DomainConfig(
    name = "animal", wrapped = false, detectionsCol = "detections",
    entityKey = Some("animal_id"), synthesizeId = true,
    frameCols = Seq("frame_number", "timestamp"))

  /** parking — wrapped document with dynamic-key `slots` map. The slots
    * struct is NOT a detection array: field names are data, so the
    * generic explode does not apply — `Sessionization.explodeSlots`
    * does the to_json/from_json map coercion (F9/G5) instead. */
  val parking: DomainConfig = DomainConfig(
    name = "parking", wrapped = true, detectionsCol = "",
    entityKey = Some("slot_id"),
    frameCols = Seq("frame_number", "timestamp_sec", "free_slots"))

  /** geolocation — flat detection array (no nesting), confidence filter,
    * no advanced stage (`basic_preprocessing_geolocation.py`). */
  val geolocation: DomainConfig = DomainConfig(
    name = "geolocation", wrapped = false, detectionsCol = "",
    entityKey = None,
    renames = Map("frame" -> "frame_number", "class" -> "class_name"),
    frameCols = Seq("frame_number"))

  /** common — flat tracked-detection array
    * (`basic_processing_common.py`). */
  val common: DomainConfig = DomainConfig(
    name = "common", wrapped = false, detectionsCol = "",
    entityKey = Some("object_id"), synthesizeId = true,
    frameCols = Seq("frame_number"))

  /** school — frame-array event layout (New_System,
    * `school/basic_preprocessing_school.py`). */
  val school: DomainConfig = DomainConfig(
    name = "school", wrapped = false, detectionsCol = "detections",
    entityKey = Some("event_id"),
    defaults = Map(
      "event_type" -> ("unknown", "string"),
      "alert_level" -> ("low", "string"),
      "response_required" -> ("false", "boolean"),
      "multiple_persons_involved" -> ("false", "boolean")),
    timestampCols = Seq("timestamp", "event_timestamp"))

  /** retail — frame-array product layout (New_System,
    * `retail/basic_preprocessing_retail.py`). */
  val retail: DomainConfig = DomainConfig(
    name = "retail", wrapped = false, detectionsCol = "detections",
    entityKey = Some("product_id"),
    defaults = Map(
      "product_name" -> ("unknown", "string"),
      "category" -> ("unknown", "string"),
      "location" -> ("unknown", "string"),
      "picked_by_customer" -> ("false", "boolean")),
    timestampCols = Seq("timestamp"))

  val all: Seq[DomainConfig] = Seq(vehicle, people, safety, pose, animal,
    parking, geolocation, common, school, retail)

  def byName(name: String): DomainConfig =
    all.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown domain: $name"))
}

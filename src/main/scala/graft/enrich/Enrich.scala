package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced preprocessing ("enrich"): flattened detection rows →
  * per-entity summary records (SURVEY.md §2.8 output schemas).
  *
  * The reference collects every entity's arrays to the driver and loops
  * in Python (`advanced_preprocessing.py:111-148`, D1-D9). Here each
  * metric is a window function or native aggregate over
  * `partitionBy(entity).orderBy(frame_number)` — one shuffle on the
  * entity key, everything else pipelined; scales with executors, not
  * driver memory.
  */
object Enrich {

  /** P4: valid-tracker filter. */
  def validEntities(key: String)(df: DataFrame): DataFrame =
    df.filter(col(key).isNotNull && col(key) =!= -1)

  private def w(key: String) =
    Window.partitionBy(col(key)).orderBy(col("frame_number"))

  private def wFull(key: String) =
    w(key).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** Seconds-valued event time: the parsed `timestamp` when present,
    * else frame_number (1 fps fallback, documented deviation). */
  private def tsSec(df: DataFrame): Column =
    if (df.columns.contains("timestamp"))
      col("timestamp").cast("double")
    else col("frame_number").cast("double")

  /** D1: Counter-compatible mode — count desc, first-seen asc tie-break
    * (Python's `Counter.most_common(1)` returns the first-inserted key
    * among ties). Returns (key, mode_<valueCol>). */
  def mode(df: DataFrame, key: String, valueCol: String,
      exclude: Seq[String] = Seq.empty): DataFrame = {
    val filtered = df.filter(col(valueCol).isNotNull &&
      (if (exclude.nonEmpty) !col(valueCol).isin(exclude: _*) else lit(true)))
    val counts = filtered.groupBy(col(key), col(valueCol))
      .agg(count(lit(1)).as("cnt"), min(col("frame_number")).as("first_seen"))
    // count desc, first-seen asc, value asc: the final value tie-break
    // pins ties where two values first appear in the same row (equal
    // count AND first_seen) — otherwise rank order is nondeterministic
    val rankW = Window.partitionBy(col(key))
      .orderBy(col("cnt").desc, col("first_seen"), col(valueCol))
    counts.withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1)
      .select(col(key), col(valueCol).as(s"mode_$valueCol"))
  }

  /** Frame-order-pinned first non-null attribute per entity: unlike a
    * bare `first(_, ignoreNulls)` over an unordered groupBy (whatever
    * partition finishes first wins), this is deterministic under ANY
    * repartitioning — the same pinning `vehicle` uses. The window
    * columns share one partitioning with the subsequent groupBy on the
    * same key, so pinning adds no extra shuffle. */
  private def pinnedFirst(key: String, c: String): Column =
    first(col(c), ignoreNulls = true).over(wFull(key))

  /** D2: sequential change count of `c` per entity in frame order. */
  private def changes(key: String, c: String): Column =
    sum(when(lag(col(c), 1).over(w(key)).isNotNull &&
      lag(col(c), 1).over(w(key)) =!= col(c), 1).otherwise(0))
      .over(wFull(key))

  /** Vehicle per-entity record (SURVEY §2.8 Vehicle,
    * `advanced_preprocessing_vehicle.py:55-170`). */
  def vehicle(flat: DataFrame): DataFrame = {
    val key = "tracker_id"
    val df = validEntities(key)(flat)
    val t = tsSec(df)
    val stepped = df
      .withColumn("_ts", t)
      .withColumn("_next_ts", lead(col("_ts"), 1).over(w(key)))
      .withColumn("_held", col("_next_ts") - col("_ts"))
      .withColumn("_prev_cx", lag(col("center_x"), 1).over(w(key)))
      .withColumn("_prev_cy", lag(col("center_y"), 1).over(w(key)))
      .withColumn("_dx", col("center_x") - col("_prev_cx"))
      .withColumn("_dy", col("center_y") - col("_prev_cy"))
      .withColumn("_step_dist", sqrt(col("_dx") * col("_dx") + col("_dy") * col("_dy")))
      .withColumn("_angle", when(col("_prev_cx").isNotNull,
        degrees(atan2(col("_dy"), col("_dx")))))
      .withColumn("_lane_changes", changes(key, "lane"))
      .withColumn("_dir_changes", changes(key, "direction"))
      .withColumn("_first_type", first(col("class_name"), ignoreNulls = true).over(wFull(key)))
      .withColumn("_first_color", first(col("vehicle_color"), ignoreNulls = true).over(wFull(key)))
      .withColumn("_initial_lane", first(col("lane"), ignoreNulls = true).over(wFull(key)))
      .withColumn("_final_lane", last(col("lane"), ignoreNulls = true).over(wFull(key)))
      .withColumn("_final_dir", last(col("direction"), ignoreNulls = true).over(wFull(key)))
    val perDir = stepped.filter(col("_held").isNotNull)
      .groupBy(col(key), col("direction"))
      .agg(sum(col("_held")).as("dir_secs"))
      .groupBy(col(key))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("direction"), col("dir_secs"))))).as("time_spent_per_direction"))
    val angles = stepped.filter(col("_angle").isNotNull)
      .groupBy(col(key))
      .agg(expr("transform(sort_array(collect_list(struct(frame_number, _angle))), p -> p._angle)")
        .as("movement_angles"),
        avg(col("_angle")).as("avg_movement_angle"))
    val base = stepped.groupBy(col(key)).agg(
      first(col("_first_type"), ignoreNulls = true).as("vehicle_type"),
      first(col("_first_color"), ignoreNulls = true).as("vehicle_color"),
      avg(col("confidence")).as("confidence_avg"),
      min(col("_ts")).as("first_detection"),
      max(col("_ts")).as("last_detection"),
      (max(col("_ts")) - min(col("_ts"))).as("duration_seconds"),
      sum(when(col("stopped") && col("_held").isNotNull, col("_held"))
        .otherwise(0.0)).as("stopped_duration"),
      count(lit(1)).as("frame_count"),
      avg(col("speed")).as("avg_speed"),
      max(col("speed")).as("max_speed"),
      min(col("speed")).as("min_speed"),
      coalesce(stddev_samp(col("speed")), lit(0.0)).as("speed_variation"),
      max(col("_lane_changes")).as("lane_changes"),
      first(col("_initial_lane"), ignoreNulls = true).as("initial_lane"),
      first(col("_final_lane"), ignoreNulls = true).as("final_lane"),
      (max(col("_lane_changes")) / count(lit(1))).as("lane_change_frequency"),
      sum(when(col("line_crossing"), 1).otherwise(0)).as("line_crossing_count"),
      first(col("_final_dir"), ignoreNulls = true).as("direction"),
      max(col("_dir_changes")).as("direction_changes"),
      sum(when(col("red_light_violation"), 1).otherwise(0)).as("red_light_violation_count"),
      sum(coalesce(col("_step_dist"), lit(0.0))).as("total_distance"))
    base
      .join(mode(df, key, "lane"), Seq(key), "left")
      .withColumnRenamed("mode_lane", "most_common_lane")
      .join(perDir, Seq(key), "left")
      .join(angles, Seq(key), "left")
      .orderBy(col(key))
  }

  /** People per-entity record (SURVEY §2.8 People,
    * `advanced_preprocessing_people.py:16-33,113-148`). */
  def people(flat: DataFrame): DataFrame = {
    val key = "tracker_id"
    val df = validEntities(key)(flat).withColumn("_ts", tsSec(flat))
    val base = df.groupBy(col(key)).agg(
      avg(col("confidence")).as("confidence_avg"),
      min(col("_ts")).as("first_detection"),
      max(col("_ts")).as("last_detection"),
      (max(col("_ts")) - min(col("_ts"))).as("duration_seconds"),
      count(lit(1)).as("frame_count"),
      // P11 boolean coalesce chain + D8 any-true
      (max(when(coalesce(col("in_restricted_area"),
        col("entered_restricted"), lit(false)), 1).otherwise(0)) === 1)
        .as("entered_restricted_area"),
      // D6 first matching timestamp
      min(when(col("in_restricted_area"), col("_ts"))).as("restricted_area_entry_time"))
    // D1 modes excluding ""/"Unknown" (reference filters before Counter);
    // when everything is filtered out the reference's get_most_frequent
    // returns "Unknown" (0 for the numeric age) — coalesce to match
    base
      .join(mode(df.filter(col("age") =!= 0), key, "age"), Seq(key), "left")
      .join(mode(df, key, "gender", Seq("", "Unknown")), Seq(key), "left")
      .join(mode(df, key, "carrying", Seq("", "Unknown")), Seq(key), "left")
      .withColumn("age", coalesce(col("mode_age"), lit(0L)))
      .withColumn("gender", coalesce(col("mode_gender"), lit("Unknown")))
      .withColumn("carrying", coalesce(col("mode_carrying"), lit("Unknown")))
      .select(col(key), col("age"), col("gender"), col("carrying"),
        col("confidence_avg"), col("entered_restricted_area"),
        col("restricted_area_entry_time"), col("first_detection"),
        col("last_detection"), col("duration_seconds"), col("frame_count"))
      .orderBy(col(key))
  }

  /** Safety per-entity record (SURVEY §2.8 Safety, D8 resolution,
    * `advanced_preprocessing_safety.py:40-97`). */
  def safety(flat: DataFrame): DataFrame = {
    val key = "tracker_id"
    val df = validEntities(key)(flat)
      .withColumn("_first_status", first(col("safety_status"), ignoreNulls = true).over(wFull(key)))
    val base = df.groupBy(col(key)).agg(
      first(col("_first_status"), ignoreNulls = true).as("initial_safety_status"),
      // "Safe" if ever safe, else "Unsafe" (D8)
      when(max(when(col("safety_status") === "Safe", 1).otherwise(0)) === 1, "Safe")
        .otherwise("Unsafe").as("safety_status"),
      (max(when(col("hardhat"), 1).otherwise(0)) === 1).as("hardhat"),
      (max(when(col("mask"), 1).otherwise(0)) === 1).as("mask"),
      (max(when(col("safety_vest"), 1).otherwise(0)) === 1).as("safety_vest"),
      count(lit(1)).as("total_frames"),
      (max(col("frame_number")) - min(col("frame_number"))).as("duration_frames"),
      sum(when(!col("hardhat"), 1).otherwise(0)).as("hardhat_violations"),
      sum(when(!col("mask"), 1).otherwise(0)).as("mask_violations"),
      sum(when(!col("safety_vest"), 1).otherwise(0)).as("safety_vest_violations"),
      sum(when(col("safety_status") === "Unsafe", 1).otherwise(0)).as("total_unsafe_frames"),
      count(col("bbox")).as("bbox_count"))
    val movement = df
      .withColumn("_pcx", lag(col("center_x"), 1).over(w(key)))
      .withColumn("_pcy", lag(col("center_y"), 1).over(w(key)))
      .withColumn("_step", sqrt(pow(col("center_x") - col("_pcx"), 2)
        + pow(col("center_y") - col("_pcy"), 2)))
      .groupBy(col(key))
      .agg(sum(coalesce(col("_step"), lit(0.0))).as("bbox_movement_estimate"))
    val missing = df.select(col(key), col("frame_number"),
      explode(col("missing_items")).as("missing_item"))
    base
      .join(mode(missing, key, "missing_item"), Seq(key), "left")
      .withColumnRenamed("mode_missing_item", "most_common_missing_item")
      .join(movement, Seq(key), "left")
      .orderBy(col(key))
  }

  /** Animal/common per-entity record (SURVEY §2.8 Animal/Common,
    * `advanced_preprocessing_animal.py:30-82` — implementing the evident
    * intent; the reference's dotted-name/missing-return bugs are fixed,
    * SURVEY §7.4 item 3). */
  def genericEntity(key: String)(flat: DataFrame): DataFrame = {
    val df = flat.filter(col(key).isNotNull).withColumn("_ts", tsSec(flat))
      .withColumn("_class_name", pinnedFirst(key, "class_name"))
    df.groupBy(col(key)).agg(
      first(col("_class_name"), ignoreNulls = true).as("class_name"),
      avg(col("confidence")).as("confidence_avg"),
      min(col("_ts")).as("first_detection"),
      max(col("_ts")).as("last_detection"),
      (max(col("_ts")) - min(col("_ts"))).as("duration_seconds"),
      count(lit(1)).as("frame_count"),
      expr("transform(sort_array(collect_list(struct(frame_number, bbox))), p -> p.bbox)")
        .as("bbox_list"),
      sort_array(collect_list(col("frame_number"))).as("frame_numbers"))
      .orderBy(col(key))
  }

  /** School per-event record (SURVEY §2.8 School event,
    * `school/advanced_preprocessing_school.py:41-88`). */
  def school(flat: DataFrame): DataFrame = {
    val key = "event_id"
    val df = flat.filter(col(key).isNotNull)
      // per-detection event duration; renamed so it can't collide with
      // the output's entity-level duration_seconds
      .withColumnRenamed("duration_seconds", "duration_seconds_det")
      .withColumn("_ts", tsSec(flat))
      .withColumn("_event_type", pinnedFirst(key, "event_type"))
      .withColumn("_location", pinnedFirst(key, "location"))
      .withColumn("_notes", pinnedFirst(key, "notes"))
    val base = df.groupBy(col(key)).agg(
      first(col("_event_type"), ignoreNulls = true).as("event_type"),
      first(col("_location"), ignoreNulls = true).as("location"),
      first(col("_notes"), ignoreNulls = true).as("notes"),
      min(col("_ts")).as("start_time"),
      max(col("_ts")).as("end_time"),
      (max(col("_ts")) - min(col("_ts"))).as("duration_seconds"),
      count(lit(1)).as("frame_occurrences"),
      avg(col("confidence")).as("avg_confidence"),
      avg(col("duration_seconds_det")).as("avg_event_duration"),
      coalesce(stddev_samp(col("duration_seconds_det")), lit(0.0)).as("event_duration_stddev"),
      (max(when(col("response_required"), 1).otherwise(0)) === 1).as("response_required"),
      sort_array(array_distinct(collect_list(col("involved_person_id")))).as("involved_persons"),
      sort_array(array_distinct(flatten(collect_list(col("person_roles"))))).as("unique_roles"),
      (max(when(col("multiple_persons_involved"), 1).otherwise(0)) === 1)
        .as("multiple_persons_involved"))
    val alertDist = df.groupBy(col(key), col("alert_level"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(key))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("alert_level"), col("n"))))).as("alert_level_distribution"))
    val roles = df.select(col(key), col("frame_number"),
      explode(col("person_roles")).as("role"))
    base
      .join(mode(df, key, "alert_level"), Seq(key), "left")
      .withColumnRenamed("mode_alert_level", "most_common_alert_level")
      .join(mode(roles, key, "role"), Seq(key), "left")
      .withColumnRenamed("mode_role", "most_common_role")
      .join(alertDist, Seq(key), "left")
      .orderBy(col(key))
  }

  /** D10 entity-map document assembly: the refined single-document
    * layout the reference writes to the refine zone — entities keyed by
    * id (sorted), wrapped with provenance
    * (`advanced_preprocessing.py:112-120`, S4 sink shape). The clock is
    * injectable for determinism (SURVEY §7.4 item 1). */
  def assembleDocument(refined: DataFrame, idCol: String, sourceFile: String,
      processingDateIso: String, version: String = "1.0"): DataFrame = {
    val payload = struct(refined.columns.filter(_ != idCol).map(col): _*)
    refined
      .select(col(idCol).cast("string").as("_k"), payload.as("_v"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("_k"), col("_v")))))
        .as("entities"))
      .withColumn("source_file", lit(sourceFile))
      .withColumn("processing_date", lit(processingDateIso))
      .withColumn("processing_version", lit(version))
  }

  /** Retail per-product record (SURVEY §2.8 Retail,
    * `retail/advanced_preprocessing_retail.py:34-58`). */
  def retail(flat: DataFrame): DataFrame = {
    val key = "product_id"
    flat.filter(col(key).isNotNull)
      .withColumn("_product_name", pinnedFirst(key, "product_name"))
      .withColumn("_category", pinnedFirst(key, "category"))
      .withColumn("_location", pinnedFirst(key, "location"))
      .groupBy(col(key)).agg(
        first(col("_product_name"), ignoreNulls = true).as("product_name"),
        first(col("_category"), ignoreNulls = true).as("category"),
        first(col("_location"), ignoreNulls = true).as("location"),
        avg(col("price")).as("average_price"),
        avg(col("stock_level")).as("average_stock_level"),
        (max(when(col("picked_by_customer"), 1).otherwise(0)) === 1).as("picked_by_customer"),
        sort_array(array_distinct(collect_list(col("expiry_date")))).as("unique_expiry_dates"),
        count(col("frame_number")).as("frame_appearances"))
      .orderBy(col(key))
  }
}

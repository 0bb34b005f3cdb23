package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, max}
import graft.operators._
import graft.registry.RegShared._

/** Domain-pipeline slice of the driver contract: the ten reference domains' enrich rollups and ES-shaped views.
  *
  * Split out of SparkEntry (r11): entries and oracle SQL move verbatim;
  * SparkEntry concatenates the family maps. Column names stay identical
  * between `queries` and `oracleSql` (the driver sorts columns by name
  * before hashing).
  */
object DomainReg {

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "domain_vehicle_enrich" -> DomainBridges.vehicleEnrich,
    "domain_slot_sessionize" -> DomainBridges.slotSessionize,
    "domain_people_enrich" -> DomainBridges.peopleEnrich,
    "domain_safety_enrich" -> DomainBridges.safetyEnrich,
    "domain_retail_enrich" -> DomainBridges.retailEnrich,
    "domain_school_enrich" -> DomainBridges.schoolEnrich,
    "view_people_es" -> DomainBridges.peopleEs,
    "view_safety_es" -> DomainBridges.safetyEs,
    "view_vehicle_legacy" -> DomainBridges.vehicleLegacy,
    "view_animal_es" -> DomainBridges.animalEs,
    "view_geolocation_es" -> DomainBridges.geoEs,
    "view_pose_es" -> DomainBridges.poseEs,
    "view_parking_es" -> DomainBridges.parkingEs,
    "view_common_es" -> DomainBridges.commonEs,
    "view_school_es" -> DomainBridges.schoolEs,
    "view_retail_es" -> DomainBridges.retailEs,
  )

  /** Mode-with-tie-break CTE pair over a `f(tracker_id, frame_number,…)`
    * relation: count desc, first-seen asc (D1 semantics). */
  private[graft] def modeCte(name: String, valueCol: String, exclude: Seq[String]): String = {
    val excl = if (exclude.isEmpty) ""
      else s" AND $valueCol NOT IN (${exclude.map(e => s"'$e'").mkString(", ")})"
    s"""m_$name AS (SELECT tracker_id, $valueCol AS v, count(*) AS cnt,
                    min(frame_number) AS fs FROM f
                    WHERE $valueCol IS NOT NULL$excl GROUP BY 1, 2),
        r_$name AS (SELECT tracker_id, v, row_number() OVER (PARTITION BY tracker_id
                    ORDER BY cnt DESC, fs, v) AS rn FROM m_$name),
        mode_$name AS (SELECT tracker_id, v AS $name FROM r_$name WHERE rn = 1)"""
  }

  private[graft] val peopleEnrichOracle: String =
    s"""WITH f AS (SELECT user_id AS tracker_id, event_id AS frame_number,
           CASE WHEN event_type = 'view' THEN 'Unknown' ELSE event_type END AS gender,
           'bag_' || CAST(user_id % 3 AS VARCHAR) AS carrying,
           CAST(CASE WHEN event_id % 50 = 0 THEN 1 ELSE 0 END AS BIGINT) AS age,
           (event_type = 'error') AS inr
           FROM events),
        base AS (SELECT tracker_id,
           (max(CASE WHEN inr THEN 1 ELSE 0 END) = 1) AS entered_restricted_area,
           min(CASE WHEN inr THEN CAST(frame_number AS DOUBLE) END)
             AS restricted_area_entry_time,
           CAST(min(frame_number) AS DOUBLE) AS first_detection,
           CAST(max(frame_number) AS DOUBLE) AS last_detection,
           CAST(max(frame_number) - min(frame_number) AS DOUBLE) AS duration_seconds,
           count(*) AS frame_count
           FROM f GROUP BY 1),
        ${modeCte("age_m", "age", Seq.empty).replace("age IS NOT NULL", "age IS NOT NULL AND age != 0")},
        ${modeCte("gender_m", "gender", Seq("", "Unknown"))},
        ${modeCte("carrying_m", "carrying", Seq("", "Unknown"))}
        SELECT b.tracker_id, coalesce(a.age_m, 0) AS age,
               coalesce(g.gender_m, 'Unknown') AS gender,
               coalesce(c.carrying_m, 'Unknown') AS carrying,
               b.entered_restricted_area,
               b.restricted_area_entry_time, b.first_detection,
               b.last_detection, b.duration_seconds, b.frame_count
        FROM base b
        LEFT JOIN mode_age_m a USING (tracker_id)
        LEFT JOIN mode_gender_m g USING (tracker_id)
        LEFT JOIN mode_carrying_m c USING (tracker_id)
        ORDER BY b.tracker_id"""

  private[graft] val safetyEnrichOracle: String =
    s"""WITH f AS (SELECT user_id AS tracker_id, event_id AS frame_number,
           CASE WHEN value > 250.0 THEN 'Safe' ELSE 'Unsafe' END AS safety_status,
           (value > 100.0) AS hardhat, (value > 200.0) AS mask,
           (value > 300.0) AS safety_vest, event_type AS missing_item
           FROM events),
        fv AS (SELECT tracker_id,
           first_value(safety_status) OVER (PARTITION BY tracker_id
             ORDER BY frame_number) AS iss
           FROM f),
        fv1 AS (SELECT tracker_id, min(iss) AS initial_safety_status FROM fv GROUP BY 1),
        base AS (SELECT tracker_id,
           CASE WHEN max(CASE WHEN safety_status = 'Safe' THEN 1 ELSE 0 END) = 1
                THEN 'Safe' ELSE 'Unsafe' END AS safety_status,
           (max(CASE WHEN hardhat THEN 1 ELSE 0 END) = 1) AS hardhat,
           (max(CASE WHEN mask THEN 1 ELSE 0 END) = 1) AS mask,
           (max(CASE WHEN safety_vest THEN 1 ELSE 0 END) = 1) AS safety_vest,
           count(*) AS total_frames,
           CAST(max(frame_number) - min(frame_number) AS BIGINT) AS duration_frames,
           CAST(sum(CASE WHEN NOT hardhat THEN 1 ELSE 0 END) AS BIGINT) AS hardhat_violations,
           CAST(sum(CASE WHEN NOT mask THEN 1 ELSE 0 END) AS BIGINT) AS mask_violations,
           CAST(sum(CASE WHEN NOT safety_vest THEN 1 ELSE 0 END) AS BIGINT)
             AS safety_vest_violations,
           CAST(sum(CASE WHEN safety_status = 'Unsafe' THEN 1 ELSE 0 END) AS BIGINT)
             AS total_unsafe_frames,
           count(*) AS bbox_count
           FROM f GROUP BY 1),
        ${modeCte("missing", "missing_item", Seq.empty)}
        SELECT b.tracker_id, f1.initial_safety_status, b.safety_status,
               b.hardhat, b.mask, b.safety_vest, b.total_frames,
               b.duration_frames, b.hardhat_violations, b.mask_violations,
               b.safety_vest_violations, b.total_unsafe_frames,
               m.missing AS most_common_missing_item, b.bbox_count
        FROM base b
        JOIN fv1 f1 USING (tracker_id)
        LEFT JOIN mode_missing m USING (tracker_id)
        ORDER BY b.tracker_id"""

  private[graft] val peopleEsOracle: String =
    s"""WITH f AS (SELECT user_id AS tracker_id, event_id AS frame_number,
           CASE WHEN event_type = 'view' THEN 'Unknown' ELSE event_type END AS gender,
           'bag_' || CAST(user_id % 3 AS VARCHAR) AS carrying,
           CAST(CASE WHEN event_id % 50 = 0 THEN 1 ELSE 0 END AS BIGINT) AS age,
           (event_type = 'error') AS inr
           FROM events),
        base AS (SELECT tracker_id,
           (max(CASE WHEN inr THEN 1 ELSE 0 END) = 1) AS entered_restricted_area,
           min(CASE WHEN inr THEN CAST(frame_number AS DOUBLE) END)
             AS restricted_area_entry_time,
           CAST(min(frame_number) AS DOUBLE) AS first_detection,
           CAST(max(frame_number) AS DOUBLE) AS last_detection,
           CAST(max(frame_number) - min(frame_number) AS DOUBLE) AS duration_seconds,
           count(*) AS frame_count
           FROM f GROUP BY 1),
        ${modeCte("age_m", "age", Seq.empty).replace("age IS NOT NULL", "age IS NOT NULL AND age != 0")},
        ${modeCte("gender_m", "gender", Seq("", "Unknown"))},
        ${modeCte("carrying_m", "carrying", Seq("", "Unknown"))}
        SELECT b.tracker_id AS people_id, coalesce(a.age_m, 0) AS age,
               coalesce(g.gender_m, 'Unknown') AS gender,
               coalesce(c.carrying_m, 'Unknown') AS carrying,
               b.entered_restricted_area,
               b.restricted_area_entry_time,
               b.first_detection AS entry_time,
               b.last_detection AS exit_time,
               b.duration_seconds, b.frame_count
        FROM base b
        LEFT JOIN mode_age_m a USING (tracker_id)
        LEFT JOIN mode_gender_m g USING (tracker_id)
        LEFT JOIN mode_carrying_m c USING (tracker_id)
        ORDER BY b.tracker_id"""

  private[graft] val safetyEsOracle: String =
    """SELECT user_id AS tracker_id, event_id AS frame_number,
              (value > 100.0) AS wearing_hardhat,
              (value > 200.0) AS wearing_mask,
              (value > 300.0) AS wearing_safety_vest,
              CASE WHEN value > 250.0 THEN 'Safe' ELSE 'Unsafe' END
                AS safety_status,
              event_type AS missing_items,
              CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || ',' ||
              CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || ',' ||
              CAST(CAST(round((value + 10.0) * 100) AS BIGINT) AS VARCHAR) || ',' ||
              CAST(CAST(round((value + 10.0) * 100) AS BIGINT) AS VARCHAR)
                AS bbox_cents
       FROM events ORDER BY tracker_id, frame_number"""

  private[graft] val vehicleLegacyOracle: String =
    s"""WITH f AS (SELECT user_id AS tracker_id, event_id AS frame_number,
           event_id % 3 AS class_id,
           'vt_' || CAST(event_id % 4 AS VARCHAR) AS vehicle_type,
           'c_' || CAST(event_id % 5 AS VARCHAR) AS vehicle_color,
           CASE WHEN value > 250.0 THEN 'north' ELSE 'south' END
             AS vehicle_direction,
           'lane_' || CAST(event_id % 3 AS VARCHAR) AS vehicle_lane,
           CAST(user_id % 8 AS DOUBLE) * 0.125 AS confidence,
           CAST(event_id % 50 AS DOUBLE) AS vehicle_speed
           FROM events),
        avgs AS (SELECT tracker_id,
           coalesce(avg(confidence), 0.0) AS average_confidence,
           coalesce(avg(vehicle_speed), 0.0) AS average_speed
           FROM f GROUP BY 1),
        ${modeCte("class_id_m", "class_id", Seq.empty)},
        ${modeCte("vehicle_type_m", "vehicle_type", Seq.empty)},
        ${modeCte("vehicle_color_m", "vehicle_color", Seq.empty)},
        ${modeCte("vehicle_direction_m", "vehicle_direction", Seq.empty)},
        ${modeCte("vehicle_lane_m", "vehicle_lane", Seq.empty)}
        SELECT a.tracker_id, c1.class_id_m AS class_id,
               t.vehicle_type_m AS vehicle_type,
               c2.vehicle_color_m AS vehicle_color,
               d.vehicle_direction_m AS vehicle_direction,
               l.vehicle_lane_m AS vehicle_lane,
               a.average_confidence, a.average_speed
        FROM avgs a
        LEFT JOIN mode_class_id_m c1 USING (tracker_id)
        LEFT JOIN mode_vehicle_type_m t USING (tracker_id)
        LEFT JOIN mode_vehicle_color_m c2 USING (tracker_id)
        LEFT JOIN mode_vehicle_direction_m d USING (tracker_id)
        LEFT JOIN mode_vehicle_lane_m l USING (tracker_id)
        ORDER BY a.tracker_id"""

  private[graft] val oracleSql: Map[String, String] = Map(
    "domain_vehicle_enrich" ->
      """WITH f AS (SELECT user_id AS tracker_id, event_id AS frame_number,
                    event_type AS lane, value,
                    (value > 400.0) AS stopped, (value > 250.0) AS line_crossing,
                    (event_type = 'error') AS red_light,
                    CASE WHEN user_id % 2 = 0 THEN 'Up' ELSE 'Down' END AS direction
                    FROM events),
         w AS (SELECT *, lag(lane) OVER win AS prev_lane,
                      lag(direction) OVER win AS prev_dir,
                      lead(CAST(frame_number AS DOUBLE)) OVER win
                        - CAST(frame_number AS DOUBLE) AS held
               FROM f WINDOW win AS (PARTITION BY tracker_id ORDER BY frame_number)),
         base AS (SELECT tracker_id, count(*) AS frame_count,
                    CAST(max(frame_number) - min(frame_number) AS DOUBLE) AS duration_seconds,
                    coalesce(sum(CASE WHEN stopped THEN held END), 0.0) AS stopped_duration,
                    CAST(sum(CASE WHEN prev_lane IS NOT NULL AND prev_lane <> lane
                                  THEN 1 ELSE 0 END) AS BIGINT) AS lane_changes,
                    CAST(sum(CASE WHEN prev_dir IS NOT NULL AND prev_dir <> direction
                                  THEN 1 ELSE 0 END) AS BIGINT) AS direction_changes,
                    CAST(sum(CASE WHEN line_crossing THEN 1 ELSE 0 END) AS BIGINT)
                      AS line_crossing_count,
                    CAST(sum(CASE WHEN red_light THEN 1 ELSE 0 END) AS BIGINT)
                      AS red_light_violation_count
                  FROM w GROUP BY 1),
         fl AS (SELECT tracker_id,
                  first_value(lane) OVER (PARTITION BY tracker_id
                    ORDER BY frame_number) AS il,
                  last_value(lane) OVER (PARTITION BY tracker_id ORDER BY frame_number
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fn
                FROM f),
         fl1 AS (SELECT tracker_id, min(il) AS initial_lane, min(fn) AS final_lane
                 FROM fl GROUP BY 1),
         m AS (SELECT tracker_id, lane, count(*) AS cnt, min(frame_number) AS fs
               FROM f GROUP BY 1, 2),
         mr AS (SELECT tracker_id, lane AS most_common_lane,
                       row_number() OVER (PARTITION BY tracker_id
                         ORDER BY cnt DESC, fs, lane) AS rn FROM m)
         SELECT b.tracker_id, 'car' AS vehicle_type, b.frame_count,
                b.duration_seconds, b.stopped_duration, b.lane_changes,
                f1.initial_lane, f1.final_lane, mm.most_common_lane,
                b.direction_changes, b.line_crossing_count,
                b.red_light_violation_count
         FROM base b
         JOIN fl1 f1 USING (tracker_id)
         JOIN (SELECT tracker_id, most_common_lane FROM mr WHERE rn = 1) mm
           USING (tracker_id)
         ORDER BY b.tracker_id""",
    "domain_slot_sessionize" ->
      """WITH s AS (SELECT CAST(user_id AS VARCHAR) AS slot_id,
                    CAST(epoch_us(ts) AS DOUBLE) AS tsec,
                    (value > 100.0) AS occupied FROM events),
         w AS (SELECT *, lag(occupied) OVER win AS prev,
                      coalesce(lead(tsec) OVER win - tsec, 0.0) AS held
               FROM s WINDOW win AS (PARTITION BY slot_id ORDER BY tsec))
         SELECT slot_id,
                CAST(sum(CASE WHEN prev IS NOT NULL AND prev AND NOT occupied
                              THEN 1 ELSE 0 END) AS BIGINT) AS became_free,
                CAST(sum(CASE WHEN prev IS NOT NULL AND NOT prev AND occupied
                              THEN 1 ELSE 0 END) AS BIGINT) AS became_occupied,
                sum(CASE WHEN occupied THEN held ELSE 0.0 END) AS total_occupied_seconds,
                sum(CASE WHEN NOT occupied THEN held ELSE 0.0 END) AS total_free_seconds,
                CASE WHEN arg_max(occupied, tsec) THEN 'occupied' ELSE 'free' END
                  AS slot_status,
                CAST(sum(CASE WHEN occupied AND (prev IS NULL OR NOT prev)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_parking_sessions
         FROM w GROUP BY 1 ORDER BY 1""",
    "domain_people_enrich" -> peopleEnrichOracle,
    "domain_safety_enrich" -> safetyEnrichOracle,
    "view_people_es" -> peopleEsOracle,
    "view_safety_es" -> safetyEsOracle,
    "view_vehicle_legacy" -> vehicleLegacyOracle,
    // stamp-only serving domains (S8): 1700000000000000 µs =
    // 2023-11-14T22:13:20Z, the bridges' pinned harness clock
    "view_animal_es" ->
      """SELECT 1700000000000000 AS ts_us,
                'animal_refined.json' AS source_file,
                '2023-11-14' AS processing_date,
                'v1.0' AS processing_version,
                event_id AS frame_number, user_id AS tracker_id,
                'animal_' || CAST(user_id % 6 AS VARCHAR) AS animal_type,
                CAST(event_id % 16 AS DOUBLE) * 0.0625 AS confidence,
                value AS center_x, value * 2.0 AS center_y
         FROM events ORDER BY frame_number, tracker_id""",
    "view_geolocation_es" ->
      """SELECT 1700000000000000 AS ts_us,
                'geolocation_refined.json' AS source_file,
                '2023-11-14' AS processing_date,
                'v1.0' AS processing_version,
                event_id AS frame_number, user_id AS tracker_id,
                value * 0.125 AS latitude,
                value * 0.25 - 64.0 AS longitude,
                event_type AS zone
         FROM events ORDER BY frame_number, tracker_id""",
    "view_pose_es" ->
      """SELECT 1700000000000000 AS ts_us,
                'pose_refined.json' AS source_file,
                '2023-11-14' AS processing_date,
                'v1.0' AS processing_version,
                event_id AS frame_number,
                'act_' || CAST(user_id % 5 AS VARCHAR) AS action,
                CAST(event_id % 8 AS DOUBLE) * 0.125 AS confidence,
                value AS kp_x, value * 2.0 AS kp_y, value * 0.5 AS kp_z
         FROM events ORDER BY frame_number, action""",
    "view_parking_es" ->
      """WITH s AS (SELECT CAST(user_id AS VARCHAR) AS slot_id,
                    CAST(epoch_us(ts) AS DOUBLE) AS tsec,
                    (value > 100.0) AS occupied FROM events),
         w AS (SELECT *, lag(occupied) OVER win AS prev,
                      coalesce(lead(tsec) OVER win - tsec, 0.0) AS held
               FROM s WINDOW win AS (PARTITION BY slot_id ORDER BY tsec))
         SELECT 1700000000000000 AS ts_us,
                'parking_refined.json' AS source_file,
                '2023-11-14' AS processing_date,
                'v1.0' AS processing_version,
                slot_id,
                CASE WHEN arg_max(occupied, tsec) THEN 'occupied' ELSE 'free' END
                  AS slot_status,
                CAST(sum(CASE WHEN prev IS NOT NULL AND prev AND NOT occupied
                              THEN 1 ELSE 0 END) AS BIGINT) AS became_free,
                CAST(sum(CASE WHEN prev IS NOT NULL AND NOT prev AND occupied
                              THEN 1 ELSE 0 END) AS BIGINT) AS became_occupied,
                sum(CASE WHEN occupied THEN held ELSE 0.0 END) AS total_occupied_seconds,
                sum(CASE WHEN NOT occupied THEN held ELSE 0.0 END) AS total_free_seconds,
                CAST(sum(CASE WHEN occupied AND (prev IS NULL OR NOT prev)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_parking_sessions
         FROM w GROUP BY slot_id ORDER BY slot_id""",
    "view_common_es" ->
      """SELECT 1700000000000000 AS ts_us,
                'common_refined.json' AS source_file,
                '2023-11-14' AS processing_date,
                'v1.0' AS processing_version,
                event_id AS frame_number, event_type AS object_class,
                CAST(user_id % 32 AS DOUBLE) * 0.03125 AS confidence
         FROM events ORDER BY frame_number, object_class, confidence""",
    "domain_school_enrich" ->
      """WITH f AS (SELECT user_id AS eid, event_id AS frame_number,
             'type_' || CAST(user_id % 4 AS VARCHAR) AS event_type,
             'loc_' || CAST(user_id % 5 AS VARCHAR) AS location,
             'note' AS notes,
             CAST(user_id % 8 AS DOUBLE) * 0.125 AS confidence,
             CAST(user_id % 4 AS DOUBLE) AS dur_det,
             (value > 480.0) AS response_required,
             'p' || CAST(event_id % 7 AS VARCHAR) AS involved_person_id,
             ['r' || CAST(event_id % 3 AS VARCHAR),
              'r' || CAST(event_id % 5 AS VARCHAR)] AS person_roles,
             event_type AS alert_level,
             (value > 250.0) AS multi
           FROM events),
         base AS (SELECT eid,
             min(event_type) AS event_type, min(location) AS location,
             min(notes) AS notes,
             CAST(min(frame_number) AS DOUBLE) AS start_time,
             CAST(max(frame_number) AS DOUBLE) AS end_time,
             CAST(max(frame_number) - min(frame_number) AS DOUBLE)
               AS duration_seconds,
             count(*) AS frame_occurrences,
             avg(confidence) AS avg_confidence,
             avg(dur_det) AS avg_event_duration,
             coalesce(stddev_samp(dur_det), 0.0) AS event_duration_stddev,
             (max(CASE WHEN response_required THEN 1 ELSE 0 END) = 1)
               AS response_required,
             array_to_string(list_sort(list_distinct(list(involved_person_id))), ',')
               AS involved_persons,
             array_to_string(list_sort(list_distinct(flatten(list(person_roles)))), ',')
               AS unique_roles,
             (max(CASE WHEN multi THEN 1 ELSE 0 END) = 1)
               AS multiple_persons_involved
           FROM f GROUP BY 1),
         ma AS (SELECT eid, alert_level, count(*) AS cnt,
                       min(frame_number) AS fs FROM f
                WHERE alert_level IS NOT NULL GROUP BY 1, 2),
         mar AS (SELECT eid, alert_level, row_number() OVER (
                   PARTITION BY eid ORDER BY cnt DESC, fs, alert_level) AS rn
                 FROM ma),
         ro AS (SELECT eid, frame_number, unnest(person_roles) AS role
                FROM f),
         mo AS (SELECT eid, role, count(*) AS cnt,
                       min(frame_number) AS fs FROM ro
                WHERE role IS NOT NULL GROUP BY 1, 2),
         mor AS (SELECT eid, role, row_number() OVER (
                   PARTITION BY eid ORDER BY cnt DESC, fs, role) AS rn FROM mo)
         SELECT b.eid AS event_id, b.event_type, b.location, b.notes,
                b.start_time, b.end_time, b.duration_seconds,
                b.frame_occurrences, b.avg_confidence, b.avg_event_duration,
                b.event_duration_stddev, b.response_required,
                b.involved_persons, b.unique_roles,
                b.multiple_persons_involved,
                a.alert_level AS most_common_alert_level,
                r.role AS most_common_role
         FROM base b
         LEFT JOIN (SELECT eid, alert_level FROM mar WHERE rn = 1) a
           USING (eid)
         LEFT JOIN (SELECT eid, role FROM mor WHERE rn = 1) r
           USING (eid)
         ORDER BY b.eid""",
    "domain_retail_enrich" ->
      """WITH f AS (SELECT 'p' || CAST(user_id % 7 AS VARCHAR) AS product_id,
                    'name_' || CAST(user_id % 7 AS VARCHAR) AS product_name,
                    'cat_' || CAST(user_id % 7 AS VARCHAR) AS category,
                    'aisle' AS location,
                    (value > 450.0) AS picked,
                    strftime(ts, '%Y-%m-%d') AS expiry_date
                    FROM events)
         SELECT product_id, min(product_name) AS product_name,
                min(category) AS category, min(location) AS location,
                (max(CASE WHEN picked THEN 1 ELSE 0 END) = 1) AS picked_by_customer,
                array_to_string(list_sort(list_distinct(list(expiry_date))), ',')
                  AS unique_expiry_dates,
                count(*) AS frame_appearances
         FROM f GROUP BY 1 ORDER BY 1""",
    // datalake-school-data serving records: the domain_school_enrich
    // rollup under the ingest stamp, keyed by detection_id, plus the
    // alert-level distribution serialized as canonical JSON
    // (README.md:4-41 mapping, common.py:81-82 keying).
    "view_school_es" ->
      """WITH f AS (SELECT user_id AS eid, event_id AS frame_number,
             'type_' || CAST(user_id % 4 AS VARCHAR) AS event_type,
             'loc_' || CAST(user_id % 5 AS VARCHAR) AS location,
             'note' AS notes,
             CAST(user_id % 8 AS DOUBLE) * 0.125 AS confidence,
             CAST(user_id % 4 AS DOUBLE) AS dur_det,
             (value > 480.0) AS response_required,
             'p' || CAST(event_id % 7 AS VARCHAR) AS involved_person_id,
             ['r' || CAST(event_id % 3 AS VARCHAR),
              'r' || CAST(event_id % 5 AS VARCHAR)] AS person_roles,
             event_type AS alert_level,
             (value > 250.0) AS multi
           FROM events),
         base AS (SELECT eid,
             min(event_type) AS event_type, min(location) AS location,
             min(notes) AS notes,
             CAST(min(frame_number) AS DOUBLE) AS start_time,
             CAST(max(frame_number) AS DOUBLE) AS end_time,
             CAST(max(frame_number) - min(frame_number) AS DOUBLE)
               AS duration_seconds,
             count(*) AS frame_occurrences,
             avg(confidence) AS avg_confidence,
             avg(dur_det) AS avg_event_duration,
             coalesce(stddev_samp(dur_det), 0.0) AS event_duration_stddev,
             (max(CASE WHEN response_required THEN 1 ELSE 0 END) = 1)
               AS response_required,
             array_to_string(list_sort(list_distinct(list(involved_person_id))), ',')
               AS involved_persons,
             array_to_string(list_sort(list_distinct(flatten(list(person_roles)))), ',')
               AS unique_roles,
             (max(CASE WHEN multi THEN 1 ELSE 0 END) = 1)
               AS multiple_persons_involved
           FROM f GROUP BY 1),
         ma AS (SELECT eid, alert_level, count(*) AS cnt,
                       min(frame_number) AS fs FROM f
                WHERE alert_level IS NOT NULL GROUP BY 1, 2),
         ad AS (SELECT eid, '{' || string_agg(
                    '"' || alert_level || '":' || CAST(cnt AS VARCHAR),
                    ',' ORDER BY alert_level) || '}' AS alert_level_distribution
                FROM ma GROUP BY 1),
         mar AS (SELECT eid, alert_level, row_number() OVER (
                   PARTITION BY eid ORDER BY cnt DESC, fs, alert_level) AS rn
                 FROM ma),
         ro AS (SELECT eid, frame_number, unnest(person_roles) AS role
                FROM f),
         mo AS (SELECT eid, role, count(*) AS cnt,
                       min(frame_number) AS fs FROM ro
                WHERE role IS NOT NULL GROUP BY 1, 2),
         mor AS (SELECT eid, role, row_number() OVER (
                   PARTITION BY eid ORDER BY cnt DESC, fs, role) AS rn FROM mo)
         SELECT 1700000000000000 AS ts_us,
                'school_refined.json' AS source_file,
                '2023-11-14' AS processing_date,
                'v1.0' AS processing_version,
                CAST(b.eid AS INTEGER) AS detection_id,
                b.event_type, b.location, b.notes,
                b.start_time, b.end_time, b.duration_seconds,
                b.frame_occurrences, b.avg_confidence, b.avg_event_duration,
                b.event_duration_stddev, b.response_required,
                a.alert_level AS most_common_alert_level,
                d.alert_level_distribution,
                b.involved_persons, b.unique_roles,
                r.role AS most_common_role,
                b.multiple_persons_involved
         FROM base b
         LEFT JOIN (SELECT eid, alert_level FROM mar WHERE rn = 1) a
           USING (eid)
         LEFT JOIN (SELECT eid, role FROM mor WHERE rn = 1) r
           USING (eid)
         LEFT JOIN ad d USING (eid)
         ORDER BY detection_id""",
    // datalake-retail-data serving records (README.md:44-66 mapping):
    // the domain_retail_enrich rollup under the stamp plus the exact
    // binary-fraction averages; detection_id derives from the product
    // key (the reference's int() on "p3" would crash — PARITY fix).
    "view_retail_es" ->
      """WITH f AS (SELECT 'p' || CAST(user_id % 7 AS VARCHAR) AS product_id,
              'name_' || CAST(user_id % 7 AS VARCHAR) AS product_name,
              'cat_' || CAST(user_id % 7 AS VARCHAR) AS category,
              'aisle' AS location,
              round(value * 4) / 32.0 AS price,
              round(value) AS stock_level,
              (value > 450.0) AS picked,
              strftime(ts, '%Y-%m-%d') AS expiry_date
           FROM events)
         SELECT 1700000000000000 AS ts_us,
                'retail_refined.json' AS source_file,
                '2023-11-14' AS processing_date,
                'v1.0' AS processing_version,
                CAST(regexp_replace(product_id, '[^0-9]', '', 'g') AS INTEGER)
                  AS detection_id,
                min(product_name) AS product_name, min(category) AS category,
                min(location) AS location,
                avg(price) AS average_price,
                avg(stock_level) AS average_stock_level,
                (max(CASE WHEN picked THEN 1 ELSE 0 END) = 1)
                  AS picked_by_customer,
                array_to_string(list_sort(list_distinct(list(expiry_date))), ',')
                  AS unique_expiry_dates,
                count(*) AS frame_appearances
         FROM f GROUP BY product_id ORDER BY detection_id""",
  )
}

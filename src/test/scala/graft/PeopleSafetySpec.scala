package graft

import graft.normalize.Normalize
import graft.enrich.Enrich
import graft.schema.DomainConfig

/** Golden-output specs for people (wrapped layout, restricted-area
  * semantics, mode-with-exclusion) and safety (boolean resolution,
  * violations, movement estimate). */
class PeopleSafetySpec extends SparkSpec {

  private val peopleFixture =
    """{"video_metadata": {"filename": "a.mp4", "duration_seconds": 10.0},
       "processing_time": "2025-05-06 06:41:20 UTC",
       "summary": {"total_people": 2, "fps": 30.0},
       "frame_detections": [
         {"frame_number": 0, "timestamp": "2025-05-06 06:41:00",
          "detections": [
            {"tracker_id": 2, "class_id": 0, "class_name": "person", "confidence": 0.9,
             "bbox": [10.0, 20.0, 110.0, 220.0], "in_restricted_area": false,
             "gender": "Unknown", "age": 30, "carrying": "backpack",
             "entry_time": "2025-05-06 06:41:00+05:30", "entered_restricted": false},
            {"tracker_id": 3, "class_id": 0, "class_name": "person", "confidence": 0.6,
             "bbox": [50.0, 60.0, 150.0, 260.0], "in_restricted_area": false,
             "gender": "Man", "age": 41, "carrying": "Unknown",
             "entry_time": "2025-05-06 06:41:00", "entered_restricted": false}]},
         {"frame_number": 1, "timestamp": "2025-05-06 06:41:05",
          "detections": [
            {"tracker_id": 2, "class_id": 0, "class_name": "person", "confidence": 0.7,
             "bbox": [15.0, 25.0, 115.0, 225.0], "in_restricted_area": true,
             "gender": "Woman", "age": 30, "carrying": "backpack",
             "entry_time": "2025-05-06 06:41:00", "entered_restricted": true}]},
         {"frame_number": 2, "timestamp": "2025-05-06 06:41:10", "detections": []}
       ]}"""

  test("people: wrapped unwrap + restricted-area + excluded-mode semantics") {
    val flat = Normalize.flatten(DomainConfig.people)(readJsonFixture(peopleFixture))
    val byId = rowsByKey[Long](Enrich.people(flat), "tracker_id")
    assert(byId.keySet == Set(2L, 3L))
    val p2 = byId(2L)
    assert(p2.getAs[Boolean]("entered_restricted_area"))
    assert(p2.getAs[Long]("frame_count") == 2)
    assert(p2.getAs[Double]("duration_seconds") == 5.0)
    // D6: first restricted timestamp = frame 1's epoch
    assert(p2.getAs[Double]("restricted_area_entry_time")
      == p2.getAs[Double]("last_detection"))
    // D1 with exclusion: "Unknown" gender dropped → Woman wins
    assert(p2.getAs[String]("gender") == "Woman")
    assert(p2.getAs[String]("carrying") == "backpack")
    assert(p2.getAs[Long]("age") == 30)
    val p3 = byId(3L)
    assert(!p3.getAs[Boolean]("entered_restricted_area"))
    assert(p3.getAs[String]("gender") == "Man")
    // carrying "Unknown" excluded and nothing else seen → reference's
    // get_most_frequent falls back to "Unknown" (PARITY #11)
    assert(p3.getAs[String]("carrying") == "Unknown")
  }

  test("D10 document assembly: entities keyed by id + provenance (S4 shape)") {
    val flat = Normalize.flatten(DomainConfig.people)(readJsonFixture(peopleFixture))
    val doc = Enrich.assembleDocument(Enrich.people(flat), "tracker_id",
      "people1.json", "2025-05-06T06:41:20Z").collect().head
    val entities = doc.getAs[collection.Map[String, org.apache.spark.sql.Row]]("entities")
    assert(entities.keySet == Set("2", "3"))
    assert(entities("2").getAs[String]("gender") == "Woman")
    assert(doc.getAs[String]("source_file") == "people1.json")
    assert(doc.getAs[String]("processing_date") == "2025-05-06T06:41:20Z")
    assert(doc.getAs[String]("processing_version") == "1.0")
  }

  private val safetyFixture =
    """[
      {"frame_number": 0, "people": [
        {"tracker_id": 45, "hardhat": true, "mask": false, "safety_vest": true,
         "safety_status": "Unsafe", "missing_items": ["mask"],
         "bbox": [100.0, 100.0, 200.0, 300.0]}]},
      {"frame_number": 1, "people": [
        {"tracker_id": 45, "hardhat": true, "mask": false, "safety_vest": false,
         "safety_status": "Unsafe", "missing_items": ["mask", "safety_vest"],
         "bbox": [110.0, 100.0, 210.0, 300.0]}]},
      {"frame_number": 2, "people": [
        {"tracker_id": 45, "hardhat": true, "mask": true, "safety_vest": true,
         "safety_status": "Safe", "missing_items": [],
         "bbox": [120.0, 100.0, 220.0, 300.0]}]}
    ]"""

  test("safety: D8 resolution, violation counts, movement estimate") {
    val flat = Normalize.flatten(DomainConfig.safety)(readJsonFixture(safetyFixture))
    val out = Enrich.safety(flat).collect()
    assert(out.length == 1)
    val s = out.head
    assert(s.getAs[String]("initial_safety_status") == "Unsafe")
    assert(s.getAs[String]("safety_status") == "Safe") // ever-safe → Safe
    assert(s.getAs[Boolean]("hardhat") && s.getAs[Boolean]("mask")
      && s.getAs[Boolean]("safety_vest"))
    assert(s.getAs[Long]("total_frames") == 3)
    assert(s.getAs[Long]("duration_frames") == 2)
    assert(s.getAs[Long]("hardhat_violations") == 0)
    assert(s.getAs[Long]("mask_violations") == 2)
    assert(s.getAs[Long]("safety_vest_violations") == 1)
    assert(s.getAs[Long]("total_unsafe_frames") == 2)
    assert(s.getAs[String]("most_common_missing_item") == "mask")
    // centers move +10px in x per frame → 2 steps of 10
    assert(math.abs(s.getAs[Double]("bbox_movement_estimate") - 20.0) < 1e-9)
  }
}

package graft

import org.apache.spark.sql.Row
import graft.enrich.Sessionization
import graft.normalize.Normalize

/** Hand-computed golden spec for parking-slot sessionization (D9). */
class SessionizationSpec extends SparkSpec {

  // slot 1: occupied, free, occupied, occupied → 1 became_free,
  // 1 became_occupied, sessions [occ 0-0][free 1-1][occ 2-3];
  // slot 2: free throughout.
  private val fixture =
    """{"video_metadata": {"width": 1280, "height": 720, "fps": 30.0},
       "parking_config": {"total_slots": 2, "detection_method": "manual"},
       "frame_detections": [
         {"frame_number": 0, "timestamp_sec": 0.0, "free_slots": 1,
          "slots": {"1": {"occupied": true,  "bbox": [10.0, 10.0, 50.0, 100.0]},
                    "2": {"occupied": false, "bbox": [70.0, 10.0, 50.0, 100.0]}}},
         {"frame_number": 1, "timestamp_sec": 1.0, "free_slots": 2,
          "slots": {"1": {"occupied": false, "bbox": [10.0, 10.0, 50.0, 100.0]},
                    "2": {"occupied": false, "bbox": [70.0, 10.0, 50.0, 100.0]}}},
         {"frame_number": 2, "timestamp_sec": 2.0, "free_slots": 1,
          "slots": {"1": {"occupied": true,  "bbox": [10.0, 10.0, 50.0, 100.0]},
                    "2": {"occupied": false, "bbox": [70.0, 10.0, 50.0, 100.0]}}},
         {"frame_number": 3, "timestamp_sec": 3.0, "free_slots": 1,
          "slots": {"1": {"occupied": true,  "bbox": [10.0, 10.0, 50.0, 100.0]},
                    "2": {"occupied": false, "bbox": [70.0, 10.0, 50.0, 100.0]}}}
       ]}"""

  test("slot map coercion + single-pass sessionization (D9)") {
    val frames = Normalize.unwrap(readJsonFixture(fixture))
    val rollup = Sessionization(frames)
    val byId = rowsByKey[String](rollup, "slot_id")
    assert(byId.keySet == Set("1", "2"))

    val s1 = byId("1")
    assert(s1.getAs[Long]("became_free") == 1)
    assert(s1.getAs[Long]("became_occupied") == 1)
    assert(s1.getAs[Double]("total_occupied_seconds") == 2.0) // t0→t1, t2→t3
    assert(s1.getAs[Double]("total_free_seconds") == 1.0)     // t1→t2
    assert(s1.getAs[String]("slot_status") == "occupied")
    assert(math.abs(s1.getAs[Double]("free_percentage") - 100.0 / 3) < 1e-9)
    val sess1 = s1.getAs[collection.Seq[Row]]("parking_sessions")
    assert(sess1.map(r => (r.getAs[Double]("entry_time"), r.getAs[Double]("exit_time"),
      r.getAs[Double]("duration"))) == Seq((0.0, 0.0, 0.0), (2.0, 3.0, 1.0)))

    val cfg = Sessionization.configSummary(
      Sessionization.explodeSlots(frames)).collect().head
    assert(cfg.getAs[Long]("total_slots") == 2)
    assert(cfg.getAs[Long]("free_slots") == 1)     // slot 2 free at t3
    assert(cfg.getAs[Long]("final_occupancy") == 1) // slot 1 occupied at t3

    val s2 = byId("2")
    assert(s2.getAs[Long]("became_free") == 0)
    assert(s2.getAs[Long]("became_occupied") == 0)
    assert(s2.getAs[Double]("total_free_seconds") == 3.0)
    assert(s2.getAs[Double]("free_percentage") == 100.0)
    assert(s2.getAs[String]("slot_status") == "free")
    assert(s2.getAs[collection.Seq[Row]]("parking_sessions").isEmpty)

    // nested document shape (§2.8): structs wrap the same values
    val doc = graft.enrich.Sessionization
      .slotDocuments(rollup)
      .filter(org.apache.spark.sql.functions.col("slot_id") === "2")
      .collect().head
    val st = doc.getAs[Row]("state_transitions")
    assert(st.getAs[Long]("became_free") == 0 && st.getAs[Long]("became_occupied") == 0)
    val tm = doc.getAs[Row]("time_metrics")
    assert(tm.getAs[Double]("free_percentage") == 100.0)
    assert(doc.schema.fieldNames.toSeq ==
      Seq("slot_id", "slot_status", "state_transitions", "time_metrics",
        "parking_sessions"))
  }
}

package graft

import scala.util.Random
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.enrich.Sessionization
import graft.normalize.Normalize
import graft.schema.DomainConfig

/** Property-style invariants over seeded random fixtures (SURVEY §5.3):
  * explode→regroup preservation, default-fill idempotence, and
  * sessionization conservation laws. */
class InvariantsSpec extends SparkSpec {

  private def randomVehicleJson(seed: Int): String = {
    val rnd = new Random(seed)
    val frames = (0 until 8).map { f =>
      val dets = (0 until rnd.nextInt(4)).map { _ =>
        val id = rnd.nextInt(5) + 1
        s"""{"tracker_id": $id, "confidence": ${math.round(rnd.nextDouble() * 100) / 100.0},
            "bbox": [${rnd.nextInt(100)}.0, ${rnd.nextInt(100)}.0, ${rnd.nextInt(100) + 100}.0, ${rnd.nextInt(100) + 100}.0],
            "vehicle_type": "car", "vehicle_lane": "L${rnd.nextInt(3)}",
            "vehicle_direction": "D${rnd.nextInt(2)}", "vehicle_speed": ${rnd.nextInt(100)}.0,
            "stopped": ${rnd.nextBoolean()}, "red_light_violation": false, "line_crossing": false}"""
      }
      s"""{"frame_number": $f, "detections": [${dets.mkString(",")}]}"""
    }
    s"[${frames.mkString(",")}]"
  }

  for (seed <- Seq(1, 7, 42)) {
    test(s"explode->regroup preserves the detection multiset (seed=$seed)") {
      val raw = readJsonFixture(randomVehicleJson(seed))
      val flat = Normalize.flatten(DomainConfig.vehicle)(raw)
      val grouped = Normalize.regroupByFrame(DomainConfig.vehicle,
        Seq("tracker_id", "confidence", "speed"))(flat)
      // every input frame survives (including empty ones)
      assert(grouped.count() == raw.count())
      // multiset of (frame, tracker, speed) is identical
      val before = flat.filter(col("tracker_id").isNotNull)
        .select(col("frame_number"), col("tracker_id"), col("speed"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      val after = grouped
        .select(col("frame_number"), explode(col("detections")).as("d"))
        .select(col("frame_number"), col("d.tracker_id"), col("d.speed"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(before == after)
    }
  }

  test("default fill is idempotent (P9)") {
    val raw = readJsonFixture(
      """[{"frame_number": 0, "detections": [
           {"tracker_id": 1, "confidence": null, "bbox": [0.0,0.0,1.0,1.0]}]}]""")
    val cfg = DomainConfig.vehicle
    val once = Normalize.fillDefaults(cfg)(
      Normalize.explodeDetections(cfg)(raw))
    val twice = Normalize.fillDefaults(cfg)(once)
    val cols = cfg.defaults.keys.toSeq.sorted.map(col)
    assert(once.select(cols: _*).collect().toSeq
      == twice.select(cols: _*).collect().toSeq)
    // null confidence got the typed default
    assert(once.select(col("confidence")).collect().head.getDouble(0) == 0.0)
  }

  private def randomSlotRows(seed: Int) = {
    import spark.implicits._
    val rnd = new Random(seed)
    (for {
      slot <- Seq("1", "2", "3")
      t <- 0 until 12
    } yield (slot, t.toDouble, rnd.nextBoolean(), 0L, t.toLong))
      .toDF("slot_id", "timestamp_sec", "occupied", "pad", "frame_number")
      .select(col("frame_number"), col("timestamp_sec"), col("slot_id"),
        col("occupied"), array(lit(0.0)).as("bbox"))
  }

  for (seed <- Seq(3, 11, 99)) {
    test(s"sessionization conservation laws (seed=$seed)") {
      val rows = randomSlotRows(seed)
      val rollup = Sessionization.slotRollup(rows).collect()
      val sess = Sessionization.sessions(rows)
        .groupBy(col("slot_id")).agg(
          count(lit(1)).as("n_sessions"),
          sum(when(col("occupied"), 1).otherwise(0)).as("n_occ_sessions"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      rollup.foreach { r =>
        val slot = r.getAs[String]("slot_id")
        val (nSessions, nOccSessions) = sess(slot)
        // occupied + free time spans the observation window exactly
        assert(r.getAs[Double]("total_occupied_seconds")
          + r.getAs[Double]("total_free_seconds") == 11.0)
        // state transitions partition the timeline into sessions
        assert(r.getAs[Long]("became_free") + r.getAs[Long]("became_occupied")
          == nSessions - 1)
        // the parking-session list has exactly one entry per occupied run
        assert(r.getAs[collection.Seq[Row]]("parking_sessions").size == nOccSessions)
      }
    }
  }
}

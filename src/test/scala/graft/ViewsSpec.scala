package graft

import org.apache.spark.sql.functions._
import graft.normalize.Normalize
import graft.enrich.Enrich
import graft.schema.DomainConfig
import graft.views.Views

class ViewsSpec extends SparkSpec {

  private val fixture =
    """[
      {"frame_number": 0, "detections": [
        {"tracker_id": 1, "confidence": 0.9, "bbox": [0.0, 0.0, 10.0, 10.0],
         "vehicle_type": "car", "vehicle_color": "red", "vehicle_speed": 40.0,
         "vehicle_direction": "Down", "vehicle_lane": "Middle Lane",
         "stopped": false, "red_light_violation": true, "line_crossing": false},
        {"tracker_id": 2, "confidence": 0.8, "bbox": [100.0, 100.0, 110.0, 110.0],
         "vehicle_type": "truck", "vehicle_color": "blue", "vehicle_speed": 30.0,
         "vehicle_direction": "Up", "vehicle_lane": "Left Lane",
         "stopped": false, "red_light_violation": false, "line_crossing": false}]},
      {"frame_number": 1, "detections": [
        {"tracker_id": 1, "confidence": 0.7, "bbox": [1.0, 0.0, 11.0, 10.0],
         "vehicle_type": "car", "vehicle_color": "red", "vehicle_speed": 50.0,
         "vehicle_direction": "Down", "vehicle_lane": "Middle Lane",
         "stopped": false, "red_light_violation": false, "line_crossing": false}]}
    ]"""

  private lazy val flat = Normalize.flatten(DomainConfig.vehicle)(readJsonFixture(fixture))
  private lazy val refined = Enrich.vehicle(flat)

  test("feature splits project the documented aspects (D11)") {
    val splits = Views.vehicleSplits(refined)
    assert(splits.keySet == Set("VehicleInfo", "Movement", "Violations", "Confidence"))
    assert(splits("Movement").columns.contains("avg_speed"))
    assert(splits("VehicleInfo").count() == 2)
  }

  test("distribution + numeric summary (D11 statistics)") {
    val dist = Views.distribution(refined, "vehicle_type").collect()
    assert(dist.map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("car" -> 1L, "truck" -> 1L))
    val s = Views.numericSummary(refined, "avg_speed").collect().head
    assert(s.getAs[Long]("n") == 2)
    assert(math.abs(s.getAs[Double]("mean") - 37.5) < 1e-9) // (45+30)/2
  }

  test("kmeans clusters bbox centers with fixed seed (D11)") {
    val clusters = Views.kmeansCenters(flat, k = 2).collect()
    assert(clusters.length == 2)
    assert(clusters.map(_.getAs[Long]("n")).sum == 3)
  }

  test("serving layer answers the Kibana aggregations (A12) + ES reshape (D12)") {
    Views.registerServing(spark, refined, refined.limit(0))
    val top = Views.top5(spark, "datalake_vehicle_data", "vehicle_type").collect()
    assert(top.length == 2)
    val speeds = Views.speedByVehicle(spark).collect()
    assert(speeds.head.getAs[Double]("max_avg_speed") == 45.0)
    val es = Views.vehicleEsRecords(refined)
    val r1 = es.filter(col("vehicle_id") === 1).collect().head
    assert(r1.getAs[Boolean]("red_light_violation"))
    assert(!r1.getAs[Boolean]("line_crossing_violation"))
    assert(es.columns.contains("entry_time"))
  }
}

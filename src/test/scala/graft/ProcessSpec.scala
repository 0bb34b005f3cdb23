package graft

import java.nio.file.{Files, Paths}

/** End-to-end lifecycle drive of the Process CLI body (§3.1 steps 2-6):
  * raw JSON → processed zone (wrapped parity JSON + parquet) → refine
  * zone, for a schema-given domain (vehicle, with a corrupt sibling
  * file quarantined) and an inferred one (retail). */
class ProcessSpec extends SparkSpec {

  test("vehicle upload lands in all zones; corrupt doc is quarantined") {
    val root = Files.createTempDirectory("graft-proc").toString
    val dir = Files.createTempDirectory("graft-procraw").toString
    Files.writeString(Paths.get(s"$dir/v1.json"),
      """[{"frame_number": 0, "detections": [
           {"tracker_id": 1, "confidence": 0.9, "vehicle_type": "car",
            "vehicle_speed": 40.0, "bbox": [0.0, 0.0, 10.0, 10.0]}]},
          {"frame_number": 1, "detections": [
           {"tracker_id": 1, "confidence": 0.8, "vehicle_type": "car",
            "vehicle_speed": 50.0, "bbox": [1.0, 0.0, 11.0, 10.0]}]}]""")
    Files.writeString(Paths.get(s"$dir/broken.json"), """{"not json!""")
    // glob both files: the corrupt one must be quarantined, not crash
    graft.app.Process.run(spark, "vehicle", s"$dir/*.json", root)
    val refined = spark.read.parquet(s"$root/refine/vehicle_detection")
    assert(refined.count() == 1)
    val r = refined.collect().head
    assert(r.getAs[String]("vehicle_type") == "car")
    assert(r.getAs[Long]("frame_count") == 2L)
    // parity JSON objects exist in both zones
    assert(Files.list(Paths.get(s"$root/processed/vehicle_detection"))
      .anyMatch(p => p.getFileName.toString.startsWith("preprocessed_")))
    assert(Files.list(Paths.get(s"$root/refine/vehicle_detection"))
      .anyMatch(p => p.getFileName.toString.startsWith("refine_")))
  }

  test("retail upload (inferred schema) refines product rollups") {
    val root = Files.createTempDirectory("graft-proc2").toString
    val f = Files.createTempDirectory("graft-procraw2").resolve("r1.json")
    Files.writeString(f,
      """[{"frame_number": 0, "detections": [
           {"product_id": "p1", "product_name": "soap", "category": "home",
            "price": 2.5, "stock_level": 10.0, "picked_by_customer": false,
            "expiry_date": "2025-01-01"}]},
          {"frame_number": 1, "detections": [
           {"product_id": "p1", "product_name": "soap", "category": "home",
            "price": 2.5, "stock_level": 9.0, "picked_by_customer": true,
            "expiry_date": "2025-01-01"}]}]""")
    graft.app.Process.run(spark, "retail", f.toString, root)
    val refined = spark.read.parquet(s"$root/refine/retail_detection")
    val r = refined.collect().head
    assert(r.getAs[String]("product_id") == "p1")
    assert(r.getAs[Boolean]("picked_by_customer"))
    assert(r.getAs[Long]("frame_appearances") == 2L)
  }
}

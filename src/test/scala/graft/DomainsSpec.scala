package graft

import graft.normalize.Normalize
import graft.enrich.Enrich
import graft.schema.DomainConfig

/** Specs for the remaining domains: school events, retail products,
  * animal (synthesized ids), common, pose/geolocation pass-through. */
class DomainsSpec extends SparkSpec {

  private val schoolFixture =
    """[
      {"frame_number": 0, "timestamp": "2025-06-01 09:00:00",
       "detections": [
         {"event_id": 101, "event_type": "fight", "timestamp": "2025-06-01 09:00:00",
          "location": "yard", "confidence": 0.8, "involved_person_id": "p1",
          "duration_seconds": 12, "notes": "", "alert_level": "high",
          "response_required": true, "multiple_persons_involved": true,
          "person_roles": ["student", "student"]}]},
      {"frame_number": 1, "timestamp": "2025-06-01 09:00:10",
       "detections": [
         {"event_id": 101, "event_type": "fight", "timestamp": "2025-06-01 09:00:10",
          "location": "yard", "confidence": 0.6, "involved_person_id": "p2",
          "duration_seconds": 18, "notes": "", "alert_level": "low",
          "response_required": false, "multiple_persons_involved": false,
          "person_roles": ["student", "teacher"]}]}
    ]"""

  test("school: event rollup with role flatten + alert distribution (A8/F12)") {
    val flat = Normalize.flatten(DomainConfig.school)(readJsonFixture(schoolFixture))
    val out = Enrich.school(flat).collect()
    assert(out.length == 1)
    val e = out.head
    assert(e.getAs[String]("event_type") == "fight")
    assert(e.getAs[Long]("frame_occurrences") == 2)
    assert(e.getAs[Double]("duration_seconds") == 10.0)
    assert(math.abs(e.getAs[Double]("avg_confidence") - 0.7) < 1e-9)
    assert(math.abs(e.getAs[Double]("avg_event_duration") - 15.0) < 1e-9)
    assert(e.getAs[Boolean]("response_required"))
    assert(e.getAs[Boolean]("multiple_persons_involved"))
    assert(e.getAs[collection.Seq[String]]("involved_persons") == Seq("p1", "p2"))
    assert(e.getAs[collection.Seq[String]]("unique_roles") == Seq("student", "teacher"))
    assert(e.getAs[String]("most_common_role") == "student")
    // tie on alert counts (1/1) → first-seen wins: high (frame 0)
    assert(e.getAs[String]("most_common_alert_level") == "high")
    assert(e.getAs[collection.Map[String, Long]]("alert_level_distribution")
      == Map("high" -> 1L, "low" -> 1L))
  }

  private val retailFixture =
    """[
      {"frame_number": 0, "timestamp": "2025-06-01 10:00:00",
       "detections": [
         {"product_id": "sku-1", "product_name": "milk", "category": "dairy",
          "location": "aisle-3", "stock_level": 12, "price": 2.5,
          "picked_by_customer": false, "expiry_date": "2025-06-20"}]},
      {"frame_number": 1, "timestamp": "2025-06-01 10:00:05",
       "detections": [
         {"product_id": "sku-1", "product_name": "milk", "category": "dairy",
          "location": "aisle-3", "stock_level": 10, "price": 2.7,
          "picked_by_customer": true, "expiry_date": "2025-06-21"}]}
    ]"""

  test("retail: product rollup (A9)") {
    val flat = Normalize.flatten(DomainConfig.retail)(readJsonFixture(retailFixture))
    val out = Enrich.retail(flat).collect()
    assert(out.length == 1)
    val p = out.head
    assert(p.getAs[String]("product_name") == "milk")
    assert(math.abs(p.getAs[Double]("average_price") - 2.6) < 1e-9)
    assert(math.abs(p.getAs[Double]("average_stock_level") - 11.0) < 1e-9)
    assert(p.getAs[Boolean]("picked_by_customer"))
    assert(p.getAs[collection.Seq[String]]("unique_expiry_dates")
      == Seq("2025-06-20", "2025-06-21"))
    assert(p.getAs[Long]("frame_appearances") == 2)
  }

  private val animalFixture =
    """[
      {"frame_number": 5, "timestamp": 0.1,
       "detections": [
         {"class_id": 19, "class_name": "cow", "confidence": 0.7,
          "bbox": [100.0, 150.0, 600.0, 650.0], "area": 267528.0}]},
      {"frame_number": 6, "timestamp": 0.2,
       "detections": [
         {"class_id": 19, "class_name": "cow", "confidence": 0.9,
          "bbox": [101.0, 150.0, 601.0, 650.0], "area": 267528.0}]}
    ]"""

  test("animal: synthesized spatial-bucket id (F6) + generic rollup (A7)") {
    val flat = Normalize.flatten(DomainConfig.animal)(readJsonFixture(animalFixture))
    // center (350,400) both frames (±0.5px) → same 10px bucket → one entity
    val out = Enrich.genericEntity("animal_id")(flat).collect()
    assert(out.length == 1)
    val a = out.head
    assert(a.getAs[String]("animal_id") == "cow_35_40")
    assert(a.getAs[String]("class_name") == "cow")
    assert(a.getAs[Long]("frame_count") == 2)
    assert(math.abs(a.getAs[Double]("confidence_avg") - 0.8) < 1e-9)
    assert(a.getAs[collection.Seq[Long]]("frame_numbers") == Seq(5L, 6L))
  }

  private val geoFixture =
    """[
      {"frame": 42, "class": "motorcycle", "confidence": 0.89,
       "bbox": [505.0, 65.0, 571.0, 160.0],
       "geolocation": {"latitude": 7.0763, "longitude": 80.0441}},
      {"frame": 43, "class": "car", "confidence": 0.05,
       "bbox": [100.0, 65.0, 200.0, 160.0],
       "geolocation": {"latitude": 7.0764, "longitude": 80.0442}}
    ]"""

  test("geolocation: flat layout renames + confidence filter (P5)") {
    val flat = Normalize.flatten(DomainConfig.geolocation)(readJsonFixture(geoFixture))
    assert(flat.columns.contains("frame_number"))
    assert(flat.columns.contains("class_name"))
    val kept = flat.filter(flat("confidence") > 0.1).collect()
    assert(kept.length == 1 && kept.head.getAs[String]("class_name") == "motorcycle")
    // struct columns survive the pipeline
    assert(flat.schema("geolocation").dataType.typeName == "struct")
  }

  test("first() attributes are frame-pinned: deterministic across repartitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // attributes VARY within an entity — exactly the case where an
    // unordered first() is partition-order dependent
    val retailRows = Seq(
      ("p1", 2L, "late-name", "late-cat", "aisle-9", 4.0, 10.0, false, "2025-01-02"),
      ("p1", 0L, "first-name", "first-cat", "aisle-1", 2.0, 20.0, true, "2025-01-01"),
      ("p1", 1L, "mid-name", "mid-cat", "aisle-5", 3.0, 30.0, false, "2025-01-03"))
      .toDF("product_id", "frame_number", "product_name", "category",
        "location", "price", "stock_level", "picked_by_customer", "expiry_date")
    val variants = Seq(
      retailRows.repartition(7),
      retailRows.repartition(1),
      retailRows.orderBy(desc("frame_number")).repartition(3, col("frame_number")))
    val results = variants.map(v =>
      Enrich.retail(v).collect().map(_.toSeq).toSeq)
    assert(results.distinct.size == 1, "retail first() varies with partitioning")
    assert(results.head.head(1) == "first-name") // frame 0's value, always
    val genericRows = Seq(
      (5L, 3L, "dog", 0.5, Seq(0.0, 0.0, 1.0, 1.0)),
      (5L, 0L, "cat", 0.7, Seq(0.0, 0.0, 1.0, 1.0)),
      (5L, 1L, null, 0.9, Seq(2.0, 2.0, 3.0, 3.0)))
      .toDF("animal_id", "frame_number", "class_name", "confidence", "bbox")
    val gResults = Seq(genericRows.repartition(5),
      genericRows.orderBy(desc("frame_number")).repartition(2, col("class_name")))
      .map(v => Enrich.genericEntity("animal_id")(v).collect().map(_.toSeq).toSeq)
    assert(gResults.distinct.size == 1)
    assert(gResults.head.head(1) == "cat") // earliest frame's non-null value
  }
}

package graft

import java.nio.file.Files
import graft.lake.Lake

/** Zone/sink round-trip specs (S1-S6). */
class LakeSpec extends SparkSpec {

  test("JSON array sink round-trips through the multiLine reader (S1/S2)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-lake").toString
    val lake = Lake(spark, root)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val path = s"$root/raw/test_detection/file1.json"
    lake.writeJsonArray(df, path)
    val back = lake.readJsonArray(path).orderBy("id").collect()
    assert(back.map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSeq
      == Seq((1L, "a"), (2L, "b")))
  }

  test("wrapped-JSON sink produces the frame_detections layout (S3)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-lake").toString
    val lake = Lake(spark, root)
    val df = Seq((0L, 2L), (1L, 0L)).toDF("frame_number", "n")
    val path = s"$root/processed/test_detection/preprocessed_file1.json"
    lake.writeWrappedJson(df, "frame_detections", path)
    val back = lake.readJsonArray(path)
    assert(back.columns.contains("frame_detections"))
    assert(graft.normalize.Normalize.unwrap(back).count() == 2)
  }

  test("parquet zone table append + catalog listing (S6/S7)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-lake").toString
    val lake = Lake(spark, root)
    val df = Seq((1L, 0.5), (2L, 0.9)).toDF("tracker_id", "confidence")
    lake.writeZoneTable(df, "processed", "vehicle", "v1.json")
    lake.writeZoneTable(df, "processed", "vehicle", "v2.json")
    assert(lake.readZoneTable("processed", "vehicle").count() == 4)
    assert(lake.list("processed", "vehicle").nonEmpty)
  }

  test("ingest stamp is injectable for determinism (S9)") {
    import spark.implicits._
    val lake = Lake(spark, "/tmp/unused")
    val stamped = lake.stampIngest(Seq(1).toDF("x"), Some(1700000000000000L))
    val ts = stamped.collect().head.getAs[java.sql.Timestamp]("@timestamp")
    assert(ts.toInstant.getEpochSecond == 1700000000L)
  }
}

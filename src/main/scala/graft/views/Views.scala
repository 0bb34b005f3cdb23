package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-split views + statistics rollups (SURVEY.md §2.6 D11,
  * `split_*_data/split_*.py`) and the serving layer reproducing the
  * reference's Elasticsearch/Kibana query surface (A12, D12) as Spark
  * SQL over the refined zone tables.
  *
  * The reference splitters are driver-side Python over the refined JSON
  * dict; here each split is a projection and each statistics block one
  * small aggregation over the refined table — all distributed.
  */
object Views {

  /** People feature splits (`split_people_data/split_people.py:62-67`):
    * PersonalInfo / Activity / Security / Confidence projections. */
  def peopleSplits(refined: DataFrame): Map[String, DataFrame] = Map(
    "PersonalInfo" -> refined.select(col("tracker_id"), col("age"),
      col("gender"), col("carrying")),
    "Activity" -> refined.select(col("tracker_id"), col("first_detection"),
      col("last_detection"), col("duration_seconds"), col("frame_count")),
    "Security" -> refined.select(col("tracker_id"),
      col("entered_restricted_area"), col("restricted_area_entry_time")),
    "Confidence" -> refined.select(col("tracker_id"), col("confidence_avg")))

  /** Vehicle splits (`split_vehicle_data/split_vehicle.py:64-69`). */
  def vehicleSplits(refined: DataFrame): Map[String, DataFrame] = Map(
    "VehicleInfo" -> refined.select(col("tracker_id"), col("vehicle_type"),
      col("vehicle_color")),
    "Movement" -> refined.select(col("tracker_id"), col("avg_speed"),
      col("max_speed"), col("min_speed"), col("direction"),
      col("total_distance"), col("lane_changes")),
    "Violations" -> refined.select(col("tracker_id"),
      col("red_light_violation_count"), col("line_crossing_count")),
    "Confidence" -> refined.select(col("tracker_id"), col("confidence_avg")))

  /** D11 statistics rollup: distribution of a categorical column. */
  def distribution(refined: DataFrame, column: String): DataFrame =
    refined.groupBy(col(column)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(column))

  /** D11 numeric summary: total/mean/min/max of a measure. */
  def numericSummary(refined: DataFrame, column: String): DataFrame =
    refined.agg(
      count(col(column)).as("n"),
      sum(col(column)).as("total"),
      avg(col(column)).as("mean"),
      min(col(column)).as("min"),
      max(col(column)).as("max"))

  /** D11 optional KMeans clustering over bbox centers
    * (`split_common_data/split_common.py:70-80`): k=2, fixed seed —
    * spark.ml, distributed. */
  def kmeansCenters(flat: DataFrame, k: Int = 2, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.VectorAssembler
    val points = flat.select(col("center_x"), col("center_y")).na.drop()
    val assembled = new VectorAssembler()
      .setInputCols(Array("center_x", "center_y")).setOutputCol("features")
      .transform(points)
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(assembled)
    model.transform(assembled)
      .groupBy(col("prediction")).agg(
        count(lit(1)).as("n"),
        avg(col("center_x")).as("cx"),
        avg(col("center_y")).as("cy"))
      .orderBy(col("prediction"))
  }

  /** A12: the Kibana dashboard aggregations as Spark SQL — register the
    * refined tables as views and answer the canned query set
    * (`Documentations/create_vehicle_dashboard_steps.md` §1-5). */
  def registerServing(spark: SparkSession, refinedVehicle: DataFrame,
      refinedPeople: DataFrame): Unit = {
    refinedVehicle.createOrReplaceTempView("datalake_vehicle_data")
    refinedPeople.createOrReplaceTempView("datalake_people_data")
  }

  /** Kibana "Top 5 values of <field>" (terms agg). */
  def top5(spark: SparkSession, table: String, field: String): DataFrame =
    spark.sql(
      s"SELECT $field, count(*) AS n FROM $table GROUP BY $field " +
        s"ORDER BY n DESC, $field LIMIT 5")

  /** Kibana "max of avg_speed / max_speed per vehicle bucket". */
  def speedByVehicle(spark: SparkSession): DataFrame =
    spark.sql(
      """SELECT tracker_id, max(avg_speed) AS max_avg_speed,
                max(max_speed) AS max_max_speed
         FROM datalake_vehicle_data GROUP BY tracker_id
         ORDER BY max_avg_speed DESC""")

  /** D12 ES-record reshaping (`processing_vehicle.py:108-141`): count
    * columns to booleans, first/last detection to entry/exit names. */
  def vehicleEsRecords(refined: DataFrame): DataFrame =
    refined.select(
      col("tracker_id").as("vehicle_id"),
      col("vehicle_type"),
      col("vehicle_color"),
      col("first_detection").as("entry_time"),
      col("last_detection").as("exit_time"),
      col("duration_seconds"),
      col("avg_speed"), col("max_speed"), col("min_speed"),
      (col("red_light_violation_count") > 0).as("red_light_violation"),
      (col("line_crossing_count") > 0).as("line_crossing_violation"),
      col("confidence_avg"))
}

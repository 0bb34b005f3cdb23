package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar-function and generator surface (SURVEY.md §2.3 F1-F15, §2.4
  * G1-G5) re-expressed over the synthetic tables. All expressions are
  * Spark built-ins — fully codegen'd, no UDFs (the reference itself has
  * zero UDFs, SURVEY F16).
  */
object Scalars {

  /** F1-F3 timestamp lane: format → suffix-append → regexp strip (the
    * reference strips "+05:30" / " UTC" before parsing,
    * `advanced_preprocessing.py:79-85`, `tracking_data.py:89-95`) →
    * to_timestamp → epoch. Round-trips to second precision. */
  def fTimestampParse(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("ts_str", concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), lit(" UTC")))
      .withColumn("ts_clean", regexp_replace(col("ts_str"), " UTC$", ""))
      .withColumn("parsed_s", unix_timestamp(to_timestamp(col("ts_clean"), "yyyy-MM-dd HH:mm:ss")))
      .groupBy(col("event_type"))
      .agg(sum(col("parsed_s")).as("sum_parsed_s"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** F9-ish JSON extraction: `props` is a JSON string; pull `$.k` as an
    * int (the reference coerces dynamic-key structs via to_json/from_json,
    * `basic_preprocessing_parkingLot.py:32-39`). */
  def fJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("user_id"))
      .agg(sum(col("k_val")).as("sum_k"), count(col("k_val")).as("n_k"))
      .orderBy(col("user_id"))
  }

  /** F6 synthesized stable id for untracked detections
    * (`advanced_preprocessing_animal.py:18-28`): concat(class, "_",
    * floor(measure/10)) spatial bucketing. */
  def fSynthId(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("synth_id",
        concat(col("event_type"), lit("_"), floor(col("value") / 10.0).cast("long")))
      .groupBy(col("synth_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("synth_id"))
  }

  /** F4 element-expansion analog (bbox[0..3] → x1..y2,
    * `basic_preprocessing_vehicle.py:90-97`): first elements of the
    * token array as typed columns + size guard (F11). */
  def fTokenExpand(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        element_at(col("toks"), 1).as("t1"),
        element_at(col("toks"), 2).as("t2"),
        element_at(col("toks"), 3).as("t3"),
        size(col("toks")).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** F4 numeric element expansion on the embedding vector: first four
    * components as x1..y2 (exact float→double widening, rounded). */
  def fVecExpand(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.embeddings.select(
      col("vec_id"),
      round(element_at(col("embedding"), 1).cast("double"), 4).as("x1"),
      round(element_at(col("embedding"), 2).cast("double"), 4).as("y1"),
      round(element_at(col("embedding"), 3).cast("double"), 4).as("x2"),
      round(element_at(col("embedding"), 4).cast("double"), 4).as("y2"),
      size(col("embedding")).cast("long").as("dim"))
      .orderBy(col("vec_id"))
  }

  /** G1/G2 explode: token stream per language — explode(split(text)),
    * then counts + distinct counts per lang. */
  def gExplodeTokens(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_distinct"))
      .orderBy(col("lang"))
  }

  /** P8 null-safe trim + P9 default fill (`preprocessing/common.py:15-35`):
    * trim strings only when non-null, coalesce missing categoricals to a
    * typed default. */
  def pCleanDefaults(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("text_clean", when(col("text").isNotNull, trim(col("text"))))
      .withColumn("lang_filled", coalesce(col("lang"), lit("unknown")))
      .withColumn("source_filled", coalesce(col("source"), lit("unknown")))
      .groupBy(col("lang_filled"), col("source_filled"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text_clean"))).as("total_chars"))
      .orderBy(col("lang_filled"), col("source_filled"))
  }
}

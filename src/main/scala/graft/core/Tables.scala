package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `dir`. All reads are plain columnar
  * scans — Catalyst pushes filters/projections into the parquet reader,
  * so callers should NOT cache or materialize these eagerly.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** `events.ts` is written as parquet timestamp[ns] (no TZ). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[Sessions]]) it reads as LongType nanos; convert to a proper
    * TimestampType (sub-microsecond digits are zero in this data, and
    * DuckDB's micros-precision oracle sees identical values).
    */
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: double division loses precision at
        // epoch-nanos magnitude (1.7e18 >> 2^53) and lands ±1 µs off.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}

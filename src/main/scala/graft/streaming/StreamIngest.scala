package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingestion over the raw zone.
  *
  * The reference's "streaming" is micro-batch-per-uploaded-file over
  * HTTP (`Send_Data_To_DataLake/main.py:64` — SURVEY §2.9: no real
  * streams). A file-source stream with `Trigger.AvailableNow`
  * reproduces those per-file batch semantics exactly, while the same
  * plan keeps running continuously on a real cluster (maxFilesPerTrigger
  * bounds batch size at scale; checkpointing gives exactly-once into the
  * parquet zone tables).
  */
object StreamIngest {

  /** Stream of raw detection documents from a zone directory. File
    * sources need an explicit schema (no inference mid-stream). */
  def rawStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("multiLine", true)
      .option("mode", "PERMISSIVE")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Watermarked sliding-window aggregation over an event-time stream —
    * the serving-layer counterpart of the Kibana date-histogram
    * aggregations (A12), with late-data handling the reference lacks. */
  def windowedCounts(events: DataFrame, eventTime: String,
      window_ : String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(eventTime, watermark)
      .groupBy(window(col(eventTime), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Drain everything currently in the source and stop — per-file batch
    * parity (Trigger.AvailableNow). */
  def runAvailableNow(writer: DataStreamWriter[org.apache.spark.sql.Row],
      checkpoint: String): Unit = {
    val q = writer
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream → transactional zone table: every micro-batch commits
    * atomically through the [[graft.lake.TxTable]] manifest log, and
    * the batch-id marker inside each manifest makes redelivered batches
    * no-ops — exactly-once into a table that concurrent compaction can
    * safely rewrite (the Delta-style streaming-sink contract, on the
    * plain-parquet log). */
  def runToTxTable(stream: DataFrame, table: graft.lake.TxTable,
      checkpoint: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.appendBatchIdempotent(batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Event-time sessionization as a REAL Structured Streaming query:
  * file source → watermark → `session_window` (gap-merging state store
  * aggregation) → memory sink, drained with `Trigger.AvailableNow`.
  *
  * The reference sessionizes only in driver Python (SURVEY D9); this is
  * the streaming-native counterpart that keeps running incrementally on
  * a live ingest directory — state is keyed by (user, session), merges
  * on overlap, and evicts by watermark, so it holds at 100 TB/day where
  * a batch re-sort would not.
  *
  * Session semantics (pinned for the oracle): a new session starts when
  * the gap from the previous event is >= 30 min; a session's end is
  * last event + gap (Spark merges windows that strictly overlap). In
  * append mode a session is emitted once the watermark passes its end —
  * with a 0s delay the end-of-stream watermark is the global max event
  * time, so the oracle applies the same `session_end <= max(ts)` cut.
  */
object StreamSessionize {

  val gapMicros: Long = 1800L * 1000000L

  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // file streams need an explicit schema — probe it from a batch read
    val batchSchema = spark.read.parquet(path).schema
    // the file source wants a directory — scope it to the events table
    // with a glob (the sf dir holds every table's parquet)
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val ev = raw.schema("ts").dataType match {
      case LongType => // timestamp[ns] read as long (see core.Tables)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val sessions = ev
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    val qname = "graft_sessions_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = new java.io.File(s"target/tmp/ckpt_$qname")
    ckpt.mkdirs()
    val q = sessions.writeStream
      .format("memory").queryName(qname)
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qname)
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        unix_micros(col("session_window.end")).as("sess_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }
}

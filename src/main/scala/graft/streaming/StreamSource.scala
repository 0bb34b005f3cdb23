package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType
import scala.jdk.CollectionConverters._

/** Shared plumbing for the streaming queries: one place for the
  * file-source schema probe, the single-table glob, the timestamp[ns]
  * normalization (mirrors `core.Tables.events`), and the drain-to-
  * memory-sink run with checkpoint cleanup. */
object StreamSource {

  /** Streaming read of event parquet under `dir` with `ts` normalized
    * to a proper TimestampType. File sources need a directory plus an
    * explicit schema; the glob scopes the stream to the events table
    * (default: the single `events.parquet` of an sf dir).
    * `maxFilesPerTrigger` bounds batch size (0 = all available). */
  def eventsStream(spark: SparkSession, dir: String,
      glob: String = "events.parquet", maxFilesPerTrigger: Int = 0): DataFrame = {
    val batchSchema = spark.read
      .option("pathGlobFilter", glob).parquet(dir).schema
    var reader = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", glob)
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val raw = reader.parquet(dir)
    raw.schema("ts").dataType match {
      case LongType => // timestamp[ns] read as long (see core.Tables)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Drain a streaming DataFrame into a uniquely named memory sink with
    * `Trigger.AvailableNow` and return the sink table. The checkpoint
    * is throwaway by design (a fresh one per run — reusing it would
    * mark the source files as already processed and emit nothing) and
    * is deleted after the run so repeated verify/bench loops don't leak
    * disk.
    *
    * For AGGREGATE-SIZED output only: a memory sink collects every
    * output row into a driver-heap buffer. Queries whose output is
    * corpus-sized (sessionization emits ~0.95 sessions per event on
    * this data) must drain through [[runToParquet]] instead — at x100
    * the driver-side collect of ~9.5M session rows was the measured
    * superlinear term (BASELINE.md r10 streaming decade). */
  def runToMemory(spark: SparkSession, out: DataFrame,
      outputMode: String, namePrefix: String): DataFrame = {
    val qname = namePrefix + "_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = new java.io.File(s"target/tmp/ckpt_$qname")
    ckpt.mkdirs()
    try {
      val q = out.writeStream
        .format("memory").queryName(qname)
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally deleteRecursively(ckpt)
    spark.table(qname)
  }

  /** Drain to a throwaway parquet sink (distributed write, executor
    * parallelism) and read the result back — the corpus-sized-output
    * twin of [[runToMemory]]. Parquet sinks are append-mode only,
    * which is exactly the class of queries whose output scales with
    * the corpus (watermark-evicted sessions, deduped streams);
    * complete-mode aggregates are aggregate-sized by definition and
    * stay on the memory sink. The read-back passes the writer's
    * schema so an empty (yet valid) sink still yields a typed empty
    * result. */
  def runToParquet(spark: SparkSession, out: DataFrame,
      namePrefix: String): DataFrame = {
    val qname = namePrefix + "_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = new java.io.File(s"target/tmp/ckpt_$qname")
    ckpt.mkdirs()
    // sink data lives under Scratch so the per-process shutdown hook
    // reclaims it once the lazy read-back has been consumed — a
    // corpus-sized sink (x100: ~9.5M session rows x 3 queries x 2
    // timed runs) must not outlive the bench/verify loop that made it
    val data = graft.core.Scratch.fresh(s"stream_sink_$namePrefix")
    try {
      val q = out.writeStream
        .format("parquet").option("path", data)
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally deleteRecursively(ckpt)
    spark.read.schema(out.schema).parquet(data)
  }

  private def deleteRecursively(dir: java.io.File): Unit = {
    val walk = java.nio.file.Files.walk(dir.toPath)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}

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
    * disk. */
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
    } finally {
      val walk = java.nio.file.Files.walk(ckpt.toPath)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    spark.table(qname)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Stream–static join + streaming aggregation: the serving-layer
  * enrichment shape — an event stream joined against a broadcast
  * dimension table, aggregated continuously. The static side is
  * re-read per micro-batch (picks up dimension updates); the join
  * never shuffles the stream (broadcast hash join), and the global
  * aggregation keeps one state row per segment. */
object StreamStaticJoin {

  def streamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val ev = (raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }).select(col("user_id"), col("value"))
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = ev
      .join(broadcast(dim), ev("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
    val qname = "graft_stream_static_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = new java.io.File(s"target/tmp/ckpt_$qname")
    ckpt.mkdirs()
    val q = joined.writeStream
      .format("memory").queryName(qname)
      .outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qname)
      .select(col("c_mktsegment"), col("n"), col("sum_cents"))
      .orderBy(col("c_mktsegment"))
  }
}

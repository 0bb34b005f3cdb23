package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream–static join + streaming aggregation: the serving-layer
  * enrichment shape — an event stream joined against a broadcast
  * dimension table, aggregated continuously. The static side is
  * re-read per micro-batch (picks up dimension updates); the join
  * never shuffles the stream (broadcast hash join), and the global
  * aggregation keeps one state row per segment.
  *
  * Complete output mode: the memory sink REPLACES its contents each
  * batch, so the final table is exactly the final aggregate even when
  * the source spans several micro-batches (update mode would append
  * each batch's changed rows and duplicate keys). */
object StreamStaticJoin {

  def streamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = StreamSource.eventsStream(spark, dir)
      .select(col("user_id"), col("value"))
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = ev
      .join(broadcast(dim), ev("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
    StreamSource.runToMemory(spark, joined, "complete", "graft_stream_static")
      .select(col("c_mktsegment"), col("n"), col("sum_cents"))
      .orderBy(col("c_mktsegment"))
  }
}

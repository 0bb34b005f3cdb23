package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream–stream interval join: clicks joined to the purchases that
  * follow them within one hour, both sides watermarked. The event-time
  * range condition is what lets the state store evict buffered rows
  * once the other side's watermark passes the interval — without it a
  * stream–stream join buffers forever. Inner-join results emit as
  * matches arrive (not watermark-gated), so draining the whole source
  * yields exactly the batch interval-join result.
  *
  * The watermark delay is the stream's out-of-orderness bound: rows
  * below the watermark are DROPPED on arrival, so a 0s delay would
  * silently lose matches whenever the source spans several micro-
  * batches. 31 days covers the synthetic month — production sets it to
  * its real late-data bound. */
object StreamStreamJoin {

  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val joined = streamStreamJoinOn(StreamSource.eventsStream(spark, dir))
    StreamSource.runToMemory(spark, joined, "append", "graft_ss_join")
      .orderBy(col("user_id"), col("c_us"), col("p_us"))
  }

  /** The streaming join plan itself (un-drained) — reused by tests that
    * drive it through several micro-batches. */
  def streamStreamJoinOn(events: DataFrame): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "31 days")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "31 days")
    clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts >= c_ts AND
              p_ts <= c_ts + INTERVAL 1 HOUR"""))
      .select(col("c_user").as("user_id"),
        unix_micros(col("c_ts")).as("c_us"),
        unix_micros(col("p_ts")).as("p_us"))
  }
}

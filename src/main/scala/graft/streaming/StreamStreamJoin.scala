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
  * below the watermark are DROPPED on arrival, and together with the
  * 1 h interval it bounds how much of each stream the state store
  * retains — so it is a PARAMETER with a production-realistic default
  * (10 minutes of late data ⇒ ~70 min of state), not a constant. The
  * oracle harness passes "31 days" because its whole synthetic month
  * arrives as one historical replay; that bound lives at the call
  * site, not here. */
object StreamStreamJoin {

  val defaultWatermarkDelay = "10 minutes"

  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    // harness bound: the replayed month is all "late" relative to its
    // final event, so the delay must cover the data span
    val joined = streamStreamJoinOn(StreamSource.eventsStream(spark, dir),
      watermarkDelay = "31 days")
    StreamSource.runToMemory(spark, joined, "append", "graft_ss_join")
      .orderBy(col("user_id"), col("c_us"), col("p_us"))
  }

  /** The streaming join plan itself (un-drained) — reused by tests that
    * drive it through several micro-batches. */
  def streamStreamJoinOn(events: DataFrame,
      watermarkDelay: String = defaultWatermarkDelay): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts >= c_ts AND
              p_ts <= c_ts + INTERVAL 1 HOUR"""))
      .select(col("c_user").as("user_id"),
        unix_micros(col("c_ts")).as("c_us"),
        unix_micros(col("p_ts")).as("p_us"))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming deduplication: `dropDuplicates` over the live event
  * stream — the first arrival of each key is emitted, every replay is
  * suppressed by the state store. This is the streaming face of the
  * batch exact-dedup operator: an at-least-once upstream (resent files,
  * replayed batches) becomes exactly-one-row-per-key downstream.
  *
  * Only the key columns are emitted, so the drained result is a SET —
  * independent of file arrival order — and equals batch `DISTINCT`
  * over the same data, which is exactly what the oracle checks.
  *
  * State discipline at scale: plain `dropDuplicates` keeps one state
  * row per distinct key forever — fine for bounded key domains
  * (user × event_type here), wrong for unbounded ones. The unbounded
  * form is `dropDuplicatesWithinWatermark`, which evicts state once
  * the watermark passes a key's event time; [[streamDedupBounded]]
  * demonstrates it (equal output when the delay covers the data's
  * out-of-orderness, state bounded by the watermark horizon —
  * spec-driven over multi-batch arrivals).
  */
object StreamDedup {

  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val deduped = StreamSource.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    // parquet drain: distinct keys grow with the corpus (150k users ×
    // 5 types at x100) — keep the result off the driver heap
    StreamSource.runToParquet(spark, deduped, "graft_sdedup")
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Watermark-bounded variant: state is evicted as event time
    * advances; `delay` must cover the stream's out-of-orderness for
    * the output to equal DISTINCT (the general streaming-dedup
    * contract). Exercised by the multi-batch spec. */
  def streamDedupBounded(spark: SparkSession, dir: String,
      delay: String = "31 days", maxFilesPerTrigger: Int = 0): DataFrame = {
    val deduped = StreamSource
      .eventsStream(spark, dir, maxFilesPerTrigger = maxFilesPerTrigger)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    StreamSource.runToMemory(spark, deduped, "append", "graft_sdedup_wm")
      .orderBy(col("user_id"), col("event_type"))
  }
}

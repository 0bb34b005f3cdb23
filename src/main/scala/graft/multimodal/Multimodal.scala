package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real and tested; the *codec* itself is a deterministic stub (this
  * container ships no image/audio libraries). `DecodeStub.decode` is
  * the single seam to swap for a real decoder: it runs inside
  * `mapPartitions`, the Scala analogue of `mapInPandas` — one
  * partition = one batch, codec state amortized across the batch, no
  * per-row JVM↔native churn.
  */
object Multimodal {

  /** media row: opaque bytes + typed metadata (the lake-zone schema for
    * binary assets). */
  final case class MediaRow(asset_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Int,
      n_frames: Int, mean_byte: Double, frame_offsets: Seq[Int])

  /** Wrap a text corpus as fake binary assets (test/bench harness for
    * the plumbing; real ingestion reads actual media files). */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, "image").otherwise("audio").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit(640).as("width"), lit(480).as("height"), lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** The decoder seam. Deterministic stub: "frames" are evenly spaced
    * byte offsets (sample every `stride` bytes, like frame sampling a
    * video); features are byte statistics. A real implementation swaps
    * the body for an actual codec call — signature and batch shape stay
    * identical. */
  object DecodeStub {
    def decode(rows: Iterator[MediaRow], stride: Int): Iterator[MediaFeatures] =
      rows.map { r =>
        val bytes = r.content
        val offsets = bytes.indices.by(math.max(stride, 1)).toSeq
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
        MediaFeatures(r.asset_id, r.kind, bytes.length, offsets.length, mean, offsets)
      }
  }

  /** Distributed decode: one codec pass per partition (mapPartitions
    * batch shape). Narrow — no shuffle; at 100 TB this is scan-speed. */
  def decodeFeatures(assets: Dataset[MediaRow], stride: Int = 256): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(rows => DecodeStub.decode(rows, stride))
  }

  /** Pure-SQL byte metrics for when the stub suffices: codegen'd, no
    * deserialization to case classes at all. */
  def byteMetrics(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("kind"),
      length(col("content")).as("n_bytes"),
      (floor((length(col("content")) - 1) / 256) + 1).as("n_chunks"),
      md5(col("content")).as("content_md5"))

  /** Fixed window/hop segmentation — the audio-framing primitive
    * (window and hop in samples; here character units of the decoded
    * payload): every asset explodes into its fully-contained segments,
    * each pinned by an md5. Pure narrow SQL (explode + substring), so
    * segmentation of a 100 TB asset zone runs at scan speed with no
    * shuffle; a real pipeline feeds the segment spans to the
    * [[DecodeStub]] seam for per-segment feature extraction. */
  def segments(assets: DataFrame, window: Int = 100, hop: Int = 60): DataFrame =
    assets
      .select(col("asset_id"), decode(col("content"), "UTF-8").as("txt"))
      .withColumn("len", length(col("txt")))
      .filter(col("len") >= window)
      .withColumn("n", expr(s"(len - $window) div $hop + 1"))
      .withColumn("i", explode(expr("sequence(0, CAST(n - 1 AS INT))")))
      .select(col("asset_id"), col("i").cast("long").as("seg_id"),
        (col("i") * hop).cast("long").as("seg_start"),
        md5(expr(s"substring(txt, i * $hop + 1, $window)")).as("seg_md5"))
      .orderBy(col("asset_id"), col("seg_id"))
}

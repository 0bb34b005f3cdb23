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
  /** Byte-level near-duplicate detection over the binary asset zone
    * (VERDICT r11 task 8) — the multimodal lane's first DEDUP
    * operator: MinHash-LSH over BYTE shingles of the raw `content`
    * bytes (no decode, no tokenizer — works on any modality), exact
    * byte-shingle Jaccard verify on the banded candidates.
    *
    * Shingling is byte-space, not char-space: content is hex-encoded
    * once (2 chars/byte — the portable cross-engine byte view; both
    * engines agree on `hex` up to case, pinned by `upper`) and each
    * DISTINCT shingle is 24 bytes at stride 4. Why MinHash and not the
    * text family's SimHash: assets here are SHORT (50-600 bytes →
    * 6-140 shingles), and a SimHash bit's vote margin is ~√n, so even
    * a 5-byte mutation — which poisons window/stride ≈ 6 windows —
    * flips 5-10 of 48 bits on a 300-byte asset (measured this round;
    * a biased-bit variant admitted thousands of false pairs first).
    * Set-Jaccard degrades gracefully instead: J = (n-c)/(n+c) ≈ 0.85
    * for the same mutation, cleanly above noise (~0 for unrelated
    * assets — the 30-word synthetic vocabulary shares almost no
    * DISTINCT 24-byte phrases across documents).
    *
    * Scale shape (the [[graft.operators.Dedup.minhashLsh]] plan,
    * byte-level): one md5 per distinct shingle feeds all four minhash
    * functions (digest windows) AND the 16-byte intersection join key;
    * candidates come from 4 single-hash band equi-joins (P[capture] =
    * 1-(1-J)⁴ — 0.94 at J=0.5, ~1 at the planted twins' J), never an
    * all-pairs cross; the exact |∩| runs ONLY over candidate pairs
    * (semi-join pushdown); no static broadcast anywhere (candidates
    * are O(N·dup-rate) — AQE may downgrade at runtime, the only safe
    * time). Near-dup TWINS are planted deterministically (every
    * doc_id ≡ 0 mod 37 gets a copy with its first 5 bytes replaced,
    * asset_id + 10⁶) so the query demonstrates its own recall and the
    * oracle checks shingling, banding, and verify end to end;
    * `MmDedupSpec` pins the planted outcomes. */
  def byteNearDup(spark: SparkSession, dir: String,
      minJaccardE4: Long = 4000L): DataFrame = {
    import graft.functions.PortableHash.phashFromDigest
    val docs = graft.core.Tables(spark, dir).documentsSpread
      .select(col("doc_id"), col("text"))
    val base = docs.select(col("doc_id").as("asset_id"), col("text").as("txt"))
    val planted = docs.filter(pmod(col("doc_id"), lit(37L)) === 0)
      .select((col("doc_id") + 1000000L).as("asset_id"),
        concat(lit("XXXXX"), expr("substring(text, 6)")).as("txt"))
    val assets = base.unionByName(planted)
      .withColumn("hx", upper(hex(encode(col("txt"), "UTF-8"))))
      .withColumn("nb", length(encode(col("txt"), "UTF-8")))
      .filter(col("nb") >= 24)
    // distinct 24-byte shingles, one md5 digest per (asset, shingle):
    // 16-byte binary join keys, hex form feeds the 4 minhash windows
    val sh = assets
      .select(col("asset_id"), col("hx"),
        explode(expr("sequence(0, CAST((nb - 24) div 4 AS INT))")).as("j"))
      .select(col("asset_id"),
        unhex(md5(expr("substring(hx, 8 * j + 1, 48)"))).as("sd"))
      .distinct()
      .cache()
    val sigs = sh.withColumn("m", lower(hex(col("sd"))))
      .groupBy(col("asset_id")).agg(
        min(phashFromDigest(col("m"), 0)).as("mh1"),
        min(phashFromDigest(col("m"), 1)).as("mh2"),
        min(phashFromDigest(col("m"), 2)).as("mh3"),
        min(phashFromDigest(col("m"), 3)).as("mh4"),
        count(lit(1)).as("n_sh"))
    // 4 single-hash bands (prefixed so bands can't cross-match): short
    // assets sit at moderate J, where r bands of 1 hash capture with
    // 1-(1-J)^4 — the 2-bands-of-2 text configuration would miss them
    val bands = sigs.select(col("asset_id"), col("n_sh"),
      explode(array(
        concat(lit("1_"), col("mh1")), concat(lit("2_"), col("mh2")),
        concat(lit("3_"), col("mh3")), concat(lit("4_"), col("mh4"))))
        .as("bk"))
    val l = bands.select(col("bk"), col("asset_id").as("a"), col("n_sh").as("na"))
    val r = bands.select(col("bk"), col("asset_id").as("b"), col("n_sh").as("nb"))
    val cands = l.join(r, Seq("bk")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("na"), col("nb")).distinct()
      .cache()
    // exact |∩| only for candidate pairs — semi-join pushdown on the
    // fixed-width digest key, the minhashLsh contract
    val shA = sh.select(col("asset_id").as("a"), col("sd"))
    val shB = sh.select(col("asset_id").as("b"), col("sd"))
    val candSh = cands.select(col("a"), col("b")).join(shA, Seq("a"))
    val inter = shB.join(candSh, Seq("b", "sd"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    cands.join(inter, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("na") + col("nb") - coalesce(col("inter"), lit(0L))).as("union_n"))
      .withColumn("jaccard_e4",
        expr("(20000 * inter + union_n) div (2 * union_n)"))
      .filter(col("jaccard_e4") >= minJaccardE4)
      .orderBy(col("a"), col("b"))
  }

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

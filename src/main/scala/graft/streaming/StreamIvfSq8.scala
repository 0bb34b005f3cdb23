package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.core.{Scratch, Tables}
import graft.lake.TxTable
import graft.operators.Similarity

/** Streamed maintenance for the COMPOSED, code-carrying vector index
  * (VERDICT r12 task 6) — closes the last lifecycle asymmetry:
  * [[StreamIvf]] gave the exact √N postings a streamed transport in
  * r12, but the SQ8/PQ postings (codes beside vectors) still had
  * batch-only append. This is the mechanical composition the verdict
  * named: [[StreamIvf]]'s idempotent micro-batch transport + the
  * pinned-range SQ8 encode.
  *
  * Lifecycle: the build-time artifacts — gate-sampled Lloyd centroids
  * ([[Similarity.sampleQuantizer]]) and the global [mn,mx] code range
  * — are pinned ONCE and never retrained; the seed commit writes the
  * base 90% (vec_id % 10 != 9) assigned + encoded against them; the
  * late 10% arrive as parquet files tailed one per micro-batch, each
  * batch assigned (argmin against the pinned centroids) and SQ8-
  * encoded (against the pinned range) before an
  * [[TxTable.appendBatchIdempotent]] commit — the batch marker makes
  * a redelivered micro-batch a no-op (`StreamIvfSq8Spec`).
  *
  * Pinned centroids + pinned range + exact-integer assignment/encode
  * ⇒ every vector lands with the same (cell, codes) row a one-shot
  * [[Similarity.ivfSq8BuildSample]] would give it, so neither the
  * transport nor redelivery can change an answer: the serve shares
  * `sim_ann_ivfsq8_sample`'s oracle verbatim. Per-batch work is
  * |batch|·k against the pinned centroid broadcast plus a |batch|·d
  * encode — independent of the corpus — and the serve is the standing
  * index's Bloom-pruned code-scan + rerank, unchanged. */
object StreamIvfSq8 {

  /** Seed + stream the composed index; returns the standing-index
    * handle so the redelivery spec can replay a batch against the
    * same snapshot the serve reads. */
  private[graft] def streamTables(spark: SparkSession,
      dir: String): Similarity.IvfSq8Index = {
    val isDelta = pmod(col("vec_id"), lit(10L)) === 9L
    // artifacts pinned at build over the FULL corpus — bit-identical
    // to the sample-trained batch build's, which is what makes the
    // streamed transport answer-neutral BY CONSTRUCTION rather than
    // by re-derivation
    val (cents, _) = Similarity.sampleQuantizer(spark, dir)
    val range = Similarity.quantized(spark, dir)
      .agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
      .localCheckpoint()
    val r0 = range.head()
    val mnv = r0.getAs[Long]("mn")
    val sv = math.max(r0.getAs[Long]("mx") - mnv, 1L)
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))

    // assign + encode one slice against the PINNED artifacts: the
    // on-row ArgminCellQ kernel (r16 — no assignment exchange, no
    // join-back) and the direct array encode (no N·d exchange) — seed
    // and micro-batches run the same function, so a streamed row can't
    // differ from a seeded one
    def encoded(part: DataFrame): DataFrame =
      Similarity.withArgminCell(part, cents)
        .withColumn("codes", Similarity.sq8EncodeExpr(mnv, sv))
        .withColumn("code_sum",
          expr("aggregate(codes, 0L, (a, x) -> a + x)"))
        .select(col("cell"), col("vec_id"), col("codes"), col("code_sum"),
          col("embedding"))

    val pDir = Scratch.fresh("tx_ivf_sq8_stream")
    val tx = TxTable(spark, pDir)
    tx.append(
      encoded(emb.filter(!isDelta)).repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))

    // late vectors land as parquet files (bit-exact float[] transport);
    // one file per micro-batch — the [[StreamIvf]] transport verbatim
    val srcDir = Scratch.fresh("ivfsq8_late_src")
    emb.filter(isDelta).repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = StructType.fromDDL("vec_id LONG, embedding ARRAY<FLOAT>")
    val chk = Scratch.fresh("ivfsq8_late_chk")
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        tx.appendBatchIdempotent(encoded(batch), id, bloomCols = Seq("cell"))
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val cDir = Scratch.fresh("tx_ivf_sq8_stream_cents")
    TxTable(spark, cDir).append(cents)
    val sDir = Scratch.fresh("tx_ivf_sq8_stream_stats")
    TxTable(spark, sDir).append(range)
    Similarity.writeIndexManifest(pDir, "family" -> "ivf_sq8#stream",
      "centroids" -> cDir, "stats" -> sDir)
    // registration is the CALLER's job: ensureStreamed installs via
    // computeIfAbsent (whose mapping function must not touch the map),
    // the full-lifecycle serve and loadStreamed put explicitly
    Similarity.IvfSq8Index(pDir, cDir, sDir)
  }

  /** Standing streamed-index registry, the batch families' pattern:
    * one seed+stream per corpus per process; `stream_ivfsq8_serve`
    * always re-drives the full lifecycle, [[streamIvfSq8ServeOnly]]
    * get-or-streams so ITS timed row is the serve alone. */
  private val standing =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.IvfSq8Index]()

  /** Get-or-build the stream-maintained snapshot (Bench warms it so
    * `stream_ivfsq8_serve_only` times the serving path alone).
    * computeIfAbsent makes the get-then-build atomic — two concurrent
    * callers can no longer both run the full seed+stream and race the
    * registry put (ADVICE r14). */
  def ensureStreamed(spark: SparkSession, dir: String): Similarity.IvfSq8Index =
    standing.computeIfAbsent(dir, _ => streamTables(spark, dir))

  /** Cold-session loader for the STREAMED snapshot — same contract as
    * the batch families' `Similarity.loadIvfSq8`: the manifest beside
    * the streamed postings names the pinned centroid/range roots, so a
    * fresh JVM serves the stream-maintained layout without re-seeding
    * or re-streaming anything. */
  def loadStreamed(spark: SparkSession, dir: String,
      postingsRoot: String): Similarity.IvfSq8Index = {
    val m = Similarity.readIndexManifest(postingsRoot)
    Similarity.requireFamily(m, postingsRoot, "ivf_sq8#stream")
    val idx = Similarity.IvfSq8Index(postingsRoot,
      Similarity.manifestKey(m, postingsRoot, "centroids"),
      Similarity.manifestKey(m, postingsRoot, "stats"))
    standing.put(dir, idx)
    idx
  }

  /** Test hook: forget the standing streamed registration (simulates
    * the cold session [[loadStreamed]] exists for). */
  private[graft] def dropStreamedForTest(dir: String): Unit = {
    standing.remove(dir)
    ()
  }

  /** Multi-probe SQ8 code-scan + exact-rerank serve from the merged
    * streamed snapshot — [[Similarity.annIvfSq8Sample]]'s serving path
    * over the stream-maintained postings (the serve never knows how
    * its postings arrived; same defaults, same oracle). */
  def streamIvfSq8Serve(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 20, nprobe: Int = 3): DataFrame = {
    // seed+stream timed into the audit registry so Bench can report
    // the row's seed_sec/serve_sec split (VERDICT r15 task 5)
    val idx = graft.core.BuildAudit.timed("stream_ivfsq8_serve")(
      streamTables(spark, dir))
    standing.put(dir, idx) // full lifecycle refreshes the registry: last build wins
    Similarity.annIvfSq8From(spark, dir, idx, k, candK, nprobe)
  }

  /** The SERVE half on its own (VERDICT r13 task 6): the same answer
    * over a pre-seeded streamed snapshot, so the streamed transport's
    * serving cost is its own decade-flat row — `stream_ivfsq8_serve`
    * keeps owning the full seed+stream+serve lifecycle, the FTS
    * family's build/serve split (`text_fts_build` / `text_bm25_indexed`)
    * applied to the streamed vector index. */
  def streamIvfSq8ServeOnly(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 20, nprobe: Int = 3): DataFrame =
    Similarity.annIvfSq8From(spark, dir, ensureStreamed(spark, dir),
      k, candK, nprobe)
}

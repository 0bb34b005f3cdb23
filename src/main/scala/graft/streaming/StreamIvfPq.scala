package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.core.{Scratch, Tables}
import graft.lake.TxTable
import graft.operators.Similarity

/** Streamed maintenance for the IVF-PQ index — the last cell of the
  * lifecycle matrix: after r12's [[StreamIvf]] (exact √N postings)
  * and r13's [[StreamIvfSq8]] (scalar-quantized codes), this gives
  * the PRODUCT-quantized postings the same idempotent micro-batch
  * transport, so all three standing vector-index families
  * (exact / SQ8 / PQ) now have both a batch and a streamed append
  * path with one serving implementation each.
  *
  * Lifecycle, [[StreamIvfSq8]] verbatim with the PQ artifacts
  * swapped in: the build-time pins are the gate-sampled Lloyd
  * centroids ([[Similarity.sampleQuantizer]] — same coarse alphabet
  * as `sim_ann_ivfpq_sample`'s batch build) and the per-(subspace,
  * code) PQ codebook trained over the FULL corpus
  * ([[Similarity.pqCodebook]] — one linear N·d aggregate, the same
  * full-corpus pin the batch build makes, and the PQ analogue of the
  * SQ8 family's global [mn,mx] range). The seed commit writes the
  * base 90% (vec_id % 10 != 9) assigned + PQ-encoded against them;
  * the late 10% arrive as parquet files tailed one per micro-batch,
  * each batch assigned (map-side-combining argmin against the pinned
  * centroid broadcast) and encoded ([[Similarity.pqEncodeAgainst]] —
  * exact-integer subspace argmin against the pinned codebook) before
  * an [[TxTable.appendBatchIdempotent]] commit; the batch marker
  * makes a redelivered micro-batch a no-op (`StreamIvfPqSpec`).
  *
  * Pinned centroids + pinned codebook + exact-integer assignment and
  * encode ⇒ every vector lands with the same (cell, codes) row the
  * one-shot sample-trained batch build gives it
  * ([[Similarity.pqEncodeAgainst]]'s per-vector argmin reads only
  * that vector's own coordinates, so slicing the corpus cannot move
  * a code), and the serve shares `sim_ann_ivfpq_sample`'s oracle
  * verbatim. Per-batch work is |batch|·k against the centroid
  * broadcast plus a |batch|·d encode against the (d/8)·|codes|·8-row
  * codebook — independent of the corpus size — and the serve is the
  * standing index's Bloom-pruned ADC code-scan + candK exact rerank,
  * unchanged. */
object StreamIvfPq {

  /** Seed + stream the PQ index; returns the standing-index handle so
    * the redelivery spec can replay a batch against the same snapshot
    * the serve reads. */
  private[graft] def streamTables(spark: SparkSession,
      dir: String): Similarity.IvfPqIndex = {
    val isDelta = pmod(col("vec_id"), lit(10L)) === 9L
    // artifacts pinned at build over the FULL corpus — bit-identical
    // to the sample-trained batch build's, which is what makes the
    // streamed transport answer-neutral BY CONSTRUCTION rather than
    // by re-derivation
    val (cents, _) = Similarity.sampleQuantizer(spark, dir)
    val cb = Similarity.pqCodebook(Similarity.qe4(spark, dir))
      .localCheckpoint()
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))

    // assign + encode one slice against the PINNED artifacts — seed
    // and micro-batches run the same function, so a streamed row
    // can't differ from a seeded one. r16: both the argmin cell and
    // the PQ codes are computed ON the row by the codegen kernels —
    // the two per-commit join-backs (and the encode's N·d·|codes|
    // subDist expansion) are gone
    def encoded(part: DataFrame): DataFrame =
      Similarity.withPqCodes(
          Similarity.withArgminCell(part, cents), cb, dimsPerSub = 8)
        .select(col("cell"), col("vec_id"), col("codes"), col("embedding"))

    val pDir = Scratch.fresh("tx_ivf_pq_stream")
    val tx = TxTable(spark, pDir)
    tx.append(
      encoded(emb.filter(!isDelta)).repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))

    // late vectors land as parquet files (bit-exact float[] transport);
    // one file per micro-batch — the [[StreamIvf]] transport verbatim
    val srcDir = Scratch.fresh("ivfpq_late_src")
    emb.filter(isDelta).repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = StructType.fromDDL("vec_id LONG, embedding ARRAY<FLOAT>")
    val chk = Scratch.fresh("ivfpq_late_chk")
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

    val cDir = Scratch.fresh("tx_ivf_pq_stream_cents")
    TxTable(spark, cDir).append(cents)
    val bDir = Scratch.fresh("tx_ivf_pq_stream_cb")
    TxTable(spark, bDir).append(cb)
    Similarity.writeIndexManifest(pDir, "family" -> "ivf_pq#stream",
      "centroids" -> cDir, "codebook" -> bDir)
    // registration is the CALLER's job: ensureStreamed installs via
    // computeIfAbsent (whose mapping function must not touch the map),
    // the full-lifecycle serve and loadStreamed put explicitly
    Similarity.IvfPqIndex(pDir, cDir, bDir)
  }

  /** Standing streamed-index registry, the batch families' pattern:
    * one seed+stream per corpus per process; `stream_ivfpq_serve`
    * always re-drives the full lifecycle, [[streamIvfPqServeOnly]]
    * get-or-streams so ITS timed row is the serve alone. */
  private val standing =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.IvfPqIndex]()

  /** Get-or-build the stream-maintained snapshot (Bench warms it so
    * `stream_ivfpq_serve_only` times the serving path alone).
    * computeIfAbsent makes the get-then-build atomic — two concurrent
    * callers can no longer both run the full seed+stream and race the
    * registry put (ADVICE r14). */
  def ensureStreamed(spark: SparkSession, dir: String): Similarity.IvfPqIndex =
    standing.computeIfAbsent(dir, _ => streamTables(spark, dir))

  /** Cold-session loader for the STREAMED snapshot — same contract as
    * the batch families' `Similarity.loadIvfPq`: the manifest beside
    * the streamed postings names the pinned centroid/codebook roots,
    * so a fresh JVM serves the stream-maintained layout without
    * re-seeding or re-streaming anything. */
  def loadStreamed(spark: SparkSession, dir: String,
      postingsRoot: String): Similarity.IvfPqIndex = {
    val m = Similarity.readIndexManifest(postingsRoot)
    Similarity.requireFamily(m, postingsRoot, "ivf_pq#stream")
    val idx = Similarity.IvfPqIndex(postingsRoot,
      Similarity.manifestKey(m, postingsRoot, "centroids"),
      Similarity.manifestKey(m, postingsRoot, "codebook"))
    standing.put(dir, idx)
    idx
  }

  /** Test hook: forget the standing streamed registration (simulates
    * the cold session [[loadStreamed]] exists for). */
  private[graft] def dropStreamedForTest(dir: String): Unit = {
    standing.remove(dir)
    ()
  }

  /** Multi-probe ADC code-scan + candK exact-rerank serve from the
    * merged streamed snapshot — [[Similarity.annIvfPqSample]]'s
    * serving path over the stream-maintained postings (the serve
    * never knows how its postings arrived; same defaults, same
    * oracle). */
  def streamIvfPqServe(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 100, nprobe: Int = 3): DataFrame = {
    // seed+stream timed into the audit registry so Bench can report
    // the row's seed_sec/serve_sec split (VERDICT r15 task 5)
    val idx = graft.core.BuildAudit.timed("stream_ivfpq_serve")(
      streamTables(spark, dir))
    standing.put(dir, idx) // full lifecycle refreshes the registry: last build wins
    Similarity.annIvfPqFrom(spark, dir, idx, k, candK, nprobe)
  }

  /** The SERVE half on its own (VERDICT r13 task 6): the same answer
    * over a pre-seeded streamed snapshot, so the streamed transport's
    * serving cost is its own decade-flat row — `stream_ivfpq_serve`
    * keeps owning the full seed+stream+serve lifecycle, the FTS
    * family's build/serve split applied to the streamed PQ index. */
  def streamIvfPqServeOnly(spark: SparkSession, dir: String, k: Int = 5,
      candK: Int = 100, nprobe: Int = 3): DataFrame =
    Similarity.annIvfPqFrom(spark, dir, ensureStreamed(spark, dir),
      k, candK, nprobe)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.core.{Scratch, Tables}
import graft.lake.TxTable
import graft.operators.Similarity

/** Streamed VECTOR-index maintenance + serve (VERDICT r11 task 6) —
  * the IVF twin of [[StreamFts]], closing the asymmetry where the FTS
  * index had a full streamed lifecycle but the vector index's
  * incremental path (`sim_ivf_append`) was batch-only.
  *
  * Lifecycle: the quantizer is trained ONCE on the base corpus
  * (vec_id % 10 != 9 — the same pinned-centroid contract as
  * `Similarity.ivfAppendServe`) and never retrained; the base
  * vectors' assignments seed the postings table cell-clustered with
  * Bloom bitmaps; the late 10% arrive as parquet files which the
  * stream tails one file per micro-batch (the reference's
  * per-uploaded-file transport, `Send_Data_To_DataLake/main.py:64`),
  * each batch assigned against the PINNED centroids and committed
  * through `TxTable.appendBatchIdempotent` — the batch marker makes a
  * redelivered micro-batch a no-op, so the index is exactly-once
  * under source-side retries (`StreamIvfSpec` replays a batch and
  * asserts the serve is byte-identical).
  *
  * Pinned quantizer + deterministic assignment ⇒ every vector lands
  * in the cell a one-shot build would give it, so neither the
  * streaming transport nor redelivery can change an answer: the serve
  * shares `sim_ivf_append`'s oracle (the re-clustering computation)
  * verbatim. Per-batch work is |batch|·k — independent of the corpus
  * — and the serve is one Bloom-pruned point read of the probed
  * cells' postings, exactly the standing-index serving cost. */
object StreamIvf {

  /** Seed + stream the index; returns (postings table, pinned
    * centroids) so the redelivery spec can replay a batch against the
    * same snapshot the serve reads. */
  private[graft] def streamIvfTables(spark: SparkSession,
      dir: String): (TxTable, DataFrame) = {
    val isDelta = pmod(col("vec_id"), lit(10L)) === 9L
    val qe = Similarity.qe4(spark, dir)
    // quantizer pinned at build: label-seeded centroids from the BASE
    // subset only, checkpointed once so seed, stream, and serve share
    // one frame (ivfAppendServe's contract)
    val cents = Similarity.labelCentroids(qe.filter(!isDelta))
      .localCheckpoint()
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))

    // r16: argmin ON the row via the ArgminCellQ kernel (same integers,
    // same tie-break as the relational rank — KernelEquivalenceSpec);
    // the per-commit N·d·k dim-join + window + join-back are gone
    def assigned(part: DataFrame): DataFrame =
      Similarity.withArgminCell(part, cents)
        .select(col("cell"), col("vec_id"), col("embedding"))

    val tx = TxTable(spark, Scratch.fresh("tx_ivf_stream"))
    tx.append(
      assigned(emb.filter(!isDelta)).repartitionByRange(8, col("cell")),
      bloomCols = Seq("cell"))

    // the late vectors land as parquet files (bit-exact transport for
    // the float[] column, unlike JSON); one file per micro-batch
    val srcDir = Scratch.fresh("ivf_late_src")
    emb.filter(isDelta).repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = StructType.fromDDL("vec_id LONG, embedding ARRAY<FLOAT>")
    val chk = Scratch.fresh("ivf_late_chk")
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        tx.appendBatchIdempotent(assigned(batch), id,
          bloomCols = Seq("cell"))
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (tx, cents)
  }

  /** Multi-probe exact-cosine serve from the merged snapshot — one
    * Bloom-pruned point read of the probed cells, probe ranking on the
    * pinned centroid table only. */
  private[graft] def serveFrom(spark: SparkSession, dir: String,
      tx: TxTable, cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val qe = Similarity.qe4(spark, dir).filter(col("vec_id") < 5)
    val probes = Similarity.rankedAgainst(qe, cents)
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cell").as("q_cell"))
    val cellIds = probes.select(col("q_cell")).distinct()
      .collect().map(r => lit(r.get(0))).toSeq
    val queries = probes.join(
      Tables(spark, dir).embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb")),
      Seq("qid"))
    val scored = tx.readWhereIn("cell", cellIds)
      .join(broadcast(queries), col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_e6",
        graft.functions.CosineSimQ.cosineSimE6(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Standing streamed-index registry, the batch families' pattern:
    * one seed+stream per corpus per process; `stream_ivf_serve`
    * always re-drives the full lifecycle, [[streamIvfServeOnly]]
    * get-or-streams so ITS timed row is the serve alone. */
  private val standing =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.IvfIndex]()

  /** Seed + stream, then persist the pinned centroids beside the
    * postings under a manifest — the durable-handle shape the other
    * streamed families got in r14; returns the handle WITHOUT
    * registering it (registration is the caller's job: ensureStreamed
    * installs via computeIfAbsent, whose mapping function must not
    * touch the map; the full-lifecycle serve and loadStreamed put
    * explicitly). */
  private[graft] def streamIndex(spark: SparkSession,
      dir: String): Similarity.IvfIndex = {
    val (tx, cents) = streamIvfTables(spark, dir)
    val cDir = Scratch.fresh("tx_ivf_stream_cents")
    TxTable(spark, cDir).append(cents)
    Similarity.writeIndexManifest(tx.root, "family" -> "ivf#stream",
      "centroids" -> cDir)
    Similarity.IvfIndex(tx.root, cDir)
  }

  /** Get-or-build the stream-maintained snapshot (Bench warms it so
    * `stream_ivf_serve_only` times the serving path alone).
    * computeIfAbsent makes the get-then-build atomic — two concurrent
    * callers cannot both run the full seed+stream. */
  def ensureStreamed(spark: SparkSession, dir: String): Similarity.IvfIndex =
    standing.computeIfAbsent(dir, _ => streamIndex(spark, dir))

  /** Cold-session loader for the STREAMED snapshot — same contract as
    * the batch family's `Similarity.loadIvf`: the manifest beside the
    * streamed postings names the pinned centroid root, so a fresh JVM
    * serves the stream-maintained layout without re-seeding or
    * re-streaming anything. */
  def loadStreamed(spark: SparkSession, dir: String,
      postingsRoot: String): Similarity.IvfIndex = {
    val m = Similarity.readIndexManifest(postingsRoot)
    Similarity.requireFamily(m, postingsRoot, "ivf#stream")
    val idx = Similarity.IvfIndex(postingsRoot,
      Similarity.manifestKey(m, postingsRoot, "centroids"))
    standing.put(dir, idx)
    idx
  }

  /** Test hook: forget the standing streamed registration (simulates
    * the cold session [[loadStreamed]] exists for). */
  private[graft] def dropStreamedForTest(dir: String): Unit = {
    standing.remove(dir)
    ()
  }

  /** [[serveFrom]] against a durable handle: the pinned centroids are
    * a k-row point read from their tx root (the corpus is never
    * touched), the postings serve is the same Bloom-pruned read. */
  private def serveFromIndex(spark: SparkSession, dir: String,
      idx: Similarity.IvfIndex, k: Int, nprobe: Int): DataFrame =
    serveFrom(spark, dir, TxTable(spark, idx.postings),
      TxTable(spark, idx.centroids).read(), k, nprobe)

  def streamIvfServe(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    // seed+stream timed into the audit registry so Bench can report
    // the row's seed_sec/serve_sec split (VERDICT r15 task 5)
    val idx = graft.core.BuildAudit.timed("stream_ivf_serve")(
      streamIndex(spark, dir))
    standing.put(dir, idx) // full lifecycle refreshes the registry: last build wins
    serveFromIndex(spark, dir, idx, k, nprobe)
  }

  /** The SERVE half on its own (r15): the same answer over a
    * pre-seeded streamed snapshot, so the streamed transport's serving
    * cost is its own decade-flat row — completing the serve-only
    * matrix across ALL FOUR streamed families (exact IVF here; SQ8,
    * PQ, FTS landed in r14/r15). */
  def streamIvfServeOnly(spark: SparkSession, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame =
    serveFromIndex(spark, dir, ensureStreamed(spark, dir), k, nprobe)
}

package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Similarity, TextAnalysis}

/** Cold-session lifecycle for EVERY standing index family (VERDICT r13
  * task 4): build, forget the JVM registration, reload the handle from
  * the on-disk manifest alone, serve — same answer, and the serve
  * reads the standing layout (the loaded postings root appears in the
  * executed plan) instead of silently rebuilding. Before this round
  * only the √N family had the loader; exact-k, sample, SQ8, PQ and the
  * FTS postings lived in process-local registries a fresh JVM could
  * not reach.
  *
  * Plus the torn-manifest contract (task 8): manifests are written
  * atomically (temp + rename), and a missing file or missing required
  * key fails with a typed error NAMING the index root — never a bare
  * NoSuchElementException. */
class ColdLoadSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def baseName(p: String): String =
    java.nio.file.Paths.get(p).getFileName.toString

  /** Shared drive: build via `ensure`, serve, drop every registration,
    * reload from the postings root, assert handle + answer identity
    * and that the served plan reads the loaded postings. */
  private def roundTrip[I](ensure: => I, serve: () => DataFrame,
      postingsOf: I => String, load: String => I): Unit = {
    val built = ensure
    val before = sorted(serve())
    Similarity.dropStandingForTest(sf)
    val loaded = load(postingsOf(built))
    assert(loaded === built, "manifest round-trip changed the handle")
    val after = serve()
    assert(sorted(after) === before, "cold-loaded serve changed the answer")
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains(baseName(postingsOf(built))),
      s"cold-loaded serve does not read the standing postings:\n$plan")
  }

  test("exact-k IVF: cold load serves the standing index") {
    roundTrip(Similarity.ensureIvf(spark, sf),
      () => Similarity.annIndexed(spark, sf),
      (i: Similarity.IvfIndex) => i.postings,
      Similarity.loadIvf(spark, sf, _))
  }

  test("sample-trained IVF: cold load serves the standing index") {
    roundTrip(Similarity.ensureIvfSample(spark, sf),
      () => Similarity.annIndexedSample(spark, sf),
      (i: Similarity.IvfIndex) => i.postings,
      Similarity.loadIvfSample(spark, sf, _))
  }

  test("IVF-SQ8: cold load serves the standing index") {
    roundTrip(Similarity.ensureIvfSq8(spark, sf),
      () => Similarity.annIvfSq8(spark, sf),
      (i: Similarity.IvfSq8Index) => i.postings,
      Similarity.loadIvfSq8(spark, sf, _))
  }

  test("sample-trained IVF-SQ8: cold load serves the standing index") {
    roundTrip(Similarity.ensureIvfSq8Sample(spark, sf),
      () => Similarity.annIvfSq8Sample(spark, sf),
      (i: Similarity.IvfSq8Index) => i.postings,
      Similarity.loadIvfSq8Sample(spark, sf, _))
  }

  test("IVF-PQ: cold load serves the standing index") {
    roundTrip(Similarity.ensureIvfPq(spark, sf),
      () => Similarity.annIvfPq(spark, sf),
      (i: Similarity.IvfPqIndex) => i.postings,
      Similarity.loadIvfPq(spark, sf, _))
  }

  test("sample-trained IVF-PQ: cold load serves the standing index") {
    roundTrip(Similarity.ensureIvfPqSample(spark, sf),
      () => Similarity.annIvfPqSample(spark, sf),
      (i: Similarity.IvfPqIndex) => i.postings,
      Similarity.loadIvfPqSample(spark, sf, _))
  }

  test("streamed SQ8 snapshot: cold load serves without re-streaming") {
    import graft.streaming.StreamIvfSq8
    val built = StreamIvfSq8.ensureStreamed(spark, sf)
    val before = sorted(StreamIvfSq8.streamIvfSq8ServeOnly(spark, sf))
    StreamIvfSq8.dropStreamedForTest(sf)
    val loaded = StreamIvfSq8.loadStreamed(spark, sf, built.postings)
    assert(loaded === built, "manifest round-trip changed the handle")
    val after = StreamIvfSq8.streamIvfSq8ServeOnly(spark, sf)
    assert(sorted(after) === before, "cold-loaded serve changed the answer")
    assert(after.queryExecution.executedPlan.toString
      .contains(baseName(built.postings)),
      "cold-loaded serve does not read the streamed postings")
  }

  test("streamed PQ snapshot: cold load serves without re-streaming") {
    import graft.streaming.StreamIvfPq
    val built = StreamIvfPq.ensureStreamed(spark, sf)
    val before = sorted(StreamIvfPq.streamIvfPqServeOnly(spark, sf))
    StreamIvfPq.dropStreamedForTest(sf)
    val loaded = StreamIvfPq.loadStreamed(spark, sf, built.postings)
    assert(loaded === built, "manifest round-trip changed the handle")
    val after = StreamIvfPq.streamIvfPqServeOnly(spark, sf)
    assert(sorted(after) === before, "cold-loaded serve changed the answer")
    assert(after.queryExecution.executedPlan.toString
      .contains(baseName(built.postings)),
      "cold-loaded serve does not read the streamed postings")
  }

  test("FTS: cold load serves the standing postings, no corpus re-tokenize") {
    val built = TextAnalysis.ensureFts(spark, sf)
    val before = sorted(TextAnalysis.bm25Indexed(spark, sf))
    TextAnalysis.dropFtsForTest(sf)
    val loaded = TextAnalysis.loadFts(spark, sf, built.postings)
    assert(loaded === built, "manifest round-trip changed the FTS handle")
    val after = TextAnalysis.bm25Indexed(spark, sf)
    assert(sorted(after) === before, "cold-loaded BM25 changed the answer")
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains(baseName(built.postings)),
      s"cold-loaded BM25 does not read the standing postings:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"cold-loaded BM25 re-scans the document corpus:\n$plan")
  }

  test("streamed exact-IVF snapshot: cold load serves without re-streaming") {
    import graft.streaming.StreamIvf
    val built = StreamIvf.ensureStreamed(spark, sf)
    val before = sorted(StreamIvf.streamIvfServeOnly(spark, sf))
    StreamIvf.dropStreamedForTest(sf)
    val loaded = StreamIvf.loadStreamed(spark, sf, built.postings)
    assert(loaded === built, "manifest round-trip changed the handle")
    val after = StreamIvf.streamIvfServeOnly(spark, sf)
    assert(sorted(after) === before, "cold-loaded serve changed the answer")
    assert(after.queryExecution.executedPlan.toString
      .contains(baseName(built.postings)),
      "cold-loaded serve does not read the streamed postings")
  }

  test("streamed FTS snapshot: cold load serves without re-streaming") {
    import graft.streaming.StreamFts
    val built = StreamFts.ensureStreamed(spark, sf)
    val before = sorted(StreamFts.streamFtsServeOnly(spark, sf))
    StreamFts.dropStreamedForTest(sf)
    val loaded = StreamFts.loadStreamed(spark, sf, built.postings)
    assert(loaded === built, "manifest round-trip changed the handle")
    val after = StreamFts.streamFtsServeOnly(spark, sf)
    assert(sorted(after) === before, "cold-loaded serve changed the answer")
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains(baseName(built.postings)),
      "cold-loaded serve does not read the streamed postings")
    assert(!plan.contains("documents.parquet"),
      s"cold-loaded streamed BM25 re-scans the document corpus:\n$plan")
  }

  /** Mid-churn cold load (VERDICT r14 stretch task 7): the plain
    * round-trips above reload a freshly-streamed snapshot; a real
    * restart lands on a table that has since been COMPACTED (every
    * postings file rewritten under a new commit) and that carries a
    * redelivered micro-batch marker in a superseded manifest. The
    * reloaded handle must (a) still suppress the redelivered batch —
    * markers live in kept superseded manifests, so compaction must not
    * lose them — and (b) serve the identical answer the in-process
    * handle gives over the churned layout. */
  private def churnTrip[I](built: I, postingsOf: I => String,
      clusterCol: String, serve: () => DataFrame, drop: () => Unit,
      load: String => I): Unit = {
    import graft.lake.TxTable
    val tx = TxTable(spark, postingsOf(built))
    tx.compact(targetFiles = 2, bloomCols = Seq(clusterCol),
      clusterBy = Seq(clusterCol))
    // batch 0 committed during the original stream; its redelivery
    // must find the marker ACROSS the compaction commit and be a no-op
    val redelivered = tx.appendBatchIdempotent(tx.read().limit(1),
      batchId = 0L, bloomCols = Seq(clusterCol))
    assert(redelivered.isEmpty,
      "redelivered batch marker was lost across compaction")
    val before = sorted(serve())
    drop()
    val loaded = load(postingsOf(built))
    assert(loaded === built, "mid-churn reload changed the handle")
    val after = serve()
    assert(sorted(after) === before,
      "mid-churn cold-loaded serve changed the answer")
    // the post-load serve goes through ensureStreamed, which would
    // silently re-stream a fresh deterministic snapshot if loadStreamed
    // ever stopped registering the handle — and the answer-equality
    // assert above would pass vacuously; pin the plan to the BUILT
    // postings root, as the plain round-trip tests do (ADVICE r15)
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains(baseName(postingsOf(built))),
      s"mid-churn cold-loaded serve does not read the built postings:\n$plan")
  }

  test("streamed exact-IVF: mid-churn cold load (compaction + redelivery marker)") {
    import graft.streaming.StreamIvf
    churnTrip[graft.operators.Similarity.IvfIndex](
      StreamIvf.ensureStreamed(spark, sf), _.postings, "cell",
      () => StreamIvf.streamIvfServeOnly(spark, sf),
      () => StreamIvf.dropStreamedForTest(sf),
      StreamIvf.loadStreamed(spark, sf, _))
  }

  test("streamed SQ8: mid-churn cold load (compaction + redelivery marker)") {
    import graft.streaming.StreamIvfSq8
    churnTrip[graft.operators.Similarity.IvfSq8Index](
      StreamIvfSq8.ensureStreamed(spark, sf), _.postings, "cell",
      () => StreamIvfSq8.streamIvfSq8ServeOnly(spark, sf),
      () => StreamIvfSq8.dropStreamedForTest(sf),
      StreamIvfSq8.loadStreamed(spark, sf, _))
  }

  test("streamed PQ: mid-churn cold load (compaction + redelivery marker)") {
    import graft.streaming.StreamIvfPq
    churnTrip[graft.operators.Similarity.IvfPqIndex](
      StreamIvfPq.ensureStreamed(spark, sf), _.postings, "cell",
      () => StreamIvfPq.streamIvfPqServeOnly(spark, sf),
      () => StreamIvfPq.dropStreamedForTest(sf),
      StreamIvfPq.loadStreamed(spark, sf, _))
  }

  test("streamed FTS: mid-churn cold load (compaction + redelivery marker)") {
    import graft.streaming.StreamFts
    churnTrip[StreamFts.FtsStreamIndex](
      StreamFts.ensureStreamed(spark, sf), _.postings, "tok",
      () => StreamFts.streamFtsServeOnly(spark, sf),
      () => StreamFts.dropStreamedForTest(sf),
      StreamFts.loadStreamed(spark, sf, _))
  }

  test("missing manifest fails typed, naming the root") {
    val root = java.nio.file.Files.createTempDirectory("graft-no-manifest")
    val e = intercept[Similarity.IndexManifestError] {
      Similarity.loadIvf(spark, sf, root.toString)
    }
    assert(e.root === root.toString)
    assert(e.getMessage.contains(root.toString))
  }

  test("torn manifest (missing required key) fails typed, naming root and key") {
    val root = java.nio.file.Files.createTempDirectory("graft-torn-manifest")
    // a partial write that lost the centroids line
    Similarity.writeIndexManifest(root.toString, "family" -> "ivf")
    val e = intercept[Similarity.IndexManifestError] {
      Similarity.loadIvf(spark, sf, root.toString)
    }
    assert(e.root === root.toString)
    assert(e.getMessage.contains("centroids"))
    assert(e.getMessage.contains("family"),
      "error should list the keys that ARE present")
  }

  test("loading the wrong family's root fails typed, not mismatched") {
    // a PQ manifest HAS a 'centroids' key — without the family guard,
    // loadIvf would happily register code-carrying PQ postings as an
    // exact-k index and the next serve would read garbage
    val pq = Similarity.ensureIvfPq(spark, sf)
    val e = intercept[Similarity.IndexManifestError] {
      Similarity.loadIvf(spark, sf, pq.postings)
    }
    assert(e.getMessage.contains("family mismatch"))
    assert(e.getMessage.contains("ivf_pq"))
  }

  test("manifest write is atomic: no temp residue, rewrite replaces") {
    val root = java.nio.file.Files.createTempDirectory("graft-manifest-atomic")
    Similarity.writeIndexManifest(root.toString, "centroids" -> "/a")
    Similarity.writeIndexManifest(root.toString, "centroids" -> "/b")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(root).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(files === Seq("_graft_index_manifest"),
      s"unexpected residue in manifest dir: $files")
    val m = Similarity.readIndexManifest(root.toString)
    assert(m("centroids") === "/b")
  }
}

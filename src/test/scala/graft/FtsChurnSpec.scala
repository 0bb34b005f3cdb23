package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The standing-index churn lifecycle (round-9 task 3): N fragmented
  * appends, a layout-restoring compaction, then serving. The DuckDB
  * oracle checks the served scores; these check the LAYOUT claims —
  * bounded file count, restored Bloom bitmaps, real pruning. */
class FtsChurnSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("compaction bounds the file count and restores the index layout") {
    val (idx, st) = TextAnalysis.ftsChurnTables(spark, sf,
      slices = 10, targetFiles = 8,
      graft.core.Scratch.fresh("tx_churn_spec"),
      graft.core.Scratch.fresh("tx_churn_spec_stats"))
    val snap = idx.latest().get
    // 10 appends x up-to-4 files each collapsed to <= targetFiles
    assert(snap.files.size <= 8,
      s"post-compaction snapshot holds ${snap.files.size} files")
    // every compacted file carries a fresh tok bitmap: a bitmap-less
    // file would be read by EVERY point query, defeating the index
    assert(snap.files.forall(e => idx.entryBlooms(e).contains("tok")),
      "compaction must re-record the Bloom bitmaps")
    // and the bitmaps actually prune: a term that hashes into few
    // range-clustered files must not touch all of them
    val hit = idx.bloomLiveEntries(snap, "tok", lit("spark"))
    assert(hit.nonEmpty && hit.size < snap.files.size,
      s"point read touches ${hit.size}/${snap.files.size} files — no pruning")
    assert(st.latest().get.files.size == 1, "stats table compacts to one file")
  }

  test("the churned index serves the scan path's exact result") {
    val served = TextAnalysis.ftsChurn(spark, sf).collect().toSeq
    val scanned = TextAnalysis.bm25Search(spark, sf).collect().toSeq
    assert(served == scanned,
      "append→fragment→compact→serve must never change an answer")
  }
}

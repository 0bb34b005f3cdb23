package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import graft.lake.{Lake, TxTable}

/** Transaction-log zone table: atomic commits, optimistic concurrency,
  * ingest-during-compaction survival (VERDICT r2 item 9's concurrent-
  * write gate). */
class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): TxTable =
    Lake(spark, Files.createTempDirectory("graft-tx").toString)
      .txTable("refine", "vehicle")

  test("append commits atomic snapshots; snapshot reads see exactly them") {
    val t = freshTable()
    assert(t.latest().isEmpty)
    val v0 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v1 = t.append(Seq((3L, "c")).toDF("id", "s"))
    assert(v0 == 0L && v1 == 1L)
    assert(t.read().count() == 3)
    // old snapshot still readable (time travel)
    assert(t.read(Some(v0)).count() == 2)
  }

  test("rows ingested DURING compaction survive the compaction commit") {
    val t = freshTable()
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"f$i")).toDF("id", "s")))
    val before = t.latest().get
    assert(before.files.size >= 4)
    // inject an append at the worst moment: after the compactor read
    // its inputs and rewrote them, before it commits
    t.compact(targetFiles = 1, beforeCommit = () =>
      t.append(Seq((99L, "late")).toDF("id", "s")))
    val ids = t.read().collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L, 99L), s"lost rows: $ids")
    // the compacted snapshot = 1 rewritten file + the late file(s)
    val after = t.latest().get
    assert(after.files.size < before.files.size + 1)
  }

  test("racing appenders all commit (optimistic retry) and lose nothing") {
    val t = freshTable()
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(8)
    (1 to 8).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try t.append(Seq((i.toLong, s"w$i")).toDF("id", "s"))
          finally done.countDown()
        }
      })
    }
    start.countDown()
    assert(done.await(120, TimeUnit.SECONDS), "writers timed out")
    pool.shutdown()
    assert(t.read().collect().map(_.getLong(0)).toSet == (1L to 8L).toSet)
    assert(t.latest().get.version == 7L) // 8 commits, each its own version
  }

  test("vacuum reclaims replaced files; the live snapshot is untouched") {
    val t = freshTable()
    (1 to 3).foreach(i => t.append(Seq((i.toLong, s"f$i")).toDF("id", "s")))
    t.compact(targetFiles = 1)
    val reclaimed = t.vacuum()
    assert(reclaimed >= 3, s"expected the 3 pre-compaction files gone, got $reclaimed")
    assert(t.read().collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("vacuum spares a concurrent writer's staged-not-committed file") {
    val t = freshTable()
    t.append(Seq((1L, "a")).toDF("id", "s"))
    // simulate an in-flight writer: a data file present but listed in
    // NO manifest yet (stage() has run, commit() has not)
    val dataDir = java.nio.file.Paths.get(t.root, "data")
    val staged = dataDir.resolve("in-flight.parquet")
    Files.write(staged, Array[Byte](1, 2, 3))
    assert(t.vacuum() == 0, "young unreferenced file must survive vacuum")
    assert(Files.exists(staged))
    // once older than the retention horizon it is an aborted orphan
    Files.setLastModifiedTime(staged,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600_000L))
    assert(t.vacuum() == 1)
    assert(!Files.exists(staged))
    assert(t.read().count() == 1)
  }

  test("replayed batch id loses the commit race and aborts, no duplicates") {
    val t = freshTable()
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    // zombie-writer interleaving: writer 1 passes the up-front marker
    // check and stages, then writer 2 commits the SAME batch id before
    // writer 1's commit runs — the in-loop re-check must catch it
    val v1 = t.appendBatchIdempotent(batch, batchId = 7L,
      beforeCommit = () =>
        assert(t.appendBatchIdempotent(batch, batchId = 7L).isDefined))
    assert(v1.isEmpty, "loser must abort, not double-commit the batch")
    assert(t.read().count() == 2, "batch rows must appear exactly once")
    // the loser's staged files were unstaged — nothing orphaned
    assert(t.vacuum(java.time.Duration.ZERO) == 0)
  }

  test("concurrent compaction is a detected conflict, not a silent dup") {
    val t = freshTable()
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"f$i")).toDF("id", "s")))
    // the winner compacts while the loser is between read and commit;
    // the loser's inputs are gone from the snapshot, so re-basing with
    // filterNot would append a second full copy of all rows
    intercept[java.util.ConcurrentModificationException] {
      t.compact(targetFiles = 1, beforeCommit = () =>
        t.compact(targetFiles = 2))
    }
    assert(t.read().count() == 4, "loser must not duplicate rows")
    assert(t.read().collect().map(_.getLong(0)).toSet == (1L to 4L).toSet)
    // the loser's staged rewrite was unstaged
    assert(t.vacuum(java.time.Duration.ZERO) >= 4) // winner's replaced inputs only
    assert(t.read().count() == 4)
  }
}

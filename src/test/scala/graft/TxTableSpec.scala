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
}

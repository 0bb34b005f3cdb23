package graft.lake

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.UUID
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Transactional zone table: a minimal versioned-manifest log over
  * parquet, the mechanism Delta/Iceberg provide in full (BASELINE.json
  * names them as the intended zone-table substrate; neither ships in
  * this build's jar set, so the refine zone gets the essential 20% —
  * atomic commits, optimistic concurrency, snapshot reads — in ~100
  * lines, and the interface stays swappable for a real table format).
  *
  * Layout:
  * {{{
  *   root/_log/v00000000000000000042.txt   one manifest per version:
  *                                         the COMPLETE relative file
  *                                         list of that snapshot
  *   root/data/<uuid>.parquet              immutable data files
  * }}}
  *
  * Commit protocol: read the latest version's file list, write new data
  * files (invisible until committed), then publish manifest `v(N+1)`
  * with CREATE_NEW — an atomic create-if-absent, so exactly one of two
  * racing writers wins; the loser re-reads the new latest and retries
  * against it. Compaction retries re-base on the current list, so rows
  * appended DURING a compaction survive it (the concurrent-write spec
  * drives exactly that interleaving). Readers always see a complete
  * committed snapshot — never a half-written directory.
  *
  * On a real object store CREATE_NEW needs a conditional-put (S3
  * If-None-Match) or a lock service — precisely the part Delta's
  * LogStore / an Iceberg catalog abstracts; swap this class for one of
  * them when the jars are available. Replaced files are not deleted at
  * commit (old snapshots stay readable); `vacuum()` reclaims them once
  * readers of old versions are done.
  */
final case class TxTable(spark: SparkSession, root: String) {

  private val logDir: Path = Paths.get(root, "_log")
  private val dataDir: Path = Paths.get(root, "data")

  /** `files` holds manifest ENTRIES: a relative file name, optionally
    * followed by TAB and per-file column stats (`col=min..max;…`) —
    * the data-skipping index, carried through every commit because
    * entries travel verbatim from one manifest to the next. Bare names
    * (pre-stats manifests) parse as stats-less entries. */
  final case class Snapshot(version: Long, files: Seq[String])

  /** Relative data-file name of a manifest entry. */
  def entryName(e: String): String = e.takeWhile(_ != '\t')

  /** Per-column [min,max] (as longs) recorded for a manifest entry;
    * empty for entries staged without stats. */
  def entryStats(e: String): Map[String, (Long, Long)] =
    e.split('\t') match {
      case Array(_, s) =>
        s.split(';').iterator.flatMap { kv =>
          kv.split('=') match {
            case Array(c, range) if !c.contains('~') =>
              range.split("\\.\\.") match {
                case Array(lo, hi) => Some(c -> (lo.toLong, hi.toLong))
                case _ => None
              }
            case _ => None
          }
        }.toMap
      case _ => Map.empty
    }

  /** Per-column Bloom bitmap (`col~hexwords` tokens) of an entry. */
  def entryBlooms(e: String): Map[String, Array[Long]] =
    e.split('\t') match {
      case Array(_, s) =>
        s.split(';').iterator.flatMap { kv =>
          kv.split('~') match {
            case Array(c, hex) if hex.length % 16 == 0 && hex.nonEmpty =>
              Some(c -> hex.grouped(16)
                .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray)
            case _ => None
          }
        }.toMap
      case _ => Map.empty
    }

  private def dataPath(entry: String): Path =
    dataDir.resolve(entryName(entry))

  private def manifestPath(v: Long): Path =
    logDir.resolve(f"v$v%020d.txt")

  // manifest lines starting with '#' are annotations (e.g. the
  // streaming batch marker), not data files
  private def manifestFiles(v: Long): Seq[String] =
    Files.readAllLines(manifestPath(v)).asScala.toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#"))

  private def manifestVersions(): Seq[Long] = {
    if (!Files.exists(logDir)) return Seq.empty
    val s = Files.list(logDir)
    val names =
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    names.collect {
      case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong
    }
  }

  /** Latest committed snapshot, or None for an empty/new table. */
  def latest(): Option[Snapshot] =
    manifestVersions().maxOption.map(v => Snapshot(v, manifestFiles(v)))

  /** Snapshot read: the committed file list, as of `version` if given. */
  def read(version: Option[Long] = None): DataFrame = {
    val snap = version match {
      case Some(v) => Snapshot(v, manifestFiles(v))
      case None => latest().getOrElse(
        throw new IllegalStateException(s"empty tx table at $root"))
    }
    if (snap.files.isEmpty)
      throw new IllegalStateException(s"version ${snap.version} lists no files")
    readEntries(snap.files)
  }

  /** Schema evolution: snapshot reads union the per-file schemas
    * (older files null-fill columns added later), so an append that
    * widens the schema needs no table rewrite — Delta's additive
    * evolution. Footer merging is distributed work; a production
    * table would pin the authoritative schema in the log instead of
    * re-deriving it per read. */
  private def readEntries(entries: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(entries.map(e => dataPath(e).toString): _*)

  /** Stage `df` as new immutable data files; returns their manifest
    * entries. Staged files are invisible until a manifest commits them.
    *
    * `statsCols` names integral columns whose per-file [min,max] is
    * recorded in the entry — the file-skipping index Delta keeps in
    * its checkpoint stats / Iceberg in manifest metrics. Stats for ALL
    * staged files come from ONE aggregate keyed by `input_file_name()`
    * (a metadata-sized job, like Delta's stats collection); at object-
    * store scale the same numbers come straight from parquet footers. */
  private def stage(df: DataFrame, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 8192): Seq[String] = {
    Files.createDirectories(dataDir)
    val scratch =
      Files.createTempDirectory("graft-tx-stage").resolve("out").toString
    df.write.parquet(scratch)
    val s = Files.list(Paths.get(scratch))
    val parts =
      try s.iterator().asScala.toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    val statsByScratchName: Map[String, String] =
      if ((statsCols.isEmpty && bloomCols.isEmpty) || parts.isEmpty) Map.empty
      else {
        val aggs = statsCols.flatMap(c => Seq(
          min(col(c).cast("long")).as(s"min_$c"),
          max(col(c).cast("long")).as(s"max_$c"))) ++
          // set-bit POSITIONS per file (≤ bits, usually far fewer) —
          // the bitmap assembles driver-side; a giant per-word CASE
          // aggregate would bloat codegen for no gain at metadata size
          bloomCols.flatMap(c => bloomSeeds.map(seed =>
            collect_set(bloomPos(col(c), seed, bloomBits))
              .as(s"bloom_${c}_$seed")))
        spark.read.parquet(scratch)
          .groupBy(input_file_name().as("_file"))
          .agg(aggs.head, aggs.tail: _*)
          .collect() // one row per staged file — metadata, not data
          .map { r =>
            val fname = r.getAs[String]("_file").split('/').last
            val rangeToks = statsCols.flatMap { c =>
              (Option(r.getAs[Any](s"min_$c")), Option(r.getAs[Any](s"max_$c"))) match {
                case (Some(lo), Some(hi)) => Some(s"$c=$lo..$hi")
                case _ => None // all-null column in this file: no stat
              }
            }
            val bloomToks = bloomCols.map { c =>
              val words = new Array[Long](bloomBits / 64)
              bloomSeeds.foreach { seed =>
                r.getAs[collection.Seq[Long]](s"bloom_${c}_$seed").foreach { p =>
                  words(p.toInt / 64) |= 1L << (p.toInt % 64)
                }
              }
              s"$c~" + words.map(w => f"$w%016x").mkString
            }
            fname -> (rangeToks ++ bloomToks).mkString(";")
          }.toMap
      }
    // when stats ran, a part file absent from the aggregate has ZERO
    // rows (an empty partition's schema-only file) — committing it
    // would add a stats-less entry that defeats skipping forever;
    // an empty file adds nothing to the table, so drop it
    val keep =
      if (statsCols.isEmpty && bloomCols.isEmpty) parts
      else parts.filter(p => statsByScratchName.contains(p.getFileName.toString))
    keep.map { p =>
      val name = s"${UUID.randomUUID()}.parquet"
      Files.move(p, dataDir.resolve(name))
      statsByScratchName.get(p.getFileName.toString).filter(_.nonEmpty) match {
        case Some(stat) => s"$name\t$stat"
        case None => name
      }
    }
  }

  /** Publish a successor of whatever version is current, transforming
    * the current list through `next`; `annotations` are '#'-prefixed
    * metadata lines carried in the same atomic manifest. Retries on
    * committer races (bounded — a loss means someone else progressed).
    * `next` runs once per attempt against the FRESH current list, so it
    * is where semantic-conflict checks belong: returning None aborts
    * the whole commit (the caller's staged files are its to clean up).
    */
  private def commit(next: Seq[String] => Option[Seq[String]],
      annotations: Seq[String] = Seq.empty): Option[Long] = {
    Files.createDirectories(logDir)
    var attempts = 0
    while (attempts < 64) {
      val cur = latest()
      val v = cur.map(_.version + 1).getOrElse(0L)
      val files = next(cur.map(_.files).getOrElse(Seq.empty)) match {
        case Some(f) => f
        case None => return None
      }
      val body = (annotations ++ files).mkString("\n").getBytes("UTF-8")
      try {
        Files.write(manifestPath(v), body, StandardOpenOption.CREATE_NEW)
        return Some(v)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => attempts += 1
      }
    }
    throw new IllegalStateException(
      s"tx commit lost ${64} races at $root — livelocked writers?")
  }

  /** Remove staged-but-never-committed files (an aborted commit's). */
  private def unstage(staged: Seq[String]): Unit =
    staged.foreach(e => Files.deleteIfExists(dataPath(e)))

  /** Streaming-batch ids already committed (from manifest annotations). */
  def committedBatches(): Set[Long] =
    manifestVersions().flatMap { v =>
      Files.readAllLines(manifestPath(v)).asScala
        .filter(_.startsWith("#batch="))
        .map(_.stripPrefix("#batch=").toLong)
    }.toSet

  /** Idempotent streaming commit: `foreachBatch` delivers each batch
    * at-least-once, so the batch id is recorded as an annotation INSIDE
    * the same atomic manifest as its files — a redelivered batch finds
    * its marker and commits nothing (the exactly-once trick Delta's
    * txnAppId/txnVersion provides). The marker scan walks the small
    * per-version manifests; a production table keeps a side index.
    * Returns the committed version, or None when the batch was already
    * in the log.
    *
    * The marker is validated INSIDE the commit retry loop, not just
    * up front: two writers replaying the same batch (driver failover
    * with a zombie executor still running) can both pass a single
    * check-then-act test, but here the loser of the manifest race
    * re-reads the log, finds the winner's marker, and aborts — its
    * staged files are unstaged, nothing duplicates. `beforeCommit` is
    * a test seam for injecting that interleaving. */
  def appendBatchIdempotent(df: DataFrame, batchId: Long,
      beforeCommit: () => Unit = () => ()): Option[Long] = {
    if (committedBatches().contains(batchId)) return None // cheap fast-path
    val staged = stage(df)
    beforeCommit()
    val v = commit(
      cur =>
        if (committedBatches().contains(batchId)) None
        else Some(cur ++ staged),
      Seq(s"#batch=$batchId"))
    if (v.isEmpty) unstage(staged)
    v
  }

  /** Atomic append: stages the rows, then commits current ∪ new.
    * `statsCols` (integral columns) get per-file [min,max] recorded
    * for data-skipping range reads; `bloomCols` get a per-file Bloom
    * bitmap for point-lookup skipping ([[readWhereEq]]). */
  def append(df: DataFrame, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 8192): Long = {
    val staged = stage(df, statsCols, bloomCols, bloomBits)
    commit(cur => Some(cur ++ staged)).get // unconditional — never aborts
  }

  // Bloom parameters: k=4 independent probes via seeded xxhash64 —
  // the same expression computes write-side bits and query-side
  // positions, so consistency is by construction, not convention.
  // Default 8192 bits ≈ 1% false-positive rate at ~1000 distinct
  // values per file (m/n ≈ 8, k=4); size `bloomBits` to the expected
  // per-file cardinality like Delta's fpp-based bloom index does.
  private val bloomSeeds = Seq(1, 2, 3, 4)

  private def bloomPos(c: Column, seed: Int, bits: Int): Column =
    pmod(xxhash64(c, lit(seed)), lit(bits.toLong))

  /** Point-lookup read with Bloom file skipping: scans only files
    * whose bitmap has ALL k probe bits set for `value` — the index
    * for equality predicates on columns the table is NOT clustered
    * by, where [min,max] ranges prune nothing (every file spans the
    * whole domain) but membership still rules most files out. False
    * positives cost a wasted scan, never a wrong answer; files
    * without a bitmap are always read. `value` must be typed as the
    * column was at write time (xxhash64 is type-sensitive). */
  def readWhereEq(column: String, value: Column): DataFrame = {
    val snap = latest().getOrElse(
      throw new IllegalStateException(s"empty tx table at $root"))
    val hit = bloomLiveEntries(snap, column, value)
    val base =
      if (hit.nonEmpty) readEntries(hit)
      else readEntries(snap.files).filter(lit(false))
    base.filter(col(column) === value)
  }

  /** Entries whose Bloom bitmap may contain `value` in `column` (or
    * that carry no bitmap for it). Public for pruning assertions. */
  def bloomLiveEntries(snap: Snapshot, column: String,
      value: Column): Seq[String] = {
    // probe positions per bitmap size present in the manifest (a
    // table whose bloomBits changed across commits stays correct)
    val lengths = snap.files
      .flatMap(e => entryBlooms(e).get(column).map(_.length)).distinct
    val posByLen: Map[Int, Seq[Long]] = lengths.map { words =>
      val row = spark.range(1)
        .select(bloomSeeds.map(s => bloomPos(value, s, words * 64)): _*)
        .head() // k tiny hashes — metadata, not data
      words -> bloomSeeds.indices.map(row.getLong(_))
    }.toMap
    snap.files.filter { e =>
      entryBlooms(e).get(column) match {
        case Some(w) => posByLen(w.length).forall(p =>
          ((w(p.toInt / 64) >>> (p.toInt % 64)) & 1L) == 1L)
        case None => true // no bitmap: must read
      }
    }
  }

  /** Entries of `snap` that may hold rows with `column` ∈ [lo, hi]:
    * stats-carrying entries whose range intersects, plus every
    * stats-less entry (unknown ⇒ must be read — skipping is only ever
    * an optimization, never a correctness filter). */
  def liveEntriesFor(snap: Snapshot, column: String,
      lo: Long, hi: Long): Seq[String] =
    snap.files.filter { e =>
      entryStats(e).get(column) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }

  /** Data-skipping range read: scans ONLY the files whose recorded
    * [min,max] for `column` intersects [lo, hi] (Delta/Iceberg file
    * skipping), then applies the residual predicate — on a range-
    * clustered 100 TB table this turns a full scan into a handful of
    * files before the query even starts. Equals
    * `read().filter(column BETWEEN lo AND hi)` by construction. */
  def readWhere(column: String, lo: Long, hi: Long): DataFrame = {
    val snap = latest().getOrElse(
      throw new IllegalStateException(s"empty tx table at $root"))
    val hit = liveEntriesFor(snap, column, lo, hi)
    val base =
      if (hit.nonEmpty) readEntries(hit)
      // no file can match: keep the schema, produce zero rows (Catalyst
      // folds filter(false) to an empty LocalRelation — no scan runs)
      else readEntries(snap.files).filter(lit(false))
    base.filter(col(column).cast("long").between(lo, hi))
  }

  /** Copy-on-write MERGE (upsert): rows of `source` replace target
    * rows with the same `key`; unmatched source rows are inserts.
    * Only files whose key range intersects the source's key range are
    * rewritten — with range-clustered data the rewrite touches a tiny
    * fraction of a 100 TB table (Delta MERGE's file-pruning phase).
    * The rest of the snapshot is carried over verbatim.
    *
    * `targetFiles > 0` range-partitions the rewrite on `key`, keeping
    * the table's key-clustering (and thus future pruning) tight.
    * Conflict rule as [[compact]]: if a racing rewrite replaced any
    * affected file, abort rather than resurrect replaced rows. */
  def merge(source: DataFrame, key: String,
      statsCols: Seq[String] = Nil, targetFiles: Int = 0,
      beforeCommit: () => Unit = () => ()): Long = {
    val snap = latest().getOrElse(
      throw new IllegalStateException(s"cannot merge into empty table at $root"))
    val Seq(srcLo, srcHi) = {
      val r = source.agg(min(col(key).cast("long")), max(col(key).cast("long")))
        .collect().head // two longs — metadata, not data
      if (r.isNullAt(0)) return snap.version // empty source: no-op
      Seq(r.getLong(0), r.getLong(1))
    }
    val affected = liveEntriesFor(snap, key, srcLo, srcHi)
    val affectedSet = affected.toSet
    val merged = {
      val kept =
        if (affected.isEmpty) source.limit(0)
        else readEntries(affected).join(source, Seq(key), "left_anti")
      val all = kept.unionByName(source)
      if (targetFiles > 0) all.repartitionByRange(targetFiles, col(key))
      else all
    }
    val staged = stage(merged, statsCols)
    beforeCommit()
    val v = commit { cur =>
      if (!affectedSet.subsetOf(cur.toSet)) None // inputs replaced under us
      else Some(cur.filterNot(affectedSet) ++ staged)
    }
    v.getOrElse {
      unstage(staged)
      throw new java.util.ConcurrentModificationException(
        s"merge inputs at $root were replaced by a concurrent rewrite; " +
          "re-read the latest snapshot and retry")
    }
  }

  /** Copy-on-write DELETE of rows with `column` ∈ [lo, hi]: files
    * whose stats range intersects are rewritten without the matching
    * rows; files that cannot contain matches — and rewrites that come
    * back empty — are simply carried over / dropped. The same
    * stats-pruning that accelerates reads bounds the write cost here:
    * deleting one key's range from a clustered 100 TB table rewrites
    * only the files that cover it. Conflict rule as [[compact]]. */
  def delete(column: String, lo: Long, hi: Long,
      statsCols: Seq[String] = Nil,
      beforeCommit: () => Unit = () => ()): Long = {
    val snap = latest().getOrElse(
      throw new IllegalStateException(s"cannot delete from empty table at $root"))
    val affected = liveEntriesFor(snap, column, lo, hi)
    val affectedSet = affected.toSet
    if (affected.isEmpty) return snap.version // nothing can match
    // null-safe: a NULL key is never "in range" — it must SURVIVE the
    // delete (bare `!between` is NULL for NULL input and would drop it)
    val remaining = readEntries(affected)
      .filter(col(column).isNull || !col(column).cast("long").between(lo, hi))
    val staged = stage(remaining, statsCols)
    beforeCommit()
    val v = commit { cur =>
      if (!affectedSet.subsetOf(cur.toSet)) None
      else Some(cur.filterNot(affectedSet) ++ staged)
    }
    v.getOrElse {
      unstage(staged)
      throw new java.util.ConcurrentModificationException(
        s"delete inputs at $root were replaced by a concurrent rewrite; " +
          "re-read the latest snapshot and retry")
    }
  }

  /** Row-level change-data-capture between two committed versions,
    * computed from the manifests alone: only files that ENTERED or
    * LEFT the snapshot are read (on a copy-on-write table that is
    * exactly the changed fraction), then a multiset difference each
    * way yields the net row changes — `_change` = 'insert' | 'delete';
    * an update appears as its delete + insert pair, rows merely
    * rewritten by compaction cancel out. */
  def changes(fromVersion: Long, toVersion: Long): DataFrame = {
    val from = manifestFiles(fromVersion)
    val to = manifestFiles(toVersion)
    val added = to.filterNot(from.toSet)
    val removed = from.filterNot(to.toSet)
    def rows(es: Seq[String], schemaOf: Seq[String]): DataFrame =
      if (es.nonEmpty) readEntries(es)
      else readEntries(schemaOf).filter(lit(false))
    if (added.isEmpty && removed.isEmpty)
      return rows(Nil, to).withColumn("_change", lit(""))
    val a = rows(added, removed)
    val r = rows(removed, added)
    a.exceptAll(r).withColumn("_change", lit("insert"))
      .unionByName(r.exceptAll(a).withColumn("_change", lit("delete")))
  }

  /** Z-order clustering rewrite: orders the table by the interleaved
    * bits of two dimensions and range-partitions on that curve, so
    * every file covers a small rectangle in (a, b) space — per-file
    * [min,max] stats then prune scans on EITHER column, where plain
    * sorting serves only its leading column (Delta OPTIMIZE ZORDER
    * BY). Stats are recorded for both dimensions. */
  def zorder(colA: String, colB: String, targetFiles: Int,
      extraStatsCols: Seq[String] = Nil): Long = {
    val snap = latest().getOrElse(
      throw new IllegalStateException(s"nothing to zorder at $root"))
    val inputs = snap.files.toSet
    val z = graft.functions.ZOrder.interleave16(col(colA), col(colB))
    val rewritten = stage(
      readEntries(snap.files)
        .withColumn("_z", z)
        .repartitionByRange(targetFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_z"),
      statsCols = Seq(colA, colB) ++ extraStatsCols)
    val v = commit { cur =>
      if (!inputs.subsetOf(cur.toSet)) None
      else Some(cur.filterNot(inputs) ++ rewritten)
    }
    v.getOrElse {
      unstage(rewritten)
      throw new java.util.ConcurrentModificationException(
        s"zorder inputs at $root were replaced by a concurrent rewrite")
    }
  }

  /** Transactional compaction: rewrites the snapshot it read into
    * `targetFiles`, committing (current − inputs) ∪ rewritten — so
    * files appended since the read survive verbatim. `beforeCommit` is
    * a test seam for injecting a concurrent writer at the worst moment.
    *
    * Concurrent-compaction conflict is detected, not re-based through:
    * if a racing compactor already replaced this one's inputs, blindly
    * committing `cur.filterNot(inputs) ++ rewritten` would append a
    * second full copy of every row (filterNot is a no-op once the
    * inputs are gone). When any input file has left the current
    * snapshot, the loser unstages its rewrite and throws — the caller
    * re-runs against the new snapshot if it still wants a compaction.
    */
  def compact(targetFiles: Int, beforeCommit: () => Unit = () => ()): Long = {
    val snap = latest().getOrElse(
      throw new IllegalStateException(s"nothing to compact at $root"))
    val inputs = snap.files.toSet
    val rewritten = stage(readEntries(snap.files).repartition(targetFiles))
    beforeCommit()
    val v = commit { cur =>
      if (!inputs.subsetOf(cur.toSet)) None // inputs replaced under us
      else Some(cur.filterNot(inputs) ++ rewritten)
    }
    v.getOrElse {
      unstage(rewritten)
      throw new java.util.ConcurrentModificationException(
        s"compaction inputs at $root were replaced by a concurrent " +
          "rewrite; re-read the latest snapshot and retry")
    }
  }

  /** Delete data files the latest version does not reference — once
    * old-version readers are done (caller's contract, as with Delta's
    * VACUUM retention). Two classes are reclaimed:
    *
    *  - files some SUPERSEDED manifest lists: committed once, since
    *    replaced — safe regardless of age (no in-flight writer will
    *    ever commit them again);
    *  - files NO manifest lists, but only once older than `retention`:
    *    a young unreferenced file is most likely a concurrent writer's
    *    staged-not-yet-committed data — deleting it would let that
    *    writer publish a manifest pointing at nothing, bricking the
    *    table. Old unreferenced files are aborted commits' orphans.
    *
    * Superseded MANIFESTS are kept: they are tiny, they carry the
    * streaming batch markers idempotency depends on, and they are what
    * lets the first rule distinguish "replaced" from "in flight".
    * Returns the number of data files reclaimed. */
  def vacuum(retention: java.time.Duration =
      java.time.Duration.ofMinutes(15)): Int = {
    val snap = latest().getOrElse(return 0)
    val live = snap.files.map(entryName).toSet
    val everCommitted =
      manifestVersions().flatMap(manifestFiles).map(entryName).toSet
    val cutoff = System.currentTimeMillis() - retention.toMillis
    val s = Files.list(dataDir)
    val all =
      try s.iterator().asScala.toSeq
      finally s.close()
    val dead = all.filter { p =>
      val name = p.getFileName.toString
      !live(name) &&
        (everCommitted(name) ||
          Files.getLastModifiedTime(p).toMillis < cutoff)
    }
    dead.foreach(Files.delete)
    dead.size
  }
}

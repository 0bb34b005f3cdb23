package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Cluster, Temporal}
import graft.streaming.StreamStateSessionize
import graft.streaming.StreamStateSessionize.{OpenSession, SessionRow}

/** Property-based tests (SURVEY §5.3): randomized inputs generated with
  * ScalaCheck `Gen` under fixed seeds (deterministic CI), checked
  * against independent reference implementations. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // --- connected components vs a plain union-find ------------------------

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  test("property: connectedComponents equals union-find on random graphs") {
    val genEdges = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)).suchThat(e => e._1 != e._2))
    (1L to 12L).foreach { seed =>
      val edges = sample(genEdges, seed)
      val expected = unionFind(edges)
      val got = Cluster.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed edges=$edges")
    }
  }

  // --- as-of join vs per-row brute force ---------------------------------

  test("property: asofJoin equals brute-force latest-at-or-before") {
    val genRows = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    (1L to 10L).foreach { seed =>
      val leftRows = sample(genRows, seed).distinct
      // unique (key, ts) on the right: payload = ts so dup-ts ambiguity
      // cannot arise (documented contract)
      val rightRows = sample(genRows, seed + 100).distinct
        .map { case (k, ts) => (k, ts, ts * 10) }
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val got = Temporal.asofJoin(
        leftRows.toDF("k", "ts"), rightRows.toDF("k", "ts", "payload"),
        "k", "ts", Seq("payload"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          Option(r.getAs[java.lang.Long]("payload")).map(_.toLong)).toMap
      leftRows.foreach { case (k, ts) =>
        val eligible = rightRows.filter(r => r._1 == k && r._2 <= ts)
        val expected =
          if (eligible.isEmpty) None else Some(eligible.maxBy(_._2)._3)
        assert(got((k, ts)) === expected, s"seed=$seed left=($k,$ts)")
      }
    }
  }

  // --- stateful session fold: batch-split invariance ---------------------

  private def foldAll(uid: Long, batches: Seq[Seq[Long]])
      : (Seq[SessionRow], Option[OpenSession]) =
    batches.foldLeft((Seq.empty[SessionRow], Option.empty[OpenSession])) {
      case ((closed, open), batch) =>
        val (c, o) = StreamStateSessionize.advance(uid, batch.sorted, open)
        (closed ++ c, o)
    }

  test("property: session fold is invariant to micro-batch boundaries") {
    val gap = StreamStateSessionize.gapMicros
    val genUs = Gen.nonEmptyListOf(Gen.choose(0L, gap * 8))
    (1L to 15L).foreach { seed =>
      val us = sample(genUs, seed).distinct.sorted
      val whole = foldAll(1L, Seq(us))
      val cut = sample(Gen.choose(0, us.length), seed + 999)
      // time-ordered batch split (the file-stream contract: batches
      // arrive in event-time order here)
      val split = foldAll(1L, Seq(us.take(cut), us.drop(cut)))
      assert(split === whole, s"seed=$seed cut=$cut us=$us")
    }
  }

  // --- portable hash -----------------------------------------------------

  test("property: portable hash is deterministic, bounded, salt-split") {
    import org.apache.spark.sql.functions._
    val genStrs = Gen.nonEmptyListOf(Gen.identifier)
    val strs = (1L to 3L).flatMap(s => sample(genStrs, s)).distinct
    val df = strs.toDF("s")
      .select(graft.functions.PortableHash.phash(col("s"), 0).as("h0"),
        graft.functions.PortableHash.phash(col("s"), 1).as("h1"))
      .collect()
    // Σ_{i=0..7} 102·128^i — max hex-digit ascii is 102 ('f')
    val maxH = 102L * ((math.pow(128, 8).toLong - 1) / 127)
    df.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= maxH)
      assert(r.getLong(0) != r.getLong(1), "salt must split the hash family")
    }
  }
}

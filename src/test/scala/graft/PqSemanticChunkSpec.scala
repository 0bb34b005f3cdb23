package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Roundtrip
import graft.streaming.StreamDedup

/** Round-4 operator properties: product-quantization ANN, semantic
  * dedup, token chunking, char-bigram LM scoring, streaming dedup, ORC
  * round-trip. The oracle gate proves exact values; these pin the
  * SEMANTIC invariants that should survive any refactor. */
class PqSemanticChunkSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pq_adc: complete ranked lists, and every ADC distance equals " +
      "exact squared-L2 to the PQ reconstruction") {
    val adc = Similarity.pqAdc(spark, sf).collect()
    val byQ = adc.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        s"query $q: ranks not dense")
      assert(rows.forall(_.getLong(2) >= 0L), s"query $q: negative ADC distance")
    }
    // the DEFINING identity of ADC, re-derived from first principles:
    // adc_dist2(q, i) == exact squared L2 between q's vector and i's
    // PQ RECONSTRUCTION (codebook entry per sub-space). A recall-vs-
    // exact-search bound would be a property of the DATA (with this
    // coarse label codebook it's genuinely 0 for some queries at this
    // sf), but the reconstruction identity is a property of the
    // ALGORITHM — any drift in grouping, rounding, or the argmin
    // tie-break shows up as an exact mismatch here.
    val rows = graft.core.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[collection.Seq[Float]](2)
          .map(x => math.floor(x.toDouble * 10000 + 0.5).toLong).toArray))
    val vecs = rows.map { case (id, _, v) => id -> v }.toMap
    val nsub = vecs(0L).length / 8
    def slice(v: Array[Long], s: Int) = v.slice(s * 8, s * 8 + 8)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // codebook: per label, floor(mean + 0.5) of its members, per dim
    val codebook = rows.groupBy(_._2).map { case (label, members) =>
      val dims = members.head._3.length
      label -> Array.tabulate(dims) { d =>
        val s = members.map(_._3(d)).sum
        math.floor(s.toDouble / members.length + 0.5).toLong
      }
    }
    // encoding: per vector and sub-space, nearest sub-centroid
    // (ties -> lower code, as the window's (d2, code) order pins)
    val codes = vecs.map { case (id, v) =>
      id -> Array.tabulate(nsub) { s =>
        codebook.toSeq.map { case (c, cb) => (d2(slice(v, s), slice(cb, s)), c) }
          .min._2
      }
    }
    adc.foreach { r =>
      val (q, i, dist) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val recon = Array.tabulate(nsub) { s =>
        slice(codebook(codes(i)(s)), s)
      }.flatten
      assert(dist == d2(vecs(q), recon),
        s"ADC($q,$i)=$dist != d2 to reconstruction ${d2(vecs(q), recon)}")
    }
  }

  test("dedup_semantic: one row per vector, keeps are cluster minima, " +
      "and the removed set shrinks as the threshold tightens") {
    val n = graft.core.Tables(spark, sf).embeddings.count()
    val loose = Dedup.semantic(spark, sf, thresholdE6 = 350000L).collect()
    val tight = Dedup.semantic(spark, sf, thresholdE6 = 990000L).collect()
    assert(loose.length == n && tight.length == n)
    def removedSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(removedSet(tight).subsetOf(removedSet(loose)),
      "tightening the threshold must only UN-remove vectors")
    // impossible threshold (> max cos_e6) removes nothing
    val none = Dedup.semantic(spark, sf, thresholdE6 = 1000001L).collect()
    assert(removedSet(none).isEmpty)
    // the lowest id in every cell always survives (it has no lower-id mate)
    loose.groupBy(_.getLong(1)).foreach { case (cell, rows) =>
      val min = rows.map(_.getLong(0)).min
      val minRow = rows.find(_.getLong(0) == min).get
      assert(!minRow.getBoolean(2), s"cell $cell: minimum id $min was removed")
    }
  }

  test("text_chunk: zero-overlap chunks partition the token stream " +
      "exactly; overlapping chunks cover it with the configured stride") {
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // stride == size → chunks are a partition: token counts add up
    val exactCover = TextAnalysis.chunk(spark, sf, chunkSize = 20, stride = 20)
      .groupBy(col("doc_id")).agg(sum(col("n_chunk_tokens")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, n) =>
      assert(exactCover(id) == n, s"doc $id: partition covers ${exactCover(id)} of $n")
    }
    // default overlap: every chunk except possibly the last is full,
    // and chunk starts advance by the stride
    val rows = TextAnalysis.chunk(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      sorted.init.foreach(r =>
        assert(r.getLong(2) == 20L, s"doc $id chunk ${r.getLong(1)} not full"))
      assert(sorted.last.getLong(2) >= 1L)
      val nChunks = sorted.length.toLong
      val n = docs(id)
      assert(15L * (nChunks - 1) < n, s"doc $id: ${nChunks} chunks overshoot $n tokens")
    }
  }

  test("text_lm_score: scores are valid probabilities in e6 fixed point " +
      "and bigram counts equal text length - 1") {
    val lens = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), length(lower(col("text"))).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = TextAnalysis.lmScore(spark, sf).collect()
    assert(scored.length == lens.count(_._2 >= 2))
    scored.foreach { r =>
      val (id, nb, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nb == lens(id) - 1, s"doc $id: $nb bigrams for length ${lens(id)}")
      assert(s >= 0L && s <= 1000000L, s"doc $id: score $s outside [0, 1e6]")
    }
  }

  test("stream_dedup equals batch DISTINCT, also under watermarked " +
      "multi-batch arrival") {
    val expected = graft.core.Tables(spark, sf).events
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = StreamDedup.streamDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == expected)
    val bounded = StreamDedup.streamDedupBounded(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bounded == expected)
  }

  test("text_boilerplate matches an independent in-memory recomputation " +
      "and untouched docs hash to their original text") {
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent oracle: same segmentation, df, and reassembly rules
    val segs = docs.toSeq.flatMap { case (id, text) =>
      text.split(" ", -1).grouped(10).zipWithIndex
        .map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val df = segs.groupBy(_._3).map { case (s, xs) =>
      s -> xs.map(_._1).distinct.size }
    val expBoiler = segs.groupBy(_._1).map { case (id, xs) =>
      id -> xs.count(x => df(x._3) >= 3).toLong }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = TextAnalysis.boilerplate(spark, sf).collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nSeg, nBoil) =
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_boiler"))
      assert(nSeg === segs.count(_._1 == id).toLong)
      assert(nBoil === expBoiler(id))
      val keptText = segs.filter(x => x._1 == id && df(x._3) < 3)
        .sortBy(_._2).map(_._3).mkString(" ")
      assert(r.getAs[String]("clean_md5") === md5hex(keptText))
      // a doc with no boilerplate reassembles to exactly its own text
      if (nBoil == 0L)
        assert(r.getAs[String]("clean_md5") === md5hex(docs(id)))
    }
  }

  test("s4_orc_roundtrip equals the same aggregate computed on parquet") {
    val viaOrc = Roundtrip.s4OrcRoundtrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = graft.core.Tables(spark, sf).lineitem
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaOrc == direct)
  }
}

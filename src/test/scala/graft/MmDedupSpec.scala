package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.registry.PipelineReg

/** Planted contract of the byte-level multimodal near-dup (VERDICT
  * r11 task 8, operator genericized r13): every DETECTABLE planted
  * twin must surface with a high verified byte-Jaccard, and every
  * reported pair must clear the verify threshold — LSH may only ADD
  * candidates for the exact verify to keep, never skip it.
  *
  * Detectability is derived from the shingle math, not guessed
  * (ADVICE r12): a twin's 5-byte head mutation poisons the shingles
  * that overlap bytes 0-4 — windows j=0 and j=1 of the 24-byte/
  * stride-4 shingling — so a doc with n = (nb-24)/4 + 1 distinct
  * shingles scores J = (n-2)/(n+2). J ≥ 0.7 (the high-confidence
  * assertion) needs n ≥ 12, i.e. nb ≥ 68 bytes; docs in [24, 68)
  * sit below that and may legitimately fall under the 0.4 report
  * threshold (n < 5, nb < 40), so they are excluded from the recall
  * gate rather than silently assumed detectable. */
class MmDedupSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** doc_ids of planted twins long enough that the shingle math
    * guarantees J = (n-2)/(n+2) ≥ 0.7: nb ≥ 68. */
  private def detectablePlanted(): Set[Long] =
    graft.core.Tables(spark, sf).documents
      .filter(pmod(col("doc_id"), lit(37L)) === 0)
      .filter(length(encode(col("text"), "UTF-8")) >= 68)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("every detectable planted byte-level twin is found with high Jaccard") {
    val pairs = Multimodal.byteNearDup(PipelineReg.mmPlantedAssets(spark, sf))
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("jaccard_e4")))
    assert(pairs.nonEmpty)
    // every reported pair carries a verified Jaccard >= the threshold
    pairs.foreach { case (a, b, j) =>
      assert(j >= 4000L, s"pair ($a,$b) below the verify threshold: $j")
    }
    val expected = detectablePlanted()
    assert(expected.nonEmpty, "fixture has no detectable planted twins")
    val found = pairs.collect {
      case (a, b, _) if b == a + 1000000L => a
    }.toSet
    assert(expected.subsetOf(found),
      s"detectable planted twins missed: ${expected -- found}")
    // twins at or past the derived floor verify well above it
    // (measured 0.71-0.97 on this corpus)
    pairs.foreach { case (a, b, j) =>
      if (b == a + 1000000L && expected.contains(a))
        assert(j >= 7000L, s"twin ($a,$b) implausibly low Jaccard $j")
    }
  }

  test("operator on a clean corpus reports no synthetic rows") {
    // the r12 version planted twins INSIDE the operator; the operator
    // must now report only what the caller's corpus contains — no
    // asset_id beyond the input's id range
    val clean = graft.core.Tables(spark, sf).documents
      .select(col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("content"))
    val ids = Multimodal.byteNearDup(clean)
      .select(col("a"), col("b")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(ids.forall(_ < 1000000L),
      "operator manufactured rows outside the input corpus")
  }

  test("incremental form finds every detectable twin straddling the split") {
    import graft.functions.PortableHash.phash
    val a = PipelineReg.mmPlantedAssets(spark, sf)
      .withColumn("bkt", pmod(phash(col("asset_id").cast("string"), 21),
        lit(5L)))
    val standing = a.filter(col("bkt") < 4).drop("bkt")
    val batch = a.filter(col("bkt") === 4).drop("bkt")
    val standingIds = standing.select(col("asset_id")).collect()
      .map(_.getLong(0)).toSet
    val batchIds = batch.select(col("asset_id")).collect()
      .map(_.getLong(0)).toSet
    val pairs = Multimodal.byteNearDupIncremental(spark, standing, batch)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("jaccard_e4")))
    // every reported pair is standing × new and clears the threshold
    pairs.foreach { case (x, b, j) =>
      assert(standingIds.contains(x), s"pair ($x,$b): a not standing")
      assert(batchIds.contains(b), s"pair ($x,$b): b not in the batch")
      assert(j >= 4000L, s"pair ($x,$b) below the verify threshold: $j")
    }
    // recall: every detectable planted twin whose halves landed on
    // opposite sides of the split must be reported
    val straddling = detectablePlanted().flatMap { d =>
      val t = d + 1000000L
      if (standingIds.contains(d) && batchIds.contains(t)) Some((d, t))
      else if (standingIds.contains(t) && batchIds.contains(d)) Some((t, d))
      else None
    }
    assert(straddling.nonEmpty,
      "fixture has no straddling twins — change the split salt")
    val found = pairs.map { case (x, b, _) => (x, b) }.toSet
    assert(straddling.subsetOf(found),
      s"straddling twins missed: ${straddling -- found}")
  }
}

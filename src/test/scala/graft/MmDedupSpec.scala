package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Planted contract of the byte-level multimodal near-dup (VERDICT
  * r11 task 8): every planted twin (doc_id ≡ 0 mod 37, first 5 bytes
  * replaced, asset_id + 10⁶, long enough to clear the 24-byte shingle
  * minimum) must surface with a high verified byte-Jaccard, and every
  * reported pair must clear the verify threshold — LSH may only ADD
  * candidates for the exact verify to keep, never skip it. */
class MmDedupSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every planted byte-level twin is found with high verified Jaccard") {
    val pairs = Multimodal.byteNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("jaccard_e4")))
    assert(pairs.nonEmpty)
    // every reported pair carries a verified Jaccard >= the threshold
    pairs.foreach { case (a, b, j) =>
      assert(j >= 4000L, s"pair ($a,$b) below the verify threshold: $j")
    }
    // planted recall: a twin differs in 5 of >=29 bytes, so its
    // distinct-shingle Jaccard is >= (n-2)/(n+2) >= 0.5 and the
    // 4-band single-hash capture is near-certain; the corpus outcome
    // is deterministic — all planted twins must appear
    val expected = graft.core.Tables(spark, sf).documents
      .filter(pmod(col("doc_id"), lit(37L)) === 0)
      .filter(length(encode(col("text"), "UTF-8")) >= 29)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "fixture has no planted twins — widen the gate")
    val found = pairs.collect {
      case (a, b, _) if b == a + 1000000L => a
    }.toSet
    assert(found === expected,
      s"planted twins missed: ${expected -- found}; unexpected: ${found -- expected}")
    // twins are near-identical in byte space: verified J well above
    // the floor (measured 0.71-0.97 on this corpus)
    pairs.foreach { case (a, b, j) =>
      if (b == a + 1000000L)
        assert(j >= 7000L, s"twin ($a,$b) implausibly low Jaccard $j")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.registry.PipelineReg

/** The exact-collapse → near-dup composition is an exact RESHAPING of
  * the all-vs-all form's answer, not an approximation: shingle sets —
  * and therefore minhash signatures, band keys, and verified Jaccard
  * — depend only on content, so byte-identical copies are
  * interchangeable everywhere in the pipeline. Assertions:
  *
  *  1. every rep-level pair appears in the full form's output with
  *     the identical (inter, union_n, jaccard_e4);
  *  2. the full form's pair COUNT equals the collapsed form's
  *     recoverable universe: Σ copies_a·copies_b over rep pairs plus
  *     Σ C(n_copies, 2) over exact groups (≥ 1 shingle long) — the
  *     within-group J=1 cliques the collapse folds away.
  *
  * The fixture adds exact byte copies (asset_id + 4·10⁶ and 8·10⁶) on
  * top of the registry's planted near-twins so the multiplicity
  * arithmetic is exercised with groups of size 3, not just 1. */
class MmCollapsedSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def fixture() = {
    val base = PipelineReg.mmPlantedAssets(spark, sf)
    val copies = base.filter(pmod(col("asset_id"), lit(50L)) === 0)
    base
      // offsets chosen clear of the planted +10⁶ band: +2·10⁶ would
      // collide (planted 10⁶ + 2·10⁶ = base 0 + 3·10⁶), giving one
      // asset_id two different contents
      .unionByName(copies.select((col("asset_id") + 4000000L).as("asset_id"),
        col("content")))
      .unionByName(copies.select((col("asset_id") + 8000000L).as("asset_id"),
        col("content")))
  }

  test("collapsed near-dup is an exact reshaping of the full pair set") {
    val assets = fixture().cache()
    val full = Multimodal.byteNearDup(assets).collect()
      .map(r => ((r.getAs[Long]("a"), r.getAs[Long]("b")),
        (r.getAs[Long]("inter"), r.getAs[Long]("union_n"),
          r.getAs[Long]("jaccard_e4")))).toMap
    val rep = Multimodal.byteNearDupCollapsed(assets).collect()
    assert(rep.nonEmpty)

    // asset -> (its group's rep, group size), plus shingle eligibility
    val groups = assets
      .withColumn("fp", md5(col("content")))
      .withColumn("nb", length(col("content")))
      .groupBy(col("fp"))
      .agg(min(col("asset_id")).as("rep"), count(lit(1)).as("n"),
        max(col("nb")).cast("long").as("nb"))
      .collect()

    // 1. rep pairs are verbatim rows of the full output
    rep.foreach { r =>
      val key = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val got = full.get(key)
      assert(got.isDefined, s"rep pair $key missing from the full form")
      assert(got.get === ((r.getAs[Long]("inter"), r.getAs[Long]("union_n"),
        r.getAs[Long]("jaccard_e4"))),
        s"rep pair $key differs from the full form's row")
    }

    // 2. pair-count arithmetic: cross-group pairs expand by
    //    copies_a * copies_b; within-group cliques contribute C(n, 2)
    val crossExpanded = rep.map(r =>
      r.getAs[Long]("copies_a") * r.getAs[Long]("copies_b")).sum
    val withinCliques = groups
      .filter(g => g.getAs[Long]("nb") >= 24L)
      .map { g => val n = g.getAs[Long]("n"); n * (n - 1) / 2 }.sum
    assert(withinCliques > 0L, "fixture grew no exact groups — the " +
      "multiplicity arithmetic is untested")
    assert(full.size.toLong === crossExpanded + withinCliques,
      s"full=${full.size} vs expanded cross=$crossExpanded + " +
        s"cliques=$withinCliques")
    assets.unpersist(blocking = false)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableHash

/** Count–min frequency sketch — approximate per-key counts in a
  * fixed d×w cell table, mergeable by cell-wise sum.
  *
  * At 100 TB an exact per-key frequency table shuffles every key;
  * the CMS shuffles d·w counters per map task no matter the input
  * (partial aggregation does the cell sums map-side), and two
  * sketches built on disjoint splits merge by adding cells. Estimates
  * only ever OVER-count (collisions add, never subtract): the
  * classical bound is est ≤ true + 2N/w with probability 1 − 2^−d.
  *
  * Determinism AND uniformity: each of the d = 4 row hashes is a
  * 2-nibble read (cell = nib·16 + nib ∈ [0, 256)) from a DISJOINT
  * 8-hex-char window of ONE md5 digest — md5 nibbles are uniform
  * bits, so cells spread evenly, and the windows are independent.
  * (The ascii-weighted [[PortableHash.phash]] family must NOT be
  * modded by a power of two here: its low bits carry only hex-char
  * ascii codes, and `phash % 256` reaches ~32 of 256 cells —
  * measured as a 3× median overcount before this construction.)
  * Everything reproduces exactly in DuckDB SQL and is
  * driver-oracle-checked (`a_cms_freq`). The width stays small
  * (w = 256 vs 150 keys × ~85 rows each at sf0.01) so collisions
  * actually occur at test scale and the estimate-vs-exact gap is
  * visible rather than vacuously zero.
  */
object FreqSketch {

  /** Sketch depth: 4 row hashes from one digest. */
  val Depth = 4

  /** Sketch width: 256 cells per row (one 2-nibble read). */
  val Width = 256

  private val hex = "0123456789abcdef"

  /** (r, cell) → count over the value column; d·w rows max. */
  def cmsSketch(df: DataFrame, valueCol: String): DataFrame =
    cmsCells(df, valueCol)
      .groupBy(col("r"), col("cell"))
      .agg(count(lit(1)).as("c"))

  /** One row per input row per depth: (value, r, cell). Row r reads
    * hex chars 8r+1, 8r+2 of the digest. */
  private def cmsCells(df: DataFrame, valueCol: String): DataFrame = {
    val digest = md5(concat(col(valueCol).cast("string"), lit("#cms")))
    df.select(col(valueCol), digest.as("d"))
      .select(col(valueCol),
        posexplode(array((0 until Depth).map { r =>
          expr(s"""(locate(substr(d, ${8 * r + 1}, 1), '$hex') - 1) * 16
                  | + locate(substr(d, ${8 * r + 2}, 1), '$hex') - 1"""
            .stripMargin).cast("long")
        }: _*)).as(Seq("r", "cell")))
  }

  /** Point estimates for every distinct key in `df`: min over the d
    * probed cells. The sketch side is d·w rows — broadcast. */
  def cmsEstimate(sketch: DataFrame, df: DataFrame, valueCol: String)
      : DataFrame =
    cmsCells(df, valueCol).distinct()
      .join(broadcast(sketch), Seq("r", "cell"))
      .groupBy(col(valueCol))
      .agg(min(col("c")).as("est_count"))

  /** Declared query: CMS estimate next to the exact count for the 20
    * busiest users — overestimate-only, bound-checked in spec. */
  def aCmsFreq(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val sk = cmsSketch(ev, "user_id")
    val est = cmsEstimate(sk, ev, "user_id")
    val exact = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_count"))
    est.join(exact, Seq("user_id"))
      .orderBy(col("exact_count").desc, col("user_id"))
      .limit(20)
      .select(col("user_id"), col("est_count"), col("exact_count"))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hash family used by the dedup/similarity
  * operators (MinHash, SimHash, LSH banding).
  *
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` are different
  * algorithms, so a correctness oracle can't use them. Instead we derive
  * a 64-bit-safe integer from the md5 hex digest — md5 is identical
  * everywhere — by weighting the ascii codes of the first 8 hex chars:
  *
  *   H_salt(s) = Σ_{i=1..8} ascii(substr(md5(s ⧺ "#salt"), i, 1)) · 128^(i-1)
  *
  * Max value ≈ 102·128^7 ≈ 5.9e16, well inside Long. ~16^8 ≈ 4.3e9
  * distinct values — plenty for banding/minhash at any realistic
  * cardinality. Everything is built from codegen'd Spark built-ins
  * (md5/substring/ascii), no UDFs.
  */
object PortableHash {

  private val weights: Seq[Long] =
    (0 until 8).map(i => math.pow(128, i).toLong)

  /** Column form: portable salted hash of a string column. */
  def phash(c: Column, salt: Int): Column = {
    val m = md5(concat(c, lit(s"#$salt")))
    (1 to 8).map { i =>
      ascii(substring(m, i, 1)).cast("long") * lit(weights(i - 1))
    }.reduce(_ + _)
  }

  /** DuckDB SQL text for the same hash, for oracle queries. */
  def phashSql(expr: String, salt: Int): String =
    (1 to 8).map { i =>
      s"CAST(ascii(substr(md5($expr || '#$salt'), $i, 1)) AS BIGINT) * ${weights(i - 1)}"
    }.mkString("(", " + ", ")")

  /** Four independent hashes from ONE md5: the 32-hex digest split into
    * disjoint 8-char windows (offsets 0/8/16/24). Quarter the digest
    * work of four salted hashes — the md5 dominates minhash cost. */
  def phashWindow(c: Column, window: Int): Column =
    phashFromDigest(md5(c), window)

  /** Same, over an ALREADY-computed md5 hex digest column — project the
    * digest once and reuse it across all four windows, instead of
    * trusting codegen subexpression elimination to dedupe four md5
    * calls inside an aggregate. */
  def phashFromDigest(m: Column, window: Int): Column =
    (1 to 8).map { i =>
      ascii(substring(m, window * 8 + i, 1)).cast("long") * lit(weights(i - 1))
    }.reduce(_ + _)

  /** DuckDB SQL for [[phashWindow]] (md5Expr must be the md5(...) text;
    * DuckDB CSEs the repeated call). */
  def phashWindowSql(md5Expr: String, window: Int): String =
    (1 to 8).map { i =>
      s"CAST(ascii(substr($md5Expr, ${window * 8 + i}, 1)) AS BIGINT) * ${weights(i - 1)}"
    }.mkString("(", " + ", ")")
}

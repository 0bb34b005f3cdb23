package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve: interleaves the bits of two dimensions so
  * that points close in (a, b) space land close on a single numeric
  * axis — the clustering key behind multi-dimensional file skipping
  * (Delta OPTIMIZE ZORDER BY, Databricks' liquid clustering ancestor).
  *
  * Built ONLY from codegen'd integer builtins (shiftleft / & / |), so
  * it runs inside WholeStageCodegen — no UDF, no boxing — and the
  * identical arithmetic runs in any ANSI SQL engine, which is what
  * makes it oracle-checkable cross-engine.
  *
  * The bit-spreading is the classic magic-mask doubling scheme
  * (Morton 1966; the form every bit-twiddling reference gives):
  * each step doubles the gap between occupied bit groups.
  */
object ZOrder {

  /** Spreads the low 16 bits of `x` to the even bit positions of a
    * 32-bit lane: b15..b0 -> 0b0..0b15 0 b14 0 ... 0 b0. */
  def spread16(x: Column): Column = {
    val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: a's bits on the even
    * positions, b's on the odd. Inputs beyond 16 bits contribute only
    * their low 16 (callers quantize/bucket first — at lake scale the
    * dimensions are range-bucketed before interleaving anyway). */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise quantized vector sum + per-dim member count — the
  * Lloyd mean-update aggregate in map-side-combining form.
  *
  * Input: one float-array embedding per row; each element is
  * e4-quantized with the SAME floor(x·10⁴ + 0.5) every other kernel
  * applies, then summed per dimension as an exact Long (|q| ≲ 10⁵ and
  * corpus counts keep every sum far under 2⁶³ — integer addition is
  * order-independent, so partial aggregation cannot change the
  * result). `cnts` tracks members PER DIMENSION, so ragged inputs sum
  * exactly like the relational per-(cell, dim) groupBy they replace.
  *
  * Why (guide §2.3 "aggregate before you shuffle"): the relational
  * update — posexplode to (vec, dim, q), join the (vec, cell)
  * assignment, groupBy (cell, dim) — shuffles N·d rows through two
  * exchanges per Lloyd round. This aggregate folds each partition's
  * vectors into k partial rows of d longs before the exchange: the
  * shuffle carries k·partitions array rows instead of N·d scalar rows,
  * and the assignment join disappears (the cell is computed on the
  * row by [[ArgminCellQ]]).
  */
final case class SumVec(sums: Seq[Long], cnts: Seq[Long])

object SumVecQ extends Aggregator[Seq[Double],
    (Array[Long], Array[Long]), SumVec] {

  override def zero: (Array[Long], Array[Long]) =
    (Array.emptyLongArray, Array.emptyLongArray)

  private def grow(a: Array[Long], n: Int): Array[Long] =
    if (a.length >= n) a else java.util.Arrays.copyOf(a, n)

  // input is Seq[Double]: the [[column]] helper casts the embedding to
  // array<double> explicitly — float widens to double EXACTLY, so the
  // quantization below is identical to the former Seq[Float] form (and
  // to the relational CAST(x AS DOUBLE)), while array<double> frames
  // (e.g. SQL transform() replicas) now aggregate correctly instead of
  // failing analysis.
  override def reduce(buf: (Array[Long], Array[Long]),
      in: Seq[Double]): (Array[Long], Array[Long]) = {
    if (in == null) return buf
    val d = in.length
    val sums = grow(buf._1, d)
    val cnts = grow(buf._2, d)
    var i = 0
    while (i < d) {
      sums(i) += math.floor(in(i) * 10000.0 + 0.5).toLong
      cnts(i) += 1L
      i += 1
    }
    (sums, cnts)
  }

  override def merge(a: (Array[Long], Array[Long]),
      b: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
    val n = math.max(a._1.length, b._1.length)
    val sums = grow(a._1, n)
    val cnts = grow(a._2, n)
    var i = 0
    while (i < b._1.length) {
      sums(i) += b._1(i); cnts(i) += b._2(i); i += 1
    }
    (sums, cnts)
  }

  override def finish(buf: (Array[Long], Array[Long])): SumVec =
    SumVec(buf._1.toSeq, buf._2.toSeq)

  override def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  override def outputEncoder: Encoder[SumVec] = Encoders.product[SumVec]

  /** Untyped Column form: sumvec_q(embedding) → struct(sums, cnts).
    * The explicit array<double> cast is exact for float inputs. */
  def column(embedding: Column): Column =
    udaf(SumVecQ).apply(embedding.cast("array<double>"))
}

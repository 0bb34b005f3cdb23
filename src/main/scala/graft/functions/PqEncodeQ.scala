package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization encode of one
  * float-array embedding against the WHOLE broadcast codebook in a
  * single row-level loop — the dim-ordered array of argmin sub-codes.
  *
  * Inputs: `emb` array<float> (e4-quantized on the fly, [[Dist2Q]]'s
  * floor(x·10⁴ + 0.5)); `codes` array<long> of the code alphabet
  * SORTED ASCENDING; `cvecs` array<array<long>> of the matching
  * per-code FULL-LENGTH quantized centroid vectors (cvecs(j)(dim) =
  * codebook c for (sub = dim div dimsPerSub, code = codes(j), dim) —
  * the per-(sub, code) codebook flattened per code, which is possible
  * because every code exists in every subspace). `dimsPerSub` is a
  * plan-time constant.
  *
  * Per subspace s the code is argmin_j Σ_{dim ∈ s} (q_dim − cvec_j[dim])²
  * with code-asc tie-break (codes sorted + strict `<` keeps the first
  * minimum) — exactly the relational subDist → min_by(code,
  * struct(d2, code)) → dim-ordered pack route of
  * [[graft.operators.Similarity]]'s `pqEncodeAgainst`, whose plan
  * materializes N·d·|codes| joined rows through TWO aggregate
  * exchanges plus a collect_list pack and then joins the codes back to
  * the embedding row. Here the codes are computed ON the row — no
  * exchange. Same integers, same tie-break.
  */
case class PqEncodeQ(first: Expression, second: Expression,
    third: Expression, dimsPerSub: Int) extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // same float-or-double embedding contract as [[ArgminCellQ]] — a
  // float widens to double exactly; anything else fails analysis
  private lazy val embIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode_q expects array<float> or array<double> embeddings, got $t")
    }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PqEncodeQ =
    copy(first = f, second = s, third = t)

  override def nullSafeEval(e: Any, cs: Any, vs: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val codes = cs.asInstanceOf[ArrayData]
    val cvecs = vs.asInstanceOf[ArrayData]
    val d = emb.numElements()
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      val x = if (embIsFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      q(i) = math.floor(x * 10000.0 + 0.5).toLong
      i += 1
    }
    val k = codes.numElements()
    val nSubs = (d + dimsPerSub - 1) / dimsPerSub
    val out = new Array[Long](nSubs)
    var s = 0
    while (s < nSubs) {
      val lo = s * dimsPerSub
      val hi = math.min(lo + dimsPerSub, d)
      var bestCode = 0L
      var bestDist = Long.MaxValue
      var j = 0
      while (j < k) {
        val cv = cvecs.getArray(j)
        val n = math.min(hi, cv.numElements())
        var acc = 0L
        var t = lo
        while (t < n) {
          val diff = q(t) - cv.getLong(t)
          acc += diff * diff
          t += 1
        }
        if (acc < bestDist) { bestDist = acc; bestCode = codes.getLong(j) }
        j += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cs, vs) => {
      val d = ctx.freshName("d")
      val q = ctx.freshName("q")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val nSubs = ctx.freshName("nSubs")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val bestCode = ctx.freshName("bestCode")
      val bestDist = ctx.freshName("bestDist")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val diff = ctx.freshName("diff")
      val get =
        if (embIsFloat) s"((double) $e.getFloat($i))" else s"$e.getDouble($i)"
      s"""
        int $d = $e.numElements();
        long[] $q = new long[$d];
        for (int $i = 0; $i < $d; $i++) {
          $q[$i] = (long) java.lang.Math.floor($get * 10000.0 + 0.5);
        }
        int $k = $cs.numElements();
        int $nSubs = ($d + $dimsPerSub - 1) / $dimsPerSub;
        long[] $out = new long[$nSubs];
        for (int $s = 0; $s < $nSubs; $s++) {
          int $lo = $s * $dimsPerSub;
          int $hi = java.lang.Math.min($lo + $dimsPerSub, $d);
          long $bestCode = 0L;
          long $bestDist = Long.MAX_VALUE;
          for (int $j = 0; $j < $k; $j++) {
            org.apache.spark.sql.catalyst.util.ArrayData $cv = $vs.getArray($j);
            int $n = java.lang.Math.min($hi, $cv.numElements());
            long $acc = 0L;
            for (int $t = $lo; $t < $n; $t++) {
              long $diff = $q[$t] - $cv.getLong($t);
              $acc += $diff * $diff;
            }
            if ($acc < $bestDist) { $bestDist = $acc; $bestCode = $cs.getLong($j); }
          }
          $out[$s] = $bestCode;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
}

object PqEncodeQ {
  /** Column API: pq_encode_q(emb, codes, cvecs, dimsPerSub) →
    * array<long> sub-codes (dim-ordered). */
  def pqEncodeQ(emb: Column, codes: Column, cvecs: Column,
      dimsPerSub: Int): Column =
    org.apache.spark.sql.functions.call_function("pq_encode_q",
      emb, codes, cvecs, org.apache.spark.sql.functions.lit(dimsPerSub))
}

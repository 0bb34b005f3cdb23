package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: exact integer dot product of two
  * long-array code vectors — the SQ8 candidate-scoring kernel of the
  * composed IVF-SQ8 serving stack ([[graft.operators.Similarity]]).
  *
  * Scoring a probed cell's members against a query's code vector is
  * one tight primitive loop per member ROW; the relational
  * (vec, dim, code) join form materializes members·d rows through a
  * hash aggregate for the same integer (the measured 10× gap that
  * motivated [[Dist2Q]]). Codes are bounded (0..255 per element, d ≤
  * 10⁴), so every partial sum stays far under 2⁵³ — the dot product is
  * exact and bit-identical to the oracle's integer arithmetic.
  */
case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $acc;
      """
    })
}

object DotQ {
  /** Column API: exact integer dot product of two quantized code
    * vectors (long arrays). Resolves through the function registry —
    * requires [[graft.core.GraftExtensions]] on the session. */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_q", a, b)
}

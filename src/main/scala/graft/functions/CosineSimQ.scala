package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: quantized cosine similarity of two
  * float-array embeddings, returned as floor(cos · 10⁶) (a Long).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function chain in
  * the similarity operators: HOFs evaluate interpreted (lambda dispatch
  * per element); this expression participates in whole-stage codegen and
  * runs a tight primitive loop — the difference is ~an order of
  * magnitude on the brute-force scan at scale.
  *
  * Numerics match the oracle exactly: elements are quantized to integers
  * via floor(x·10⁴ + 0.5); dot product and norms are exact integer sums
  * (order-independent, all < 2⁵³); one deterministic double expression at
  * the end. Zero-norm inputs return 0.
  */
case class CosineSimQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimQ =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = math.floor(a.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      val y = math.floor(b.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0L
    else math.floor(dot.toDouble
      / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1000000.0).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $dot = 0L; long $na = 0L; long $nb = 0L;
        for (int $i = 0; $i < $n; $i++) {
          long $x = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 10000.0 + 0.5);
          long $y = (long) java.lang.Math.floor(((double) $b.getFloat($i)) * 10000.0 + 0.5);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = ($na == 0L || $nb == 0L) ? 0L :
          (long) java.lang.Math.floor(((double) $dot)
            / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb))
            * 1000000.0);
      """
    })
}

object CosineSimQ {
  /** Column API: floor(cosine(a, b) · 10⁶) as Long. Resolves through the
    * function registry — requires [[graft.core.GraftExtensions]] on the
    * session (set by [[graft.core.Sessions]]). */
  def cosineSimE6(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim_e6", a, b)
}

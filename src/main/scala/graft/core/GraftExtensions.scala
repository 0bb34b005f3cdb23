package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ArgminCellQ, CosineSimQ, Dist2Q, DotQ, PqEncodeQ}

/** Session extensions registering the engine's native Catalyst
  * expressions, activated via `spark.sql.extensions` (see [[Sessions]]).
  * This is the public, documented injection point — no private Spark
  * API is touched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim_e6"),
      new ExpressionInfo(classOf[CosineSimQ].getName, "cosine_sim_e6"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimQ(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("dist2_q"),
      new ExpressionInfo(classOf[Dist2Q].getName, "dist2_q"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Dist2Q(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotQ].getName, "dot_q"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotQ(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("argmin_cell_q"),
      new ExpressionInfo(classOf[ArgminCellQ].getName, "argmin_cell_q"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgminCellQ(exprs.head, exprs(1), exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("pq_encode_q"),
      new ExpressionInfo(classOf[PqEncodeQ].getName, "pq_encode_q"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqEncodeQ(exprs.head, exprs(1), exprs(2),
          // dimsPerSub is a plan-time constant: a literal 4th argument
          exprs(3).eval().asInstanceOf[Number].intValue)))
  }
}

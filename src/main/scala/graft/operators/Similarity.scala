package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the `embeddings(vec_id, embedding float[64],
  * label)` table.
  *
  * - Brute-force cosine top-k is the exact baseline: broadcast the
  *   (small) query set against the full table — one scan, no shuffle of
  *   the big side, per-partition local top-k then global top-k via the
  *   rank window.
  * - The IVF variant prunes to the query's coarse partition (here the
  *   `label` column stands in for the nearest-centroid assignment): at
  *   scale the bucket equi-join touches 1/k of the data — the path that
  *   survives 100 TB.
  *
  * Numerics: embeddings are quantized to exact integers
  * (floor(x·10⁴ + 0.5)), so dot products and norms are
  * order-independent integer sums (all < 2⁵³); the final cosine is one
  * deterministic double expression. This keeps results bit-identical
  * across engines/partitionings — a float fold would not be.
  */
object Similarity {

  private val quantize =
    "transform(%s, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"

  private def withQuant(t: Tables): DataFrame =
    t.embeddings.select(col("vec_id"), col("label"),
      expr(quantize.format("embedding")).as("qv"))
      .withColumn("nrm",
        expr("aggregate(qv, CAST(0 AS BIGINT), (a, v) -> a + v * v)"))

  private def topk(spark: SparkSession, dir: String, k: Int,
      sameLabelOnly: Boolean): DataFrame = {
    val base = withQuant(Tables(spark, dir))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qv").as("q_qv"),
        col("label").as("q_label"), col("nrm").as("q_nrm"))
    val joined =
      if (sameLabelOnly)
        base.join(broadcast(queries), col("label") === col("q_label"))
      else
        base.crossJoin(broadcast(queries))
    val scored = joined
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot",
        expr("aggregate(zip_with(q_qv, qv, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
      .withColumn("cos_e6",
        floor(col("dot").cast("double")
          / (sqrt(col("q_nrm").cast("double")) * sqrt(col("nrm").cast("double")))
          * 1000000.0).cast("long"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_e6"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Exact brute-force cosine top-10 for 5 query vectors. */
  def cosineTopk(spark: SparkSession, dir: String): DataFrame =
    topk(spark, dir, 10, sameLabelOnly = false)

  /** IVF-pruned ANN: top-5 within the query's coarse bucket (label). */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    topk(spark, dir, 5, sameLabelOnly = true)
}

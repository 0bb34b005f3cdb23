package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Capstone composition: the full training-corpus curation pass a data
  * pipeline actually runs, as ONE declarative plan — quality gate →
  * exact-dedup keeper election → deterministic train/dev/test split →
  * per-(lang, split) corpus stats. Catalyst pipelines the quality
  * filter into the scan, the dedup window is the only wide stage over
  * full rows, and the split is a shuffle-free hash of the keeper id. */
object Pipelines {

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = split(col("text"), " ")
    val quality = t.documents
      .select(col("doc_id"), col("lang"), col("text"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .filter(col("n_tokens") >= 30 && col("n_distinct") * 2 >= col("n_tokens"))
    val w = Window.partitionBy(col("fp"))
    val keepers = quality
      .withColumn("fp", md5(Dedup.norm(col("text"))))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
    keepers
      .withColumn("bucket", Sampling.splitBucket(col("doc_id")))
      .withColumn("split", Sampling.splitName(col("bucket")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("lang"), col("split"))
  }
}

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

  /** Sequence packing (concat-and-chop): documents are laid end-to-end
    * in a deterministic order per language and chopped into fixed
    * token-budget bins — the packing step that turns a curated corpus
    * into fixed-length pretraining sequences. A document's bin is the
    * bin its FIRST token lands in. One window pass + one aggregation;
    * the running sum shards by language. */
  def packSequences(spark: SparkSession, dir: String,
      tokenBudget: Long = 2048L): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) div $tokenBudget"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  /** Deterministic chunk/frame sampling for multimodal assets: every
    * k-th fixed-size chunk of each asset (here: 256-byte chunks of the
    * text payload standing in for video frames — the Spark-side
    * plumbing is identical). Pure narrow ops: sequence + explode +
    * modulo filter; no data-dependent driver loop. */
  def mmChunkSample(spark: SparkSession, dir: String,
      chunkBytes: Int = 256, every: Int = 10): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      // greatest(…, 1) keeps the dividend non-negative for empty text
      // (negative operands are where Spark's truncating div and floor
      // division `//` disagree); an empty asset still has chunk 0
      .select(col("doc_id"),
        expr(s"(greatest(octet_length(encode(text, 'UTF-8')), 1) - 1) div $chunkBytes")
          .as("max_chunk"))
      .select(col("doc_id"),
        explode(expr("sequence(0L, max_chunk)")).as("chunk_idx"))
      .filter(pmod(col("chunk_idx"), lit(every.toLong)) === 0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"), max(col("chunk_idx")).as("last_sampled"))
      .orderBy(col("doc_id"))
  }

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = split(col("text"), " ")
    // spread: array_distinct + md5-normalize per doc is the CPU; the
    // corpus scan's split count must not bound it (x100 lesson)
    val quality = t.documentsSpread
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

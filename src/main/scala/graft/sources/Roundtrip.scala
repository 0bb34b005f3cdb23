package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.core.Tables

/** Source/sink format coverage beyond JSON (SURVEY §2.1): CSV and
  * partitioned Parquet, each proven by a write → re-read → aggregate
  * round-trip whose result must equal computing directly on the
  * original table (the oracle does exactly that).
  *
  * The partitioned write demonstrates the layout a 100 TB lake zone
  * actually uses — hive-style `lang=<v>/` directories so that a filtered
  * read lists and scans ONLY the matching partition (partition pruning,
  * visible as `PartitionFilters` in the scan node).
  */
object Roundtrip {

  /** Per-process scratch path: isolated across concurrently running
    * Verify/Bench JVMs (which would race on a shared overwrite-then-
    * read dir), stable within one JVM (reruns overwrite), and removed
    * by a shutdown hook so repeated fresh-JVM loops don't accumulate
    * pid-suffixed copies on disk. */
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def tmpDir(prefix: String): String = {
    val d = new java.io.File(
      s"target/tmp/${prefix}_${ProcessHandle.current().pid()}")
    d.mkdirs()
    if (cleanupRegistered.compareAndSet(false, true)) {
      val root = new java.io.File("target/tmp")
      val pid = ProcessHandle.current().pid().toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        Option(root.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(s"_$pid"))
          .foreach { dir =>
            val walk = java.nio.file.Files.walk(dir.toPath)
            try walk.iterator().asScala.toSeq.reverse
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
            finally walk.close()
          }
      }))
    }
    d.toString
  }

  /** CSV sink + source round-trip (header, explicit read schema — CSV
    * inference is a second full scan, never acceptable at scale). */
  def s2CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val out = tmpDir("csv_docs")
    t.documents
      .select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("text_len"))
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.read.option("header", "true")
      .schema("doc_id BIGINT, lang STRING, source STRING, text_len BIGINT")
      .csv(out)
      .select(
        coalesce(col("lang"), lit("unknown")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        col("text_len"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("text_len")).as("sum_len"))
      .orderBy(col("lang"), col("source"))
  }

  /** ORC sink + source round-trip (the second columnar format Spark
    * ships natively — zero extra dependencies, same pushdown/pruning
    * machinery as parquet). Doubles survive losslessly, so the cents
    * conversion happens after the re-read and must equal computing on
    * the original parquet directly. */
  def s4OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val out = tmpDir("orc_lineitem")
    t.lineitem
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** Hive-partitioned parquet write + partition-pruned read-back. */
  def s3PartitionedPrune(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val out = tmpDir("part_docs")
    t.documents
      .select(col("doc_id"),
        coalesce(col("lang"), lit("unknown")).as("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    spark.read.parquet(out)
      .filter(col("lang") === "en") // partition-pruned: only lang=en/ scanned
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }
}

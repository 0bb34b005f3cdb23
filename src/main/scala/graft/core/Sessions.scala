package graft.core

import org.apache.spark.sql.SparkSession

/** Single shared SparkSession factory (replaces the reference's three
  * sessions-per-request — SURVEY.md §3.1, `config/spark_config.py`).
  *
  * - UTC session TZ for deterministic timestamp parity with the oracle.
  * - AQE on (runtime partition coalescing + skew-join handling).
  * - shuffle.partitions sized to cores, not the 200 default (local mode);
  *   on a real cluster this is overridden per deployment.
  * - nanosAsLong: the driver-generated `events` table stores
  *   timestamp[ns], which Spark 4 otherwise refuses to read.
  */
object Sessions {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Session for local dev/tests. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

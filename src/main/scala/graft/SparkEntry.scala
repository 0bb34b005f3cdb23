package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, max}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator family from SURVEY.md
  * §2's inventory, re-expressed over the synthetic tables; `oracleSql`
  * carries the equivalent DuckDB SQL the driver uses as the correctness
  * oracle. Column names/aliases are kept identical on both sides (the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — the
    * concatenation of the per-family registries (graft.registry). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.registry.RelationalReg.queries ++
    graft.registry.DomainReg.queries ++
    graft.registry.DedupReg.queries ++
    graft.registry.TextReg.queries ++
    graft.registry.SimReg.queries ++
    graft.registry.PipelineReg.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Typed-output policy (the q5 r7 lesson): DuckDB's integer `sum()`
    * yields HUGEINT, which pandas reads as float64 and the driver's
    * typed hash rejects against Spark's int64 — so every integer sum
    * that REACHES THE OUTPUT must be wrapped `CAST(... AS BIGINT)` in
    * the final projection. Bare `sum(` inside a CTE is fine when the
    * outer SELECT casts it or folds it into float math (`// x / y.0`),
    * and `sum(` over DOUBLE inputs is already float64. This is machine
    * -enforced: `tools/check.py` fails any int-vs-float dtype-kind
    * mismatch per column, and preflight runs it over every query. */
  def oracleSql: Map[String, String] =
    graft.registry.RelationalReg.oracleSql ++
    graft.registry.DomainReg.oracleSql ++
    graft.registry.DedupReg.oracleSql ++
    graft.registry.TextReg.oracleSql ++
    graft.registry.SimReg.oracleSql ++
    graft.registry.PipelineReg.oracleSql
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar-function surface beyond what the reference exercises (SURVEY
  * §2.3 stops at timestamps/regex/casts): date arithmetic and string
  * functions, every output pinned to a cross-engine-exact encoding.
  * All narrow transformations — these run at scan speed at any scale.
  */
object FunctionSuites {

  /** Date/time functions over order dates, grouped per month:
    * date_trunc, dayofmonth, dayofweek (aligned to DuckDB's 0=Sunday),
    * last_day, add-months, datediff. */
  def fDateSuite(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .select(col("o_orderdate"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .groupBy(unix_micros(col("m")).as("month_us"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dayofmonth(col("o_orderdate")).cast("long")).as("sum_dom"),
        // Spark: 1=Sunday..7=Saturday; minus 1 aligns to DuckDB dow
        sum((dayofweek(col("o_orderdate")) - 1).cast("long")).as("sum_dow"),
        max(unix_date(last_day(col("o_orderdate"))).cast("long")).as("max_last_day"),
        max(unix_micros(add_months(col("m"), 2).cast("timestamp"))).as("plus2m_us"),
        sum(datediff(col("o_orderdate"), col("m")).cast("long")).as("sum_day_offset"))
      .orderBy(col("month_us"))
  }

  /** Conditional + bitwise functions: nullif / least / greatest and
    * AND/OR/XOR/shift over event ids, rolled up per event_type. */
  def fCondBitwise(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = round(col("value") * 100).cast("long")
    t.events
      .select(col("event_type"), col("event_id"), col("user_id"), c.as("c"))
      .groupBy(col("event_type"))
      .agg(
        count(when(expr("nullif(user_id % 10, 0)").isNull, 1)).as("n_zero_mod"),
        sum(least(col("c"), lit(10000L))).as("sum_capped"),
        sum(greatest(col("c"), col("user_id") * 100)).as("sum_floored"),
        sum(col("event_id").bitwiseAND(lit(255L))).as("sum_and"),
        sum(col("event_id").bitwiseOR(lit(1L))).as("sum_or"),
        sum(col("event_id").bitwiseXOR(col("user_id"))).as("sum_xor"),
        sum(shiftleft(col("user_id"), 3).cast("long")).as("sum_shl"))
      .orderBy(col("event_type"))
  }

  /** String functions over English docs (single-script text so
    * levenshtein/substr agree across engines' unicode handling):
    * levenshtein, reverse, repeat, translate, lpad. */
  def fStringSuite(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val head16 = substring(col("text"), 1, 16)
    t.documents
      .filter(col("lang") === "en")
      .select(
        col("doc_id"),
        levenshtein(head16, reverse(head16)).cast("long").as("lev"),
        translate(lower(head16), "aeiou", "01234").as("tr"),
        length(repeat(substring(col("text"), 1, 4), 3)).cast("long").as("rep_len"),
        lpad(col("lang"), 5, "_").as("padded"))
      .orderBy(col("doc_id"))
  }
}

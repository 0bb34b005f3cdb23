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

  /** Array-function surface: build deterministic integer sequences per
    * event_type, then drive intersect/except/union, position/contains,
    * reverse/slice/flatten, min/max and the HOF fold — each pinned to a
    * sorted string encoding (element order of Spark's set ops is
    * first-occurrence; sorting before joining removes the cross-engine
    * order sensitivity). DuckDB 1.0 lacks list_intersect/except, so the
    * oracle re-expresses them as list_filter + list_contains. */
  def fArraySuite(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        expr("sequence(1, CAST(3 + n % 5 AS INT))").as("la"),
        expr("sequence(CAST(2 + n % 3 AS INT), 8)").as("lb"))
      .select(col("event_type"), col("n"),
        array_join(col("la"), ",").as("la_s"),
        array_join(col("lb"), ",").as("lb_s"),
        array_join(sort_array(array_intersect(col("la"), col("lb"))), ",")
          .as("inter_s"),
        array_join(sort_array(array_except(col("la"), col("lb"))), ",")
          .as("except_s"),
        array_join(sort_array(array_union(col("la"), col("lb"))), ",")
          .as("union_s"),
        size(col("la")).cast("long").as("la_len"),
        try_element_at(col("la"), lit(2)).cast("long").as("la_2"),
        expr("array_position(lb, 5)").as("pos5"),
        array_contains(col("lb"), 4).as("has4"),
        array_join(reverse(col("la")), ",").as("rev_s"),
        array_max(col("lb")).cast("long").as("mx"),
        array_min(col("lb")).cast("long").as("mn"),
        array_join(slice(col("lb"), 2, 3), ",").as("slice_s"),
        array_join(flatten(array(col("la"), col("lb"))), ",").as("flat_s"),
        expr("aggregate(la, CAST(0 AS BIGINT), (acc, e) -> acc + e)")
          .as("sum_la"))
      .orderBy(col("event_type"))
  }

  /** Map-function surface: construct typed maps from aggregates, then
    * drive keys/lookup/cardinality/concat and the map_filter HOF —
    * outputs pinned to sorted joined strings and scalar lookups. The
    * DuckDB oracle re-expresses map_filter (absent in 1.0) as
    * list_filter over map_keys + map_extract. */
  def fMapSuite(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("u"),
        max(round(col("value") * 100).cast("long")).as("mx"))
      .select(col("event_type"),
        map(lit("n"), col("n"), lit("u"), col("u")).as("m1"),
        map(lit("x"), col("mx")).as("m2"))
      .withColumn("cm", map_concat(col("m1"), col("m2")))
      .select(col("event_type"),
        array_join(sort_array(map_keys(col("m1"))), ",").as("keys1"),
        try_element_at(col("m1"), lit("n")).as("m1_n"),
        try_element_at(col("m1"), lit("u")).as("m1_u"),
        (size(col("m1")) + size(col("m2"))).cast("long").as("card_sum"),
        size(col("cm")).cast("long").as("card_cm"),
        try_element_at(col("cm"), lit("x")).as("cm_x"),
        array_join(sort_array(map_keys(
          map_filter(col("cm"), (_, v) => v >= lit(1000L)))), ",")
          .as("big_keys"))
      .orderBy(col("event_type"))
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

  /** Morton (Z-order) codes from pure integer bit arithmetic
    * ([[graft.functions.ZOrder]]): interleaves two bucketed order
    * dimensions and aggregates per curve segment — the exact same
    * shift/mask pipeline runs in the oracle, proving the clustering
    * key is engine-independent (what makes Z-order layouts portable
    * across writers). */
  def fZorder(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val z = graft.functions.ZOrder.interleave16(
      col("o_custkey") % 1024, col("o_orderkey") % 1024)
    t.orders
      .select(z.as("z"))
      .groupBy(expr("z div 65536").as("z_seg"))
      .agg(count(lit(1)).as("n"), sum(col("z")).cast("long").as("sum_z"))
      .orderBy(col("z_seg"))
  }
}

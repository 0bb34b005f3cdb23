package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Core relational operators (SURVEY.md §2.2 projections/filters, §2.5
  * aggregations, §2.7 joins) re-expressed over the synthetic tables.
  *
  * Every query is a declarative DataFrame plan — filters/projections are
  * pushed into the parquet scan by Catalyst, aggregations run as partial
  * (map-side) + final hash aggregates, and dimension joins broadcast.
  * Results are deterministically ordered and every computed column is
  * aliased to match the DuckDB oracle exactly.
  */
object Relational {

  /** A12 pricing-summary style aggregation (partial+final hash agg;
    * scan reads only the 5 referenced columns). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        sum(col("l_quantity").cast("long")).as("sq"),
        count(lit(1)).as("n_rows"))
      // quantities are integral: exact integer sum + half-up integer
      // rounding gives a bit-deterministic 4-decimal average
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("sum_price"),
        (expr("(20000 * sq + n_rows) div (2 * n_rows)").cast("double") / 10000.0).as("avg_qty"),
        col("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** J1/J2 analog: left join preserving unmatched rows + coalesce-to-zero
    * (reference `basic_preprocessing_people.py:149-163`,
    * `basic_preprocessing_parkingLot.py:93-97`). Aggregate first, then
    * broadcast the small grouped side. */
  def jLeftCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perCust = t.orders.groupBy(col("o_custkey")).agg(
      count(lit(1)).as("n_orders"),
      round(sum(col("o_totalprice")), 2).as("total_spent"))
    t.customer
      .join(broadcast(perCust), col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** Broadcast dimension-chain join (lineitem ⋈ supplier ⋈ nation ⋈
    * region): revenue per region. Dims broadcast — no shuffle of the
    * fact side except the final small aggregation. */
  def jBroadcastDims(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      // price/discount are 2-decimal data: revenue in exact integer
      // 1e-4-dollar units (cents × (100 - discount_cents)) so the sum is
      // order-independent — a raw double sum flakes at round() edges.
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4"),
        count(lit(1)).as("n_items"))
      .select(col("r_name"),
        (expr("(rev4 + 50) div 100").cast("double") / 100.0).as("revenue"),
        col("n_items"))
      .orderBy(col("r_name"))
  }

  /** Semi/anti join surface: per-segment counts of customers with and
    * without orders (left_semi / left_anti against a broadcast key set). */
  def jSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val custKeys = t.orders.select(col("o_custkey")).distinct()
    val withO = t.customer.join(custKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
    val withoutO = t.customer.join(custKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(
        col("c_mktsegment"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Top-k pattern (Kibana "Top 5 values", SURVEY A12): top 10 orders by
    * revenue, deterministic tie-break on the key. TakeOrderedAndProject —
    * no global sort materialization. */
  def aTopkRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4"))
      .orderBy(col("rev4").desc, col("l_orderkey")) // exact-integer order key
      .limit(10)
      .select(col("l_orderkey"),
        (expr("(rev4 + 50) div 100").cast("double") / 100.0).as("revenue"))
  }

  /** A1 deterministic frame-regroup analog: collect_list pinned with
    * sort_array (reference relies on accidental single-partition order —
    * SURVEY §2.5 A1). String-join for a stable cross-engine encoding. */
  def a1Regroup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("linenumbers"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_orderkey"))
  }

  /** A11 distinct: distinct (event_type, user_id) pairs per type. */
  def aDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** The canonical full pricing-summary (TPC-H Q1 shape): shipdate
    * predicate pushed to the scan, eight aggregates in one partial+final
    * hash-agg pass. Money terms are exact-integer: disc price in 1e-4
    * units, charge in 1e-6 units; the two product sums accumulate as
    * decimal(38,0) (≡ DuckDB HUGEINT) so no scale factor can overflow
    * them, and sum_base_price is derived from the exact cents sum —
    * never a partition-order-dependent double accumulation. Averages
    * use the proven integer half-up form. */
  def q1Full(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pc = round(col("l_extendedprice") * 100).cast("long")
    val dc = round(col("l_discount") * 100).cast("long")
    val tc = round(col("l_tax") * 100).cast("long")
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum((pc * (lit(100L) - dc)).cast("decimal(38,0)")).as("disc4"),
        sum((pc * (lit(100L) - dc) * (lit(100L) + tc)).cast("decimal(38,0)"))
          .as("charge6"),
        sum(pc).as("sum_price_cents"),
        sum(dc).as("sum_disc_cents"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("sum_price_cents").cast("double") / 100.0).as("sum_base_price"),
        (expr("(disc4 + 50) div 100").cast("double") / 100.0).as("sum_disc_price"),
        (expr("(charge6 + 5000) div 10000").cast("double") / 100.0).as("sum_charge"),
        (expr("(20000 * sum_qty + n_rows) div (2 * n_rows)").cast("double") / 10000.0)
          .as("avg_qty"),
        (expr("(200 * sum_price_cents + n_rows) div (2 * n_rows)").cast("double") / 10000.0)
          .as("avg_price"),
        (expr("(200 * sum_disc_cents + n_rows) div (2 * n_rows)").cast("double") / 10000.0)
          .as("avg_disc"),
        col("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Correlated scalar subquery + EXISTS predicate through the SQL
    * surface — Catalyst decorrelates both into aggregate/semi joins
    * (no per-row re-execution; `.explain` shows plain joins). */
  def qSubqueries(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.nation.createOrReplaceTempView("graft_sq_nation")
    t.supplier.createOrReplaceTempView("graft_sq_supplier")
    t.customer.createOrReplaceTempView("graft_sq_customer")
    spark.sql(
      """SELECT n_name,
                (SELECT count(1) FROM graft_sq_supplier
                 WHERE s_nationkey = n_nationkey) AS n_suppliers,
                EXISTS (SELECT 1 FROM graft_sq_customer
                        WHERE c_nationkey = n_nationkey
                          AND c_acctbal > 9000.0) AS has_rich_customer
         FROM graft_sq_nation ORDER BY n_name""")
  }

  /** Q3-shape shipping-priority join: selective filters on BOTH
    * dimensions (pushed into the parquet scans), then
    * customer ⋈ orders ⋈ lineitem with the filtered customer side
    * broadcast — the canonical selective multi-join every OLAP bench
    * leads with. Revenue in exact integer 1e-4 units. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = t.orders
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    t.lineitem
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4"))
      .orderBy(col("rev4").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("odate_us"),
        (expr("(rev4 + 50) div 100").cast("double") / 100.0).as("revenue"))
  }

  /** Q5-shape local-supplier revenue: the classic SIX-table join-order
    * stress (region → nation → {customer, supplier} → orders →
    * lineitem) with a selective region filter and an order-date
    * window. Hint policy: only region/nation — CONSTANT-size tables —
    * carry broadcast hints; customer and supplier scale with SF, so
    * AQE decides those joins from measured sizes (broadcast at bench
    * scale, shuffle at 100 TB — both correct). The data-sized
    * shuffles are lineitem ⋈ orders on orderkey plus whatever AQE
    * declines to broadcast; the final per-nation aggregate is tiny.
    * The co-location predicate c_nationkey = s_nationkey is the
    * famous Q5 trap: it is NOT a join key until both sides are
    * already joined to the facts — Catalyst handles it as a post-join
    * equi-condition on the customer join, exactly right.
    * Revenue in exact 1e-4 integer units (cents × (100 − disc)). */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val asiaNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val ord = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev4"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier.join(broadcast(asiaNations),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name")),
        col("l_suppkey") === col("s_suppkey"))
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev4")).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("n_name"))
  }

  /** Q18-shape large-volume orders — the HAVING-over-aggregate +
    * fact-to-aggregate join no other declared query exercises: the
    * per-order quantity rollup (one lineitem shuffle) keeps only
    * orders past the volume threshold, and THAT aggregate — tiny by
    * selectivity — drives the joins to orders and customer, so AQE
    * broadcasts it and neither fact table shuffles again. Top-20 by
    * exact price cents via TakeOrderedAndProject. */
  def q18VolumeCustomer(spark: SparkSession, dir: String,
      minQty: Long = 300L): DataFrame = {
    val t = Tables(spark, dir)
    // HAVING compares the EXACT sum (cast would truncate while the
    // oracle's HAVING sees the raw value); only the output column is
    // round-then-cast, the same rounding DuckDB's CAST applies.
    val big = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty_exact"))
      .filter(col("sum_qty_exact") > minQty) // the HAVING clause
      .select(col("l_orderkey"),
        round(col("sum_qty_exact")).cast("long").as("sum_qty"))
    big
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("sum_qty"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Q10-shape returned-item losses: which customers returned the
    * most revenue in a year window. Both fact filters (returnflag,
    * order-date window) push to their scans before any join; customer
    * is SF-proportional so AQE decides that join from measured sizes;
    * nation — constant — is the only static broadcast. The customer
    * account balance rides IN the group key as exact cents (one value
    * per customer, so the key is no wider), revenue in exact 1e-4
    * units, top-20 via TakeOrderedAndProject with the unique custkey
    * tie-break. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ord = t.orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    t.lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev4"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select(col("c_custkey"), col("c_name"),
        col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_cents")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        col("acctbal_cents"))
      .agg(sum(col("rev4")).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue_e4"), col("acctbal_cents"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting) — the
    * heaviest classic join-order stress: a DOUBLE-correlated
    * existence test on the same fact table. Adapted to this schema
    * ("late" := l_shipdate > o_orderdate + 60 days, the trimmed
    * tables carry no receipt/commit dates): a supplier is counted for
    * an F-status order when its line was late, ANOTHER supplier also
    * supplied the order (EXISTS), and NO other supplier was late on
    * it (NOT EXISTS).
    *
    * Spark-first form: both correlated subqueries become one
    * LEFT SEMI and one LEFT ANTI join against the same (order,
    * supplier) frames — Catalyst's own decorrelation target — so the
    * plan is three hash joins sharing the l_orderkey shuffle, never a
    * per-row subquery. The nation dim is the only static broadcast
    * (constant-size); the SF-scaled supplier side is AQE-decided, and
    * the nation filter SEMI-prunes candidates before the count. */
  def q21WaitingSupplier(spark: SparkSession, dir: String,
      nationName: String = "NATION_9", lateDays: Int = 60): DataFrame = {
    val t = Tables(spark, dir)
    val ordF = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ordF, col("l_orderkey") === col("o_orderkey"))
    val lLate = l
      .filter(col("l_shipdate") > expr(s"o_orderdate + INTERVAL $lateDays DAY"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val oth = l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val othLate = lLate.select(col("ok").as("ok2"), col("sk").as("sk2"))
    val natSupp = t.supplier
      .join(broadcast(t.nation.filter(col("n_name") === nationName)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    lLate
      .join(oth, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
        "left_semi")
      .join(othLate, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
        "left_anti")
      .join(natSupp.select(col("s_suppkey").as("sk")), Seq("sk"), "left_semi")
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("numwait"))
      .join(natSupp, col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Set operations beyond union: INTERSECT / EXCEPT over key sets
    * (customers with vs without orders by key arithmetic). Spark plans
    * both as aggregates/semi-anti joins — no materialized temp sets. */
  def uIntersectExcept(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val custKeys = t.customer.select(col("c_custkey").as("k"))
    val orderCust = t.orders.select(col("o_custkey").as("k"))
    val both = custKeys.intersect(orderCust)
    val onlyCust = custKeys.except(orderCust)
    both.agg(count(lit(1)).as("n_intersect"))
      .crossJoin(onlyCust.agg(count(lit(1)).as("n_except")))
  }

  /** Unpivot (wide → long): per-order metric rows from the lineitem
    * aggregate — the native `unpivot` API, one Expand pass. */
  def aUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"),
        sum(round(col("l_discount") * 100).cast("long")).as("disc_cents"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("qty"), col("price_cents"), col("disc_cents")),
        "metric", "value")
      .filter(col("l_orderkey") <= 100)
      .orderBy(col("l_orderkey"), col("metric"))
  }

  /** TPC-H Q7 shape (volume shipping): revenue flowing between two
    * nations, by supplier nation × customer nation × ship year.
    *
    * Plan: the two tiny nation legs broadcast into supplier and
    * customer; lineitem's shipdate filter pushes to the scan; the only
    * data-sized shuffles are the two fact equi-joins
    * (lineitem⋈orders on orderkey, then ⋈customer on custkey). The
    * (n1, n2) pair filter lands after both joins as a residual
    * condition on broadcast-provided columns — no extra pass. Revenue
    * in exact 1e-4 integer units, year via extract — both
    * engine-portable. */
  def q7VolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val t = Tables(spark, dir)
    val nations = t.nation.filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val supp = t.supplier.join(broadcast(nations),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t.customer.join(broadcast(nations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev4"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev4")).as("revenue_e4"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape (national market share): of all 'PROMO'-part
    * revenue delivered to customers in one region per order year, the
    * share supplied by one nation — conditional aggregation over a
    * six-table join.
    *
    * Plan: part (filtered), both nation legs, and region broadcast;
    * lineitem⋈part prunes the fact FIRST (the selective join), then
    * orders/customer equi-joins shuffle what's left. The share is
    * reported in exact basis points via integer division
    * ((num·10⁴) div den — safe: revenue_e4 ≤ ~1e15 at any bench SF)
    * rather than a cross-engine float ratio. */
  def q8MarketShare(spark: SparkSession, dir: String,
      nation: String = "NATION_1", region: String = "ASIA",
      pType: String = "PROMO"): DataFrame = {
    val t = Tables(spark, dir)
    val parts = t.part.filter(col("p_type") === pType)
      .select(col("p_partkey"))
    val regionNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = t.customer.join(broadcast(regionNations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = t.supplier
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    t.lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev4"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === nation, col("rev4"))
          .otherwise(lit(0L))).as("nation_e4"),
        sum(col("rev4")).as("total_e4"))
      .withColumn("share_bp",
        expr("(nation_e4 * 10000) div total_e4"))
      .orderBy(col("o_year"))
  }

  /** P5 confidence-threshold filter analog + A3 guard: value > 0.1,
    * counts and sums per type (filter pushed to parquet scan). */
  def pFilterThreshold(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .filter(col("value") > 0.1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Q13-shape customer order-count distribution — the one classic
    * relational shape no other declared query exercises: an OUTER join
    * whose predicate lives in the ON clause (moving it to WHERE would
    * silently turn the join inner and drop the zero-order customers,
    * which are the POINT of Q13), then a second aggregation over the
    * first's results (count-of-counts).
    *
    * Plan shape: one customer⟕orders shuffle on custkey, then the
    * count-of-counts aggregates a CUSTOMER-sized frame down to the
    * distinct order-count alphabet (≤ hundreds at any SF) — the second
    * shuffle is aggregate-sized. The priority filter pushes to the
    * orders scan because it is a single-table predicate even inside
    * the ON clause. */
  def q13CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ord = t.orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderpriority"))
    val perCust = t.customer
      .join(ord,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Runtime-filter (Bloom-style) join pruning — the semi-join
    * reduction a 100 TB fact⋈dim join lives on when the filtered
    * dimension is too large to broadcast AS ROWS but its key
    * MEMBERSHIP fits in constant space: hash every dim key into one of
    * 4096 buckets, broadcast the occupied-bucket set (≤4096 rows — a
    * few KB regardless of dim cardinality, bounded by CONSTRUCTION,
    * hence the static hint is policy-legal), and LEFT SEMI the fact on
    * its own key's bucket BEFORE the real join. False positives pass
    * the filter and die in the exact join — the filter can never
    * change the answer, only cut the fact rows entering the join
    * shuffle (here to ~nations-covered/4096 of buckets; at 100 TB this
    * is the difference between shuffling the whole fact table and
    * shuffling the matching fraction). Spark's own
    * `runtime.bloomFilter` optimization makes the same move with a
    * real Bloom bitmap; this is the declarative, oracle-checkable
    * form. */
  def jBloomPrune(spark: SparkSession, dir: String,
      nationName: String = "NATION_3", nBuckets: Int = 4096): DataFrame = {
    val t = Tables(spark, dir)
    val dim = t.supplier
      .join(broadcast(t.nation.filter(col("n_name") === nationName)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val occupied = dim
      .select(pmod(xxhash64(col("s_suppkey")), lit(nBuckets)).as("bkt"))
      .distinct()
    val factPruned = t.lineitem
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(occupied),
        pmod(xxhash64(col("l_suppkey")), lit(nBuckets)) === col("bkt"),
        "left_semi")
    factPruned
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
          .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("s_suppkey"))
      .limit(20)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg _,
    "j_left_coalesce" -> Relational.jLeftCoalesce _,
    "j_broadcast_dims" -> Relational.jBroadcastDims _,
    "j_semi_anti" -> Relational.jSemiAnti _,
    "a_topk_revenue" -> Relational.aTopkRevenue _,
    "a1_regroup" -> Relational.a1Regroup _,
    "a_distinct" -> Relational.aDistinct _,
    "p_filter_threshold" -> Relational.pFilterThreshold _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "j_left_coalesce" ->
      """SELECT c_custkey, c_name,
         coalesce(n_orders, 0) AS n_orders,
         coalesce(total_spent, 0.0) AS total_spent
         FROM customer LEFT JOIN (
           SELECT o_custkey, count(*) AS n_orders,
                  round(sum(o_totalprice), 2) AS total_spent
           FROM orders GROUP BY 1) o ON c_custkey = o_custkey
         ORDER BY c_custkey""",
    "j_broadcast_dims" ->
      """SELECT r_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "j_semi_anti" ->
      """WITH ck AS (SELECT DISTINCT o_custkey FROM orders),
         w AS (SELECT c_mktsegment, count(*) AS with_orders FROM customer
               WHERE c_custkey IN (SELECT o_custkey FROM ck) GROUP BY 1),
         wo AS (SELECT c_mktsegment, count(*) AS without_orders FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM ck) GROUP BY 1)
         SELECT c_mktsegment,
                coalesce(with_orders, 0) AS with_orders,
                coalesce(without_orders, 0) AS without_orders
         FROM w FULL OUTER JOIN wo USING (c_mktsegment)
         ORDER BY c_mktsegment""",
    "a_topk_revenue" ->
      """SELECT l_orderkey,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem GROUP BY 1
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "a1_regroup" ->
      """SELECT l_orderkey,
         string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS linenumbers,
         count(*) AS n_lines
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "a_distinct" ->
      """SELECT event_type, count(*) AS n_users FROM (
           SELECT DISTINCT event_type, user_id FROM events)
         GROUP BY 1 ORDER BY 1""",
    "p_filter_threshold" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events WHERE value > 0.1
         GROUP BY 1 ORDER BY 1""",
  )
}

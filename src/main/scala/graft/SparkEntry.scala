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
    "a5_entity_rollup" -> Windows.a5EntityRollup _,
    "d1_mode" -> Windows.d1Mode _,
    "d2_change_count" -> Windows.d2ChangeCount _,
    "d3_time_per_state" -> Windows.d3TimePerState _,
    "d4_trajectory" -> Windows.d4Trajectory _,
    "d5_stddev" -> Windows.d5Stddev _,
    "d6d7_first_match_duration" -> Windows.d6d7FirstMatchDuration _,
    "d8_bool_agg" -> Windows.d8BoolAgg _,
    "d9_sessionize" -> Windows.d9Sessionize _,
    "f_timestamp_parse" -> Scalars.fTimestampParse _,
    "f_json_extract" -> Scalars.fJsonExtract _,
    "f_synth_id" -> Scalars.fSynthId _,
    "f_token_expand" -> Scalars.fTokenExpand _,
    "f_vec_expand" -> Scalars.fVecExpand _,
    "g_explode_tokens" -> Scalars.gExplodeTokens _,
    "p_clean_defaults" -> Scalars.pCleanDefaults _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """WITH g AS (SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price,
           sum(CAST(l_quantity AS BIGINT)) AS sq,
           count(*) AS n_rows
           FROM lineitem GROUP BY 1, 2)
         SELECT l_returnflag, l_linestatus, sum_qty, sum_price,
                ((20000 * sq + n_rows) // (2 * n_rows)) / 10000.0 AS avg_qty,
                n_rows
         FROM g ORDER BY 1, 2""",
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
         ((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100) / 100.0
           AS revenue,
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
      """WITH g AS (SELECT l_orderkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
           FROM lineitem GROUP BY 1)
         SELECT l_orderkey, ((rev4 + 50) // 100) / 100.0 AS revenue
         FROM g ORDER BY rev4 DESC, l_orderkey LIMIT 10""",
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
    "a5_entity_rollup" ->
      """WITH s AS (
           SELECT user_id, value, epoch_us(ts) AS us,
                  first_value(event_type) OVER w AS first_type,
                  last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, CAST(min(us) AS BIGINT) AS first_us,
                CAST(max(us) AS BIGINT) AS last_us, count(*) AS n_events,
                ((200 * sum(CAST(round(value * 100) AS BIGINT)) + count(*))
                  // (2 * count(*))) / 10000.0 AS value_avg,
                round(max(value), 2) AS value_max,
                round(min(value), 2) AS value_min,
                min(first_type) AS initial_type, min(last_type) AS final_type
         FROM s GROUP BY 1 ORDER BY 1""",
    "d1_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
                    FROM events GROUP BY 1, 2),
         r AS (SELECT user_id, event_type, cnt,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY cnt DESC, event_type) AS rn FROM c)
         SELECT user_id, event_type AS mode_event, cnt AS mode_count
         FROM r WHERE rn = 1 ORDER BY user_id""",
    "d2_change_count" ->
      """WITH s AS (SELECT user_id, event_type,
                    lag(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_type FROM events)
         SELECT user_id,
                CAST(sum(CASE WHEN prev_type IS NOT NULL AND prev_type <> event_type
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                count(*) AS n_events
         FROM s GROUP BY 1 ORDER BY 1""",
    "d3_time_per_state" ->
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                    lead(epoch_us(ts)) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS next_us FROM events)
         SELECT user_id, event_type,
                CAST(sum(next_us - us) AS BIGINT) AS held_micros,
                count(*) AS n_intervals
         FROM s WHERE next_us IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""",
    "d4_trajectory" ->
      """WITH s AS (SELECT user_id, value, epoch_us(ts) AS us,
                    lag(value) OVER w AS prev_value,
                    lag(epoch_us(ts)) OVER w AS prev_us
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id,
                round(sum(sqrt((value - prev_value) * (value - prev_value) +
                  ((us - prev_us) / 1000000.0) * ((us - prev_us) / 1000000.0))), 2)
                  AS total_distance,
                count(*) AS n_steps
         FROM s WHERE prev_us IS NOT NULL GROUP BY 1 ORDER BY 1""",
    "d5_stddev" ->
      """WITH c AS (SELECT user_id, event_type,
                    CAST(round(value * 100) AS BIGINT) AS c FROM events),
         g AS (SELECT user_id, event_type, count(*) AS n,
                      sum(c) AS sc, sum(c * c) AS sc2 FROM c GROUP BY 1, 2)
         SELECT user_id, event_type,
                CASE WHEN n > 1 THEN round(sqrt(greatest(
                  (CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n)
                    / (n - 1), 0.0)) / 100.0, 4) ELSE 0.0 END AS value_stddev,
                ((200 * sc + n) // (2 * n)) / 10000.0 AS value_avg,
                n
         FROM g ORDER BY 1, 2""",
    "d6d7_first_match_duration" ->
      """SELECT user_id,
                CAST(min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) AS BIGINT)
                  AS first_error_us,
                CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS span_micros,
                count(*) AS n_events
         FROM events GROUP BY 1 ORDER BY 1""",
    "d8_bool_agg" ->
      """SELECT user_id,
                max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS had_error,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
                min(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS all_purchase
         FROM events GROUP BY 1 ORDER BY 1""",
    "d9_sessionize" ->
      """WITH e AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
                    lag(epoch_us(ts)) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_us FROM events),
         f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                              THEN 1 ELSE 0 END AS new_sess FROM e),
         g AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM f),
         s AS (SELECT user_id, sess_id, max(us) - min(us) AS sess_micros,
                      count(*) AS sess_events FROM g GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_sessions,
                CAST(sum(sess_micros) AS BIGINT) AS total_sess_micros,
                max(sess_events) AS max_sess_events
         FROM s GROUP BY 1 ORDER BY 1""",
    "f_timestamp_parse" ->
      """SELECT event_type,
                CAST(sum(epoch_us(strptime(regexp_replace(
                  strftime(ts, '%Y-%m-%d %H:%M:%S') || ' UTC', ' UTC$', ''),
                  '%Y-%m-%d %H:%M:%S')) // 1000000) AS BIGINT) AS sum_parsed_s,
                count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "f_json_extract" ->
      """SELECT user_id,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
                count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "f_synth_id" ->
      """SELECT event_type || '_' || CAST(CAST(floor(value / 10.0) AS BIGINT) AS VARCHAR)
                  AS synth_id,
                count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "f_token_expand" ->
      """SELECT doc_id, string_split(text, ' ')[1] AS t1,
                string_split(text, ' ')[2] AS t2,
                string_split(text, ' ')[3] AS t3,
                len(string_split(text, ' ')) AS n_tokens
         FROM documents ORDER BY doc_id""",
    "f_vec_expand" ->
      """SELECT vec_id,
                round(CAST(embedding[1] AS DOUBLE), 4) AS x1,
                round(CAST(embedding[2] AS DOUBLE), 4) AS y1,
                round(CAST(embedding[3] AS DOUBLE), 4) AS x2,
                round(CAST(embedding[4] AS DOUBLE), 4) AS y2,
                len(embedding) AS dim
         FROM embeddings ORDER BY vec_id""",
    "g_explode_tokens" ->
      """SELECT lang, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY 1 ORDER BY 1""",
    "p_clean_defaults" ->
      """SELECT coalesce(lang, 'unknown') AS lang_filled,
                coalesce(source, 'unknown') AS source_filled,
                count(*) AS n_docs,
                CAST(sum(length(trim(text))) AS BIGINT) AS total_chars
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}

package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, max}
import graft.operators._
import graft.registry.RegShared._

/** Relational/TPC-H-ish slice of the driver contract: scans, joins, aggregates, windows, set ops, sketches, skew, time-series, and graph queries with their DuckDB oracles.
  *
  * Split out of SparkEntry (r11): entries and oracle SQL move verbatim;
  * SparkEntry concatenates the family maps. Column names stay identical
  * between `queries` and `oracleSql` (the driver sorts columns by name
  * before hashing).
  */
object RelationalReg {

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg _,
    "q3_shipping" -> Relational.q3Shipping _,
    "q5_local_supplier" -> Relational.q5LocalSupplier _,
    "q7_volume_shipping" -> ((s: SparkSession, dir: String) =>
      Relational.q7VolumeShipping(s, dir)),
    "q8_market_share" -> ((s: SparkSession, dir: String) =>
      Relational.q8MarketShare(s, dir)),
    "q10_returned_items" -> Relational.q10ReturnedItems _,
    "q21_waiting_supplier" -> ((s: SparkSession, dir: String) =>
      Relational.q21WaitingSupplier(s, dir)),
    "q18_volume_customer" -> ((s: SparkSession, dir: String) =>
      Relational.q18VolumeCustomer(s, dir)),
    "q_subqueries" -> Relational.qSubqueries _,
    "q13_cust_distribution" -> Relational.q13CustDistribution _,
    "j_bloom_prune" -> ((s: SparkSession, dir: String) =>
      Relational.jBloomPrune(s, dir)),
    "q1_pricing_full" -> Relational.q1Full _,
    "j_left_coalesce" -> Relational.jLeftCoalesce _,
    "j_broadcast_dims" -> Relational.jBroadcastDims _,
    "j_semi_anti" -> Relational.jSemiAnti _,
    "a_topk_revenue" -> Relational.aTopkRevenue _,
    "a1_regroup" -> Relational.a1Regroup _,
    "a_distinct" -> Relational.aDistinct _,
    "u_intersect_except" -> Relational.uIntersectExcept _,
    "a_unpivot" -> Relational.aUnpivot _,
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
    "a2_global_wrap" -> Coverage.a2GlobalWrap _,
    "f_map_explode" -> Coverage.fMapExplode _,
    "a12_date_histogram" -> Coverage.a12DateHistogram _,
    "a_funnel" -> Coverage.aFunnel _,
    "a_retention" -> Coverage.aRetention _,
    "a12_date_histogram_dense" -> Coverage.a12DateHistogramDense _,
    "a12_topn_per_user" -> Coverage.a12TopnPerUser _,
    "d_running_sum" -> Coverage.dRunningSum _,
    "u_union_keys" -> Coverage.uUnionKeys _,
    "a12_time_window" -> Coverage.a12TimeWindow _,
    "skew_salted_agg" -> Skew.skewSaltedAgg _,
    "skew_salted_join" -> ((s: SparkSession, dir: String) =>
      Skew.skewSaltedJoin(s, dir)),
    "a_rollup" -> Analytics.aRollup _,
    "a_cube" -> Analytics.aCube _,
    "a_grouping_sets" -> Analytics.aGroupingSets _,
    "a_pivot" -> Analytics.aPivot _,
    "a_quantiles" -> Analytics.aQuantiles _,
    "w_rank_suite" -> Analytics.wRankSuite _,
    "w_range_frame" -> Analytics.wRangeFrame _,
    "a_corr_cov" -> Analytics.aCorrCov _,
    "a_hll_distinct" -> ApproxDistinct.aHllDistinct _,
    "a_cms_freq" -> FreqSketch.aCmsFreq _,
    "ts_gapfill_interp" -> ((s: SparkSession, dir: String) =>
      TimeSeries.gapFillInterpolate(s, dir)),
    "j_asof" -> Temporal.jAsof _,
    "j_range" -> Temporal.jRange _,
    "f_date_suite" -> FunctionSuites.fDateSuite _,
    "f_string_suite" -> FunctionSuites.fStringSuite _,
    "f_cond_bitwise" -> FunctionSuites.fCondBitwise _,
    "f_array_suite" -> FunctionSuites.fArraySuite _,
    "f_map_suite" -> FunctionSuites.fMapSuite _,
    "graph_pagerank" -> Cluster.graphPagerank _,
    "graph_triangles" -> Cluster.graphTriangles _,
  )

  private[graft] val oracleSql: Map[String, String] = Map(
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
    "q3_shipping" ->
      """WITH g AS (SELECT l_orderkey,
             CAST(epoch_us(o_orderdate) AS BIGINT) AS odate_us,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1996-01-01'
           GROUP BY 1, 2)
         SELECT l_orderkey, odate_us, ((rev4 + 50) // 100) / 100.0 AS revenue
         FROM g ORDER BY rev4 DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS revenue_e4
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY revenue_e4 DESC, n_name""",
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS revenue_e4
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name IN ('NATION_1', 'NATION_2')
           AND n2.n_name IN ('NATION_1', 'NATION_2')
           AND n1.n_name <> n2.n_name
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q8_market_share" ->
      """WITH rev AS (
           SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                  n1.n_name AS supp_nation,
                  CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           JOIN region ON n2.n_regionkey = r_regionkey
           WHERE p_type = 'PROMO' AND r_name = 'ASIA')
         SELECT o_year,
                CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                              THEN rev4 ELSE 0 END) AS BIGINT) AS nation_e4,
                CAST(sum(rev4) AS BIGINT) AS total_e4,
                CAST((sum(CASE WHEN supp_nation = 'NATION_1'
                               THEN rev4 ELSE 0 END) * 10000)
                     // sum(rev4) AS BIGINT) AS share_bp
         FROM rev GROUP BY 1 ORDER BY 1""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS revenue_e4,
                CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
         FROM customer
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON n_nationkey = c_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY 1, 2, 3, round(c_acctbal * 100)
         ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""",
    // Q13 shape: the priority predicate must sit in the ON clause so
    // zero-order customers survive the outer join (c_count = 0 rows
    // are the point of the query)
    "q13_cust_distribution" ->
      """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY 1)
         SELECT CAST(c_count AS BIGINT) AS c_count,
                CAST(count(*) AS BIGINT) AS custdist
         FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
    // the Bloom-style bucket filter is semantics-preserving by
    // construction (false positives die in the exact join), so the
    // oracle is the PLAIN join — any bucket-filter bug that drops a
    // true match diverges from this
    "j_bloom_prune" ->
      """SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS revenue_e4
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_3'
         GROUP BY 1, 2 ORDER BY revenue_e4 DESC, s_suppkey LIMIT 20""",
    // Q21 shape: "late" adapted to l_shipdate > o_orderdate + 60 days
    // (trimmed schema has no receipt/commit dates); EXISTS another
    // supplier in the order, NOT EXISTS another LATE supplier
    "q21_waiting_supplier" ->
      """WITH ordF AS (SELECT o_orderkey, o_orderdate FROM orders
              WHERE o_orderstatus = 'F'),
         l AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
               FROM lineitem JOIN ordF ON l_orderkey = o_orderkey),
         late AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                  FROM l WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
         alls AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                  FROM l),
         cand AS (SELECT c.ok, c.sk FROM late c
                  WHERE EXISTS (SELECT 1 FROM alls a
                                WHERE a.ok = c.ok AND a.sk != c.sk)
                    AND NOT EXISTS (SELECT 1 FROM late x
                                    WHERE x.ok = c.ok AND x.sk != c.sk)),
         ns AS (SELECT s_suppkey, s_name FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_9')
         SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM cand JOIN ns ON cand.sk = ns.s_suppkey
         GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""",
    "q18_volume_customer" ->
      """WITH big AS (SELECT l_orderkey,
             CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
           FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
         SELECT c_name, o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                sum_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY price_cents DESC, o_orderkey LIMIT 20""",
    "q1_pricing_full" ->
      """WITH c AS (SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_discount * 100) AS BIGINT) AS dc,
             CAST(round(l_tax * 100) AS BIGINT) AS tc
           FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'),
         g AS (SELECT l_returnflag, l_linestatus,
             sum(q) AS sum_qty,
             sum(pc * (100 - dc)) AS disc4,
             sum(pc * (100 - dc) * (100 + tc)) AS charge6,
             sum(pc) AS spc, sum(dc) AS sdc, count(*) AS n_rows
           FROM c GROUP BY 1, 2)
         SELECT l_returnflag, l_linestatus,
                CAST(sum_qty AS BIGINT) AS sum_qty,
                CAST(spc AS DOUBLE) / 100.0 AS sum_base_price,
                ((disc4 + 50) // 100) / 100.0 AS sum_disc_price,
                ((charge6 + 5000) // 10000) / 100.0 AS sum_charge,
                ((20000 * sum_qty + n_rows) // (2 * n_rows)) / 10000.0 AS avg_qty,
                ((200 * spc + n_rows) // (2 * n_rows)) / 10000.0 AS avg_price,
                ((200 * sdc + n_rows) // (2 * n_rows)) / 10000.0 AS avg_disc,
                n_rows
         FROM g ORDER BY 1, 2""",
    "q_subqueries" ->
      """SELECT n_name,
                (SELECT count(1) FROM supplier
                 WHERE s_nationkey = n_nationkey) AS n_suppliers,
                EXISTS (SELECT 1 FROM customer
                        WHERE c_nationkey = n_nationkey
                          AND c_acctbal > 9000.0) AS has_rich_customer
         FROM nation ORDER BY n_name""",
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
    "a2_global_wrap" ->
      """SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users,
                CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
                CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
         FROM events""",
    "f_map_explode" ->
      """SELECT k AS key, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS BIGINT)
                  AS sum_value
         FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
         GROUP BY 1 ORDER BY 1""",
    "a12_date_histogram" ->
      """SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
                event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // ES min_doc_count:0 — every bucket in bounds, zero-filled
    "a12_date_histogram_dense" ->
      """WITH c AS (SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT)
                  AS hour_us, event_type, count(*) AS n
               FROM events GROUP BY 1, 2),
         b AS (SELECT min(hour_us) AS lo, max(hour_us) AS hi FROM c),
         h AS (SELECT unnest(generate_series(lo, hi, 3600000000))
                 AS hour_us FROM b),
         t AS (SELECT DISTINCT event_type FROM c)
         SELECT h.hour_us, t.event_type,
                CAST(COALESCE(c.n, 0) AS BIGINT) AS n
         FROM h CROSS JOIN t
         LEFT JOIN c ON c.hour_us = h.hour_us AND c.event_type = t.event_type
         ORDER BY 1, 2""",
    "a12_topn_per_user" ->
      """WITH r AS (SELECT user_id, event_id, value,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY value DESC, event_id) AS rn FROM events)
         SELECT user_id, rn, event_id, value FROM r WHERE rn <= 2
         ORDER BY user_id, rn""",
    "d_running_sum" ->
      """WITH c AS (SELECT user_id, ts, event_id,
                    CAST(round(value * 100) AS BIGINT) AS c FROM events),
         r AS (SELECT user_id,
                      sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS running_cents,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS rn FROM c)
         SELECT user_id, CAST(running_cents AS BIGINT) AS running_cents
         FROM r WHERE rn = 10 ORDER BY user_id""",
    "u_union_keys" ->
      """SELECT count(*) AS n_total, count(DISTINCT k) AS n_distinct
         FROM (SELECT c_custkey AS k FROM customer
               UNION ALL SELECT s_suppkey AS k FROM supplier)""",
    "u_intersect_except" ->
      """SELECT (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer
                 INTERSECT SELECT o_custkey FROM orders)) AS n_intersect,
                (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer
                 EXCEPT SELECT o_custkey FROM orders)) AS n_except""",
    "a_unpivot" ->
      """WITH g AS (SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS disc_cents
           FROM lineitem GROUP BY 1)
         SELECT l_orderkey, metric, value FROM (
           SELECT l_orderkey, 'qty' AS metric, qty AS value FROM g
           UNION ALL
           SELECT l_orderkey, 'price_cents', price_cents FROM g
           UNION ALL
           SELECT l_orderkey, 'disc_cents', disc_cents FROM g)
         WHERE l_orderkey <= 100
         ORDER BY l_orderkey, metric""",
    "a12_time_window" ->
      """SELECT CAST(epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start_us,
                event_type, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "skew_salted_agg" ->
      """SELECT event_type,
                count(DISTINCT user_id) AS n_distinct,
                count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    // salting is a layout choice, never a semantic: the salted join's
    // aggregate equals the plain join's
    "skew_salted_join" ->
      """SELECT c_mktsegment AS seg, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "a_rollup" ->
      """SELECT coalesce(l_returnflag, '_all') AS returnflag,
                coalesce(l_linestatus, '_all') AS linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                  AS price_cents,
                count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "a_cube" ->
      """SELECT coalesce(event_type, '_all') AS event_type,
                coalesce(user_id % 10, -1) AS cohort,
                count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY CUBE (event_type, user_id % 10)
         ORDER BY event_type, cohort""",
    "a_grouping_sets" ->
      """SELECT coalesce(event_type, '_all') AS event_type,
                coalesce(user_id % 10, -1) AS cohort,
                count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
         ORDER BY event_type, cohort""",
    "a_pivot" ->
      """SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "a_quantiles" ->
      """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                    event_id FROM events),
         r AS (SELECT event_type, c,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY c, event_id) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n FROM c)
         SELECT event_type, max(n) AS n,
                max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS p50_cents,
                max(CASE WHEN rn = (9 * n + 9) // 10 THEN c END) AS p90_cents
         FROM r GROUP BY 1 ORDER BY 1""",
    "w_rank_suite" ->
      """WITH c AS (SELECT user_id, event_id,
                    CAST(round(value * 100) AS BIGINT) AS c FROM events),
         r AS (SELECT user_id, event_id, c,
                      row_number() OVER w AS rn,
                      dense_rank() OVER (PARTITION BY user_id ORDER BY c DESC) AS drank,
                      ntile(4) OVER w AS quartile,
                      percent_rank() OVER w AS pr,
                      cume_dist() OVER w AS cd,
                      nth_value(c, 3) OVER w AS third_cents
               FROM c WINDOW w AS (PARTITION BY user_id ORDER BY c DESC, event_id))
         SELECT user_id, event_id, c, rn, drank, quartile, pr, cd, third_cents
         FROM r WHERE rn <= 5 ORDER BY user_id, rn""",
    "w_range_frame" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                    CAST(round(value * 100) AS BIGINT) AS c FROM events),
         r AS (SELECT user_id, event_id, us,
                      count(*) OVER w AS n_trailing_1h,
                      CAST(sum(c) OVER w AS BIGINT) AS cents_trailing_1h,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY us, event_id) AS rn
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
         SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id,
                n_trailing_1h, cents_trailing_1h
         FROM r WHERE rn <= 5 ORDER BY user_id, rn""",
    "a_corr_cov" ->
      """WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
                    FROM lineitem),
         g AS (SELECT l_returnflag, count(*) AS n,
                      sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                      sum(x * x) AS sx2, sum(y * y) AS sy2
               FROM c GROUP BY 1),
         d AS (SELECT l_returnflag, n,
                      CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
                      CAST(sxy AS DOUBLE) AS sxy,
                      n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
                      n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy
               FROM g)
         SELECT l_returnflag, n,
                (sxy - sx * sy / n) / n AS covar_pop,
                CASE WHEN dx = 0 OR dy = 0 THEN NULL
                     ELSE (n * sxy - sx * sy) / (sqrt(dx) * sqrt(dy)) END AS corr
         FROM d ORDER BY l_returnflag""",
    "a_cms_freq" -> {
      val md5e = "md5(CAST(user_id AS VARCHAR) || '#cms')"
      def cellSql(r: Int) =
        s"""(strpos('0123456789abcdef', substr($md5e, ${8 * r + 1}, 1)) - 1) * 16
           | + strpos('0123456789abcdef', substr($md5e, ${8 * r + 2}, 1)) - 1"""
          .stripMargin
      val rows = (0 until 4).map(r =>
        s"SELECT user_id, $r AS r, ${cellSql(r)} AS cell FROM events")
        .mkString("\n         UNION ALL ")
      s"""WITH g AS ($rows),
         sk AS (SELECT r, cell, count(*) AS c FROM g GROUP BY 1, 2),
         k AS (SELECT DISTINCT user_id, r, cell FROM g),
         est AS (SELECT k.user_id, CAST(min(sk.c) AS BIGINT) AS est_count
                 FROM k JOIN sk ON k.r = sk.r AND k.cell = sk.cell
                 GROUP BY k.user_id),
         ex AS (SELECT user_id, count(*) AS exact_count FROM events GROUP BY 1)
         SELECT est.user_id, est_count, CAST(exact_count AS BIGINT) AS exact_count
         FROM est JOIN ex ON est.user_id = ex.user_id
         ORDER BY exact_count DESC, est.user_id LIMIT 20"""
    },
    "ts_gapfill_interp" ->
      """WITH p AS (SELECT user_id,
                    CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS h_us,
                    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
               FROM events WHERE user_id < 25 GROUP BY 1, 2),
         b AS (SELECT user_id, min(h_us) AS lo, max(h_us) AS hi
               FROM p GROUP BY 1),
         sp AS (SELECT user_id, lo,
                       unnest(generate_series(lo, hi, 3600000000)) AS h_us
                FROM b),
         s2 AS (SELECT user_id, h_us,
                       (h_us - lo) // 3600000000 AS idx FROM sp),
         j AS (SELECT s2.user_id, s2.h_us, s2.idx, p.v
               FROM s2 LEFT JOIN p
                 ON s2.user_id = p.user_id AND s2.h_us = p.h_us),
         w AS (SELECT user_id, h_us, idx, v,
                      last_value(v IGNORE NULLS) OVER pw AS pv,
                      last_value(CASE WHEN v IS NOT NULL THEN idx END
                                 IGNORE NULLS) OVER pw AS pi,
                      first_value(v IGNORE NULLS) OVER nw AS nv,
                      first_value(CASE WHEN v IS NOT NULL THEN idx END
                                  IGNORE NULLS) OVER nw AS ni
               FROM j
               WINDOW pw AS (PARTITION BY user_id ORDER BY idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                      nw AS (PARTITION BY user_id ORDER BY idx
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, h_us,
                CAST(CASE WHEN v IS NOT NULL THEN v
                     ELSE pv + CAST(floor(CAST((nv - pv) * (idx - pi) AS DOUBLE)
                                          / CAST(ni - pi AS DOUBLE)) AS BIGINT)
                     END AS BIGINT) AS cents,
                CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
         FROM w ORDER BY user_id, h_us""",
    "a_hll_distinct" ->
      """WITH h AS (SELECT event_type,
                    md5(CAST(user_id AS VARCHAR) || '#hll') AS d FROM events),
         b AS (SELECT event_type,
                      (strpos('0123456789abcdef', substr(d,1,1))-1)*16
                      + strpos('0123456789abcdef', substr(d,2,1))-1 AS reg,
                      substr(d,3,30) AS tail,
                      30 - length(ltrim(substr(d,3,30), '0')) AS z
               FROM h),
         c AS (SELECT event_type, reg, z,
                      CASE WHEN z >= 30 THEN 0
                           ELSE strpos('0123456789abcdef', substr(tail, z+1, 1))-1
                      END AS nz
               FROM b),
         r AS (SELECT event_type, reg,
                      CASE WHEN z >= 30 THEN 121
                           ELSE 4*z + (CASE WHEN nz >= 8 THEN 0 WHEN nz >= 4 THEN 1
                                            WHEN nz >= 2 THEN 2 ELSE 3 END) + 1
                      END AS rho
               FROM c),
         s AS (SELECT event_type, reg, max(rho) AS mrho FROM r GROUP BY 1, 2),
         e AS (SELECT event_type,
                      CAST(sum(CASE WHEN mrho <= 40
                                    THEN (CAST(1 AS BIGINT) << (40 - mrho))
                                    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS s_hit,
                      count(*) AS nreg
               FROM s GROUP BY 1),
         f AS (SELECT event_type, 256 - nreg AS v_zero,
                      s_hit + (256 - nreg) * (CAST(1 AS BIGINT) << 40) AS s40
               FROM e),
         g AS (SELECT event_type, v_zero, s40,
                      (7182 * ((CAST(1 AS BIGINT) << 56) // greatest(s40, 256)))
                        // 10000 AS est_raw
               FROM f),
         x AS (SELECT event_type,
                      CAST(CASE WHEN s40 < 256
                                THEN (7182 * (CAST(1 AS BIGINT) << 48)) // 10000
                                WHEN est_raw <= 640 AND v_zero > 0
                                THEN CAST(floor(256.0 * ln(256.0 / v_zero) + 0.5) AS BIGINT)
                                ELSE est_raw END AS BIGINT) AS est_distinct,
                      CAST(v_zero AS BIGINT) AS empty_regs
               FROM g)
         SELECT x.event_type, est_distinct, empty_regs,
                CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
         FROM x JOIN (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
                      FROM events GROUP BY 1) ex ON x.event_type = ex.event_type
         ORDER BY x.event_type""",
    "j_asof" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
                    FROM events),
         p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, us AS c_us FROM e WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, p.us AS purchase_us,
                c.c_us AS click_us, p.us - c.c_us AS gap_us
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.us >= c.c_us
         ORDER BY p.event_id""",
    "j_range" ->
      """WITH bands AS (SELECT i AS band_id, i * 4000 AS lo_c, i * 4000 + 8000 AS hi_c
                        FROM (SELECT unnest(range(0, 12)) AS i)),
         e AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events)
         SELECT band_id, CAST(lo_c AS BIGINT) AS lo_c, CAST(hi_c AS BIGINT) AS hi_c,
                count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_cents
         FROM e JOIN bands ON c >= lo_c AND c < hi_c
         GROUP BY 1, 2, 3 ORDER BY 1""",
    "f_date_suite" ->
      """WITH o AS (SELECT o_orderdate, date_trunc('month', o_orderdate) AS m
                    FROM orders)
         SELECT CAST(epoch_us(m) AS BIGINT) AS month_us,
                count(*) AS n_orders,
                CAST(sum(date_part('day', o_orderdate)) AS BIGINT) AS sum_dom,
                CAST(sum(date_part('dow', o_orderdate)) AS BIGINT) AS sum_dow,
                CAST(max(CAST(last_day(o_orderdate) AS DATE)
                  - DATE '1970-01-01') AS BIGINT) AS max_last_day,
                CAST(max(epoch_us(m + INTERVAL 2 MONTH)) AS BIGINT) AS plus2m_us,
                CAST(sum(date_diff('day', m, o_orderdate)) AS BIGINT)
                  AS sum_day_offset
         FROM o GROUP BY 1 ORDER BY 1""",
    "f_string_suite" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 16) AS h16, text, lang
                    FROM documents WHERE lang = 'en')
         SELECT doc_id,
                CAST(levenshtein(h16, reverse(h16)) AS BIGINT) AS lev,
                translate(lower(h16), 'aeiou', '01234') AS tr,
                CAST(length(repeat(substr(text, 1, 4), 3)) AS BIGINT) AS rep_len,
                lpad(lang, 5, '_') AS padded
         FROM d ORDER BY doc_id""",
    "f_cond_bitwise" ->
      """WITH b AS (SELECT event_type, event_id, user_id,
                    CAST(round(value * 100) AS BIGINT) AS c FROM events)
         SELECT event_type,
                count(CASE WHEN nullif(user_id % 10, 0) IS NULL THEN 1 END)
                  AS n_zero_mod,
                CAST(sum(least(c, 10000)) AS BIGINT) AS sum_capped,
                CAST(sum(greatest(c, user_id * 100)) AS BIGINT) AS sum_floored,
                CAST(sum(event_id & 255) AS BIGINT) AS sum_and,
                CAST(sum(event_id | 1) AS BIGINT) AS sum_or,
                CAST(sum(xor(event_id, user_id)) AS BIGINT) AS sum_xor,
                CAST(sum(user_id << 3) AS BIGINT) AS sum_shl
         FROM b GROUP BY 1 ORDER BY 1""",
    "f_array_suite" ->
      """WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
         a AS (SELECT event_type, n,
                 range(1, CAST(3 + n % 5 AS INTEGER) + 1) AS la,
                 range(CAST(2 + n % 3 AS INTEGER), 9) AS lb FROM g)
         SELECT event_type, n,
                array_to_string(la, ',') AS la_s,
                array_to_string(lb, ',') AS lb_s,
                array_to_string(list_sort(list_filter(la,
                  x -> list_contains(lb, x))), ',') AS inter_s,
                array_to_string(list_sort(list_filter(la,
                  x -> NOT list_contains(lb, x))), ',') AS except_s,
                array_to_string(list_sort(list_distinct(la || lb)), ',')
                  AS union_s,
                CAST(len(la) AS BIGINT) AS la_len,
                CAST(la[2] AS BIGINT) AS la_2,
                CAST(coalesce(list_position(lb, 5), 0) AS BIGINT) AS pos5,
                list_contains(lb, 4) AS has4,
                array_to_string(list_reverse(la), ',') AS rev_s,
                CAST(list_max(lb) AS BIGINT) AS mx,
                CAST(list_min(lb) AS BIGINT) AS mn,
                array_to_string(lb[2:4], ',') AS slice_s,
                array_to_string(la || lb, ',') AS flat_s,
                CAST(list_sum(la) AS BIGINT) AS sum_la
         FROM a ORDER BY event_type""",
    "f_map_suite" ->
      """WITH g AS (SELECT event_type, count(*) AS n,
                    count(DISTINCT user_id) AS u,
                    max(CAST(round(value * 100) AS BIGINT)) AS mx
                    FROM events GROUP BY 1),
         m AS (SELECT event_type, n, u, mx,
                 MAP {'n': n, 'u': u} AS m1, MAP {'x': mx} AS m2,
                 map_concat(MAP {'n': n, 'u': u}, MAP {'x': mx}) AS cm
               FROM g)
         SELECT event_type,
                array_to_string(list_sort(map_keys(m1)), ',') AS keys1,
                CAST(n AS BIGINT) AS m1_n,
                CAST(u AS BIGINT) AS m1_u,
                CAST(cardinality(m1) + cardinality(m2) AS BIGINT) AS card_sum,
                CAST(cardinality(cm) AS BIGINT) AS card_cm,
                CAST(mx AS BIGINT) AS cm_x,
                array_to_string(list_sort(list_filter(map_keys(cm),
                  k -> map_extract(cm, k)[1] >= 1000)), ',') AS big_keys
         FROM m ORDER BY event_type""",
    "graph_pagerank" -> {
      val iters = (1 to 5).map { k =>
        val prev = s"pr${k - 1}"
        s"""pr$k AS (
             SELECT v.id,
                    CAST(150000 + (850000 * coalesce(c.s, 0)) // 1000000 AS BIGINT) AS r
             FROM v LEFT JOIN (
               SELECT e.dst AS id, sum(p.r // d.deg) AS s
               FROM $prev p JOIN deg d ON p.id = d.id JOIN ed e ON e.src = p.id
               GROUP BY e.dst) c ON v.id = c.id)"""
      }.mkString(",\n")
      s"""WITH mh AS (SELECT a, b FROM (${DedupReg.minhashOracle})),
          ed AS (SELECT a AS src, b AS dst FROM mh
                 UNION SELECT b AS src, a AS dst FROM mh),
          v AS (SELECT DISTINCT src AS id FROM ed),
          deg AS (SELECT src AS id, count(*) AS deg FROM ed GROUP BY 1),
          pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM v),
          $iters
          SELECT id AS doc_id, r AS rank_e6 FROM pr5 ORDER BY doc_id"""
    },
    "graph_triangles" ->
      s"""WITH mh AS (SELECT a, b FROM (${DedupReg.minhashOracle}))
          SELECT count(*) AS n_triangles,
                 CAST(coalesce(sum(t.a + t.b + t.c), 0) AS BIGINT)
                   AS node_checksum
          FROM (SELECT e1.a, e1.b, e2.b AS c
                FROM mh e1
                JOIN mh e2 ON e2.a = e1.b
                JOIN mh e3 ON e3.a = e1.a AND e3.b = e2.b) t""",
    "a_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         s1 AS (SELECT user_id, min(us) AS t_view FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(us) AS t_click FROM e
                JOIN s1 USING (user_id)
                WHERE event_type = 'click' AND us > t_view GROUP BY 1),
         s3 AS (SELECT e.user_id, min(us) AS t_purchase FROM e
                JOIN s2 USING (user_id)
                WHERE event_type = 'purchase' AND us > t_click GROUP BY 1),
         n AS (SELECT '1_view' AS stage, count(*) AS n_users FROM s1
               UNION ALL SELECT '2_click', count(*) FROM s2
               UNION ALL SELECT '3_purchase', count(*) FROM s3),
         f AS (SELECT n_users AS n_first FROM n WHERE stage = '1_view')
         SELECT stage, n_users,
                CAST((20000 * n_users + n_first) // (2 * n_first) AS BIGINT)
                  AS conv_from_first_e4
         FROM n, f ORDER BY stage""",
    "a_retention" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day
                    FROM events),
         c AS (SELECT user_id, min(day) AS cohort_day FROM e
               WHERE event_type = 'signup' GROUP BY 1),
         a AS (SELECT DISTINCT user_id, day FROM e),
         j AS (SELECT a.user_id,
                      CAST(c.cohort_day - DATE '1970-01-01' AS BIGINT)
                        AS cohort_epoch_day,
                      CAST(a.day - c.cohort_day AS BIGINT) AS day_offset
               FROM a JOIN c USING (user_id))
         SELECT cohort_epoch_day, day_offset,
                count(DISTINCT user_id) AS n_active
         FROM j WHERE day_offset BETWEEN 0 AND 7
         GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}

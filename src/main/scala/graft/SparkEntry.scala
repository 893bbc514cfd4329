package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q2RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Analytics.q1PricingSummary _),
    "q2_revenue_by_nation" -> (Analytics.q2RevenueByNation _),
    "q3_topk_orders" -> (Analytics.q3TopkOrders _),
    "q4_filter_range" -> (Analytics.q4FilterRange _),
    "q5_window_running" -> (Analytics.q5WindowRunning _),
    "q6_distinct_users" -> (Analytics.q6DistinctUsers _),
    "q6b_approx_distinct" -> (Analytics.q6bApproxDistinct _),
    "q7_semi_anti" -> (Analytics.q7SemiAnti _),
    "q8_rollup" -> (Analytics.q8Rollup _),
    "q9_above_avg" -> (Analytics.q9AboveAvg _),
    "q10_repeat_buyers" -> (Analytics.q10RepeatBuyers _),
    "q11_pivot_events" -> (Analytics.q11PivotEvents _),
    "q12_json_props" -> (Analytics.q12JsonProps _),
    "q13_asof_join" -> (Analytics.q13AsofJoin _),
    "q14_sessionize" -> (Analytics.q14Sessionize _),
    "q15_tumbling_agg" -> (Analytics.q15TumblingAgg _),
    "odns_typing" -> (OdnsOps.odnsTyping _),
    "odns_scan_date" -> (OdnsOps.odnsScanDate _),
  )

  /** DuckDB-dialect oracle SQL per query key; same aliases, same ORDER BY.
    * Numeric parity: decimal-exact aggregation, double only at the end
    * (see Analytics scaladoc). Keys absent here get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
        | cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) AS sum_disc_price,
        | cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(18,6))) as double) AS sum_charge,
        | round(cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*), 6) AS avg_qty,
        | round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double) / count(*), 6) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_topk_orders" ->
      """SELECT l_orderkey,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,6)) - cast(l_discount as decimal(18,6)))) as double) AS revenue,
        | count(*) AS n_items
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q4_filter_range" ->
      """SELECT
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * cast(l_discount as decimal(18,6))) as double) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
        |  AND l_shipdate < timestamp '1998-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q5_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) as bigint) AS rn,
        | cast(sum(cast(o_totalprice as decimal(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS run_total
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "q6_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_semi_anti" ->
      """SELECT c_custkey, TRUE AS has_orders FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, FALSE AS has_orders FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q8_rollup" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
        | coalesce(o_orderpriority, 'ALL') AS orderpriority,
        | cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP(c_mktsegment, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q9_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q10_repeat_buyers" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "q11_pivot_events" ->
      """SELECT cast(ts as date) AS day,
        | cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS click,
        | cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) as bigint) AS error,
        | cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS purchase,
        | cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) as bigint) AS signup,
        | cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_json_props" ->
      """SELECT cast(json_extract_string(props, '$.k') as bigint) % 10 AS k_bucket,
        | count(*) AS n,
        | cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_asof_join" ->
      """SELECT e.event_id, e.user_id,
        | max(o.o_orderdate) AS last_order_ts,
        | count(o.o_orderkey) AS n_prior_orders
        |FROM events e
        |LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q14_sessionize" ->
      """WITH x AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |       WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |       ELSE 0 END AS new_sess
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), y AS (
        | SELECT user_id, ts_us,
        |  cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
        | FROM x
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q15_tumbling_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "odns_typing" ->
      """SELECT
        | count(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f')) AS n_ts_parsed,
        | max(epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f'))) AS max_ts_us,
        | count(try_cast(event_type as double)) AS n_bad_numeric,
        | count(try_cast(cast(value as varchar) as double)) AS n_good_numeric
        |FROM events""".stripMargin,
    "odns_scan_date" ->
      """SELECT regexp_extract('tcp_scan_' || cast(cast(ts as date) as varchar) || '.csv.gz', '\d{4}-\d{2}-\d{2}') AS scan_date,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}

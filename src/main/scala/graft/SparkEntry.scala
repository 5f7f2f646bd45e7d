package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.EventsEtl
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7.
  *
  * Every `queries` key has a matching DuckDB `oracleSql` entry unless the
  * op is not SQL-expressible (then the driver records a rows-only
  * check). Column names are aligned exactly between the Spark result
  * and the oracle SQL (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5JoinChain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 reference-surface ETL ops (events)
    "etl_parse_props"    -> EventsEtl.parseProps _,
    "etl_parse_errors"   -> EventsEtl.parseErrors _,
    "etl_snapshot_stats" -> EventsEtl.snapshotStats _,
    "etl_dim_firstseen"  -> EventsEtl.dimFirstSeen _,
    "etl_dim_surrogate"  -> EventsEtl.dimSurrogate _,
    "etl_upsert_newkeys" -> EventsEtl.upsertNewKeys _,
    "etl_latest_state"   -> EventsEtl.latestState _,
    "etl_missing_minutes" -> EventsEtl.missingMinutes _,
    "etl_sessionize"     -> EventsEtl.sessionize _,
    "etl_star_join"      -> EventsEtl.starJoin _,
    "etl_validate_recon" -> EventsEtl.validateRecon _,
    "etl_retry_dedup"    -> EventsEtl.retryDedup _,
    // §2.2 relational core
    "q1_pricing_summary" -> Relational.q1PricingSummary _,
    "q3_top_unshipped"   -> Relational.q3TopUnshipped _,
    "q5_join_chain"      -> Relational.q5JoinChain _,
    "q6_selective_filter" -> Relational.q6SelectiveFilter _,
    "q7_semi_join"       -> Relational.q7SemiJoin _,
    "q8_anti_join"       -> Relational.q8AntiJoin _,
    "q9_window_rank"     -> Relational.q9WindowRank _,
    "q10_rollup"         -> Relational.q10Rollup _,
    "q12_case_agg"       -> Relational.q12CaseAgg _,
    "q14_cond_ratio"     -> Relational.q14CondRatio _,
    "q18_having_join"    -> Relational.q18HavingJoin _,
    "q_topk_global"      -> Relational.qTopkGlobal _,
  )

  /** DuckDB-runnable equivalents over the same parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "etl_parse_props" ->
      """SELECT event_id, user_id, event_type,
        | TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        | CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch
        |FROM events ORDER BY event_id""".stripMargin,
    "etl_parse_errors" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
        | CAST(sum(CASE WHEN event_type <> 'error' AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parse_ok,
        | CAST(sum(CASE WHEN event_type <> 'error' AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_parse_failed
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_snapshot_stats" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
        | count(*) AS n_records,
        | count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | min(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS first_sec,
        | max(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS last_sec
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_dim_firstseen" ->
      """SELECT user_id, event_type,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS first_sec,
        | event_id AS first_event_id
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "etl_dim_surrogate" ->
      """SELECT CAST(dense_rank() OVER (ORDER BY user_id, event_type) AS BIGINT) AS surrogate_id,
        | user_id, event_type
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |ORDER BY surrogate_id""".stripMargin,
    "etl_upsert_newkeys" ->
      """SELECT DISTINCT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |EXCEPT
        |SELECT DISTINCT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        |ORDER BY user_id, event_type""".stripMargin,
    "etl_latest_state" ->
      """SELECT user_id, event_type AS last_event_type, value AS last_value,
        | CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS last_sec
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "etl_missing_minutes" ->
      """WITH b AS (SELECT CAST(date_trunc('minute', min(ts)) AS TIMESTAMP) AS mn,
        |                  CAST(date_trunc('minute', max(ts)) AS TIMESTAMP) AS mx FROM events),
        |mins AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |obs AS (SELECT DISTINCT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute FROM events)
        |SELECT CAST(epoch(minute) AS BIGINT) AS minute_epoch
        |FROM mins WHERE minute NOT IN (SELECT minute FROM obs) ORDER BY 1""".stripMargin,
    "etl_sessionize" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |    lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        |  FROM events),
        |t AS (SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_sess FROM s),
        |u AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_num FROM t)
        |SELECT user_id, CAST(session_num AS BIGINT) AS session_num, count(*) AS n_events,
        | min(sec) AS start_sec, max(sec) AS end_sec
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "etl_star_join" ->
      """WITH dim AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY user_id, event_type) AS BIGINT) AS dim_id, user_id, event_type
        |  FROM (SELECT DISTINCT user_id, event_type FROM events))
        |SELECT d.dim_id, d.user_id, d.event_type, count(*) AS n_facts,
        | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dim d USING (user_id, event_type)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "etl_validate_recon" ->
      """WITH a AS (SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch, count(*) AS n_a FROM events GROUP BY 1),
        |b AS (SELECT minute_epoch, count(*) AS n_b FROM (
        |  SELECT DISTINCT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch, event_id FROM events) GROUP BY 1)
        |SELECT coalesce(a.minute_epoch, b.minute_epoch) AS minute_epoch,
        | coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        | coalesce(n_a, 0) = coalesce(n_b, 0) AS is_match
        |FROM a FULL OUTER JOIN b ON a.minute_epoch = b.minute_epoch ORDER BY 1""".stripMargin,
    "etl_retry_dedup" ->
      """SELECT event_type, count(*) AS n FROM (
        | SELECT DISTINCT * FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_unshipped" ->
      """SELECT l_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join_chain" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_selective_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q9_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |FROM orders
        |QUALIFY rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q12_case_agg" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_cond_ratio" ->
      """SELECT round(
        | CAST(sum(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |   ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) * 100.0 /
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
        | 6) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin,
    "q18_having_join" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,
    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
  )
}

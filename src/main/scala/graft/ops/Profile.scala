package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Column-level data profiling — the first pass every ingestion
  * pipeline runs on an unfamiliar 100 TB table: row/null/distinct
  * counts and typed min/max per column, in two scans total.
  *
  * Why not one agg with six countDistinct: Catalyst plans multi-column
  * DISTINCT aggregates with an Expand (one row copy per distinct
  * column — a 6× input blowup here). Instead the distinct counts come
  * from an unpivot (stack) into (column, value) pairs aggregated at
  * (column, value) grain first — map-side combinable, skew spread over
  * values — then rolled up per column. Typed min/max take one ordinary
  * agg pass (no distinct, no Expand) and join the 6-row summaries at
  * the end. At scale both passes are single shuffles of tiny outputs.
  */
object Profile {

  /** Join-key skew profile of the fact table — the diagnostic run
    * BEFORE committing a 100 TB join plan, and the evidence that
    * decides salting (Scale.saltedJoin) or AQE skew thresholds: for
    * each candidate join key, its cardinality, the heaviest key's
    * count, the mean count, and the max/mean skew ratio. Each key
    * profile is one (key, cnt) partial agg rolled into a 1-row
    * summary — three bounded shuffles total, nothing at row grain
    * leaves the executors. */
  def profileJoinSkew(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def one(c: String): DataFrame = li
      .groupBy(col(c).as("k")).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_distinct"), max(col("cnt")).as("max_cnt"),
        round(avg(col("cnt")), 6).as("avg_cnt"),
        round(max(col("cnt")) / avg(col("cnt")), 6).as("skew_ratio"))
      .select(lit(c).as("key_col"), col("n_distinct"), col("max_cnt"),
        col("avg_cnt"), col("skew_ratio"))
    one("l_orderkey").unionAll(one("l_partkey")).unionAll(one("l_suppkey"))
      .orderBy(col("key_col"))
  }

  /** Per-column profile of `orders`: n_rows, n_nulls, n_distinct
    * (non-null), and min/max rendered canonically per type (numerics
    * as numbers — not lexicographic strings — timestamps as
    * 'yyyy-MM-dd HH:mm:ss', doubles via DECIMAL(18,2) so both engines
    * print identical fixed notation). */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val kv = orders.select(expr(
      """stack(6,
        |  'o_orderkey',      CAST(o_orderkey AS STRING),
        |  'o_custkey',       CAST(o_custkey AS STRING),
        |  'o_orderstatus',   o_orderstatus,
        |  'o_totalprice',    CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS STRING),
        |  'o_orderdate',     date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss'),
        |  'o_orderpriority', o_orderpriority
        |) AS (column_name, val)""".stripMargin))
    val counts = kv
      .groupBy(col("column_name"), col("val"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("column_name"))
      .agg(
        sum(col("c")).as("n_rows"),
        coalesce(sum(when(col("val").isNull, col("c"))), lit(0L)).as("n_nulls"),
        count(when(col("val").isNotNull, lit(1))).as("n_distinct"))
    def dec(c: String) = s"CAST(CAST(round(min($c), 2) AS DECIMAL(18,2)) AS STRING)" ->
      s"CAST(CAST(round(max($c), 2) AS DECIMAL(18,2)) AS STRING)"
    val minmax = orders.agg(
        min(col("o_orderkey")).cast("string").as("min_o_orderkey"),
        max(col("o_orderkey")).cast("string").as("max_o_orderkey"),
        min(col("o_custkey")).cast("string").as("min_o_custkey"),
        max(col("o_custkey")).cast("string").as("max_o_custkey"),
        min(col("o_orderstatus")).as("min_o_orderstatus"),
        max(col("o_orderstatus")).as("max_o_orderstatus"),
        expr(dec("o_totalprice")._1).as("min_o_totalprice"),
        expr(dec("o_totalprice")._2).as("max_o_totalprice"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("min_o_orderdate"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("max_o_orderdate"),
        min(col("o_orderpriority")).as("min_o_orderpriority"),
        max(col("o_orderpriority")).as("max_o_orderpriority"))
      .select(expr(
        """stack(6,
          |  'o_orderkey',      min_o_orderkey,      max_o_orderkey,
          |  'o_custkey',       min_o_custkey,       max_o_custkey,
          |  'o_orderstatus',   min_o_orderstatus,   max_o_orderstatus,
          |  'o_totalprice',    min_o_totalprice,    max_o_totalprice,
          |  'o_orderdate',     min_o_orderdate,     max_o_orderdate,
          |  'o_orderpriority', min_o_orderpriority, max_o_orderpriority
          |) AS (column_name, min_val, max_val)""".stripMargin))
    counts.join(broadcast(minmax), Seq("column_name"))
      .orderBy(col("column_name"))
  }
}

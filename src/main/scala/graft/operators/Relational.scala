package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational query surface — the analytic queries a user of the
  * reference's stride DB runs over the star schema, re-expressed on the
  * driver's TPC-H-ish testdata.
  *
  * Numeric discipline (so the DuckDB oracle hash-matches): money math is
  * done in exact DECIMAL (doubles cast before aggregation — float sums
  * are order-dependent and Spark's partial aggregation order is not),
  * then the final value is cast to DOUBLE / rounded. Timestamps are
  * emitted as epoch seconds (BIGINT) to avoid engine timestamp-type
  * skew.
  */
object Relational {
  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)

  private def d2(c: Column): Column = c.cast(dec2)
  /** exact revenue term: extendedprice * (1 - discount) in decimal */
  private def revTerm(price: Column, disc: Column): Column =
    d2(price) * (lit(1).cast(DecimalType(5, 4)) - disc.cast(dec4))

  /** Wide pricing-summary aggregation (TPC-H Q1 shape): scan → filter
    * (pushed to parquet) → hash-agg on a low-cardinality key. At scale
    * this is a pure map-side-partial + tiny shuffle plan. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= Tables.tsLit(li, "l_shipdate", "1999-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(d2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(revTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        round(sum(d2(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(d2(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** 3-way join + selective filters + group + top-k (TPC-H Q3 shape).
    * customer is the small side → broadcast; orders⋈lineitem shuffles on
    * the join key only after both sides are filtered. */
  def q3TopUnshipped(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord0 = Tables.orders(spark, dir)
    val ord = ord0
      .filter(col("o_orderdate") < Tables.tsLit(ord0, "o_orderdate", "1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li0 = Tables.lineitem(spark, dir)
    val li = li0
      .filter(col("l_shipdate") > Tables.tsLit(li0, "l_shipdate", "1998-01-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .select(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** 5-way join chain region→nation→customer→orders→lineitem with all
    * dimension sides broadcast (TPC-H Q5 shape, minus supplier's
    * nation-equality since testdata has no l_suppkey→nation path that
    * matters). Only the orders⋈lineitem edge shuffles. */
  def q5JoinChain(spark: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val dims = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    val ord0 = Tables.orders(spark, dir)
    val ord = ord0
      .filter(col("o_orderdate") >= Tables.tsLit(ord0, "o_orderdate", "1996-01-01") &&
        col("o_orderdate") < Tables.tsLit(ord0, "o_orderdate", "1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(dims), ord("o_custkey") === dims("c_custkey"))
      .groupBy(col("n_name"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Tight range filter + single aggregate (TPC-H Q6 shape): the whole
    * plan should collapse to scan-with-pushed-filters → partial sum. */
  def q6SelectiveFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li
      .filter(col("l_shipdate") >= Tables.tsLit(li, "l_shipdate", "1997-01-01") &&
        col("l_shipdate") < Tables.tsLit(li, "l_shipdate", "1998-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(d2(col("l_extendedprice")) * col("l_discount").cast(dec4)).cast("double").as("revenue"))
  }

  /** EXISTS → left_semi join: customers that have at least one order,
    * counted per market segment. No row multiplication, no dedup pass. */
  def q7SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir).select("o_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** NOT EXISTS → left_anti join: customers with no recent orders. This is the
    * same primitive the reference's get-or-create uses to find new keys
    * (ObjectsMaker fetch-then-create, process_snapshot.py:113). */
  def q8AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord0 = Tables.orders(spark, dir)
    val ord = ord0
      .filter(col("o_orderdate") >= Tables.tsLit(ord0, "o_orderdate", "2000-01-01"))
      .select("o_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Top-N per group via ranking window: 3 biggest orders per customer.
    * Single shuffle on the partition key; rank ties broken by unique
    * orderkey so the result is deterministic. */
  def q9WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Hierarchical aggregation with ROLLUP over (returnflag, linestatus):
    * one pass, Spark expands grouping sets without rescanning. */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Conditional (CASE) aggregation over a join (TPC-H Q12 shape):
    * high- vs low-priority order counts per linestatus. */
  def q12CaseAgg(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val li0 = Tables.lineitem(spark, dir)
    val li = li0
      .filter(col("l_shipdate") >= Tables.tsLit(li0, "l_shipdate", "1997-01-01") &&
        col("l_shipdate") < Tables.tsLit(li0, "l_shipdate", "1998-01-01"))
      .select("l_orderkey", "l_linestatus")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** Ratio of conditional sums over a broadcast join (TPC-H Q14 shape):
    * promo revenue share. Part is the small side → broadcast. */
  def q14CondRatio(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    val li0 = Tables.lineitem(spark, dir)
    val li = li0
      .filter(col("l_shipdate") >= Tables.tsLit(li0, "l_shipdate", "1997-01-01") &&
        col("l_shipdate") < Tables.tsLit(li0, "l_shipdate", "1997-07-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val rev = revTerm(col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(38, 6)))).cast("double") * 100.0 /
          sum(rev).cast("double"), 6).as("promo_revenue_pct"))
  }

  /** Group-HAVING subquery joined back (TPC-H Q18 shape): orders whose
    * total quantity exceeds a threshold, with customer detail. The
    * HAVING side reduces to few keys → broadcast back against orders. */
  def q18HavingJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(d2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 300)
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    ord.join(broadcast(big), ord("o_orderkey") === big("l_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  /** Distinct-count per group (TPC-H Q16 shape): supplier-size variety
    * per (brand, type). count(distinct) plans a two-phase partial
    * aggregate — no row explosion. */
  def q16DistinctCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("p_size")).as("size_cnt"),
        count(lit(1)).as("part_cnt"))
      .orderBy(col("p_brand"), col("p_type"))
  }

  /** Scalar subquery + anti join (TPC-H Q22 shape): wealthy customers
    * (above 1.2× average balance) with no recent orders, summarized by
    * segment. The scalar average is computed once and broadcast into
    * the filter. */
  def q22WealthyInactive(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.agg(avg(col("c_acctbal")).as("a"))
    val ord0 = Tables.orders(spark, dir)
    val recent = ord0
      .filter(col("o_orderdate") >= Tables.tsLit(ord0, "o_orderdate", "2000-01-01"))
      .select("o_custkey")
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a") * 1.2)
      .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Exact interpolated median per group — the percentile aggregate
    * (exact, not approx_percentile, so the oracle agrees bit-for-bit).
    * At 100 TB you'd switch to approx_percentile with a bounded error;
    * the exact version is the correctness anchor. */
  def qMedianValue(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("median_value"),
        round(expr("percentile(value, 0.9)"), 6).as("p90_value"))
      .orderBy(col("event_type"))
  }

  /** Correlated min-within-group subquery (TPC-H Q2 shape): parts
    * priced at their type's minimum. Planned as one aggregate +
    * broadcast join back — the correlation never re-executes per row. */
  def q2MinWithinGroup(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val minPrice = part.groupBy(col("p_type").as("mt"))
      .agg(min(col("p_retailprice")).as("min_price"))
    part.join(broadcast(minPrice),
        col("p_type") === col("mt") && col("p_retailprice") === col("min_price"))
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_retailprice"))
      .orderBy(col("p_type"), col("p_partkey"))
  }

  /** Aggregate-equals-max view join (TPC-H Q15 shape): suppliers whose
    * revenue equals the global maximum. The max comes from an
    * unpartitioned window over the ALREADY-AGGREGATED per-supplier
    * relation (|suppliers| rows, not |lineitem|), so the whole query is
    * one fact scan — a separate `rev.agg(max)` branch re-executes the
    * scan+agg subtree unless it's persisted (Spark reuses exchanges,
    * not arbitrary subtrees; measured 3.3s vs 0.8s at sf0.1). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li0 = Tables.lineitem(spark, dir)
    val rev = li0
      .filter(col("l_shipdate") >= Tables.tsLit(li0, "l_shipdate", "1997-01-01") &&
        col("l_shipdate") < Tables.tsLit(li0, "l_shipdate", "1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("total_revenue"))
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    rev.withColumn("mx",
        max(col("total_revenue")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Ordered-sequence funnel (view → click → purchase, strictly
    * increasing timestamps): the product-analytics query family. Three
    * min-aggregations, each gated on the previous stage's time — ONE
    * shuffle per stage and nothing else (spec-asserted): each stage's
    * aggregate output is small (per-user rows), so it broadcasts back
    * onto the next stage's scan; under sort-merge at larger |users|
    * the stage groupBys (keyed on supersets of user_id) reuse the
    * join's partitioning. Times are exact epoch micros. */
  def qFunnelSequence(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val tv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_view"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, "user_id").filter(col("tus") > col("t_view"))
      .groupBy(col("user_id"), col("t_view")).agg(min(col("tus")).as("t_click"))
    ev.filter(col("event_type") === "purchase")
      .join(tc, "user_id").filter(col("tus") > col("t_click"))
      .groupBy(col("user_id"), col("t_view"), col("t_click"))
      .agg(min(col("tus")).as("t_purchase"))
      .orderBy(col("user_id"))
  }

  /** Explicit GROUPING SETS (the general form behind rollup/cube),
    * exercised through the engine's SQL-string surface: the same
    * Catalyst plan (one Expand pass) whether the query arrives as
    * DataFrame calls or `spark.sql`. Sets: by priority, by status,
    * and the grand total. */
  def qGroupingSetsMix(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT coalesce(o_orderpriority, 'ALL') AS priority,
             coalesce(o_orderstatus, 'ALL') AS status,
             CAST(count(1) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders_v
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      ORDER BY priority, status""")
  }

  /** Decile segmentation (ntile window): customers bucketed 1–10 by
    * total spend. The window is unpartitioned but runs over the
    * ALREADY-AGGREGATED per-customer relation (|customers| rows, like
    * [[q15TopSupplier]]'s max) — the exact-decile contract needs a
    * global order; at extreme |customers| you'd switch to
    * approx-percentile boundaries + a map-side bucket lookup. Spend is
    * an exact DECIMAL sum cast to double, so the ordering (and thus
    * every decile edge) is bit-identical across engines. */
  def qNtileDeciles(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spend"))
    spend.withColumn("decile",
        ntile(10).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("total_spend").desc, col("o_custkey"))).cast("long"))
      .select(col("o_custkey"), round(col("total_spend"), 6).as("total_spend"), col("decile"))
      .orderBy(col("o_custkey"))
  }

  /** Weekly cohort retention (the second pillar of product analytics
    * next to [[qFunnelSequence]]): users grouped by first-active week,
    * counted per week-offset they return. Dedup to (user, week) grain
    * first — count(*) then IS the distinct-user count, avoiding
    * count(distinct)'s Expand; the cohort min reuses the same
    * partitioning. Output is the retention triangle. */
  def qCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(spark, dir)
      .select(col("user_id"),
        unix_timestamp(date_trunc("week", col("ts"))).cast("long").as("wk"))
      .distinct()
    val cohort = u.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    u.join(cohort, "user_id")
      .groupBy(col("cohort_wk"),
        expr("CAST((wk - cohort_wk) DIV 604800 AS BIGINT)").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  /** Sketch dashboard — the 100 TB path for per-group distinct counts
    * and quantiles, via the PORTABLE kernels (so, unlike Spark's
    * approx_count_distinct / approx_percentile whose sketch internals
    * are engine-private, every number hash-matches a DuckDB oracle):
    * per-event-type [[hllRegisters]]-style HLL (exact-integer register
    * math, see [[qHllPortable]]) for approx_users and the binned
    * quantile sketch (see [[qQuantileSketch]]) for approx_p50/p95.
    *
    * Shape at scale: registers are ONE map-side-combinable
    * (group, bucket) agg — ≤ |groups|·256 rows; the histogram is one
    * (group, bin) agg; both tiny relations then join broadcast. The
    * fact table is scanned twice but never shuffled at fact grain. */
  def qApproxSketches(spark: SparkSession, dir: String): DataFrame = {
    val m = 256L; val cap = 40L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("value"))
    val reg = ev
      .select(col("event_type"),
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .select(col("event_type"), (col("h") % m).as("bucket"), expr(s"h div $m").as("v"))
      .withColumn("rho", least(lit(53L) - length(expr("bin(v)")), lit(cap)))
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("mj"))
    val users = reg.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($cap - mj AS INT))")).as("s_present"))
      .withColumn("raw", round(lit(0.7183) * lit(m * m) * lit(1L << cap.toInt) /
        (col("s_present") + (lit(m) - col("n_buckets")) * lit(1L << cap.toInt)), 4))
      .select(col("event_type"),
        when(col("n_buckets") < m && col("raw") <= lit(2.5 * m),
          round(lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("n_buckets"))), 4))
          .otherwise(col("raw")).as("approx_users"))
    val hist = ev
      .groupBy(col("event_type"), floor(col("value") * 2).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val totals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("bin"))))
    val quants = cum.join(broadcast(totals), "event_type")
      .crossJoin(broadcast(spark.range(1)
        .select(explode(array(Seq(0.5, 0.95).map(lit): _*)).as("p"))))
      .withColumn("rk", ceil(col("p") * col("n")).cast("long"))
      .filter(col("cum") >= col("rk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"), col("p")).orderBy(col("bin"))))
      .filter(col("rn") === 1)
      .withColumn("est_q", round(col("bin") * lit(0.5) +
        lit(0.5) * (col("rk") - (col("cum") - col("c"))) / col("c"), 4))
      .groupBy(col("event_type"))
      .agg(max(when(col("p") === 0.5, col("est_q"))).as("approx_p50"),
        max(when(col("p") === 0.95, col("est_q"))).as("approx_p95"))
    users.join(quants, "event_type").join(totals, "event_type")
      .select(col("event_type"), col("approx_users"), col("approx_p50"),
        col("approx_p95"), col("n"))
      .orderBy(col("event_type"))
  }

  /** Portable HyperLogLog — the oracle-gated counterpart of
    * [[qApproxSketches]]: a from-scratch HLL (Flajolet et al. 2007)
    * whose registers are EXACT integers both engines compute
    * identically, so even an approximate sketch gets a hash-matching
    * DuckDB oracle. 256 buckets over a 60-bit md5-derived hash of
    * l_partkey: bucket = h mod 256, rho = leading-zero rank of the
    * remaining 52 bits (53 − bitlen, capped at 40 so the harmonic sum
    * stays exact in BIGINT: Σ 2^(40−M_j) ≤ 256·2^40 = 2^48 « 2^63 and,
    * cast to double, « 2^53 — no float rounding anywhere before the
    * final division). Estimate = α₂₅₆·m²·2^40 / S with the same literal
    * folding on both sides, plus the standard linear-counting
    * correction for the small-range regime (E ≤ 2.5m with empty
    * buckets) — the branch condition is an already-identical double,
    * so both engines always take the same arm.
    *
    * Shape at scale: the register table is ONE map-side-combinable
    * 256-group agg of a projected hash — the textbook mergeable-sketch
    * plan; the exact countDistinct rides along only as the accuracy
    * anchor (itself a two-phase partial agg). */
  /** The (bucket, mj) HLL register table for an arbitrary
    * single-column ("k", string) key relation — the mergeable sketch
    * state itself: registers(A ∪ B) = max-merge(registers(A),
    * registers(B)), which is exactly Spark's map-side partial max and
    * what a spec asserts. */
  private[graft] def hllRegisters(keys: DataFrame): DataFrame = {
    val m = 256L; val cap = 40L
    keys
      .select(expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)").as("h"))
      // integer div, NOT `/`: Spark divide casts to double, which is
      // lossy above 2^53 — h is 60 bits
      .select((col("h") % m).as("bucket"), expr(s"h div $m").as("v"))
      .withColumn("rho", least(lit(53L) - length(expr("bin(v)")), lit(cap)))
      .groupBy(col("bucket")).agg(max(col("rho")).as("mj"))
  }

  /** Corrected HLL estimate from a (bucket, mj) register table, as a
    * 1-row (n_buckets, estimate) frame — the [[qHllPortable]] formula
    * factored out so register-algebra consumers ([[qHllSetOps]]) reuse
    * it on derived (merged) register tables. */
  private[graft] def hllEstimate(reg: DataFrame): DataFrame = {
    val m = 256L; val cap = 40L
    reg
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($cap - mj AS INT))")).as("s_present"))
      .select(col("n_buckets"),
        round(lit(0.7183) * lit(m * m) * lit(1L << cap.toInt) /
          (col("s_present") + (lit(m) - col("n_buckets")) * lit(1L << cap.toInt)), 4)
          .as("raw_estimate"))
      .withColumn("estimate",
        when(col("n_buckets") < m && col("raw_estimate") <= lit(2.5 * m),
          round(lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("n_buckets"))), 4))
          .otherwise(col("raw_estimate")))
  }

  def qHllPortable(spark: SparkSession, dir: String): DataFrame = {
    val m = 256L; val cap = 40L
    val h = Tables.lineitem(spark, dir)
      .select(col("l_partkey").cast("string").as("k"), col("l_partkey"))
    val reg = hllRegisters(h)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($cap - mj AS INT))")).as("s_present"))
    val exact = h.agg(countDistinct(col("l_partkey")).as("n_exact"))
    reg.crossJoin(broadcast(exact))
      .select(
        lit(m).as("m"), col("n_buckets"), col("n_exact"),
        round(lit(0.7183) * lit(m * m) * lit(1L << cap.toInt) /
          (col("s_present") + (lit(m) - col("n_buckets")) * lit(1L << cap.toInt)), 4)
          .as("raw_estimate"))
      // linear-counting small-range correction (E ≤ 2.5m with empty
      // buckets): both engines branch on the SAME already-identical
      // double, so the ln only ever reaches a hash compare rounded and
      // far from a boundary
      .withColumn("estimate",
        when(col("n_buckets") < m && col("raw_estimate") <= lit(2.5 * m),
          round(lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("n_buckets"))), 4))
          .otherwise(col("raw_estimate")))
      .withColumn("rel_err",
        round(abs(col("estimate") - col("n_exact")) / col("n_exact"), 4))
  }

  /** HLL set algebra — union and intersection cardinalities from
    * REGISTER operations alone: |A∪B| comes from max-merging A's and
    * B's registers (exact sketch union — no rescan, no row-level set
    * op), and |A∩B| from inclusion–exclusion
    * est(A) + est(B) − est(A∪B). Here A/B = distinct customers
    * ordering in 1996 / 1997; the exact intersection rides along as
    * the anchor. At 100 TB this is how per-segment audience-overlap
    * questions are answered from a register table without ever
    * joining the raw sets. (Inclusion–exclusion error grows when the
    * overlap is small relative to the sets — the reported rel_err
    * makes that visible rather than hiding it.) */
  def qHllSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def year(y: Int) = ord
      .filter(col("o_orderdate") >= Tables.tsLit(ord, "o_orderdate", s"$y-01-01") &&
        col("o_orderdate") < Tables.tsLit(ord, "o_orderdate", s"${y + 1}-01-01"))
      .select(col("o_custkey").cast("string").as("k"))
    val a = graft.Caches.persistTracked(year(1996))
    val b = graft.Caches.persistTracked(year(1997))
    val regA = graft.Caches.persistTracked(hllRegisters(a))
    val regB = graft.Caches.persistTracked(hllRegisters(b))
    val regU = regA.unionAll(regB)
      .groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
    val estA = hllEstimate(regA).select(col("estimate").as("est_a"))
    val estB = hllEstimate(regB).select(col("estimate").as("est_b"))
    val estU = hllEstimate(regU).select(col("estimate").as("est_union"))
    val exact = a.select(col("k")).intersect(b.select(col("k")))
      .agg(count(lit(1)).as("n_exact_intersection"))
      .crossJoin(a.distinct().agg(count(lit(1)).as("n_exact_a")))
      .crossJoin(b.distinct().agg(count(lit(1)).as("n_exact_b")))
    estA.crossJoin(estB).crossJoin(estU).crossJoin(broadcast(exact))
      .withColumn("est_intersection",
        round(col("est_a") + col("est_b") - col("est_union"), 4))
      .withColumn("rel_err", round(
        abs(col("est_intersection") - col("n_exact_intersection")) /
          col("n_exact_intersection"), 4))
      .select(col("n_exact_a"), col("est_a"), col("n_exact_b"), col("est_b"),
        col("est_union"), col("n_exact_intersection"),
        col("est_intersection"), col("rel_err"))
  }

  /** Hierarchical distinct-count rollup on MERGED HLL registers — the
    * payoff of a mergeable sketch inside one query: daily
    * (type, day, bucket) registers aggregate once from the fact table,
    * then the monthly per-type estimate comes from max-merging the
    * DAILY REGISTERS — the fact table is NOT rescanned at the coarser
    * grain. This is exactly how a 100 TB deployment serves distinct
    * counts at every rollup level from one register table (and how
    * Spark's own partial aggregation works, materialized as data).
    * Registers/estimates follow [[qHllPortable]]'s exact-integer
    * discipline, so the whole rollup hash-matches DuckDB; the exact
    * per-type countDistinct rides along as the accuracy anchor. */
  def qHllRollup(spark: SparkSession, dir: String): DataFrame = {
    val m = 256L; val cap = 40L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("k"),
        date_trunc("day", col("ts")).as("day"))
    val daily = ev
      .select(col("event_type"), col("day"),
        expr("CAST(conv(substr(md5(k), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .select(col("event_type"), col("day"),
        (col("h") % m).as("bucket"), expr(s"h div $m").as("v"))
      .withColumn("rho", least(lit(53L) - length(expr("bin(v)")), lit(cap)))
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
    // the rollup: register max-merge, never a rescan
    val monthly = daily
      .groupBy(col("event_type"), col("bucket")).agg(max(col("mj")).as("mj"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($cap - mj AS INT))")).as("s_present"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("k")).as("n_exact"))
    monthly.join(exact, "event_type")
      .select(col("event_type"), col("n_buckets"), col("n_exact"),
        round(lit(0.7183) * lit(m * m) * lit(1L << cap.toInt) /
          (col("s_present") + (lit(m) - col("n_buckets")) * lit(1L << cap.toInt)), 4)
          .as("raw_estimate"))
      .withColumn("estimate",
        when(col("n_buckets") < m && col("raw_estimate") <= lit(2.5 * m),
          round(lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("n_buckets"))), 4))
          .otherwise(col("raw_estimate")))
      .withColumn("rel_err",
        round(abs(col("estimate") - col("n_exact")) / col("n_exact"), 4))
      .orderBy(col("event_type"))
  }

  /** Portable quantile sketch — the quantile counterpart of
    * [[qHllPortable]]: a fixed-width binned histogram (bin = ⌊2·value⌋,
    * 0.5-wide bins) whose counts are exact integers, queried by rank
    * (r = ⌈p·n⌉) with linear interpolation inside the landing bin.
    * Every arithmetic step is either exact-integer or a single
    * deterministic IEEE double op mirrored literally in the oracle, so
    * the approximation hash-matches DuckDB. The exact
    * percentile anchor rides along to report abs_err.
    *
    * Shape at scale: the histogram is a map-side-combinable
    * (type, bin) agg — ~1k bins per group regardless of row count —
    * then all quantile logic runs on the tiny aggregated relation; the
    * raw table is scanned once (the exact anchor, which a real deploy
    * would drop, is the only full-sort cost). */
  def qQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val hist = ev
      .groupBy(col("event_type"), floor(col("value") * 2).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val totals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("bin"))))
    val ps = Seq(0.5, 0.95)
    val withP = cum.join(broadcast(totals), "event_type")
      .crossJoin(broadcast(spark.range(1)
        .select(explode(array(ps.map(lit): _*)).as("p"))))
      .withColumn("rk", ceil(col("p") * col("n")).cast("long"))
    val sel = withP.filter(col("cum") >= col("rk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"), col("p")).orderBy(col("bin"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("p"),
        round(col("bin") * lit(0.5) +
          lit(0.5) * (col("rk") - (col("cum") - col("c"))) / col("c"), 4).as("est_q"))
    val exact = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 4).as("q50"),
        round(expr("percentile(value, 0.95)"), 4).as("q95"))
      .select(col("event_type"), explode(map(
        lit(0.5), col("q50"), lit(0.95), col("q95"))).as(Seq("p", "exact_q")))
    sel.join(exact, Seq("event_type", "p"))
      .withColumn("abs_err", round(abs(col("est_q") - col("exact_q")), 4))
      .orderBy(col("event_type"), col("p"))
  }

  /** EXISTS over a date-ranged fact (TPC-H Q4 shape): filtered orders
    * left_semi lineitem — the semi join never multiplies rows, and both
    * sides' filters push to the scans. */
  def q4PriorityExists(spark: SparkSession, dir: String): DataFrame = {
    val ord0 = Tables.orders(spark, dir)
    val ord = ord0
      .filter(col("o_orderdate") >= Tables.tsLit(ord0, "o_orderdate", "1996-01-01") &&
        col("o_orderdate") < Tables.tsLit(ord0, "o_orderdate", "1997-01-01"))
      .select("o_orderkey", "o_orderpriority")
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    ord.join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Group-value vs global-scalar threshold (TPC-H Q11 shape): per-part
    * value, kept if above 0.06% of total (testdata spreads value near-
    * uniformly over 2000 parts ≈ 0.05% each, so this keeps the heavy
    * tail). The threshold is a 1-row broadcast (scalar subquery), and
    * ALL arithmetic stays in exact decimal until output so the filter
    * is reproducible. */
  def q11ValueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).as("v"))
    val thr = pv.agg((sum(col("v")) * lit(BigDecimal("0.0006"))).as("thr"))
    pv.crossJoin(broadcast(thr))
      .filter(col("v") > col("thr"))
      .select(col("l_partkey"), col("v").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** Decile lift table — the campaign-targeting readout built on the
    * `q_ntile_deciles` assignment: customers ranked by total spend into
    * 10 deciles, per decile the customer count, revenue, revenue share,
    * cumulative share, and lift (share ÷ the 10% a uniform decile
    * would hold). Decile 1 lift ≈ how much better "target the top 10%"
    * is than random targeting — the whole-curve Pareto evidence beside
    * `q11_value_concentration`'s single threshold.
    *
    * Shape at scale: the per-customer agg is one map-side-combinable
    * shuffle; the ntile window orders only the |customers| aggregate
    * (never the fact stream) and at 1000-executor scale swaps for a
    * percentile-sketch bucketing with the identical downstream
    * arithmetic; the final 10-row table is window'd in place. Exact
    * DECIMAL sums end-to-end — the share division is the only float. */
  def qDecileLift(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend"))
    val wN = Window.orderBy(col("spend").desc, col("o_custkey"))
    val deciles = graft.Caches.persistTracked(spend
      .withColumn("decile", ntile(10).over(wN).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("spend")).as("rev")))
    val wC = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .crossJoin(broadcast(deciles.agg(sum(col("rev")).as("tot"))))
      .withColumn("rev_share", round(col("rev").cast("double") / col("tot"), 6))
      .withColumn("cum_share",
        round(sum(col("rev")).over(wC).cast("double") / col("tot"), 6))
      .withColumn("lift",
        round(col("rev").cast("double") / col("tot") * 10.0, 6))
      .select(col("decile"), col("n_customers"),
        col("rev").cast("double").as("revenue"),
        col("rev_share"), col("cum_share"), col("lift"))
      .orderBy(col("decile"))
  }

  /** Distribution query (TPC-H Q13 shape): customers left-joined to
    * orders so zero-order customers survive, then a histogram of order
    * counts. Two shuffles: the outer join and the tiny re-agg. */
  def q13CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    // aggregate the fact FIRST (map-side partial -> one row per
    // customer), then outer-join the shrunk result — joining raw orders
    // to customers and counting after would move the whole fact through
    // the join at 100 TB
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    cust.join(perCust, cust("c_custkey") === perCust("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Correlated per-group average (TPC-H Q17 shape): lineitems of one
    * brand's parts below 20% of that part's average quantity. The
    * correlated subquery becomes a per-part agg + broadcast join back —
    * no per-row rescans. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    // integral double quantities sum exactly → avg is order-independent
    val avgQ = li.groupBy(col("l_partkey").as("ap")).agg(avg(col("l_quantity")).as("aq"))
    li.join(broadcast(avgQ), col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg(round(sum(d2(col("l_extendedprice"))).cast("double") / 7.0, 6).as("avg_yearly"))
  }

  /** Disjunctive multi-attribute join predicate (TPC-H Q19 shape): the
    * OR-of-ANDs stays a single broadcast-join filter — one lineitem
    * scan, no union of three plans. */
  def q19DisjunctiveJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
  }

  /** Nested semi-join chain (TPC-H Q20 shape): suppliers who moved >100
    * units of any 'red' part — part filter → fact agg → HAVING →
    * distinct supplier keys → semi join. Each hop shrinks the data. */
  def q20SupplierSemiChain(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("%red%")).select("p_partkey")
    val movers = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty")) // integral doubles: exact
      .filter(col("qty") > 100)
      .select("l_suppkey").distinct()
    val sup = Tables.supplier(spark, dir)
    // movers is a post-HAVING distinct key set (bounded by |supplier|)
    // — broadcast it; the static planner can't know the agg output size
    sup.join(broadcast(movers), sup("s_suppkey") === movers("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Double-correlated EXISTS/NOT-EXISTS (TPC-H Q21 shape): suppliers
    * who were the ONLY returning supplier in a multi-supplier finished
    * order. Both correlated subqueries collapse into ONE per-order
    * aggregate (distinct suppliers / distinct returning suppliers) —
    * one extra shuffle instead of two correlated rescans of the fact. */
  def q21SoleReturner(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_returnflag")
    // two-level agg instead of two countDistincts: a double distinct
    // plans an Expand that doubles every fact row before the shuffle;
    // collapsing to (order, supplier) grain first shuffles each pair once
    val perOrder = li
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_r"))
      .groupBy(col("l_orderkey").as("po_orderkey")).agg(
        count(lit(1)).as("n_supp"),
        sum(col("has_r")).as("n_r_supp"))
    val fOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val waiting = li.filter(col("l_returnflag") === "R")
      .join(perOrder.filter(col("n_supp") > 1 && col("n_r_supp") === 1),
        col("l_orderkey") === col("po_orderkey"))
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_suppkey").distinct()
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    waiting.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Pivot (long→wide reshape): order counts by market segment × order
    * status. Spark's `pivot` with explicit values compiles to one
    * hash-agg with conditional buffers — a single scan, no per-column
    * rescans, same plan DuckDB reaches with CASE aggregates. */
  def qPivotSegmentStatus(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    Tables.orders(spark, dir).select("o_custkey", "o_orderstatus")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("c_mktsegment"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("c_mktsegment"))
  }

  /** Running total per customer (order-sensitive window aggregation):
    * cumulative spend over order history. One shuffle on the partition
    * key; the running sum is a single sort-based window pass. */
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    // epoch ordering ≡ o_orderdate ordering (monotone transform), and
    // the epoch column survives the projection below
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_epoch"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 100 === 0) // a deterministic slice keeps output bounded
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"),
        col("o_totalprice"))
      .withColumn("running_spend",
        round(sum(d2(col("o_totalprice"))).over(w).cast("double"), 6))
      .orderBy(col("o_custkey"), col("order_epoch"), col("o_orderkey"))
  }

  /** Set intersection (INTERSECT): customers who ordered in BOTH 1996
    * and 1997. Spark plans a left-semi join over distincts — no row
    * multiplication; the year filters push to both scans. */
  def qRepeatCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def activeIn(from: String, to: String) = ord
      .filter(col("o_orderdate") >= Tables.tsLit(ord, "o_orderdate", from) &&
        col("o_orderdate") < Tables.tsLit(ord, "o_orderdate", to))
      .select("o_custkey")
    activeIn("1996-01-01", "1997-01-01")
      .intersect(activeIn("1997-01-01", "1998-01-01"))
      .orderBy("o_custkey")
  }

  /** EXCEPT set operator (the complement of [[qRepeatCustomers]]'
    * INTERSECT): customers active in 1996 who LAPSED in 1997. Spark
    * plans EXCEPT as a distinct left-anti join — the same
    * shuffle-on-key shape as the semi-join family, no full
    * materialization of either side. */
  def qLapsedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def activeIn(from: String, to: String) = ord
      .filter(col("o_orderdate") >= Tables.tsLit(ord, "o_orderdate", from) &&
        col("o_orderdate") < Tables.tsLit(ord, "o_orderdate", to))
      .select("o_custkey")
    activeIn("1996-01-01", "1997-01-01")
      .except(activeIn("1997-01-01", "1998-01-01"))
      .orderBy("o_custkey")
  }

  /** CUBE aggregation (all 4 grouping sets of priority × status in one
    * pass): Spark plans a single Expand + hash agg — no per-set rescans.
    * Null grouping cells are labeled 'ALL' so the cross-engine compare
    * never sees ambiguous NULL-vs-value rows. */
  def qCubePriorityStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(d2(col("o_totalprice"))).cast("double").as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("priority"), col("status"))

  /** RANGE-framed window (trailing 30-day spend): the frame is bound
    * by VALUE distance on the ordering key, not row count — a
    * different window frame machinery than ROWS (running total). One
    * shuffle on the key, one sort-based window pass. */
  def qTrailingSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_epoch"))
      .rangeBetween(-2592000L, Window.currentRow) // 30 days of seconds
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 100 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"),
        col("o_totalprice"))
      .withColumn("trailing_30d_spend",
        round(sum(d2(col("o_totalprice"))).over(w).cast("double"), 6))
      .orderBy(col("o_custkey"), col("order_epoch"), col("o_orderkey"))
  }

  /** Global deterministic top-k: ORDER BY with unique-key tie-break then
    * LIMIT — Spark plans TakeOrderedAndProject (per-partition heaps, no
    * global sort materialization). */
  def qTopkGlobal(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  /** National market share (TPC-H Q8 shape): NATION_3's slice of PROMO
    * revenue sold into the AMERICA region, by order year. The fact
    * stream (lineitem) joins three broadcast dim chains — part gate,
    * supplier→nation (the share attribution), order→customer→nation→
    * region gate — then one tiny agg computes the conditional-sum
    * ratio. All dims broadcast, so the only shuffle is the final
    * per-year aggregation; exact decimal sums, divided as doubles and
    * rounded. */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
      .select("p_partkey")
    val supNat = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
    val custAmerica = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custAmerica), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        revTerm(col("l_extendedprice"), col("l_discount")).as("volume"),
        col("supp_nation"))
      .groupBy(col("o_year"))
      .agg(round(
        (sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0).cast(DecimalType(38, 6)))).cast("double") /
          sum(col("volume")).cast("double")), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** 2-D skyline (Pareto front) over part: the parts no other part
    * beats on BOTH price (lower is better) and size (higher is
    * better) — the multi-objective shortlist query ("cheapest part at
    * every capability level") that no single ORDER BY can answer.
    * Börzsönyi et al. 2001's SKYLINE operator, expressed as pure
    * window algebra: collapse to the per-price max size, then one
    * running-max window over prices — a row survives iff it carries
    * its price's max size AND that size strictly exceeds every
    * cheaper price's max.
    *
    * Shape at scale: the skyline is DISTRIBUTIVE (skyline(A∪B) =
    * skyline(skyline(A)∪skyline(B))), so the groupBy(price) partial
    * agg does the heavy reduction map-side; the window then runs on
    * the ≤|distinct prices| relation. Never the quadratic NOT-EXISTS
    * self-join. */
  def qSkylinePareto(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val perPrice = p.groupBy(col("p_retailprice"))
      .agg(max(col("p_size")).as("msize"))
    val prevW = Window.orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = perPrice
      .withColumn("prev_max", max(col("msize")).over(prevW))
      .filter(col("prev_max").isNull || col("msize") > col("prev_max"))
    p.join(sky, Seq("p_retailprice"))
      .filter(col("p_size") === col("msize"))
      .select(col("p_partkey"), round(col("p_retailprice"), 2).as("price"),
        col("p_size").cast("long").as("size"))
      .orderBy(col("p_partkey"))
  }

  /** Gini coefficient of customer spend — the single-number
    * inequality readout beside [[qDecileLift]]'s whole curve (and the
    * concentration metric behind "top 10% of customers drive X%").
    * Computed from the rank formula G = (2·Σ r·x − (n+1)·Σx)/(n·Σx)
    * with x ascending; tied spends rank arbitrarily-but-
    * deterministically (custkey tie-break), which leaves G invariant
    * because equal x contribute a rank-sum independent of their
    * order. Σ r·x is EXACT decimal arithmetic — the only float is the
    * final division.
    *
    * Shape at scale: the rank window orders the per-customer
    * AGGREGATE (|customers| rows, the [[qNtileDeciles]] argument); at
    * extreme cardinality the rank comes from a distributed sort,
    * which Spark's window already range-partitions. Output: 1 row. */
  def qGiniSpend(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(d2(col("o_totalprice"))) * 100).cast("long").as("cents"))
    val ranked = spend.withColumn("rk",
      row_number().over(Window.orderBy(col("cents"), col("o_custkey"))).cast("long"))
    ranked.agg(count(lit(1)).as("n"),
        sum(col("cents").cast(DecimalType(38, 0))).as("tot"),
        sum((col("rk") * col("cents")).cast(DecimalType(38, 0))).as("rx"))
      .select(col("n").as("n_customers"),
        round(col("tot").cast("double") / 100.0, 2).as("total_spend"),
        round((lit(2).cast(DecimalType(38, 0)) * col("rx") -
          (col("n") + 1).cast(DecimalType(38, 0)) * col("tot")).cast("double") /
          (col("n").cast("double") * col("tot").cast("double")), 6)
          .as("gini"))
  }

  /** First-order Markov transition matrix over each user's event
    * sequence — the behavioral-flow model behind Sankey "user journey"
    * dashboards and next-event prediction baselines: for every
    * (from, to) event-type pair, the transition count and the
    * row-normalized probability P(to | from).
    *
    * Shape at scale: ONE lag window per user (hash exchange on
    * user_id — the event stream's natural key, no global order), then
    * a ≤|types|²-group agg with map-side combine; the per-from totals
    * come from a window over that tiny matrix, not a second scan. */
  def qMarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val m = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    m.withColumn("prob",
        round(col("n_transitions") /
          sum(col("n_transitions")).over(Window.partitionBy(col("from_type")))
            .cast("double"), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Daily actives split into new vs returning users — the growth
    * dashboard's first chart (is today's traffic acquisition or
    * retention?), and the cohort-zero diagonal of
    * [[qCohortRetention]]'s triangle as a time series. A user is new
    * on their first-seen day, returning after.
    *
    * Shape at scale: dedup to (user, day) grain first (the
    * [[qCohortRetention]] trick — count(*) then IS distinct users),
    * per-user min-day reuses the same hash partitioning, and the
    * final relation is |days| rows. */
  def qNewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .distinct()
    val first = u.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    u.join(first, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"))
      .select(col("day"), col("dau"), col("new_users"),
        (col("dau") - col("new_users")).as("returning_users"),
        round(col("new_users") / col("dau").cast("double"), 6).as("new_frac"))
      .orderBy(col("day"))
  }

  /** Per-brand discount↔quantity correlation — the promo-elasticity
    * screen ("do discounts actually move volume for this brand?") a
    * category manager reads before repricing; Pearson r over the
    * joined fact, computed per brand.
    *
    * Shape at scale: the part dim broadcasts (it always does here),
    * corr is a map-side-combinable moment aggregate — one scan, one
    * ≤|brands|-group shuffle.
    *
    * Precision ceiling: Spark's corr is a Welford-style central
    * co-moment (shift-invariant, no catastrophic cancellation); its
    * merge order varies run to run, so the 6-dp output is only
    * reproducible while the accumulated double error ~√n·2⁻⁵³·κ stays
    * below 5·10⁻⁷ — safe past 10¹² rows/brand unless |r| → 1 (κ blows
    * up); at that scale the exact-decimal moment form (qSpearmanCorr's
    * staging) is the swap. */
  def qDiscountQuantityCorr(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_discount"), col("l_quantity"))
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        round(corr(col("l_discount"), col("l_quantity")), 6).as("corr_disc_qty"))
      .orderBy(col("p_brand"))

  /** Welch's unequal-variance t-test between two user cohorts'
    * purchase values (even vs odd user_id — the deterministic stand-in
    * for an A/B assignment): per-arm n/mean/variance, the t statistic,
    * and the Welch–Satterthwaite degrees of freedom. The experiment
    * readout a growth team runs over the same events the ETL loads;
    * moments are computed from Σx/Σx² so the whole test is ONE
    * map-side-combinable aggregation pass — no per-arm rescans, no
    * variance() two-pass.
    *
    * Shape at scale: single scan → 2-group agg → 1-row pivot; the
    * arithmetic after the agg touches two rows.
    *
    * Precision ceiling: Σx (DECIMAL(28,2)) and Σx² (DECIMAL(38,4))
    * stay exact past 10²⁰ rows; every double after the agg is a
    * FIXED-ORDER scalar expression over those exact inputs, so the
    * result is bit-deterministic cross-engine at any n — the only
    * large-n cost is statistical: the one-pass variance
    * (Σx² − (Σx)²/n) loses ~log₁₀(n·mean²/σ²) − 15.9 digits to
    * cancellation, which erodes the 6-dp var columns once
    * n·mean²/σ² ≳ 10¹⁰ (≈10⁹ rows at this data's mean/σ ≈ 3). */
  def qWelchTtest(spark: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("long").as("arm"), d2(col("value")).as("x"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(col("arm"), col("n"), (col("sx") / col("n")).as("mean"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("v"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("mean").as("m_a"), col("v").as("v_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("mean").as("m_b"), col("v").as("v_b"))
    a.crossJoin(b)
      .withColumn("se2", col("v_a") / col("n_a") + col("v_b") / col("n_b"))
      .select(col("n_a").cast("long").as("n_a"), round(col("m_a"), 6).as("mean_a"),
        round(col("v_a"), 6).as("var_a"),
        col("n_b").cast("long").as("n_b"), round(col("m_b"), 6).as("mean_b"),
        round(col("v_b"), 6).as("var_b"),
        round((col("m_a") - col("m_b")) / sqrt(col("se2")), 6).as("t_stat"),
        round(col("se2") * col("se2") /
          (col("v_a") * col("v_a") / (col("n_a") * col("n_a") * (col("n_a") - 1)) +
           col("v_b") * col("v_b") / (col("n_b") * col("n_b") * (col("n_b") - 1))), 6)
          .as("welch_df"))
  }

  /** RFM segmentation (recency / frequency / monetary quintiles) —
    * the classic CRM customer grid: per customer the last-order day,
    * order count, and exact-decimal lifetime spend, each scored into
    * quintiles by ntile(5) with a custkey tie-break (ties are why a
    * bare ntile isn't engine-portable), then rolled up per (r,f,m)
    * cell with the cell's customer count and mean spend.
    *
    * Shape at scale: the per-customer agg shuffles the fact once on
    * custkey; the ntile windows rank the CUSTOMER-grain table (a dim,
    * orders of magnitude below the fact) — the global sort is over
    * |customers| rows, and a 100-TB deploy would swap it for
    * approx-quantile boundaries at identical downstream shape. The
    * output is ≤125 cells. */
  def qRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val rfm = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        // epoch DAY via datediff: timezone-independent for the
        // date-valued order stamp (unix_timestamp localizes NTZ input
        // through the session zone — only matched the UTC oracle
        // because every entry point pins UTC)
        expr("CAST(datediff(o_orderdate, DATE'1970-01-01') AS BIGINT)").as("day"),
        d2(col("o_totalprice")).as("price"))
      .groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
        sum(col("price")).as("monetary"))
    val wr = Window.orderBy(col("last_day"), col("o_custkey"))
    val wf = Window.orderBy(col("freq"), col("o_custkey"))
    val wm = Window.orderBy(col("monetary"), col("o_custkey"))
    rfm.select(
        ntile(5).over(wr).cast("long").as("r_bucket"),
        ntile(5).over(wf).cast("long").as("f_bucket"),
        ntile(5).over(wm).cast("long").as("m_bucket"),
        col("monetary"))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_customers"), sum(col("monetary")).as("mon_sum"))
      // ADVICE r8: never divide DECIMALs across engines — and per the
      // r9 mm_audio_energy lesson, double division can still TIE at
      // the 6th digit. The mean is the exact rational cents/(100·n):
      // 6-dp half-up via integer (2·S·10⁴+n) div (2n) is tie-free.
      .select(col("r_bucket"), col("f_bucket"), col("m_bucket"),
        col("n_customers"),
        expr("CAST((2 * CAST(mon_sum * 100 AS BIGINT) * 10000 + n_customers) " +
          "div (2 * n_customers) AS DOUBLE) / 1000000.0").as("mean_monetary"))
      .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
  }

  /** ABC (Pareto) inventory classification: parts ranked by exact-
    * decimal revenue, class A while the cumulative share is ≤70%, B
    * to 90%, C after — the stock-policy split every inventory planner
    * draws first. Class boundaries are decided by the EXACT decimal
    * comparison cum·10 ≤ total·7 (never a float share), so the cut is
    * identical in both engines.
    *
    * Shape at scale: revenue per part is one fact-scan agg on
    * partkey; the cumulative window sorts the PART-grain table (a
    * dim); the class rollup is 3 rows. */
  def qAbcClass(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).as("rev"))
    val w = Window.orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rev.agg(sum(col("rev")).as("total"))
    rev.withColumn("cum", sum(col("rev")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(col("cum") * 10 <= col("total") * 7, "A")
          .when(col("cum") * 10 <= col("total") * 9, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("rev")).cast("double"), 2).as("class_rev"),
        sum(col("rev")).as("crev"), first(col("total")).as("tot"))
      // ADVICE r8: the share is the exact rational crev/total (both
      // scale-6 DECIMALs); 6-dp half-up in exact integer arithmetic —
      // micro-units can exceed long range, so stage through DECIMAL(38,0)
      .select(col("abc_class"), col("n_parts"), col("class_rev"),
        expr("CAST((2 * CAST(crev * 1000000 AS DECIMAL(38,0)) * 1000000 " +
          " + CAST(tot * 1000000 AS DECIMAL(38,0))) " +
          "div (2 * CAST(tot * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0")
          .as("rev_share"))
      .orderBy(col("abc_class"))
  }

  /** Mann–Whitney U rank-sum test (tie-corrected normal
    * approximation) between BUILDING and MACHINERY customers' order
    * totals — the nonparametric sibling of [[qWelchTtest]], the test
    * actually used when spend distributions are heavy-tailed. Average
    * ranks come from avg(row_number) per distinct value, which is
    * deterministic under ties AND exactly representable (half-integer
    * doubles); the rank SUMS and the tie correction Σ(t³−t) are staged
    * through DECIMAL(38,0) (r12), so both are exact integers/
    * half-integers at any corpus this engine will see, and every
    * double downstream is a fixed-order scalar expression —
    * bit-identical across engines.
    *
    * Shape at scale: one fact scan (customer dim broadcast), a global
    * rank over the filtered two-arm subset (the test's definition —
    * at 100 TB the rank assignment would shard by value range with
    * offset reconstruction, same downstream algebra), then two tiny
    * aggs and a 1-row combine.
    *
    * Precision ceiling: DECIMAL(38,0) holds Σ(2·ar) ≈ n² to n ≈ 10¹⁹
    * rows and Σt³ to max-tie ≈ 4·10¹² copies; the remaining double
    * terms (n_a·(n_a+1)/2 in u_a) pass 2^53 at n_a ≈ 10⁸ but stay
    * fixed-order-deterministic — only the test's own normal
    * approximation quality degrades, never the cross-engine match. */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val pooled = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(when(col("c_mktsegment") === "BUILDING", 0L).otherwise(1L).as("arm"),
        col("o_totalprice").as("x"), col("o_orderkey"))
    val wAll = Window.orderBy(col("x"), col("o_orderkey"))
    val byX = Window.partitionBy(col("x"))
    val ranked = pooled
      .withColumn("rn", row_number().over(wAll))
      .withColumn("ar", avg(col("rn")).over(byX))
    val arms = ranked.groupBy(col("arm"))
      // rank sums staged exact: ar is a half-integer, so 2·ar is an
      // exact integer — summed in DECIMAL(38,0) (a double Σar loses
      // exactness once Σ ≈ n²/2 crosses 2^53, n ≈ 1.3·10⁸ rows, and a
      // distributed double sum is merge-order-nondeterministic past
      // that); halved and cast once at the end (deterministic)
      .agg(count(lit(1)).cast("double").as("n"),
        (sum(expr("CAST(2 * ar AS DECIMAL(38,0))")) / 2).cast("double").as("r"))
    val ties = pooled.groupBy(col("x"))
      .agg(count(lit(1)).as("t"))
      // t³ staged through DECIMAL(38,0): long t*t*t wraps silently at
      // t > 2²¹ ≈ 2.1M copies of one value, and Σ(t³−t) wraps long at
      // 9.2·10¹⁸ — both reachable under value skew at sf1000
      .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t"))
        .cast("double").as("tie_term"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("r").as("r_a"))
    val b = arms.filter(col("arm") === 1).select(col("n").as("n_b"))
    a.crossJoin(b).crossJoin(broadcast(ties))
      .withColumn("nn", col("n_a") + col("n_b"))
      .withColumn("u_a", col("r_a") - col("n_a") * (col("n_a") + 1) / 2)
      .withColumn("sigma2",
        col("n_a") * col("n_b") / 12 *
          ((col("nn") + 1) - col("tie_term") / (col("nn") * (col("nn") - 1))))
      .select(col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        round(col("r_a"), 2).as("rank_sum_a"),
        round(col("u_a"), 2).as("u_stat"),
        round((col("u_a") - col("n_a") * col("n_b") / 2) / sqrt(col("sigma2")), 6)
          .as("z_score"))
  }

  /** Chi-squared test of independence between customer market segment
    * and order priority (is priority assignment uniform across
    * segments?) with Cramér's V effect size — the categorical
    * association audit beside [[qWelchTtest]] (means) and
    * [[qMannWhitney]] (ranks). Per-cell contributions
    * (obs−exp)²/exp are rounded to 9 dp and summed as DECIMAL so the
    * statistic is addition-order-independent across engines.
    *
    * Shape at scale: ONE fact-scan agg into the ≤|segments|·|priorities|
    * contingency table; margins, expecteds, and the statistic all live
    * on that tiny relation (windows over ≤35 rows).
    *
    * Precision ceiling: the margin product rt·ct is staged through
    * DECIMAL(38,0) (r12 — as a long product it wrapped silently past
    * n ≈ 1.8·10¹⁰ rows for this table's 5×7 margins); the DECIMAL(28,9)
    * contribution sum holds χ² to 10¹⁹, so the statistic is exact-input
    * deterministic at any reachable n. */
  def qChi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("o"))
    val wRow = Window.partitionBy(col("c_mktsegment"))
    val wCol = Window.partitionBy(col("o_orderpriority"))
    val wAll = Window.partitionBy()
    obs
      .withColumn("rt", sum(col("o")).over(wRow))
      .withColumn("ct", sum(col("o")).over(wCol))
      .withColumn("n", sum(col("o")).over(wAll))
      // rt·ct staged through DECIMAL(38,0): the long product wraps
      // silently past rt·ct ≈ 9.2·10¹⁸, i.e. n ≈ 1.8·10¹⁰ orders for
      // this table's ~5×7 margins — inside a 100-TB deploy's range
      .withColumn("e", (col("rt").cast(DecimalType(38, 0)) * col("ct"))
        .cast("double") / col("n").cast("double"))
      .withColumn("contrib",
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 9)
          .cast(DecimalType(18, 9)))
      .agg(countDistinct(col("c_mktsegment")).as("r"),
        countDistinct(col("o_orderpriority")).as("c"),
        first(col("n")).as("n"), sum(col("contrib")).as("chi2d"))
      .select(
        round(col("chi2d").cast("double"), 6).as("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        col("n").as("n"),
        round(sqrt(col("chi2d").cast("double") /
          (col("n") * least(col("r") - 1, col("c") - 1)).cast("double")), 6)
          .as("cramers_v"))
  }

  /** Per-segment spend distribution bands: exact interpolated
    * p25/p50/p75/p90 of order totals per market segment — the
    * "where does a typical BUILDING order sit" table a pricing
    * analyst reads before [[qNtileDeciles]]' per-customer cut.
    *
    * Shape at scale: customer dim broadcast onto the fact, one
    * |segments|-group agg; `percentile` is exact here (the grouped
    * sort is per-segment), and the 100-TB swap is the binned quantile
    * sketch ([[qQuantileSketch]]) at identical output shape. */
  def qPercentileBands(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.25D)"), 6).as("p25"),
        round(expr("percentile(o_totalprice, 0.5D)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.75D)"), 6).as("p75"),
        round(expr("percentile(o_totalprice, 0.9D)"), 6).as("p90"))
      .orderBy(col("c_mktsegment"))

  /** Priority-mix drift: per order priority, the OLS slope of its
    * monthly order share over time — is URGENT quietly growing? The
    * mix-shift monitor behind capacity planning. The regression is
    * computed from Σx/Σy/Σxy/Σx² where x is the integer month index
    * and y the 6-dp-rounded share held as DECIMAL, so the slope is
    * exact integer/decimal arithmetic — no float moment accumulation,
    * no addition-order dependence.
    *
    * Shape at scale: one fact-scan agg into the |months|·|priorities|
    * grid; everything after lives on that tiny relation. */
  def qPriorityTrend(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate")))
          .cast("long").as("month_sec"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
    val wTot = Window.partitionBy(col("month_sec"))
    val wIdx = Window.orderBy(col("month_sec"))
    val grid = m
      .withColumn("mt", sum(col("c")).over(wTot))
      .withColumn("mi", dense_rank().over(wIdx).cast("long"))
      .withColumn("share",
        round(col("c") / col("mt").cast("double"), 6).cast(DecimalType(18, 6)))
    grid.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_months"),
        sum(col("mi")).as("sx"), sum(col("share")).as("sy"),
        sum(col("mi") * col("share")).as("sxy"),
        sum(col("mi") * col("mi")).as("sxx"))
      .select(col("o_orderpriority"), col("n_months"),
        round((col("sy") / col("n_months")).cast("double"), 6).as("mean_share"),
        round(((col("n_months") * col("sxy") - col("sx") * col("sy")) /
          (col("n_months") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .cast("double"), 9).as("share_slope"))
      .orderBy(col("o_orderpriority"))
  }

  /** Grouped top-N through the full dimension chain: the 3
    * highest-revenue parts per REGION (exact decimal revenue) — the
    * per-market bestseller board, and the canonical
    * window-over-join-chain benchmark shape ([[q2MinWithinGroup]]'s
    * top-N generalization).
    *
    * Shape at scale: all dims broadcast (region→nation→customer is
    * dim-sized), ONE fact shuffle into the (region, part) agg, then
    * the rank window runs per region over the part-grain table. */
  def qRegionTopParts(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("l_partkey"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).as("rev"))
    val w = Window.partitionBy(col("r_name"))
      .orderBy(col("rev").desc, col("l_partkey"))
    rev.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("r_name"), col("l_partkey"),
        round(col("rev").cast("double"), 2).as("revenue"), col("rk"))
      .orderBy(col("r_name"), col("rk"))
  }

  /** Year-over-year monthly revenue growth — the seasonality-free
    * growth readout every revenue dashboard leads with (month vs the
    * SAME month last year, so holiday peaks compare to holiday
    * peaks). Months key on the integer year·12+month index, so the
    * YoY join is exact integer arithmetic; revenue is the exact
    * decimal sum.
    *
    * Shape at scale: one fact-scan agg into the |months|-row table,
    * then a self-join on mi−12 over that tiny relation. */
  def qYoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mi"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(sum(d2(col("o_totalprice"))).as("rev"))
    m.as("cur").join(
        m.select(col("mi").as("pmi"), col("rev").as("prev_rev")).as("prev"),
        col("cur.mi") === col("pmi") + 12)
      .select(col("yr"), col("mo"),
        round(col("rev").cast("double"), 2).as("revenue"),
        round(col("prev_rev").cast("double"), 2).as("prev_revenue"),
        // the ratio divides DOUBLES (exact decimal division rounds by
        // engine-specific scale rules; IEEE division is portable)
        round((col("rev").cast("double") - col("prev_rev").cast("double")) /
          col("prev_rev").cast("double"), 6).as("yoy_growth"))
      .orderBy(col("yr"), col("mo"))
  }

  /** Cohort lifetime value: customers grouped by first-order month,
    * cumulative revenue PER COHORT CUSTOMER at each month offset —
    * the LTV triangle finance reads next to [[qCohortRetention]]'s
    * activity triangle (retention says they came back; this says
    * what that was worth). Revenue accumulates as exact DECIMAL down
    * the offset axis; only the final per-customer division goes to
    * double.
    *
    * Shape at scale: per-customer first-month agg reuses the
    * custkey partitioning of the revenue agg; the cumulative window
    * runs per cohort over the ≤|months|²-row triangle, never the
    * fact. */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mi"),
        d2(col("o_totalprice")).as("price"))
    val cohort = o.groupBy(col("o_custkey")).agg(min(col("mi")).as("cohort_mi"))
    val sizes = cohort.groupBy(col("cohort_mi")).agg(count(lit(1)).as("n_customers"))
    val cell = o.join(cohort, "o_custkey")
      .groupBy(col("cohort_mi"), (col("mi") - col("cohort_mi")).as("month_offset"))
      .agg(sum(col("price")).as("rev"))
    val w = Window.partitionBy(col("cohort_mi")).orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell.withColumn("cum_rev", sum(col("rev")).over(w))
      .join(broadcast(sizes), Seq("cohort_mi"))
      .select(col("cohort_mi"), col("month_offset"), col("n_customers"),
        round(col("cum_rev").cast("double"), 2).as("cum_revenue"),
        round(col("cum_rev").cast("double") / col("n_customers"), 6)
          .as("ltv_per_customer"))
      .orderBy(col("cohort_mi"), col("month_offset"))
  }

  /** Repeat-purchase cadence: the profile of day gaps between a
    * customer's consecutive orders (count/mean/exact p50/p90/max) —
    * the replenishment-cycle constant that calibrates
    * [[qLapsedCustomers]]' inactivity threshold, measured instead of
    * guessed ([[graft.etl.EventsEtl.interArrival]]'s order-grain
    * sibling).
    *
    * Shape at scale: one lag window per customer (no global sort),
    * one global agg; percentile → binned sketch at 100 TB. */
  def qReorderGap(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        // tz-independent epoch day (see qRfmSegments)
        expr("CAST(datediff(o_orderdate, DATE'1970-01-01') AS BIGINT)").as("day"))
      .withColumn("prev", lag(col("day"), 1).over(byCust))
      .filter(col("prev").isNotNull)
      .withColumn("gap_days", col("day") - col("prev"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_days")), 6).as("mean_gap_days"),
        round(expr("percentile(gap_days, 0.5D)"), 6).as("p50_gap_days"),
        round(expr("percentile(gap_days, 0.9D)"), 6).as("p90_gap_days"),
        max(col("gap_days")).as("max_gap_days"))
  }

  /** Herfindahl–Hirschman supplier-concentration index per nation:
    * HHI = Σᵢ shareᵢ² over each nation's suppliers' revenue shares —
    * the antitrust-style concentration number that says whether a
    * nation's supply base is a monopoly (→1) or fragmented (→0),
    * the squared-share sibling of [[qGiniSpend]]. Computed as the
    * exact rational Σcᵢ²/(Σcᵢ)² in integer cents (DECIMAL(38,0)
    * accumulators — cᵢ² at 100 TB exceeds BIGINT), rounded 6-dp with
    * the tie-free (2·num·10⁶+den) div (2·den) rule.
    *
    * Shape at scale: one fact-scan agg on suppkey (map-side partials),
    * then nation-grain sums over the |suppliers| rows — the squares
    * and the total both come from the same supplier-grain table, no
    * second fact pass; nation dim broadcasts. */
  def qHhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    val supRev = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).as("rev"))
      // exact integer micro-units (rev is scale-6: ×10⁶ is lossless;
      // ×100 would round) as DECIMAL(38,0) so the squares stay exact
      .withColumn("c", expr("CAST(rev * 1000000 AS DECIMAL(38,0))"))
    supRev
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("c") * col("c")).as("s2"), sum(col("c")).as("t"))
      .select(col("n_name"), col("n_suppliers"),
        round(col("t").cast("double") / 1000000.0, 2).as("total_rev"),
        expr("""CAST((2 * s2 * 1000000 + t * t) div (2 * t * t) AS DOUBLE)
               / 1000000.0""").as("hhi"))
      .orderBy(col("n_name"))
  }

  /** Year-over-year spend-quintile migration matrix: each customer's
    * annual spend is bucketed into within-year quintiles (ntile over
    * (spend, custkey) — total order, engine-identical), and every
    * consecutive-year pair contributes one (from_quintile →
    * to_quintile) transition; customers absent the following year
    * migrate to bucket 0 ("churned"). The 5×6 matrix is the segment
    * half-life picture behind [[qRfmSegments]] — not where customers
    * ARE but how fast they MOVE.
    *
    * Shape at scale: one fact agg to (custkey, year) grain, ntile
    * windows PARTITIONED BY year over that dim-grain table (|C| rows
    * per partition — approx-quantile bucketing at 100 TB, same note
    * as [[qRfmSegments]]), one self-join on (custkey, year+1), and a
    * ≤30-group agg. */
  def qBucketMigration(spark: SparkSession, dir: String): DataFrame = {
    val yearly = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(d2(col("o_totalprice"))).as("spend"))
    val wq = Window.partitionBy(col("yr")).orderBy(col("spend"), col("o_custkey"))
    val q = graft.Caches.persistTracked(
      yearly.select(col("o_custkey"), col("yr"),
        ntile(5).over(wq).cast("long").as("bucket")))
    q.count()
    q.as("a").join(q.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("b.yr") === col("a.yr") + 1, "left")
      // customers in the LAST observed year have no "next year" to
      // migrate into; drop that frontier, keep true churn
      .join(broadcast(q.agg(max(col("yr")).as("max_yr"))),
        col("a.yr") < col("max_yr"))
      .groupBy(col("a.bucket").as("from_bucket"),
        coalesce(col("b.bucket"), lit(0L)).as("to_bucket"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("from_bucket"), col("to_bucket"))
  }

  /** Top-15 part-level YoY revenue growers: [[qYoyGrowth]] says THAT
    * the business grew; this says WHICH parts drove it. Per (part,
    * year) exact-decimal revenue, lag along the year axis per part,
    * growth = (rev − prev)/prev as an exact micro-unit rational with
    * the tie-free 6-dp rounding; top-15 by (growth, part, year) so the
    * cut is a total order.
    *
    * Shape at scale: one fact agg to (part, year) grain (map-side
    * partials), ONE lag window partitioned by part over that dim×|years|
    * table, TakeOrdered top-k — no global sort of anything fact-sized. */
  def qPartGrowthTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey")).orderBy(col("yr"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(revTerm(col("l_extendedprice"), col("l_discount"))).as("rev"))
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .withColumn("prev_yr", lag(col("yr"), 1).over(w))
      .filter(col("prev").isNotNull && col("yr") - col("prev_yr") === 1)
      // growth can be NEGATIVE: integer div is truncate-toward-zero in
      // Spark but floor in DuckDB, so the tie-free formula runs on the
      // magnitude and the sign is reapplied (half-away-from-zero —
      // identical in both engines)
      .withColumn("n6", expr("CAST((rev - prev) * 1000000 AS DECIMAL(38,0))"))
      .withColumn("d6", expr("CAST(prev * 1000000 AS DECIMAL(38,0))"))
      .select(col("l_partkey"), col("yr"),
        round(col("rev").cast("double"), 2).as("revenue"),
        round(col("prev").cast("double"), 2).as("prev_revenue"),
        expr("""CAST(CASE WHEN n6 >= 0
                 THEN (2 * n6 * 1000000 + d6) div (2 * d6)
                 ELSE -((2 * (-n6) * 1000000 + d6) div (2 * d6)) END
               AS DOUBLE) / 1000000.0""").as("growth"))
      .orderBy(col("growth").desc, col("l_partkey"), col("yr"))
      .limit(15)
  }

  /** One-way ANOVA across the 7 weekdays of order totals — "does the
    * day of the week move the basket?" — the k-group generalization
    * of [[qWelchTtest]]'s two arms. Weekday is the portable integer
    * `epoch_day mod 7` (calendar-function week-start conventions
    * differ across engines; integer day arithmetic doesn't). The
    * float discipline is the [[graft.ops.Similarity]] embed_abtt
    * "wide single-row agg" trick: the 7 groups pivot into ONE row of
    * exact-decimal (n, Σx, Σx²) columns, so every double in the F
    * statistic is computed by the SAME fixed-order scalar expression
    * in both engines — no engine-dependent float summation order
    * exists anywhere in the plan.
    *
    * Shape at scale: one conditional-aggregation pass over the fact
    * (map-side partials, 21 exact-decimal accumulators), then scalar
    * math on a single row.
    *
    * Precision ceiling: the 21 decimal accumulators stay exact past
    * 10²⁰ rows, and the F/SS doubles are one fixed-order scalar
    * expression over them — bit-deterministic cross-engine at any n;
    * statistically, SS_between = Σ(sx_d²/n_d) − (Σsx)²/n cancels like
    * qWelchTtest's variance (~log₁₀(n·mean²/σ²) − 15.9 digits lost),
    * meaningful for the 6-dp SS columns past n ≈ 10⁹ rows. */
  def qWeekdayAnova(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(
        // tz-independent epoch weekday (see qRfmSegments)
        expr("CAST(datediff(o_orderdate, DATE'1970-01-01') % 7 AS BIGINT)").as("dow"),
        d2(col("o_totalprice")).as("x"))
    val accs = (0 until 7).flatMap { d =>
      Seq(
        sum(when(col("dow") === d, 1L).otherwise(0L)).as(s"n$d"),
        sum(when(col("dow") === d, col("x"))).as(s"sx$d"),
        sum(when(col("dow") === d, col("x") * col("x"))).as(s"sxx$d"))
    }
    val wide = base.agg(accs.head, accs.tail: _*)
    val n = (0 until 7).map(d => s"CAST(n$d AS DOUBLE)").mkString(" + ")
    val sx = (0 until 7).map(d => s"CAST(sx$d AS DOUBLE)").mkString(" + ")
    val sxx = (0 until 7).map(d => s"CAST(sxx$d AS DOUBLE)").mkString(" + ")
    val ssbTerms = (0 until 7)
      .map(d => s"CAST(sx$d AS DOUBLE) * CAST(sx$d AS DOUBLE) / CAST(n$d AS DOUBLE)")
      .mkString(" + ")
    wide.select(
        lit(7L).as("k_groups"),
        expr(s"CAST($n AS BIGINT)").as("n_total"),
        expr(s"round(($ssbTerms) - ($sx) * ($sx) / ($n), 6)").as("ss_between"),
        expr(s"round(($sxx) - ($ssbTerms), 6)").as("ss_within"),
        expr(s"""round(((($ssbTerms) - ($sx) * ($sx) / ($n)) / 6.0)
               / ((($sxx) - ($ssbTerms)) / (($n) - 7.0)), 6)""").as("f_stat"),
        expr(s"""round((($ssbTerms) - ($sx) * ($sx) / ($n))
               / (($sxx) - ($sx) * ($sx) / ($n)), 6)""").as("eta_sq"))
  }

  /** Classical seasonal decomposition of monthly revenue (STL-lite):
    * revenue = trend (centered 13-month moving mean) + seasonal
    * (month-of-year mean of the detrended series) + residual — the
    * decomposition behind "was December big, or is December always
    * big?". EVERY stage is exact-integer: the trend is the rational
    * Σ₁₃/13 in micro-units with tie-free rounding, detrended =
    * exact − trend in integers, the seasonal mean is sign-split
    * half-away-from-zero over integer micro-units — no float
    * accumulates anywhere, so both engines agree bit-for-bit.
    *
    * Shape at scale: one fact agg to the |months|-row grain; the
    * moving window and the month-of-year agg run on that tiny table
    * (documented dim-grain global window); output only months with a
    * full 13-month window. */
  def qSeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(expr("(year(o_orderdate) * 12 + month(o_orderdate))")
        .cast("long").as("mi"))
      .agg(sum(d2(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("mi")).rowsBetween(-6, 6)
    val trended = monthly
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum6", sum(expr("CAST(rev * 1000000 AS DECIMAL(38,0))")).over(w))
      .filter(col("win_n") === 13)
      .withColumn("t6", expr("(2 * win_sum6 + 13) div 26"))
      .withColumn("d6", expr("CAST(rev * 1000000 AS DECIMAL(38,0)) - t6"))
    val seasonal = trended
      .groupBy((col("mi") % 12).as("moy"))
      .agg(sum(col("d6")).as("sd6"), count(lit(1)).as("nm"))
      .select(col("moy"),
        expr("""CASE WHEN sd6 >= 0 THEN (2 * sd6 + nm) div (2 * nm)
               ELSE -((2 * (-sd6) + nm) div (2 * nm)) END""").as("s6"))
    trended.join(broadcast(seasonal), (col("mi") % 12) === col("moy"))
      .select(col("mi").as("month_index"),
        round(col("rev").cast("double"), 2).as("revenue"),
        (col("t6").cast("double") / 1e6).as("trend"),
        (col("s6").cast("double") / 1e6).as("seasonal"),
        ((col("d6") - col("s6")).cast("double") / 1e6).as("residual"))
      .orderBy(col("month_index"))
  }

  /** Lorenz curve of customer spend at decile resolution — the curve
    * [[qGiniSpend]] integrates: customers ranked ascending by exact
    * lifetime spend (custkey tie-break — a total order), decile =
    * ntile(10), per decile the customer count, spend, spend share and
    * CUMULATIVE share — "the bottom 50% hold 18% of revenue" read off
    * directly. Shares are exact micro-unit rationals with tie-free
    * rounding; the cumulative sum runs over the 10-row decile table
    * in exact integers before the one division.
    *
    * Shape at scale: one fact agg to customer grain, one dim-grain
    * ntile window (documented approx-quantile swap at 100 TB), a
    * 10-row rollup + 10-row running sum. */
  def qLorenzDeciles(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(d2(col("o_totalprice"))).as("spend"))
    val w = Window.orderBy(col("spend"), col("o_custkey"))
    val dec = spend
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("CAST(spend * 1000000 AS DECIMAL(38,0))")).as("s6"))
    val wc = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("c6", sum(col("s6")).over(wc))
      .crossJoin(broadcast(dec.agg(sum(col("s6")).as("t6"))))
      .select(col("decile"), col("n_customers"),
        round(col("s6").cast("double") / 1e6, 2).as("spend"),
        expr("""CAST((2 * s6 * 1000000 + t6) div (2 * t6) AS DOUBLE)
               / 1000000.0""").as("spend_share"),
        expr("""CAST((2 * c6 * 1000000 + t6) div (2 * t6) AS DOUBLE)
               / 1000000.0""").as("cum_share"))
      .orderBy(col("decile"))
  }

  /** Two-sample Kolmogorov–Smirnov test on order totals between the
    * BUILDING and MACHINERY market segments — the distribution-shift
    * detector behind "did this cohort's spend distribution actually
    * move, or just its mean" (the nonparametric sibling of
    * [[qWelchTtest]]). D = max |F₁(x) − F₂(x)| is computed entirely
    * in integers: at each distinct total, the CDF gap is
    * |c₁·n₂ − c₂·n₁| over the common denominator n₁·n₂, the max is
    * taken on that integer numerator, and the one division is rounded
    * tie-free ((2·num·10⁶+den) div (2·den) — non-negative operands,
    * so the formula is safe without a sign split). The scaled
    * statistic √(n₁n₂/(n₁+n₂))·D follows as one IEEE sqrt·ratio.
    *
    * Shape at scale: the fact scan reduces to distinct-value grain
    * (one hash-agg), and the CDF walk is a single ordered cumsum over
    * that grain — the documented 100 TB swap is a per-segment quantile
    * sketch compared at fixed probe points (the [[qQuantileSketch]]
    * machinery) at identical output shape. */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), d2(col("o_totalprice")).as("v"))
    val byVal = seg.groupBy(col("v"))
      .agg(sum(when(col("seg") === "BUILDING", 1L).otherwise(0L)).as("d1"),
        sum(when(col("seg") === "MACHINERY", 1L).otherwise(0L)).as("d2"))
    val wCdf = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    // every cross-product stages through DECIMAL(38,0): c1·n2 runs up
    // to n1·n2 (~4.6e12 rows² wraps a long around sf500) and the
    // rounding numerator 2·dnum·10⁶ wraps even earlier, while the
    // DuckDB oracle computes the same formula in HUGEINT — long math
    // here would be a silent cross-engine divergence at scale (the
    // qLorenzDeciles micro-unit discipline, applied to counts)
    byVal
      .withColumn("c1", sum(col("d1")).over(wCdf).cast(DecimalType(38, 0)))
      .withColumn("c2", sum(col("d2")).over(wCdf).cast(DecimalType(38, 0)))
      .withColumn("n1", sum(col("d1")).over(wAll).cast(DecimalType(38, 0)))
      .withColumn("n2", sum(col("d2")).over(wAll).cast(DecimalType(38, 0)))
      .agg(max(col("n1")).as("n1d"), max(col("n2")).as("n2d"),
        max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("dnum"))
      .select(col("n1d").cast("long").as("n1"), col("n2d").cast("long").as("n2"),
        expr("""CAST((2 * dnum * 1000000 + n1d * n2d) div (2 * n1d * n2d) AS DOUBLE)
               / 1000000.0""").as("ks_d"),
        round(sqrt(col("n1d").cast("double") * col("n2d").cast("double") /
            (col("n1d") + col("n2d")).cast("double")) *
          (col("dnum").cast("double") /
            (col("n1d").cast("double") * col("n2d").cast("double"))), 6)
          .as("ks_scaled"))
  }

  /** Distributed exact average-rank over a VALUE-GRAIN relation
    * (v, cnt): 2·avgrank(v) = 2·cntLess(v) + cnt(v) + 1.
    *
    * Size-gated hybrid (the [[graft.ops.Dedup.connectedComponents]]
    * discipline): under `windowMaxRows` distinct values, one ordered
    * cumsum window over the grain — a single task sorting ≤4M tiny
    * (v, cnt) rows, which measures ~100× cheaper than the distributed
    * machinery's fixed overhead at small SF. Past the gate, the
    * scale path: range-partition on v, per-partition running sums
    * (the window partitions by the physical partition id, so every
    * sort is task-local), then each partition's rows shift by the
    * broadcast running total of the partitions before it; the one
    * global window left runs over the #partitions-row offset
    * relation. localCheckpoint pins the partition ids: the offset agg
    * and the final join must read the SAME materialized partitioning,
    * not re-sample range bounds. The caller passes a grain-size upper
    * bound it already owns (here: the cached pair-table count) so the
    * gate costs zero extra jobs. */
  private def rankByValue(byVal: DataFrame, grainBound: Long,
      windowMaxRows: Long = 1L << 22): DataFrame = {
    if (grainBound <= windowMaxRows) {
      val wCum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byVal
        .withColumn("csum", sum(col("cnt")).over(wCum))
        .select(col("v"),
          (lit(2L) * col("csum") - col("cnt") + lit(1L)).as("r2"))
    } else {
      val local = byVal
        .repartitionByRange(col("v"))
        .withColumn("pid", spark_partition_id())
        .withColumn("csum", sum(col("cnt")).over(
          Window.partitionBy(col("pid")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint(true)
      val wOff = Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = local.groupBy(col("pid")).agg(sum(col("cnt")).as("tot"))
        .withColumn("off", coalesce(sum(col("tot")).over(wOff), lit(0L)))
        .select(col("pid"), col("off"))
      local.join(broadcast(offs), "pid")
        // cntLess = off + csum − cnt; r2 = 2·cntLess + cnt + 1
        .select(col("v"),
          (lit(2L) * (col("off") + col("csum")) - col("cnt") + lit(1L)).as("r2"))
    }
  }

  /** Spearman rank correlation between line-item quantity and
    * extended price — the monotone-association check run where
    * [[qDiscountQtyCorr]]'s Pearson is distorted by the heavy price
    * tail. Ties get AVERAGE ranks (the statistically standard
    * treatment), which is also what makes the statistic
    * engine-deterministic: a row's rank depends only on the VALUE
    * multiset (never on scan order — lineitem has no unique key to
    * tie-break a row_number on), held integer as
    * 2·avgrank = 2·cntLess + cnt + 1. ρ is then the Pearson
    * correlation of the rank pairs with every moment (Σxy, Σx²,
    * n·Σ − Σ·Σ) accumulated in DECIMAL(38,0) exact integers, and the
    * single ratio/sqrt happens in IEEE doubles at the end.
    *
    * Shape at scale: size-gated hybrid. A small fact (≤16M rows —
    * where the whole query is sub-second) keeps the direct two-window
    * form; past the gate the fact collapses to (quantity, price) PAIR
    * grain in one map-combinable hash-agg and both rank relations come
    * from [[rankByValue]] — itself gated under 4M distinct values to a
    * single grain-window task, range-partitioned running sums past
    * that (no single-partition FACT sort at any scale that matters —
    * the r10 form ran two un-partitioned rank windows over the whole
    * fact unconditionally and serialized on one task); the quantity
    * side (~50 distinct values) broadcasts back, the price side joins
    * on the price grain. A spec proves both paths bit-identical. Honest ceiling:
    * DECIMAL(38,0) holds 10³⁸ — Σcnt·rq·rp ≈ 4n³ crosses it near
    * n ≈ 3·10¹² rows (a few PB of lineitem), and the final n·Σxy
    * cross-term crosses near n ≈ 10¹² i.e. ~100 TB; past that the
    * exact path needs a two-level (per-range partial moment) split or
    * the documented swap to bucketed approximate ranks (fixed-width
    * value histograms) feeding the same formula. */
  def qSpearmanCorr(spark: SparkSession, dir: String,
      smallFactRows: Long = 1L << 24,
      rankWindowMaxRows: Long = 1L << 22): DataFrame = {
    val d38 = DecimalType(38, 0)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_quantity").as("q"), col("l_extendedprice").as("p"))
    // size-gated hybrid, same integer 2·avgrank on both paths: under
    // the gate the two in-fact windows win outright (the distributed
    // machinery's ~2s of shuffles/checkpoints is 13× the whole query
    // at sf0.1); past it the fact NEVER sees a global window. The
    // probe is a parquet metadata count — no data scan.
    val ranked =
      if (li.count() <= smallFactRows)
        li.withColumn("rq", lit(2L) * rank().over(Window.orderBy(col("q"))) +
            count(lit(1)).over(Window.partitionBy(col("q"))) - lit(1L))
          .withColumn("rp", lit(2L) * rank().over(Window.orderBy(col("p"))) +
            count(lit(1)).over(Window.partitionBy(col("p"))) - lit(1L))
          .select(lit(1L).as("cnt"), col("rq"), col("rp"))
      else {
        val pairs = graft.Caches.persistTracked(
          li.groupBy(col("q"), col("p")).agg(count(lit(1)).as("cnt")))
        // one cached count bounds BOTH value grains (each is a rollup
        // of the pair grain) — the rank hybrid gate costs no extra scan
        val nPairs = pairs.count()
        val qRank = rankByValue(
          pairs.groupBy(col("q").as("v")).agg(sum(col("cnt")).as("cnt")),
          nPairs, rankWindowMaxRows)
        val pRank = rankByValue(
          pairs.groupBy(col("p").as("v")).agg(sum(col("cnt")).as("cnt")),
          nPairs, rankWindowMaxRows)
        pairs
          .join(broadcast(qRank.select(col("v").as("q"), col("r2").as("rq"))), "q")
          .join(pRank.select(col("v").as("p"), col("r2").as("rp")), "p")
          .select(col("cnt"), col("rq"), col("rp"))
      }
    ranked
      .select(col("cnt").cast(d38).as("cnt"),
        col("rq").cast(d38).as("rq"), col("rp").cast(d38).as("rp"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt") * col("rq") * col("rp")).as("sxy"),
        sum(col("cnt") * col("rq")).as("sx"),
        sum(col("cnt") * col("rp")).as("sy"),
        sum(col("cnt") * col("rq") * col("rq")).as("sxx"),
        sum(col("cnt") * col("rp") * col("rp")).as("syy"))
      .select(col("n").cast("long").as("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("spearman_rho"))
  }

  /** Theil T inequality index of customer lifetime spend, decomposed
    * by nation: T_total = T_between + Σ_g share_g·T_g — the
    * additively-decomposable alternative to [[qGiniSpend]] that
    * answers "how much of the spend inequality lives WITHIN nations
    * vs BETWEEN them". Spend is aggregated in exact DECIMAL; the
    * ln(x·n/S) terms are the only floats and are summed per group
    * before one 6-dp rounding (the [[TextAnalysis.sourceDivergence]]
    * cross-engine discipline).
    *
    * Shape at scale: one fact agg to customer grain (shuffle on
    * custkey), the nation dim broadcast on, then two tiny group-aggs
    * — linear, no window, no global sort.
    *
    * Precision ceiling: the spend sums are DECIMAL (exact past 10²⁰
    * rows); the one inexact accumulator is Σ x·ln x — same-sign
    * addends (ln x > 0 for every spend ≥ 2.72), so error grows as
    * ~√n·2⁻⁵³ RELATIVE with no cancellation: the 6-dp theil terms
    * (magnitude ~ln n) stay reproducible to n ≈ 10¹⁴ customers; the
    * within/between SPLIT additionally cancels like qWelchTtest's
    * variance when T → 0 (homogeneous spend), which degrades the
    * statistic's own meaning, not the cross-engine match. */
  def qTheilIndex(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(d2(col("o_totalprice"))).as("x"))
      .join(broadcast(Tables.customer(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)
              .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("n_name"), col("x").cast("double").as("x"))
    val tot = spend.agg(sum(d2(col("x"))).as("sdec"), count(lit(1)).as("n"))
      .select(col("sdec").cast("double").as("s"), col("n"))
    val grp = spend.crossJoin(broadcast(tot))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(d2(col("x"))).as("sgdec"),
        first(col("s")).as("s"), first(col("n")).as("n"),
        sum(col("x") * log(col("x"))).as("sxlx"))
      .withColumn("sg", col("sgdec").cast("double"))
      // T_g = Σ(x/S_g)ln(x n_g/S_g) = (Σ x ln x)/S_g − ln(S_g/n_g)
      .withColumn("theil_within",
        col("sxlx") / col("sg") - log(col("sg") / col("n_cust")))
      .withColumn("share", col("sg") / col("s"))
    grp.agg(
        sum(col("n_cust")).as("n_customers"),
        round(sum(col("share") * (col("theil_within") +
          log((col("sg") / col("n_cust")) / (col("s") / col("n"))))), 6)
          .as("theil_total"),
        round(sum(col("share") *
          log((col("sg") / col("n_cust")) / (col("s") / col("n")))), 6)
          .as("theil_between"),
        round(sum(col("share") * col("theil_within")), 6).as("theil_within"))
  }
}

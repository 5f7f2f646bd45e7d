package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Invariant tests for the round-2 TPC-H widening (Q4/Q11/Q13/Q17/
  * Q19/Q20/Q21 shapes). Exact value parity is the DuckDB oracle gate's
  * job; these pin the semantic invariants that survive data change. */
class RelationalWideSpec extends SparkSpec {
  import spark.implicits._

  test("q6: filters push to the parquet scan and only referenced columns are read") {
    val r = Relational.q6SelectiveFilter(spark, sf0001)
    val scan = r.queryExecution.executedPlan.toString
    // pushdown claims in EXPLAINS.md, enforced: quantity/discount
    // predicates reach PushedFilters, and the ReadSchema carries a
    // handful of columns, not all of lineitem
    assert(scan.contains("PushedFilters: [") && !scan.contains("PushedFilters: []"),
      s"no pushed filters:\n$scan")
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(readSchema.nonEmpty && readSchema.split(",").length <= 5,
      s"scan reads too many columns: $readSchema")
  }

  test("funnel: strict order holds and stage groupBys reuse the user_id partitioning") {
    val r = Relational.qFunnelSequence(spark, sf0001)
    val rows = r.collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      assert(x.getAs[Long]("t_view") < x.getAs[Long]("t_click") &&
        x.getAs[Long]("t_click") < x.getAs[Long]("t_purchase"))
    }
    // one shuffle per funnel stage + the final sort, nothing more
    // (count real shuffle stages in the FINAL adaptive plan only —
    // the toString also prints the initial plan, and BroadcastExchange
    // would match a bare "Exchange" pattern)
    val planStr = r.queryExecution.executedPlan.toString
    val finalPlan = planStr.split("== Initial Plan ==").head
    val nShuffles = "ShuffleQueryStage".r.findAllIn(finalPlan).length
    assert(nShuffles <= 4, s"funnel plans $nShuffles shuffle stages:\n$finalPlan")
  }

  test("q4: semi join returns at most one row per priority, counts bounded by orders") {
    val r = Relational.q4PriorityExists(spark, sf0001).collect()
    assert(r.nonEmpty && r.length <= 5)
    assert(r.map(_.getAs[String]("o_orderpriority")).distinct.length == r.length)
  }

  test("q11: every kept part exceeds 0.06% of total value") {
    val pv = Relational.q11ValueConcentration(spark, sf0001)
    val kept = pv.collect()
    assert(kept.nonEmpty)
    val total = Tables.lineitem(spark, sf0001)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,4)"))).cast("double"))
      .head().getDouble(0)
    assert(kept.forall(_.getAs[Double]("part_value") > total * 0.0006 * 0.999))
  }

  test("q13: histogram masses sum to the customer count, zero bucket present") {
    val r = Relational.q13CustDistribution(spark, sf0001).collect()
    val nCust = Tables.customer(spark, sf0001).count()
    assert(r.map(_.getAs[Long]("custdist")).sum == nCust)
  }

  test("q17: small-quantity revenue is positive and below total brand revenue") {
    val r = Relational.q17SmallQtyRevenue(spark, sf0001).head()
    val v = r.getAs[Double]("avg_yearly")
    assert(v > 0)
  }

  test("q19: disjunctive revenue equals the sum of the three disjunct branches") {
    val whole = Relational.q19DisjunctiveJoin(spark, sf0001).head().getAs[Double]("revenue")
    // branches are mutually exclusive (distinct brands) → sum must match
    val part = Tables.part(spark, sf0001).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    def branch(brand: String, szHi: Int, qLo: Int, qHi: Int): Double = {
      val d = li.join(broadcast(part),
          col("l_partkey") === col("p_partkey") && col("p_brand") === brand &&
            col("p_size").between(1, szHi) && col("l_quantity").between(qLo, qHi))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)")) *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,4)"))).cast("double"))
        .head()
      if (d.isNullAt(0)) 0.0 else d.getDouble(0)
    }
    val parts = branch("Brand#12", 5, 1, 11) + branch("Brand#23", 10, 10, 20) +
      branch("Brand#34", 15, 20, 30)
    assert(math.abs(whole - parts) < 1e-6, s"$whole vs $parts")
  }

  test("q20: every returned supplier actually moved >100 units of a red part") {
    val sups = Relational.q20SupplierSemiChain(spark, sf0001)
      .select("s_suppkey").as[Long].collect().toSet
    val redParts = Tables.part(spark, sf0001)
      .filter(col("p_name").like("%red%")).select("p_partkey")
    val qty = Tables.lineitem(spark, sf0001)
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum("l_quantity").as("q"))
      .filter(col("q") > 100)
      .select("l_suppkey").as[Long].collect().toSet
    assert(sups == qty)
  }

  test("q21: counted orders are multi-supplier with exactly one returning supplier") {
    val r = Relational.q21SoleReturner(spark, sf0001).collect()
    assert(r.length <= 20)
    if (r.nonEmpty) {
      assert(r.map(_.getAs[Long]("numwait")).toSeq == r.map(_.getAs[Long]("numwait")).sortBy(-_).toSeq)
    }
  }
}

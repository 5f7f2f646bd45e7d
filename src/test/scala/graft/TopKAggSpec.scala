package graft

import org.apache.spark.sql.functions._

/** graft_topk — the bounded-heap per-group top-k aggregate
  * ([[graft.functions.TopKTriples]]). The contract under test: result
  * identical to the row_number-window form (score DESC, id ASC, rk≤k)
  * for every group, under forced multi-partition partial/final merge,
  * null inputs, ties, and groups smaller than k. */
class TopKAggSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(TestSpark.spark)

  test("graft_topk matches the window form on random data across partitions") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      (i.toLong % 37, // 37 groups
        // coarse scores force ties that the id tie-break must resolve
        (rnd.nextInt(50) / 10.0), i.toLong, rnd.nextInt(2).toLong)
    }
    val df = spark.createDataFrame(rows).toDF("g", "s", "id", "pay")
      .repartition(8) // partial buffers must merge across partitions
    df.createOrReplaceTempView("topk_in")

    val agg = spark.sql(
      """SELECT g, t.id AS id, t.score AS s, t.pay AS pay
        |FROM (SELECT g, graft_topk(s, id, pay, 7) AS top FROM topk_in GROUP BY g)
        |LATERAL VIEW explode(top) AS t""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    val win = spark.sql(
      """SELECT g, id, s, pay FROM (
        |  SELECT g, id, s, pay,
        |    row_number() OVER (PARTITION BY g ORDER BY s DESC, id) AS rk
        |  FROM topk_in) WHERE rk <= 7""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    assert(agg == win)
  }

  test("graft_topk: array is ordered best-first; short groups; null rows skipped") {
    val df = spark.createDataFrame(Seq(
      (1L, Some(3.0), 10L, 1L), (1L, Some(5.0), 11L, 0L), (1L, Some(5.0), 9L, 1L),
      (1L, None, 12L, 1L), // null score: dropped, not ranked
      (2L, Some(1.0), 20L, 7L))).toDF("g", "s", "id", "pay")
    df.createOrReplaceTempView("topk_small")
    val out = spark.sql(
      "SELECT g, graft_topk(s, id, pay, 2) AS top FROM topk_small GROUP BY g ORDER BY g")
      .collect()
    val g1 = out(0).getSeq[org.apache.spark.sql.Row](1)
    // ties break on id ASC: (5.0, 9) before (5.0, 11); 3.0 falls off at k=2
    assert(g1.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))) ==
      Seq((5.0, 9L, 1L), (5.0, 11L, 0L)))
    val g2 = out(1).getSeq[org.apache.spark.sql.Row](1)
    assert(g2.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))) ==
      Seq((1.0, 20L, 7L))) // group smaller than k: all rows, still ordered
  }

  test("graft_topk: NaN and signed-zero scores follow Spark's total order") {
    // Spark (and DuckDB) sort NaN ABOVE every double, and treat −0.0 =
    // 0.0 — so a NaN candidate must rank FIRST under score DESC (a
    // primitive > comparison would silently drop it: NaN > x and
    // NaN == x are both false), and ±0.0 must tie on id. The window
    // form is the contract; assert both engines' shape directly.
    val df = spark.createDataFrame(Seq(
      (1L, Double.NaN, 10L, 0L), (1L, 99.0, 11L, 0L), (1L, 1.0, 12L, 0L),
      (2L, -0.0, 20L, 0L), (2L, 0.0, 21L, 0L), (2L, -1.0, 22L, 0L)))
      .toDF("g", "s", "id", "pay").repartition(4)
    df.createOrReplaceTempView("topk_nan")
    val agg = spark.sql(
      """SELECT g, t.id AS id FROM
        |(SELECT g, graft_topk(s, id, pay, 2) AS top FROM topk_nan GROUP BY g)
        |LATERAL VIEW explode(top) AS t""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = spark.sql(
      """SELECT g, id FROM (
        |  SELECT g, id, row_number() OVER (PARTITION BY g ORDER BY s DESC, id) AS rk
        |  FROM topk_nan) WHERE rk <= 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(agg == win)
    assert(agg == Set((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)))
  }
}

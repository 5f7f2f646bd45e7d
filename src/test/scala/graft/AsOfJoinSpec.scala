package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.AsOf

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right row at-or-before left time, nulls when none") {
    val quotes = Seq( // (sym, qts, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0),
      ("C", 99L, 5.0)).toDF("sym", "qts", "px")
    val trades = Seq( // (sym, ts, qty)
      ("A", 5L, 100),  // before any quote → null
      ("A", 20L, 200), // exactly at quote 20 → 2.0
      ("A", 25L, 300), // between → 2.0
      ("A", 99L, 400), // after all → 3.0
      ("B", 14L, 500), // before B's quote → null
      ("B", 16L, 600), // → 9.0
      ("D", 50L, 700)  // key missing on right → null
    ).toDF("sym", "ts", "qty")
    val r = AsOf.join(trades, quotes.withColumnRenamed("sym", "qsym"),
        Seq("sym"), Seq("qsym"), "ts", "qts")
      .select($"sym", $"ts", $"qty", $"px")
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet
    assert(r == Set(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, Some(2.0)), ("A", 99L, Some(3.0)),
      ("B", 14L, None), ("B", 16L, Some(9.0)), ("D", 50L, None)))
  }

  test("forward asof picks earliest right row at-or-after left time; match is peeked") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("qsym", "qts", "px")
    val trades = Seq(
      ("A", 5L, 100),  // next quote 10 → 1.0
      ("A", 10L, 150), // exactly at 10 → 1.0
      ("A", 11L, 200), // → 2.0 (quote 20)
      ("A", 12L, 250), // → 2.0 again (peeked, not consumed)
      ("A", 31L, 300), // after all → null
      ("B", 16L, 400), // after B's only quote → null
      ("C", 1L, 500)   // key missing → null
    ).toDF("sym", "ts", "qty")
    val r = AsOf.join(trades, quotes, Seq("sym"), Seq("qsym"), "ts", "qts",
        direction = "forward")
      .select($"sym", $"ts", $"qty", $"px")
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet
    assert(r == Set(
      ("A", 5L, Some(1.0)), ("A", 10L, Some(1.0)), ("A", 11L, Some(2.0)),
      ("A", 12L, Some(2.0)), ("A", 31L, None), ("B", 16L, None), ("C", 1L, None)))
  }

  test("forward asof tolerance bounds the lookahead") {
    val quotes = Seq(("A", 100L, 1.0), ("A", 500L, 2.0)).toDF("qsym", "qts", "px")
    val trades = Seq(
      ("A", 90L, 1),  // next quote 100, 10 away → within tol 50
      ("A", 200L, 2), // next quote 500, 300 away → beyond tol → null
      ("A", 460L, 3)  // 40 away → within
    ).toDF("sym", "ts", "qty")
    val r = AsOf.join(trades, quotes, Seq("sym"), Seq("qsym"), "ts", "qts",
        toleranceMicros = Some(50L), direction = "forward")
      .select($"qty", $"px")
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toSet
    assert(r == Set((1, Some(1.0)), (2, None), (3, Some(2.0))))
  }

  test("null join keys never match (SQL equi-join semantics, either side)") {
    val right = Seq((Option("A"), 10L, 1.0), (Option.empty[String], 5L, 7.0))
      .toDF("qsym", "qts", "px")
    val left = Seq((Option("A"), 20L, 100), (Option.empty[String], 20L, 200))
      .toDF("sym", "ts", "qty")
    val r = AsOf.join(left, right, Seq("sym"), Seq("qsym"), "ts", "qts")
      .select($"qty", $"px")
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toSet
    // the null-keyed left row must NOT pick up the null-keyed right row
    assert(r == Set((100, Some(1.0)), (200, None)))
  }

  test("tolerance bounds the lookback (merge_asof tolerance semantics)") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 100L, 2.0)).toDF("qsym", "qts", "px")
    val trades = Seq(
      ("A", 12L, 1),   // 2 ticks after quote 10 → within tol 5
      ("A", 50L, 2),   // 40 ticks after quote 10 → outside tol 5
      ("A", 103L, 3)   // 3 ticks after quote 100 → within
    ).toDF("sym", "ts", "qty")
    val r = AsOf.join(trades, quotes, Seq("sym"), Seq("qsym"), "ts", "qts",
        toleranceMicros = Some(5L))
      .select($"qty", $"px")
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toSet
    assert(r == Set((1, Some(1.0)), (2, None), (3, Some(2.0))))
  }

  test("downstream agg on the join key plans no exchange after the as-of join") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("vuser"), $"ts".as("vts"))
    val agged = AsOf.join(purchases, views, Seq("user_id"), Seq("vuser"), "ts", "vts")
      .groupBy($"user_id").agg(count($"view_id").as("n"))
    val exchanges = agged.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    // one shuffle per join side, NONE for the downstream agg
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n${agged.queryExecution.executedPlan}")
    assert(agged.count() > 0)
  }

  test("asof join agrees with the composed range-join + window equivalent on real data") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("vuser"), $"ts".as("vts"))

    val fast = AsOf.join(purchases, views, Seq("user_id"), Seq("vuser"), "ts", "vts")
      .select($"purchase_id", $"view_id")

    // reference composition: range join (row-multiplying) + window dedup
    val w = Window.partitionBy($"purchase_id").orderBy($"vts".desc, $"view_id".desc)
    val slow = purchases.join(views,
        $"user_id" === $"vuser" && $"ts" >= $"vts", "left")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"purchase_id", $"view_id")

    val fastSet = fast.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val slowSet = slow.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(fastSet == slowSet)
    assert(fastSet.nonEmpty)
  }

  test("optimizer rule rewrites portable hash spelling to the native kernel") {
    GraftExtensions.install(spark)
    val df = Tables.documents(spark, sf0001)
      .selectExpr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT) AS h")
    assert(df.queryExecution.optimizedPlan.toString.contains("h60"),
      s"expected H60 in:\n${df.queryExecution.optimizedPlan}")
    // value parity with the native function
    GraftFunctions(spark)
    val direct = Tables.documents(spark, sf0001).selectExpr("graft_h60(text) AS h")
    assert(df.collect().map(_.getLong(0)).toSeq == direct.collect().map(_.getLong(0)).toSeq)
  }

  private def GraftFunctions(s: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.register(s)
}

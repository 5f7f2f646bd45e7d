package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TopKRewrite — the opt-in Filter(row_number ≤ k over Window) →
  * TopKRowsAgg + posexplode optimizer rule. Contract: flag off leaves
  * the Window plan untouched; flag on removes the Window from the
  * optimized plan, and the results (all columns INCLUDING the rank)
  * are identical to the window form under a total per-partition
  * order. */
class TopKRewriteSpec extends SparkSpec {

  private val Flag = "spark.graft.topkRewrite.enabled"

  private def rankQuery() = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 3000).map { i =>
      (i.toLong % 23, rnd.nextDouble(), i.toLong, s"p$i")
    }
    val df = spark.createDataFrame(rows).toDF("g", "score", "id", "tag")
      .repartition(6)
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
  }

  test("flag off: the Window survives optimization") {
    GraftExtensions.install(spark)
    spark.conf.set(Flag, "false")
    val plan = rankQuery().queryExecution.optimizedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty)
  }

  test("flag on: Window replaced by TopKRowsAgg; results identical incl. rank") {
    GraftExtensions.install(spark)
    spark.conf.set(Flag, "false")
    val expected = rankQuery().collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3), r.getInt(4)))
      .toSet
    spark.conf.set(Flag, "true")
    try {
      val q = rankQuery()
      val opt = q.queryExecution.optimizedPlan
      assert(opt.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.isEmpty, s"Window not rewritten:\n$opt")
      assert(opt.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.aggregateExpressions.exists(_.exists {
              case _: graft.functions.TopKRowsAgg => true; case _ => false
            }) => a
      }.nonEmpty)
      val got = q.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3), r.getInt(4)))
        .toSet
      assert(got == expected)
    } finally spark.conf.set(Flag, "false")
  }

  test("flag on: rn < k, rn = k, and global (no partition) forms stay exact") {
    GraftExtensions.install(spark)
    val df = spark.createDataFrame(
      (0 until 500).map(i => (i.toLong % 7, (i * 37 % 101).toLong, i.toLong)))
      .toDF("g", "v", "id").repartition(5)
    val wp = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val wg = Window.orderBy(col("v").desc, col("id"))
    def runAll() = Seq(
      df.withColumn("rn", row_number().over(wp)).filter(col("rn") < 3),
      df.withColumn("rn", row_number().over(wp)).filter(col("rn") === 2),
      df.withColumn("rn", row_number().over(wg)).filter(col("rn") <= 5)
    ).map(_.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet)
    spark.conf.set(Flag, "false")
    val off = runAll()
    spark.conf.set(Flag, "true")
    try {
      val on = runAll()
      assert(on == off)
    } finally spark.conf.set(Flag, "false")
  }

  test("flag on: null sort keys honor the window's null placement") {
    GraftExtensions.install(spark)
    val rows = (0 until 400).map { i =>
      (i.toLong % 11,
        if (i % 7 == 0) None else Some((i * 13 % 97).toDouble), i.toLong)
    }
    val df = spark.createDataFrame(rows).toDF("g", "v", "id").repartition(4)
    val wLast = Window.partitionBy(col("g")).orderBy(col("v").desc_nulls_last, col("id"))
    val wFirst = Window.partitionBy(col("g")).orderBy(col("v").asc_nulls_first, col("id"))
    def runBoth() = Seq(wLast, wFirst).map { w =>
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    }
    spark.conf.set(Flag, "false")
    val off = runBoth()
    spark.conf.set(Flag, "true")
    try assert(runBoth() == off) finally spark.conf.set(Flag, "false")
  }

  test("guards: rank >= / other window functions / non-literal k are untouched") {
    GraftExtensions.install(spark)
    spark.conf.set(Flag, "true")
    try {
      val df = spark.createDataFrame(
        (0 until 100).map(i => (i.toLong % 5, i.toLong))).toDF("g", "id")
      val w = Window.partitionBy(col("g")).orderBy(col("id"))
      // rank() is not row_number: must NOT rewrite
      val r1 = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
      assert(r1.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.nonEmpty)
      // rn >= 2 keeps the TAIL: must NOT rewrite
      val r2 = df.withColumn("rn", row_number().over(w)).filter(col("rn") >= 2)
      assert(r2.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.nonEmpty)
      assert(r2.count() == 95)
    } finally spark.conf.set(Flag, "false")
  }

  test("flag on: cast-through-Project rank (the oracle's BIGINT shape) rewrites") {
    GraftExtensions.install(spark)
    def q() = {
      val rnd = new scala.util.Random(11)
      val rows = (0 until 2000).map(i => (i.toLong % 7, rnd.nextDouble(), i.toLong))
      val df = spark.createDataFrame(rows).toDF("g", "score", "id").repartition(5)
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
      // the cross-engine rank shape: row_number cast to BIGINT before
      // the filter — previously disqualified the rewrite silently
      df.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
    }
    spark.conf.set(Flag, "false")
    val expected = q().collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    spark.conf.set(Flag, "true")
    try {
      val opt = q().queryExecution.optimizedPlan
      assert(opt.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.isEmpty, "cast-through-Project rank shape was not rewritten")
      val got = q().collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, "rewritten results diverge from the window form")
    } finally spark.conf.set(Flag, "false")
  }

  test("flag on: CONJUNCTIVE condition (rank-limit AND other preds) rewrites exactly") {
    // the r15 audit's live failure class: a rank-prefix subtree
    // consumed by a join gets inferred isnotnulls merged into its
    // Filter, turning `rn <= k` into `rn <= k AND isnotnull(...)` —
    // which the single-comparison guard silently skipped
    GraftExtensions.install(spark)
    def q() = {
      val rnd = new scala.util.Random(3)
      val rows = (0 until 2000).map(i => (i.toLong % 13, rnd.nextDouble(), i.toLong))
      val df = spark.createDataFrame(rows).toDF("g", "score", "id").repartition(5)
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 4 && col("id") % 3 =!= 0)
    }
    def qRange() = {
      val df = spark.createDataFrame(
        (0 until 600).map(i => (i.toLong % 9, (i * 31 % 83).toLong, i.toLong)))
        .toDF("g", "v", "id").repartition(4)
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      // both conjuncts reference rn: the upper bound drives k, the
      // full filter on top keeps the >= 2 side exact
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") >= 2 && col("rn") <= 5)
    }
    spark.conf.set(Flag, "false")
    val off = q().collect().map(_.toSeq).toSet
    val offR = qRange().collect().map(_.toSeq).toSet
    spark.conf.set(Flag, "true")
    try {
      for ((mk, exp) <- Seq((() => q(), off), (() => qRange(), offR))) {
        val built = mk()
        assert(built.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }.isEmpty, "conjunctive rank filter was not rewritten")
        assert(built.collect().map(_.toSeq).toSet == exp)
      }
    } finally spark.conf.set(Flag, "false")
  }

  test("flag on: Spark's InferWindowGroupLimit leftover is stripped (no double sort)") {
    GraftExtensions.install(spark)
    spark.conf.set(Flag, "true")
    try {
      val rnd = new scala.util.Random(5)
      val rows = (0 until 2000).map(i => (i.toLong % 13, rnd.nextDouble(), i.toLong))
      val df = spark.createDataFrame(rows).toDF("g", "score", "id").repartition(5)
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
      val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      val opt = q.queryExecution.optimizedPlan
      assert(opt.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => g
      }.isEmpty,
        "redundant WindowGroupLimit survived — it plans as two full sorts " +
          s"of the candidate stream:\n$opt")
      assert(q.count() == 13 * 4)
    } finally spark.conf.set(Flag, "false")
  }
}

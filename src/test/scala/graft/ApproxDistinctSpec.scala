package graft

import org.apache.spark.sql.functions._

/** The opt-in approx-distinct rewrite: exact `count(DISTINCT x)`
  * becomes HyperLogLog++ only when the session flag is on, and the
  * estimates land within the sketch's error band of the exact counts. */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val Flag = "spark.graft.approxDistinct.enabled"

  private def usersPerType = Tables.events(spark, sf0001)
    .groupBy($"event_type")
    .agg(countDistinct($"user_id").as("u"))

  test("flag off: plan stays exact (no HLL++ aggregate)") {
    GraftExtensions.install(spark)
    spark.conf.set(Flag, "false")
    val plan = usersPerType.queryExecution.optimizedPlan.toString
    assert(!plan.contains("approx_count_distinct"), plan)
  }

  test("flag on: distinct count rewrites to HLL++ and estimates track exact") {
    GraftExtensions.install(spark)
    val exact = usersPerType.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set(Flag, "true")
    try {
      val df = usersPerType // plan built under the flag
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"rewrite did not fire:\n$plan")
      val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet === exact.keySet)
      approx.foreach { case (k, a) =>
        val e = exact(k)
        assert(math.abs(a - e).toDouble / e <= 0.1,
          s"$k: approx $a vs exact $e drifted past 10%")
      }
    } finally spark.conf.set(Flag, "false")
  }
}

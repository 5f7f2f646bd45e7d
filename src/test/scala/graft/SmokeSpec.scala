package graft

/** Pre-commit smoke gate: EVERY SparkEntry query must at least execute
  * end-to-end on sf0.001 — analysis errors, unresolved columns, and
  * type mismatches surface here in seconds instead of in the driver's
  * bench run (round 4 shipped graph_triangles with a Catalyst
  * analysis error because no test ever executed it).
  *
  * Each query runs as its own test case so one failure names the
  * query instead of aborting the sweep. Correctness is the DuckDB
  * oracle gate's job — this only asserts "runs and returns a schema";
  * rows>0 is asserted for the flagship entry alone (some operators
  * legitimately return few/zero rows at sf0.001).
  */
class SmokeSpec extends SparkSpec {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"smoke: $name executes on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name returned no columns")
      df.count() // forces full execution, surfaces runtime errors
      Caches.releaseAll()
      spark.catalog.clearCache()
    }
  }

  test("smoke: flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("smoke: every query key has an oracle or a documented exemption") {
    // the correctness contract (SparkEntry scaladoc): every key gets an
    // oracleSql unless the op is not SQL-expressible — those exemptions
    // are enumerated HERE so a new ungated query fails the suite
    val exempt = Set.empty[String] // every query is oracle-gated
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- exempt
    assert(ungated.isEmpty, s"queries without oracleSql: ${ungated.toSeq.sorted.mkString(", ")}")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracleSql without a query: ${orphaned.toSeq.sorted.mkString(", ")}")
  }
}

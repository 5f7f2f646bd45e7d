package graft

/** The raw-SQL entry point: registerAll + spark.sql must answer the
  * same questions as the DataFrame operators. */
class SqlSurfaceSpec extends SparkSpec {

  test("registerAll exposes every table and the graft_* functions to spark.sql") {
    Tables.registerAll(spark, sf0001)
    for (t <- Tables.all) {
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) > 0, s"$t is empty")
    }
    // native kernels callable from SQL
    val h = spark.sql("SELECT graft_h60('hello') AS h").head.getLong(0)
    assert(h > 0)
    // a representative join across registered views
    val rows = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name""".stripMargin).collect()
    assert(rows.nonEmpty)
  }

  test("a SparkEntry query is reproducible through the SQL surface") {
    Tables.registerAll(spark, sf0001)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
    val df = graft.operators.Relational.q10Rollup(spark, sf0001)
    assert(sql.count() == df.count())
  }
}

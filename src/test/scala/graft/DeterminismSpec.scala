package graft

/** Determinism gate: every SparkEntry query, run twice from a cold
  * plan at sf0.001, must return IDENTICAL rows. Nondeterminism —
  * unordered ties under limit/row_number, float aggregation order
  * leaking past a round(), rand() sneaking in — is the #1 source of
  * oracle hash flaps, and this catches it before the driver's
  * correctness gate does.
  *
  * One test per query so a failure names the offender. Rows compare as
  * canonicalized sorted strings (the driver's comparator also sorts, so
  * row order itself is NOT part of the contract being checked here —
  * value stability is).
  */
class DeterminismSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"determinism: $name is run-to-run stable") {
      val a = canon(fn(spark, sf0001))
      Caches.releaseAll(); spark.catalog.clearCache()
      val b = canon(fn(spark, sf0001))
      Caches.releaseAll(); spark.catalog.clearCache()
      assert(a.size == b.size, s"$name returned ${a.size} then ${b.size} rows")
      val diff = a.zip(b).indexWhere { case (x, y) => x != y }
      if (diff != -1)
        fail(s"$name row $diff differs between runs:\n  ${a(diff)}\n  ${b(diff)}")
    }
  }
}

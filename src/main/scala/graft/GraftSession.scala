package graft

import org.apache.spark.sql.SparkSession

/** The tuned SparkSession the library is designed against — one place
  * for the conf story instead of copies in every main:
  *
  *  - shuffle partitions sized to the parallelism actually available
  *    (NOT the 200 default — on a real cluster pass executors×cores;
  *    at 100 TB raise it so post-shuffle partitions stay ≲ executor
  *    memory, then let AQE coalesce the small ones back down);
  *  - AQE on: runtime re-planning converts stats misses into coalesced
  *    partitions, demoted broadcasts, and split skew partitions
  *    (skewJoin handles the hot keys that salting targets statically);
  *  - UTC session timezone — every oracle comparison and timestamp
  *    literal in the library assumes it;
  *  - graft extensions installed (as-of strategy, native-hash kernel
  *    swap, the opt-in rewrites) with the top-k rewrite ON: rewriting
  *    `row_number().over(...) <= k` into the bounded-heap aggregate is
  *    bit-identical for total window orders (every library query's
  *    orders are total) and removes the full-candidate-set sort —
  *    the production mode, not an experiment. Callers who need the
  *    untouched window plan set spark.graft.topkRewrite.enabled=false
  *    on the built session.
  */
object GraftSession {
  def build(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
            shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.topkRewrite.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.install(s)
    s
  }
}

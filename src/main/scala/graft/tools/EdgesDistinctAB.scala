package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B of the pair-distinct shuffle width — the final `.distinct()` in
  * [[graft.ops.Graph.coOccurrenceEdges]] is the one unavoidable
  * |E|-sized exchange under every graph query, and VARIANCE_r14 §8
  * measured it growing ×12.6 at ×10 data on this box: SPILL, not work
  * (the pair count itself grows ×10.00 to the row). The hypothesis:
  * at 32 shuffle partitions each final-agg partition at sf10 exceeds
  * the executor-memory share and the hash aggregate spills; widening
  * the exchange (more, smaller partitions — what a 1000-executor
  * cluster gets for free from its task count) should recover the
  * linear term. AQE's partition coalescing makes over-provisioning
  * cheap at the small end, so the cluster-shaped setting is a high
  * initialPartitionNum, not a hand-tuned constant.
  *
  * Interleaved passes per width, min reported, edge counts asserted
  * equal across widths.
  *
  *   runMain graft.tools.EdgesDistinctAB <sfDir> [widths=32,64,128,256]
  */
object EdgesDistinctAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val widths = (if (args.length > 1) args(1) else "32,64,128,256")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(w: Int): (Double, Long) = {
      graft.Caches.releaseAll(blocking = true)
      spark.catalog.clearCache()
      System.gc()
      spark.conf.set("spark.sql.shuffle.partitions", w)
      // AQE reads initialPartitionNum (falls back to shuffle.partitions
      // when unset) — set BOTH so the width actually applies under AQE
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", w)
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.coOccurrenceEdges(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    run(widths.head) // JVM/JIT/file-meta warmup, discarded
    val order = widths ++ widths.reverse ++ widths // 3 passes, interleaved
    val passes = order.map(w => w -> run(w))
    val counts = passes.map(_._2._2).distinct
    require(counts.size == 1, s"edge counts diverge across widths: $counts")
    val byW = widths.map { w =>
      val ts = passes.filter(_._1 == w).map(_._2._1)
      w -> ts
    }
    val fmt = (xs: Seq[Double]) => xs.map(t => f"$t%.2f").mkString("[", ",", "]")
    val body = byW.map { case (w, ts) =>
      s""""w$w":{"passes":${fmt(ts)},"min":${f"${ts.min}%.2f"}}"""
    }.mkString(",")
    println(s"""{"tool":"edges_distinct_ab","sf_dir":"$dir","edges":${counts.head},$body}""")
    spark.stop()
  }
}

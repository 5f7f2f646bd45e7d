package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B isolating the shiftMemo-rebuild tax from a flagged query's wall
  * time (VARIANCE_r13 §2 hypothesis; r13 verdict item 3 of "What's
  * wrong"): each query runs alternating passes where the between-pass
  * cleanup either fires the release hooks (memo CLEARED — the Bench
  * protocol's epoch) or keeps them (memo WARM). Storage caches are
  * released identically in both arms; the only difference is whether
  * the next pass recomputes Dedup.doubleShift's max(doc_id) probes.
  * JIT warmth monotonically favors LATER passes, so a warm-arm
  * advantage read from interleaved passes is a lower bound on the tax.
  *
  * Scope: SCALAR memos only (Dedup's shift). Memos holding persisted
  * handles (Graph.sharedEdges) are cleared by BOTH arms since r15 —
  * releaseTrackedOnly unpersists their blocks, so a surviving handle
  * would silently re-derive in both arms and invalidate the A/B
  * (ADVICE r14 item 4). To measure the edge memo, use Bench's
  * SPARK_GRAFT_BENCH_PIN_EDGES mode instead.
  *
  *   runMain graft.tools.MemoAB <sfDir> <query1,query2,...>
  */
object MemoAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_containment", "dedup_lsh_eval",
        "text_jaccard_sources", "text_source_divergence")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pass(name: String, clearMemo: Boolean): Double = {
      if (clearMemo) graft.Caches.releaseAll(blocking = true)
      else graft.Caches.releaseTrackedOnly(blocking = true)
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      pass(name, clearMemo = true) // discard: JVM/JIT + file-meta warmup
      // interleave: cold, warm, cold, warm, cold, warm
      val seq = Seq(true, false, true, false, true, false)
        .map(c => (c, pass(name, c)))
      val cold = seq.filter(_._1).map(_._2)
      val warm = seq.filterNot(_._1).map(_._2)
      val fmt = (xs: Seq[Double]) => xs.map(t => f"$t%.2f").mkString(",")
      println(f"""{"tool":"memo_ab","query":"$name","memo_cold":[${fmt(cold)}],"memo_warm":[${fmt(warm)}],"cold_min":${cold.min}%.2f,"warm_min":${warm.min}%.2f}""")
    }
    spark.stop()
  }
}

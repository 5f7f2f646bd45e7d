package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dumps the formatted physical plan of every SparkEntry query so plan
  * regressions (lost pushdown, surprise shuffles, missing broadcasts,
  * codegen gaps) are visible in review. Findings live in EXPLAINS.md.
  *
  *   runMain graft.PlanAudit <sfDir> <outDir> [queryName...]
  *
  * Optional trailing query names restrict the dump (like Verify's
  * filter) — the way to inspect ONE query's plan at a heavy SF, where
  * a full sweep would execute every iterative op's build actions. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "target/plans"
    val only = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // production optimizer mode (same as Bench/Verify): the audited
      // plans must be the plans the library ships — without this the
      // dumps showed the UN-rewritten window form for every rank-prefix
      // query and the audit could not see whether TopKRewrite fired
      .config("spark.graft.topkRewrite.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.install(spark)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // rank-prefix audit: one line per query stating whether the opt-in
    // Filter(row_number ≤ k over Window) → TopKRowsAgg rewrite fired
    // (VERDICT r14 item 2/8 — the contract used to be "fires when the
    // shape happens to match" with nothing asserting it)
    val topkAudit = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val opt = df.queryExecution.optimizedPlan
        val nTopK = opt.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
              if a.aggregateExpressions.exists(_.exists {
                case _: graft.functions.TopKRowsAgg => true; case _ => false
              }) => a
        }.size
        val nWin = opt.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }.size
        val audit =
          s"-- graft.audit: topk_rewrite=${if (nTopK > 0) "FIRED" else "absent"}" +
            s" topk_aggs=$nTopK windows_remaining=$nWin"
        if (nTopK > 0 || nWin > 0)
          topkAudit += s"$name ${audit.stripPrefix("-- graft.audit: ")}"
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan + "\n" + audit + "\n")
      } catch {
        case e: Throwable =>
          Files.writeString(Paths.get(s"$outDir/$name.txt"), s"ERROR: ${e.getMessage}")
      }
      // iterative ops run actions during plan construction and persist
      // intermediates — release them between queries like Bench/Verify
      Caches.releaseAll()
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(s"$outDir/topk_audit.txt"),
      topkAudit.mkString("", "\n", "\n"))
    println(s"plans written to $outDir (${topkAudit.size} window/topk queries in topk_audit.txt)")
    spark.stop()
  }
}

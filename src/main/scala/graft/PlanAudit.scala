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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      } catch {
        case e: Throwable =>
          Files.writeString(Paths.get(s"$outDir/$name.txt"), s"ERROR: ${e.getMessage}")
      }
      // iterative ops run actions during plan construction and persist
      // intermediates — release them between queries like Bench/Verify
      Caches.releaseAll()
      spark.catalog.clearCache()
    }
    println(s"plans written to $outDir")
    spark.stop()
  }
}

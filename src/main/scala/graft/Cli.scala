package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{Backfill, SiriSnapshotEtl}
import graft.sources.SnapshotStorage

/** Command-line surface mirroring the reference's cli.py commands, each
  * dispatching to the library jobs:
  *
  *   process-snapshots <rawDir> <outDir>           (process_snapshot)
  *   update-pending-snapshots <from> <to> <statusParquet>
  *   process-old-missing-snapshots <from> <to> <statusParquet> <rawDir> <outDir>
  *   validate-snapshots <rawDir>                   (validate_snapshots)
  *
  * Raw snapshots are JSON files named by snapshot id (the reference's
  * storage layout, one document per minute); <rawDir>/YYYY/MM/DD/HH/MM.json.
  */
object Cli {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def readRaw(spark: SparkSession, rawDir: String) =
    SnapshotStorage.readRaw(spark, rawDir)

  private def writeResult(r: SiriSnapshotEtl.EtlResult, outDir: String): Unit =
    SnapshotStorage.writeTables(r, outDir)

  def main(args: Array[String]): Unit = {
    val spark = session()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "process-snapshots" :: rawDir :: outDir :: Nil =>
        writeResult(SiriSnapshotEtl.run(readRaw(spark, rawDir)), outDir)
      case "update-pending-snapshots" :: from :: to :: statusParquet :: Nil =>
        val status = spark.read.parquet(statusParquet)
        Backfill.pendingSnapshots(spark, from, to, status)
          .write.mode("append").parquet(statusParquet)
      case "process-old-missing-snapshots" :: from :: to :: statusParquet :: rawDir :: outDir :: Nil =>
        val status = spark.read.parquet(statusParquet)
        writeResult(Backfill.processBacklog(spark, from, to, status, readRaw(spark, rawDir)), outDir)
      case "validate-snapshots" :: rawDir :: Nil =>
        val r = SiriSnapshotEtl.run(readRaw(spark, rawDir))
        val bad = SiriSnapshotEtl.validate(r.visits, r.vehicleLocations,
          r.rideStops, r.rides, r.stops)
        val n = bad.count()
        println(s"validation mismatches: $n")
        if (n > 0) bad.show(50, truncate = false)
      case other =>
        System.err.println(s"unknown command: ${other.mkString(" ")}")
        System.err.println("commands: process-snapshots | update-pending-snapshots | " +
          "process-old-missing-snapshots | validate-snapshots")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{Backfill, SiriSnapshotEtl}

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

  /** Read raw snapshot JSON files; snapshot_id derived from the path
    * (YYYY/MM/DD/HH/MM.json) — no driver-side directory walking. */
  private def readRaw(spark: SparkSession, rawDir: String) =
    spark.read.option("wholetext", "true").text(s"$rawDir/*/*/*/*/*.json")
      .select(
        regexp_extract(input_file_name(), raw"(\d{4}/\d{2}/\d{2}/\d{2}/\d{2})\.json", 1)
          .as("snapshot_id"),
        col("value").as("json"))

  private def writeResult(r: SiriSnapshotEtl.EtlResult, outDir: String): Unit = {
    r.routes.write.mode("overwrite").parquet(s"$outDir/siri_routes")
    r.stops.write.mode("overwrite").parquet(s"$outDir/siri_stops")
    r.rides.write.mode("overwrite").parquet(s"$outDir/siri_rides")
    r.rideStops.write.mode("overwrite").parquet(s"$outDir/siri_ride_stops")
    // facts partitioned by snapshot id prefix (= date) → reloading one
    // snapshot rewrites one partition, the reference's idempotent reload
    r.vehicleLocations
      .withColumn("snapshot_date",
        translate(substring(col("snapshot_id"), 1, 10), "/", "-"))
      .write.mode("overwrite").partitionBy("snapshot_date")
      .parquet(s"$outDir/siri_vehicle_locations")
    r.snapshotStats.write.mode("overwrite").parquet(s"$outDir/siri_snapshots")
    r.parseErrors.write.mode("overwrite").parquet(s"$outDir/parse_errors")
  }

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

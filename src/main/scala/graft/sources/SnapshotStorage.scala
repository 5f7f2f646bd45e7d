package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.SiriSnapshotEtl

/** Storage contract for raw snapshots and the materialized star schema
  * — the reference's open_bus_siri_requester.storage layout
  * (`<root>/YYYY/MM/DD/HH/MM` one document per minute) and its Postgres
  * tables, re-expressed as files Spark reads natively.
  *
  * Raw reads are distributed (`input_file_name`-derived ids — no
  * driver-side directory walking, unlike the reference's per-minute
  * loop); the same glob serves batch (`read`) and the daemon
  * (`readStream` + checkpoint). Facts are date-partitioned so
  * reloading one snapshot rewrites one partition.
  */
object SnapshotStorage {

  private val idFromPath = raw"(\d{4}/\d{2}/\d{2}/\d{2}/\d{2})\.json"

  /** Batch read of every raw snapshot under `rootDir`. */
  def readRaw(spark: SparkSession, rootDir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$rootDir/*/*/*/*/*.json")
      .select(
        regexp_extract(input_file_name(), idFromPath, 1).as("snapshot_id"),
        col("value").as("json"))

  /** Streaming read of the same layout (json-lines documents carrying
    * snapshot_id + json, as the daemon's requester writes them). */
  def readRawStream(spark: SparkSession, rootDir: String): DataFrame =
    spark.readStream.schema("snapshot_id STRING, json STRING").json(rootDir)

  /** Write an ETL result as the star schema. Dims overwrite (they are
    * the get-or-create union of everything seen); facts partition by
    * snapshot date. */
  def writeTables(r: SiriSnapshotEtl.EtlResult, outDir: String): Unit = {
    r.routes.write.mode(SaveMode.Overwrite).parquet(s"$outDir/siri_routes")
    r.stops.write.mode(SaveMode.Overwrite).parquet(s"$outDir/siri_stops")
    r.rides.write.mode(SaveMode.Overwrite).parquet(s"$outDir/siri_rides")
    r.rideStops.write.mode(SaveMode.Overwrite).parquet(s"$outDir/siri_ride_stops")
    r.vehicleLocations
      .withColumn("snapshot_date",
        translate(substring(col("snapshot_id"), 1, 10), "/", "-"))
      .write.mode(SaveMode.Overwrite).partitionBy("snapshot_date")
      .parquet(s"$outDir/siri_vehicle_locations")
    r.snapshotStats.write.mode(SaveMode.Overwrite).parquet(s"$outDir/siri_snapshots")
    r.parseErrors.write.mode(SaveMode.Overwrite).parquet(s"$outDir/parse_errors")
  }

  /** Merge fresh snapshot stats into a status table (last write wins
    * per snapshot_id) — the siri_snapshot upsert. */
  def mergeStatus(existing: DataFrame, fresh: DataFrame): DataFrame = {
    val cols = fresh.columns
    existing.select(cols.map(col).toSeq: _*)
      .join(fresh.select("snapshot_id"), Seq("snapshot_id"), "left_anti")
      .unionByName(fresh)
  }
}

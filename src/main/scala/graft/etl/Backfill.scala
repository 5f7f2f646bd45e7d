package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Backlog management: the reference's update_pending_snapshots.py
  * (enumerate every available snapshot id, anti-join against the
  * siri_snapshot status table, insert the missing ones as `pending`)
  * and parallel_process_old_missing_snapshots.py (chop a date range
  * into chunks and process them in parallel workers).
  *
  * Spark-first: the expected id series comes from `sequence` (no
  * driver loop over minutes — the reference iterates one minute at a
  * time, update_pending_snapshots.py:94), the set difference is a
  * left_anti join, and "parallel workers" is just partitioning — the
  * batch ETL already distributes, so the whole backfill is ONE job
  * regardless of how many snapshots are behind.
  */
object Backfill {

  private val SnapshotIdFmt = "yyyy/MM/dd/HH/mm"

  /** Every expected snapshot id in [from, to], one per minute —
    * generated distributed, not on the driver. */
  def expectedSnapshotIds(spark: SparkSession, fromId: String, toId: String): DataFrame = {
    import spark.implicits._
    Seq((fromId, toId)).toDF("from_id", "to_id")
      .select(
        to_timestamp(col("from_id"), SnapshotIdFmt).as("mn"),
        to_timestamp(col("to_id"), SnapshotIdFmt).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 minute"))).as("minute"))
      .select(date_format(col("minute"), SnapshotIdFmt).as("snapshot_id"))
  }

  /** update_pending_snapshots: expected ids not yet present in the
    * status table become `pending` rows (idempotent — ids already
    * tracked are untouched). `statusTable` needs (snapshot_id,
    * etl_status). */
  def pendingSnapshots(spark: SparkSession, fromId: String, toId: String,
      statusTable: DataFrame): DataFrame =
    expectedSnapshotIds(spark, fromId, toId)
      .join(statusTable.select("snapshot_id"), Seq("snapshot_id"), "left_anti")
      .withColumn("etl_status", lit("pending"))

  /** process_old_missing_snapshots: run the batch ETL over exactly the
    * snapshots that are pending or errored (reference reprocesses
    * error-status snapshots under force_reload,
    * process_snapshot.py:367). `raw` carries (snapshot_id, json) for
    * whatever snapshot payloads exist. */
  def processBacklog(spark: SparkSession, fromId: String, toId: String,
      statusTable: DataFrame, raw: DataFrame): SiriSnapshotEtl.EtlResult = {
    val todo = pendingSnapshots(spark, fromId, toId, statusTable)
      .select("snapshot_id")
      .unionAll(statusTable.filter(col("etl_status") === "error").select("snapshot_id"))
      .distinct()
    SiriSnapshotEtl.run(raw.join(broadcast(todo), Seq("snapshot_id")))
  }
}

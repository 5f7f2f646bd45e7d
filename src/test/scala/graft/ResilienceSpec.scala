package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import graft.etl.SiriSnapshotEtl

/** Failure-path and resume semantics. */
class ResilienceSpec extends SparkSpec {
  import spark.implicits._

  test("malformed snapshot JSON surfaces as a failed-parse row, not silence") {
    val raw = Seq(
      ("2023/03/10/09/00", "this is not json {"),
      ("2023/03/10/09/01", """{"Siri": {"ServiceDelivery": {}}}"""),
      ("2023/03/10/09/02", SiriFixtures.snapA)).toDF("snapshot_id", "json")
    val r = SiriSnapshotEtl.run(raw)
    val stats = r.snapshotStats.collect()
      .map(x => x.getAs[String]("snapshot_id") ->
        (x.getAs[Long]("num_successful_parse_vehicle_locations"),
         x.getAs[Long]("num_failed_parse_vehicle_locations"))).toMap
    assert(stats("2023/03/10/09/00") == (0L, 1L)) // garbage → failed marker
    assert(stats("2023/03/10/09/01") == (0L, 1L)) // no deliveries → failed marker
    assert(stats("2023/03/10/09/02") == (3L, 1L)) // normal snapshot
    // malformed snapshots contribute no dimension or fact rows
    assert(r.vehicleLocations.filter($"snapshot_id" < "2023/03/10/09/02").count() == 0)
  }

  test("empty-but-valid delivery produces zero visits and zero failures") {
    val empty = """{"Siri": {"ServiceDelivery": {"ResponseTimestamp": "2023-03-10T08:00:00+02:00",
      "StopMonitoringDelivery": [{"Status": "true", "MonitoredStopVisit": []}]}}}"""
    val r = SiriSnapshotEtl.run(Seq(("2023/03/10/09/03", empty)).toDF("snapshot_id", "json"))
    assert(r.visits.count() == 0)
  }

  test("file-source stream with checkpoint resumes incrementally (daemon catch-up)") {
    val dir = Files.createTempDirectory("snapstream").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapckpt").toFile.getAbsolutePath
    def writeSnap(name: String, json: String): Unit = {
      val row = json.replaceAll("\n", " ")
      Files.writeString(java.nio.file.Paths.get(s"$dir/$name.json"),
        s"""{"snapshot_id": "$name", "json": ${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(row)}}""")
    }
    writeSnap("A", SiriFixtures.snapA)

    def runOnce(): Long = {
      val raw = spark.readStream
        .schema("snapshot_id STRING, json STRING")
        .json(dir)
      val visits = SiriSnapshotEtl.parseVisits(raw)
      var processed = 0L
      val q = visits.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          processed += batch.count()
          ()
        }.start()
      q.awaitTermination()
      processed
    }
    assert(runOnce() == 4L)   // snapA has 4 visits
    assert(runOnce() == 0L)   // nothing new → checkpoint skips A
    writeSnap("B", SiriFixtures.snapB)
    assert(runOnce() == 2L)   // only the new snapshot is processed
  }
}

package graft

import graft.etl.Backfill
import graft.streaming.RideState

class BackfillSpec extends SparkSpec {
  import spark.implicits._

  test("expected snapshot ids: one per minute, inclusive bounds, reference id format") {
    val ids = Backfill.expectedSnapshotIds(spark, "2023/03/10/08/00", "2023/03/10/08/05")
      .as[String].collect()
    assert(ids.length == 6)
    assert(ids.head == "2023/03/10/08/00" && ids.last == "2023/03/10/08/05")
  }

  test("pending = expected minus tracked; errored snapshots re-enter the backlog") {
    val status = Seq(
      ("2023/03/10/08/00", "loaded"),
      ("2023/03/10/08/01", "error"),
      ("2023/03/10/08/03", "loaded")).toDF("snapshot_id", "etl_status")
    val pending = Backfill.pendingSnapshots(spark, "2023/03/10/08/00", "2023/03/10/08/04", status)
      .select("snapshot_id").as[String].collect().sorted
    assert(pending.toSeq == Seq("2023/03/10/08/02", "2023/03/10/08/04"))

    val raw = Seq(
      ("2023/03/10/08/01", SiriFixtures.snapA), // errored → reprocessed
      ("2023/03/10/08/02", SiriFixtures.snapB), // missing → processed
      ("2023/03/10/08/03", SiriFixtures.snapA)  // loaded → skipped
    ).toDF("snapshot_id", "json")
    val result = Backfill.processBacklog(spark, "2023/03/10/08/00", "2023/03/10/08/04", status, raw)
    val processed = result.snapshotStats.select("snapshot_id").as[String].collect().sorted
    assert(processed.toSeq == Seq("2023/03/10/08/01", "2023/03/10/08/02"))
  }
}

class RideStateSpec extends SparkSpec {
  import org.apache.spark.api.java.Optional
  import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

  test("state fold accumulates visits across batches (updateRide)") {
    val s1 = TestGroupState.create[RideState.RideProgress](
      optionalState = Optional.empty(), timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val out1 = RideState.updateRide("ride-1",
      Iterator(RideState.VisitEvent("ride-1", 1000L, 34.7, 31.8, 10, 100)), s1).toSeq
    assert(out1.head.nVisits == 1 && out1.head.maxDistance == 100)
    assert(s1.exists)

    val s2 = TestGroupState.create[RideState.RideProgress](
      optionalState = Optional.of(out1.head), timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val out2 = RideState.updateRide("ride-1",
      Iterator(
        RideState.VisitEvent("ride-1", 3000L, 34.9, 31.95, 20, 700),
        RideState.VisitEvent("ride-1", 2000L, 34.8, 31.9, 30, 900)), s2).toSeq
    assert(out2.head.nVisits == 3)
    assert(out2.head.maxDistance == 900 && out2.head.maxVelocity == 30)
    assert(out2.head.lastLon == 34.9 && out2.head.lastMs == 3000L) // sorted by time
    assert(out2.head.firstMs == 1000L)
  }

  test("ride tracking end-to-end: state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[RideState.VisitEvent]
    stream.addData(RideState.VisitEvent("ride-1", 1000L, 34.7, 31.8, 10, 100))
    stream.addData(
      RideState.VisitEvent("ride-1", 2000L, 34.8, 31.9, 30, 900),
      RideState.VisitEvent("ride-2", 1500L, 35.0, 32.0, 20, 50))
    val q = RideState.track(stream.toDS())
      .writeStream.format("memory").queryName("ride_track").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    if (q.isActive) q.stop()
    val rows = spark.table("ride_track").as[RideState.RideProgress].collect()
    // the latest emitted progress per ride carries the accumulated state
    val last1 = rows.filter(_.rideKey == "ride-1").maxBy(_.nVisits)
    assert(last1.nVisits == 2 && last1.maxDistance == 900 && last1.maxVelocity == 30)
    assert(rows.exists(r => r.rideKey == "ride-2" && r.nVisits == 1))
  }

  test("timed-out ride is emitted closed and state removed") {
    val prior = RideState.RideProgress("ride-9", 4, 100L, 900L, 35.0, 32.0, 1200, 60, closed = false)
    val s = TestGroupState.create[RideState.RideProgress](
      optionalState = Optional.of(prior), timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 10000L, eventTimeWatermarkMs = Optional.empty(), hasTimedOut = true)
    val out = RideState.updateRide("ride-9", Iterator.empty, s).toSeq
    assert(out.head.closed && out.head.nVisits == 4)
    assert(s.isRemoved)
  }
}

class SnapshotStorageSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.SnapshotStorage

  test("status merge: fresh stats replace stale rows, others untouched") {
    val existing = Seq(
      ("2023/03/10/08/01", "error", 0L),
      ("2023/03/10/08/02", "loaded", 5L)).toDF("snapshot_id", "etl_status", "n")
    val fresh = Seq(
      ("2023/03/10/08/01", "loaded", 3L),
      ("2023/03/10/08/03", "loaded", 7L)).toDF("snapshot_id", "etl_status", "n")
    val merged = SnapshotStorage.mergeStatus(existing, fresh)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(merged == Map(
      "2023/03/10/08/01" -> ("loaded", 3L),
      "2023/03/10/08/02" -> ("loaded", 5L),
      "2023/03/10/08/03" -> ("loaded", 7L)))
  }

  test("writeTables is idempotent per snapshot: a backlog rerun never loses other partitions") {
    import graft.etl.SiriSnapshotEtl
    val outDir = java.nio.file.Files.createTempDirectory("star").toFile.getAbsolutePath
    // full load: two snapshots
    SnapshotStorage.writeTables(SiriSnapshotEtl.run(Seq(
      ("2023/03/10/08/01", SiriFixtures.snapA),
      ("2023/03/10/08/02", SiriFixtures.snapB)).toDF("snapshot_id", "json")), outDir)
    val facts0 = spark.read.parquet(s"$outDir/siri_vehicle_locations")
    assert(facts0.count() == 5)
    val routes0 = spark.read.parquet(s"$outDir/siri_routes").count()

    // backlog rerun touching ONLY snapshot 08/02
    SnapshotStorage.writeTables(SiriSnapshotEtl.run(Seq(
      ("2023/03/10/08/02", SiriFixtures.snapB)).toDF("snapshot_id", "json")), outDir)
    val facts1 = spark.read.parquet(s"$outDir/siri_vehicle_locations")
    // 08/01's three facts survive; 08/02's two are replaced, not doubled
    assert(facts1.count() == 5)
    assert(facts1.filter($"snapshot_id" === "2023/03/10/08/01").count() == 3)
    // dims keep every key ever seen, and gained no duplicates
    assert(spark.read.parquet(s"$outDir/siri_routes").count() == routes0)
    val stats = spark.read.parquet(s"$outDir/siri_snapshots")
    assert(stats.select("snapshot_id").distinct().count() == 2)
    assert(stats.count() == 2)
  }
}

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compaction bin-packs many small files, preserving rows") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toFile.getAbsolutePath + "/facts"
    val df = Tables.events(spark, sf0001)
      .withColumn("d", org.apache.spark.sql.functions.to_date($"ts"))
    // simulate daemon appends: many tiny files
    df.repartition(40).write.partitionBy("d").parquet(dir)
    val rows = spark.read.parquet(dir).count()
    val (before, after) = graft.sources.Maintenance.compact(spark, dir, "d", targetFileMB = 256)
    assert(before > after, s"$before -> $after")
    assert(spark.read.parquet(dir + "_compacted").count() == rows)
  }

  test("retention drops only partitions older than the cutoff, no data rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("expire").toFile.getAbsolutePath + "/facts"
    val df = Tables.events(spark, sf0001)
      .withColumn("d", org.apache.spark.sql.functions.date_format($"ts", "yyyy-MM-dd"))
    df.write.partitionBy("d").parquet(dir)
    // partition-value inference reads d back as DATE; compare as ISO strings
    val dates = spark.read.parquet(dir).select($"d".cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(dates.length >= 3, s"need multiple dates, got ${dates.toSeq}")
    val cutoff = dates(1) // keep from the second date onward
    val expectedKeptRows = df.filter($"d" >= cutoff).count()
    val (dropped, kept) = graft.sources.Maintenance.expirePartitions(spark, dir, "d", cutoff)
    assert(dropped == 1 && kept == dates.length - 1)
    assert(spark.read.parquet(dir).count() == expectedKeptRows)
    assert(spark.read.parquet(dir).select($"d").distinct().count() == dates.length - 1)
  }

  test("a partition larger than the target splits into multiple files, not one giant file") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("compactbig").toFile.getAbsolutePath + "/facts"
    // one big date (~3 MB of incompressible hex) + one tiny date
    spark.range(30000)
      .select(
        when($"id" < 29900, lit("2023-03-10")).otherwise(lit("2023-03-11")).as("d"),
        concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
          md5(($"id" + 2).cast("string")), md5(($"id" + 3).cast("string"))).as("payload"))
      .repartition(8).write.partitionBy("d").parquet(dir)
    val rows = spark.read.parquet(dir).count()
    val (_, after) = graft.sources.Maintenance.compact(spark, dir, "d", targetFileMB = 1)
    def filesIn(p: String): Long =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesIn(s"${dir}_compacted/d=2023-03-10") >= 2,
      s"big partition should bin-pack to >=2 files, got $after total")
    assert(filesIn(s"${dir}_compacted/d=2023-03-11") == 1)
    assert(spark.read.parquet(dir + "_compacted").count() == rows)
  }
}

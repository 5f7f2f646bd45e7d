package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SnapshotStream

import scala.collection.mutable

/** The continuous-daemon path: snapshots arrive as a stream, each
  * micro-batch runs the same ETL as the batch path and upserts via
  * foreachBatch (reference process_new_snapshots loop). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed snapshots produce the same tables as the batch path") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    stream.addData(("2023/03/10/08/01", SiriFixtures.snapA))
    stream.addData(("2023/03/10/08/02", SiriFixtures.snapB))

    val visits = SnapshotStream.parsedVisits(
      stream.toDF().toDF("snapshot_id", "json"))

    val sunk = mutable.Map[String, Long]().withDefaultValue(0L)
    val q = SnapshotStream.upsertWriter(visits) { (table, df, _) =>
      sunk.synchronized { sunk(table) += df.count() }
    }.start()
    q.awaitTermination(120000)

    assert(sunk("siri_vehicle_locations") == 5) // 3 ok in A + 2 in B
    assert(sunk("siri_snapshots") == 2)
    assert(sunk("siri_routes") >= 3) // (25,1),(25,3) in A; (30,9) new in B
    // batch-path equivalence on the fact count
    val batch = graft.etl.SiriSnapshotEtl.run(
      Seq(("2023/03/10/08/01", SiriFixtures.snapA),
        ("2023/03/10/08/02", SiriFixtures.snapB)).toDF("snapshot_id", "json"))
    assert(batch.vehicleLocations.count() == 5)
  }

  test("re-delivered snapshot dedups within the watermark on RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    SnapshotStream.rocksDbStateConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val stream = MemoryStream[(String, String)]
      // same snapshot delivered twice (the reference's retry loop)
      stream.addData(("2023/03/10/08/01", SiriFixtures.snapA))
      stream.addData(("2023/03/10/08/01", SiriFixtures.snapA))

      val deduped = SnapshotStream.dedupedVisits(
        SnapshotStream.parsedVisits(stream.toDF().toDF("snapshot_id", "json")))
      val q = deduped.writeStream.format("memory")
        .queryName("dedup_out").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // 4 distinct visits in snapA (3 ok + 1 parse-failure), not 8
      assert(spark.table("dedup_out").count() == 4)
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally SnapshotStream.rocksDbStateConfs.keys.foreach(spark.conf.unset)
  }

  test("heartbeat listener records per-batch progress while a query loads") {
    implicit val sqlCtx = spark.sqlContext
    val hb = new graft.streaming.Heartbeat
    spark.streams.addListener(hb)
    try {
      val stream = MemoryStream[(String, String)]
      stream.addData(("2023/03/10/08/01", SiriFixtures.snapA))
      val q = SnapshotStream.parsedVisits(stream.toDF().toDF("snapshot_id", "json"))
        .writeStream.format("memory").queryName("hb_out").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // listener delivery is async — wait for the beat to land
      val deadline = System.currentTimeMillis() + 30000
      while (hb.beats.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(hb.beats.nonEmpty)
      assert(hb.beats.exists(_.numInputRows > 0))
      assert(hb.alive(System.currentTimeMillis(), staleAfterMs = 60000))
    } finally spark.streams.removeListener(hb)
  }

  test("stream-stream interval join matches right events in the preceding horizon") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2023-03-10 08:$m%02d:00")
    val alerts = MemoryStream[(String, Timestamp)]
    val locs = MemoryStream[(String, Timestamp)]
    alerts.addData(("veh-1", ts(20)), ("veh-2", ts(20)))
    locs.addData(
      ("veh-1", ts(15)), // within 10m before the alert → match
      ("veh-1", ts(5)),  // too old → no match
      ("veh-2", ts(25))) // after the alert → no match
    val joined = SnapshotStream.streamIntervalJoin(
      alerts.toDF().toDF("a_veh", "a_ts"), locs.toDF().toDF("l_veh", "l_ts"),
      "a_veh", "l_veh", "a_ts", "l_ts")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("ssjoin")
      .collect().map(r => (r.getString(0), r.getString(2), r.getTimestamp(3)))
    assert(rows.toSet == Set(("veh-1", "veh-1", ts(15))))
  }
}

package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

/** Config-module + structured-logging parity (reference config.py /
  * logs.py): env-driven path derivation, the DEBUG gate, timed
  * sections, and the zero-arg CLI deployment path. */
class ConfigLogsSpec extends SparkSpec {

  private def withOverrides[T](kv: (String, String)*)(body: => T): T = {
    val prev = Config.overrides
    Config.overrides = prev ++ kv
    try body finally Config.overrides = prev
  }

  test("config derives raw/etl/checkpoint roots under the storage root; env overrides win") {
    withOverrides("GRAFT_STORAGE_ROOTPATH" -> "/data/stride") {
      assert(Config.rawRoot == "/data/stride/raw")
      assert(Config.etlRoot == "/data/stride/etl")
      assert(Config.checkpointRoot == "/data/stride/checkpoints")
      assert(Config.snapshotSourceRoot.isEmpty)
    }
    withOverrides(
        "GRAFT_STORAGE_ROOTPATH" -> "/data/stride",
        "GRAFT_ETL_ROOTPATH" -> "/fast/etl") {
      assert(Config.etlRoot == "/fast/etl")
      assert(Config.rawRoot == "/data/stride/raw") // others stay derived
    }
    // reference semantics: DEBUG is on only for the exact value "yes"
    withOverrides("GRAFT_DEBUG" -> "yes")(assert(Config.debug))
    withOverrides("GRAFT_DEBUG" -> "true")(assert(!Config.debug))
  }

  test("debugTime prints timed start/end sections only under DEBUG") {
    val out = new ByteArrayOutputStream()
    val r = Console.withOut(out) {
      withOverrides("GRAFT_DEBUG" -> "yes") {
        Logs.debugTime("load-snapshot", "snapshot_id" -> "2023/03/10/08/01")(41 + 1)
      }
    }
    assert(r == 42)
    val s = out.toString
    assert(s.contains("start load-snapshot") && s.contains("end load-snapshot"), s)
    assert(s.contains("\"snapshot_id\": \"2023/03/10/08/01\""), s)

    val silent = new ByteArrayOutputStream()
    Console.withOut(silent)(Logs.debugTime("quiet")(1))
    assert(silent.toString.isEmpty)
  }

  test("debugTimeStats accumulates per-section totals and reports slow calls") {
    val stats = new Logs.Stats
    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      Logs.debugTimeStats("parse", stats)(())
      Logs.debugTimeStats("parse", stats)(())
      Logs.debugTimeStats("slow-section", stats,
        logIfMoreThanSeconds = Some(0.0))(Thread.sleep(5))
    }
    assert(stats.get("parse-total-calls") == 2.0)
    assert(stats.get("parse-total-seconds") >= 0.0)
    assert(stats.get("slow-section-total-calls") == 1.0)
    assert(out.toString.contains("slow-section: took"), out.toString)
    assert(!out.toString.contains("parse: took"))
  }

  test("zero-arg CLI resolves every path from config (deploy without code edits)") {
    val root = Files.createTempDirectory("cfgroot").toString
    val rawId = "2023/03/10/08/01"
    val p = Paths.get(s"$root/raw/$rawId.json")
    Files.createDirectories(p.getParent)
    Files.write(p, SiriFixtures.snapA.getBytes("UTF-8"))
    withOverrides("GRAFT_STORAGE_ROOTPATH" -> root) {
      Cli.main(Array("process-snapshots"))
    }
    assert(spark.read.parquet(s"$root/etl/siri_vehicle_locations").count() == 3)
    // backfill DAG commands also resolve their status/raw/etl paths
    // from config: pending detection sees the gap after 08/01
    withOverrides("GRAFT_STORAGE_ROOTPATH" -> root) {
      Cli.main(Array("update-pending-snapshots", "2023/03/10/08/01", "2023/03/10/08/03"))
    }
    val status = spark.read.parquet(s"$root/etl/siri_snapshots")
    assert(status.filter(org.apache.spark.sql.functions.col("etl_status") === "pending")
      .count() == 2) // 08/02 and 08/03 missing from the raw dir
    // timed sections appear on the same path under DEBUG
    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      withOverrides("GRAFT_STORAGE_ROOTPATH" -> root, "GRAFT_DEBUG" -> "yes") {
        Cli.main(Array("process-snapshots"))
      }
    }
    assert(out.toString.contains("end write-vehicle-locations"), out.toString)
  }
}

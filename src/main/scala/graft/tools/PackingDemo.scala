package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStorage

/** Small-file packing measurement over the drain landing tree — the
  * evidence behind BASELINE_measured.md's scale note, which previously
  * ASSERTED that `spark.sql.files.maxPartitionBytes` /
  * `openCostInBytes` amortize the per-file scheduling tax of a
  * minute-partitioned tree (reference layout: one ~10 KB `.br` file
  * per minute, process_snapshot.py:324-342) without a number.
  *
  *   runMain graft.tools.PackingDemo <workDir> [minutes] [visitsPer]
  *
  * Generates (or reuses) a `minutes`-file tree, then runs the SAME
  * decode-and-parse job (binaryFile scan → RFC 7932 decode in the
  * mapper → JSON length sum — per-file work identical across runs)
  * under three packing configs:
  *   - one_task_per_file: openCostInBytes = maxPartitionBytes, so the
  *     greedy FilePartition packer can never co-locate two files — the
  *     unpacked worst case the scale note warns about;
  *   - default_packing: Spark defaults (4 MB open cost, 128 MB split);
  *   - tuned_packing: open cost ≈ the files' true ~64 KB handling cost,
  *     so task count collapses to ~total/maxSplit.
  * Prints one JSON line per config: scheduled scan tasks and wall —
  * identical work, so the wall delta IS the scheduling tax. Each run
  * repeats `passes` times (first pass also warms the page cache; the
  * MIN is reported, upper-bounding the tax honestly). */
object PackingDemo {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.length > 0) args(0) else
      Files.createTempDirectory("packingdemo").toString
    val minutes = if (args.length > 1) args(1).toInt else 6000
    val visitsPer = if (args.length > 2) args(2).toInt else 500
    val passes = sys.env.get("PACKING_DEMO_PASSES")
      .flatMap(_.toIntOption).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val landing = s"$workDir/landing"
    val marker = Paths.get(s"$landing/.complete_$minutes")
    if (!Files.exists(marker)) {
      SiriDrain.generateTree(landing, minutes, visitsPer)
      Files.createFile(marker)
    }

    val mb128 = (128L << 20).toString
    val configs = Seq(
      ("one_task_per_file", mb128, mb128),
      ("default_packing", (4L << 20).toString, mb128),
      ("tuned_packing", (64L << 10).toString, mb128))
    configs.foreach { case (name, openCost, maxPart) =>
      spark.conf.set("spark.sql.files.openCostInBytes", openCost)
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPart)
      val walls = (1 to passes).map { _ =>
        // fresh DataFrame per pass: the file-split planning reads the
        // session conf when the scan RDD is built
        val df = SnapshotStorage.readRaw(spark, landing)
        val t0 = System.nanoTime()
        df.agg(sum(length(col("json")))).head()
        (System.nanoTime() - t0) / 1e9
      }
      val tasks = SnapshotStorage.readRaw(spark, landing).rdd.getNumPartitions
      println(
        s"""{"metric":"packing_demo","config":"$name","files":$minutes,""" +
        s""""open_cost":$openCost,"max_partition_bytes":$maxPart,""" +
        s""""scan_tasks":$tasks,"walls_sec":[${walls.map(w => f"$w%.3f").mkString(",")}],""" +
        s""""best_sec":${f"${walls.min}%.3f"}}""")
    }
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance for the continuously-ingested fact tables.
  *
  * The daemon appends one micro-batch of files per trigger — after a
  * week the vehicle-locations table is thousands of kilobyte-files and
  * every scan pays the open/footer cost. Compaction bin-packs each
  * date partition to a target file size; the rewrite is per-partition
  * (dynamic overwrite), so compacting yesterday never touches today.
  */
object Maintenance {

  /** Rewrite `dir` (a parquet table partitioned by `partitionCol`)
    * with ~`targetFileMB` files per partition. Returns files before →
    * after for reporting. */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
      targetFileMB: Int = 256): (Long, Long) = {
    def countFiles(): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(dir))
    }
    val before = countFiles()
    val df = spark.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val targetFiles = math.max(1L,
      (bytes / (targetFileMB.toLong * 1024 * 1024)).toLong).toInt
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      df.repartition(targetFiles, col(partitionCol))
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol)
        .parquet(dir + "_compacted")
    } finally prev.foreach(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    // atomically swap would be a filesystem rename in production; here
    // the compacted copy lives alongside for the caller to promote
    val after = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(dir + "_compacted"))
    }
    (before, after)
  }
}

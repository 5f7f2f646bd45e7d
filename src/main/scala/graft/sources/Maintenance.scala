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
    * bin-packed to ~`targetFileMB` files. Returns files before →
    * after for reporting.
    *
    * Hash-partitioning by the partition column alone would send each
    * date to ONE task (a 10 GB day → one 10 GB file), so each row gets
    * a bounded deterministic salt: partition p with estimated size S
    * gets ⌈S/target⌉ salt values, and the shuffle key is (p, salt).
    * `maxRecordsPerFile` backstops salt-hash skew. */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
      targetFileMB: Int = 256): (Long, Long) = {
    def countFiles(root: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(root))
    }
    val before = countFiles(dir)
    val df = spark.read.parquet(dir)
    val targetBytes = targetFileMB.toLong * 1024 * 1024
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // per-partition file counts from row counts × global avg row width —
    // one small agg pass, no per-file driver listing
    val perPart = df.groupBy(col(partitionCol)).agg(count(lit(1)).as("_rows"))
    val totalRows = math.max(1L,
      perPart.agg(sum(col("_rows"))).head().getLong(0))
    val bytesPerRow = math.max(1L, (totalBytes / totalRows).toLong)
    val rowsPerFile = math.max(1L, targetBytes / bytesPerRow)
    val plan = perPart.withColumn("_nfiles",
      greatest(lit(1L), ceil(col("_rows") / lit(rowsPerFile.toDouble))))
    val totalFiles = math.max(1L,
      plan.agg(sum(col("_nfiles"))).head().getLong(0)).toInt
    val dataCols = df.columns.map(col).toSeq
    val salted = df
      .join(broadcast(plan.select(col(partitionCol), col("_nfiles"))), Seq(partitionCol))
      .withColumn("_salt", pmod(xxhash64(dataCols: _*), col("_nfiles")))
    salted
      .repartition(totalFiles, col(partitionCol), col("_salt"))
      .select(dataCols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(partitionCol)
      .parquet(dir + "_compacted")
    // atomically swap would be a filesystem rename in production; here
    // the compacted copy lives alongside for the caller to promote
    (before, countFiles(dir + "_compacted"))
  }

  /** Retention: drop partition directories whose value sorts below
    * `keepFrom` (dates in ISO form sort chronologically). Partition
    * deletion is a directory-metadata operation — no data scan, no
    * rewrite of surviving partitions — which is the point of
    * date-partitioning a continuously-ingested fact at 100 TB.
    * Returns (dropped, kept) partition counts. */
  def expirePartitions(spark: SparkSession, dir: String, partitionCol: String,
      keepFrom: String): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partitionCol="
    var dropped = 0L
    var kept = 0L
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith(prefix)) {
        if (name.stripPrefix(prefix) < keepFrom) {
          fs.delete(st.getPath, true)
          dropped += 1
        } else kept += 1
      }
    }
    (dropped, kept)
  }
}

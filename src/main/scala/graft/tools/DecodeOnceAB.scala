package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the decode-once composition for the image family (r13
  * verdict item 6): wall time of mm_image_histogram + mm_phash_dedup
  * run independently (each pays its own PNG decode pass — the
  * per-query gate shape) vs both consumers reading ONE persisted
  * [[graft.ops.Multimodal.decodedPlanes]] relation (the production
  * decode-once shape). Results are an EXPLAINS/VARIANCE input, not a
  * gate — the per-query bench keeps queries independent by design
  * (Bench's release-between-entries protocol must attribute decode
  * cost to the query that pays it).
  *
  *   runMain graft.tools.DecodeOnceAB <sfDir>
  */
object DecodeOnceAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def cleanup(): Unit = {
      graft.Caches.releaseAll(blocking = true)
      spark.catalog.clearCache()
      System.gc()
    }

    // warm the JVM/scan path once, outcome discarded
    graft.ops.Multimodal.imageHistogram(spark, dir).count()
    cleanup()

    val tIndep = time {
      graft.ops.Multimodal.imageHistogram(spark, dir).count()
      graft.ops.Multimodal.phashDedup(spark, dir).count()
    }
    cleanup()

    val tShared = time {
      val planes = graft.Caches.persistTracked(
        graft.ops.Multimodal.decodedPlanes(spark, dir))
      planes.count() // the ONE decode pass
      graft.ops.Multimodal.imageHistogramFrom(spark, planes).count()
      graft.ops.Multimodal.phashDedupFrom(spark, planes).count()
    }
    cleanup()

    println(f"""{"tool":"decode_once_ab","sf_dir":"$dir","independent_sec":$tIndep%.2f,"shared_decode_sec":$tShared%.2f,"ratio":${tShared / tIndep}%.3f}""")
    spark.stop()
  }
}

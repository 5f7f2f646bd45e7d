package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fingerprint-frequency profile for the winnow candidate join — the
  * drill-down behind PairGrowth: prints the df distribution of
  * `graft_winnow16` fingerprints over the doubled corpus, the top
  * offenders with the text gram behind them, and (for ScaleData dirs)
  * how many distinct replicas each hot fingerprint spans. Candidate
  * fan-in is Σ prefix_df·df, so a handful of corpus-wide fingerprints
  * (df ≈ |docs|) dominate the entire join.
  *
  *   runMain graft.tools.FpProfile <sfDir> [replicaSize]
  */
object FpProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val repSize = if (args.length > 1) args(1).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val shift = (docs.agg(max(col("doc_id")).cast("long")).head().getLong(0) / 100000L + 1L) * 100000L
    val doubled = docs.unionAll(
      docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    val sh = doubled
      .select(col("doc_id"), explode(expr("graft_winnow16(text)")).as("fp"))
      .persist()
    val freq = sh.groupBy(col("fp")).agg(count(lit(1)).as("df")).persist()

    println("== df histogram (log2 buckets) ==")
    freq.groupBy(expr("cast(floor(log2(df)) as int)").as("log2_df"))
      .agg(count(lit(1)).as("n_fps"), sum(col("df") * col("df")).as("sum_df2"))
      .orderBy(col("log2_df"))
      .show(40, truncate = false)

    println("== top 15 fps by df (with replica span if replicaSize given) ==")
    val top = freq.orderBy(col("df").desc).limit(15)
    val withSpan = if (repSize > 0) {
      sh.join(top, "fp")
        .groupBy(col("fp"))
        .agg(max("df").as("df"),
          countDistinct(expr(s"(doc_id % $shift) div $repSize")).as("replicas"),
          countDistinct(col("doc_id")).as("docs"))
        .orderBy(col("df").desc)
    } else top
    withSpan.show(15, truncate = false)
    spark.stop()
  }
}

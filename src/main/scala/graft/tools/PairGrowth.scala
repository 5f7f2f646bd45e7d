package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Work-bound accounting for the pair-enumerating dedup family — the
  * diagnosis tool behind the "superlinear at 10×" question (VERDICT r9
  * item 4): for each op it prints the CANDIDATE-GENERATION bound (the
  * rows the collision join actually produces) next to the row counts
  * feeding it, at whatever sfDir it's pointed at. Running it at sf0.1
  * and at the ScaleData-built sf1 answers, with measured numbers,
  * whether observed runtime growth tracks the collision bound (data
  * artifact / execution effect) or exceeds it (operator defect).
  *
  *   runMain graft.tools.PairGrowth <sfDir>
  */
object PairGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    val nDocs = docs.count()

    // ---- winnowPairs bound: doubled corpus, fingerprint stream,
    // prefix size, and the exact candidate fan-in Σ_fp prefix_df·df ----
    val shift = (docs.agg(max(col("doc_id"))).head().getLong(0) / 100000L + 1L) * 100000L
    val doubled = docs.unionAll(
      docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    val fpArr = doubled.select(col("doc_id"), expr("graft_winnow16(text)").as("fa"))
    val sh = fpArr.select(col("doc_id"), size(col("fa")).as("n"), explode(col("fa")).as("fp"))
      .persist()
    val shRows = sh.count()
    val tDec = lit(BigDecimal("0.8"))
    val freq = sh.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(freq, "fp")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("fp"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * tDec) + 1)
      .select(col("doc_id"), col("fp"))
    val prefixRows = ranked.count()
    // candidate fan-in = Σ_fp prefix_df(fp) · df(fp)
    val fanIn = ranked.groupBy(col("fp")).agg(count(lit(1)).as("pdf"))
      .join(freq, "fp")
      .agg(sum(col("pdf") * col("df"))).head().getLong(0)
    val candidates = ranked.as("a").join(sh.select(col("doc_id"), col("fp")).as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct().count()
    sh.unpersist()

    // ---- ngramJaccard / thresholdSweep bound: shingle stream + the
    // banded-minhash collision count thresholdSweep verifies ----
    val sweepPairs = {
      val toks = docs.select(col("doc_id"),
        expr("filter(split(lower(text), '[^a-z0-9]+'), w -> w <> '')").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), expr(
          "transform(sequence(0, size(ws) - 3), i -> " +
          "concat_ws(' ', ws[i], ws[i+1], ws[i+2]))").as("shingles"))
      val sh3 = toks.select(col("doc_id"), explode(array_distinct(col("shingles"))).as("s"))
        .persist()
      val n3 = sh3.count()
      val df3 = sh3.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val sumDf2 = df3.agg(sum(col("df") * col("df"))).head().getLong(0)
      sh3.unpersist()
      (n3, sumDf2)
    }

    println(
      s"""{"metric":"pair_growth","sf":"$sfDir","n_docs":$nDocs,""" +
      s""""winnow_fp_rows":$shRows,"winnow_prefix_rows":$prefixRows,""" +
      s""""winnow_candidate_fanin":$fanIn,"winnow_candidates":$candidates,""" +
      s""""shingle_rows":${sweepPairs._1},"shingle_sum_df2":${sweepPairs._2}}""")
    spark.stop()
  }
}

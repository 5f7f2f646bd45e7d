package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver-generated testdata for SCALE
  * MEASUREMENT (not correctness — oracles run on the driver's own
  * dirs): replicate `lineitem`, `documents`, and `embeddings` `factor`×
  * with per-replica key offsets, so the scaled corpus is `factor`
  * disjoint copies of the original — the same shape a larger TPC-H SF
  * has (more orders AND more parts, constant basket size; more docs
  * AND more near-dup families, constant family size; more vectors AND
  * more cells, constant cell size).
  *
  * Why disjoint copies and not verbatim replication: verbatim text
  * would plant `factor`-sized exact-duplicate families everywhere and
  * QUADRATICALLY inflate every collision-bounded candidate set — the
  * scaled run would measure the inflation, not the engine. Instead
  * every word is suffixed with the replica tag (within-replica shingle
  * structure identical, zero cross-replica collisions), graph keys and
  * embedding labels offset per replica (same degree / cell-size
  * distribution, `factor`× vertices/cells). Under this scaling the
  * predicted growth of every heavy family is LINEAR:
  *  - triangles: wedges ∝ Σ out-deg² — per-copy identical, `factor`×
  *  - LSH pairs: per-bucket collisions identical per copy, `factor`×
  *  - IVF/PQ: Σ cell² with constant cell size, `factor`× cells
  * Observed super-linear growth in BENCH_sf1 therefore indicts the
  * operator, not the data.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <dstDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleData <srcDir> <dstDir> <factor>")
    val Array(src, dst, fStr) = args.take(3)
    val f = fStr.toInt
    require(f >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def reps(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(f).toDF("__r"))

    // lineitem: orders, parts, suppliers all offset — f disjoint market
    // copies (degree distribution of the co-occurrence graph preserved)
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val (maxO, maxP, maxS) = {
      val r = li.agg(max("l_orderkey"), max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0) + 1, r.getLong(1) + 1, r.getLong(2) + 1)
    }
    reps(li)
      .withColumn("l_orderkey", col("l_orderkey") + col("__r") * maxO)
      .withColumn("l_partkey", col("l_partkey") + col("__r") * maxP)
      .withColumn("l_suppkey", col("l_suppkey") + col("__r") * maxS)
      .drop("__r")
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // documents: ids offset, every word suffixed with the replica tag
    // (replica 0 keeps the original text verbatim)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxD = docs.agg(max("doc_id")).head().getLong(0) + 1
    reps(docs)
      .withColumn("text",
        when(col("__r") === 0, col("text")).otherwise(
          array_join(expr("transform(split(text, ' '), w -> concat(w, '~', __r))"), " ")))
      .withColumn("doc_id", col("doc_id") + col("__r") * maxD)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__r")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // embeddings: ids and cell labels offset — f× cells of unchanged size
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val (maxV, maxL) = {
      val r = emb.agg(max("vec_id"), max(col("label").cast("long"))).head()
      (r.getLong(0) + 1, r.getLong(1) + 1)
    }
    reps(emb)
      .withColumn("vec_id", col("vec_id") + col("__r") * maxV)
      .withColumn("label",
        (col("label").cast("long") + col("__r") * maxL).cast("int"))
      .drop("__r")
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"""{"scaled":"$dst","factor":$f}""")
    spark.stop()
  }
}

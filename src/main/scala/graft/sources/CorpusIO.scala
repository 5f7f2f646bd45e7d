package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus ingestion and publication — the two endpoints of
  * the curation pipeline around the documents-shaped operators.
  *
  * Ingestion reads JSONL (the lingua franca of web-scale text dumps)
  * line-by-line and QUARANTINES failures instead of dropping them:
  * unparseable lines and schema-invalid records land in a side output
  * with the raw line preserved, so a 100 TB ingest is auditable — the
  * same segregate-don't-discard discipline as the reference's
  * parse-error sink (open_bus_siri_etl/process_snapshot.py:46).
  *
  * Publication writes the corpus as deterministically-sharded parquet:
  * shard by content hash of the id, order within shards, bound file
  * size — rerunning the write on the same input yields byte-identical
  * layout regardless of cluster size, which is what makes training
  * runs reproducible from the data side.
  */
object CorpusIO {

  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Parsed documents + quarantined lines. `good` rows satisfy the
    * schema AND the integrity predicate (non-null id and text);
    * everything else appears in `quarantine` with the raw line and a
    * reason. */
  final case class Ingest(good: DataFrame, quarantine: DataFrame)

  /** JSONL → (good, quarantine). The file is read as TEXT and parsed
    * with from_json per line — unlike the json reader's PERMISSIVE
    * mode, this keeps the raw line available for the quarantine sink
    * without caching tricks (Spark refuses to filter on the internal
    * corrupt-record column directly). */
  def readJsonl(spark: SparkSession, path: String): Ingest = {
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // blank lines are noise, not errors
      .select(col("value"),
        from_json(col("value"), documentSchema).as("d"))
      .select(col("value"), col("d.*"))
    val isValid = col("doc_id").isNotNull && col("text").isNotNull
    val good = parsed.filter(isValid)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))
    val quarantine = parsed.filter(!isValid || col("doc_id").isNull)
      .select(col("value").as("raw_line"),
        when(col("doc_id").isNull && col("text").isNull, "unparseable_or_missing_both")
          .when(col("doc_id").isNull, "missing_doc_id")
          .otherwise("missing_text").as("reason"))
    Ingest(good, quarantine)
  }

  /** Deterministic sharded parquet write: shard = portable 60-bit hash
    * of doc_id mod `shards` (stable across engines, runs, and cluster
    * sizes — NOT Spark's internal hash partitioning, which changes
    * with partition count), rows ordered by doc_id inside each shard,
    * file size bounded by maxRecordsPerFile. Output is
    * `outDir/shard=K/part-*.parquet`. */
  def writeSharded(df: DataFrame, outDir: String, shards: Int = 16,
                   maxRecordsPerFile: Long = 100000L): Unit = {
    df.withColumn("shard",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)") % shards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
  }
}

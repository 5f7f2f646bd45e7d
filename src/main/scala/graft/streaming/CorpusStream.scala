package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.CorpusIO

/** Continuous corpus ingestion — the streaming form of
  * [[graft.sources.CorpusIO.readJsonl]]: tail a landing directory of
  * JSONL dumps, parse per line, gate, dedup, and append parquet, with
  * quarantined lines in their own sink. The source checkpoint replaces
  * any "which files have we loaded" bookkeeping — the same file-source
  * discipline as the snapshot daemon ([[SnapshotStream.daemon]]),
  * applied to the training-data surface.
  *
  * Good rows and quarantine run as TWO queries over the same landing
  * dir (each with its own checkpoint): the good path gets Structured
  * Streaming's exactly-once parquet sink AND CROSS-BATCH dedup state
  * (`dropDuplicates` on the content hash — one 16-byte key per
  * distinct doc ever seen; bound it with a TTL'd state store or
  * output compaction when the stream outlives the state budget), and
  * the quarantine path can lag or replay independently — a dropped
  * line never blocks the corpus. */
object CorpusStream {

  /** Parse a text stream of JSONL lines into the documents shape +
    * validity flag (the streaming half of CorpusIO.readJsonl). */
  def parsedDocs(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), CorpusIO.documentSchema).as("d"))
      .select(col("value"), col("d.*"))
      .withColumn("is_valid", col("doc_id").isNotNull && col("text").isNotNull)

  /** Start both ingest queries: good rows (valid, quality ≥
    * minQuality, first occurrence of each content hash) append to
    * `outDir/docs`; invalid lines land in `outDir/quarantine` with the
    * raw line. AvailableNow processes the current backlog and stops —
    * run from a scheduler for batch semantics, or swap the trigger for
    * continuous tailing. */
  def ingest(spark: SparkSession, inDir: String, outDir: String, ckptDir: String,
             minQuality: Double = 0.0): (StreamingQuery, StreamingQuery) = {
    val good = parsedDocs(spark.readStream.text(inDir))
      .filter(col("is_valid"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))
      .withColumn("quality_score", graft.ops.TextAnalysis.qualityScoreCol)
      .filter(col("quality_score") >= minQuality)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")
      .writeStream
      .option("checkpointLocation", s"$ckptDir/docs")
      .option("path", s"$outDir/docs")
      .trigger(Trigger.AvailableNow())
      .start()
    val quarantine = parsedDocs(spark.readStream.text(inDir))
      .filter(!col("is_valid"))
      .select(col("value").as("raw_line"))
      .writeStream
      .option("checkpointLocation", s"$ckptDir/quarantine")
      .option("path", s"$outDir/quarantine")
      .trigger(Trigger.AvailableNow())
      .start()
    (good, quarantine)
  }
}

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

  /** Streaming maintenance of the portable CMS term-frequency sketch
    * ([[graft.ops.TextAnalysis.cmsSketch]]): each micro-batch computes
    * its partial (row_i, cell, cnt) counters and sum-merges them into
    * the running state — the streaming form of the merge law
    * QualityOpsR5bSpec proves for the batch sketch.
    *
    * Exactly-once without transactions: the merged state for batch N
    * is written to `outDir/cms/batch_N` (state reads come from the
    * HIGHEST batch dir, see [[latestCms]]). A replayed batch N
    * recomputes the same merge from batch N−1's state and OVERWRITES
    * its own dir — idempotent by construction, no marker files. The
    * state is bounded (3×512 counters) regardless of stream volume, so
    * the driver-side rewrite is constant work — the whole point of
    * maintaining a sketch instead of exact counts. */
  def cmsMaintain(spark: SparkSession, inDir: String, outDir: String,
                  ckptDir: String): StreamingQuery =
    parsedDocs(spark.readStream.text(inDir))
      .filter(col("is_valid"))
      .select(explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("w"))
      .writeStream
      .option("checkpointLocation", s"$ckptDir/cms")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val part = graft.ops.TextAnalysis.cmsSketch(batch)
        // merge against the highest state STRICTLY BELOW this batch:
        // on replay, batch N must not see its own (possibly partial)
        // batch_N dir or the merge double-counts
        val merged = latestCms(s, outDir, below = Some(batchId)) match {
          case Some(prev) => prev.unionAll(part)
            .groupBy(col("row_i"), col("cell")).agg(sum(col("cnt")).as("cnt"))
          case None => part
        }
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/cms/batch_$batchId")
        ()
      }
      .start()

  /** The current CMS state: the highest batch_N dir under outDir/cms
    * (optionally restricted to N < below, for replay-safe merging), or
    * None before the first batch commits. */
  def latestCms(spark: SparkSession, outDir: String,
                below: Option[Long] = None): Option[DataFrame] =
    latestState(spark, s"$outDir/cms", below)

  /** The current HLL register state under outDir/hll — same contract
    * as [[latestCms]]. */
  def latestHll(spark: SparkSession, outDir: String,
                below: Option[Long] = None): Option[DataFrame] =
    latestState(spark, s"$outDir/hll", below)

  private def latestState(spark: SparkSession, root0: String,
                          below: Option[Long]): Option[DataFrame] = {
    val root = new java.io.File(root0)
    val ids = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .map(_.getName.stripPrefix("batch_").toLong)
      .filter(id => below.forall(id < _))
    if (ids.isEmpty) None
    else Some(spark.read.parquet(s"$root0/batch_${ids.max}"))
  }

  /** Streaming distinct-document estimation: maintain the portable HLL
    * register table ([[graft.operators.Relational.hllRegisters]]) over
    * the stream of content hashes, max-merging each micro-batch's
    * partial registers into bounded 256-row state — the same
    * batch-stamped replay-idempotent layout as [[cmsMaintain]], with
    * max instead of sum as the merge. latestHll + the qHllPortable
    * estimate formula answer "how many distinct docs ever?" at any
    * moment without keeping per-doc state. */
  def hllMaintain(spark: SparkSession, inDir: String, outDir: String,
                  ckptDir: String): StreamingQuery =
    parsedDocs(spark.readStream.text(inDir))
      .filter(col("is_valid"))
      .select(md5(col("text")).as("k"))
      .writeStream
      .option("checkpointLocation", s"$ckptDir/hll")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val part = graft.operators.Relational.hllRegisters(batch)
        val merged = latestHll(s, outDir, below = Some(batchId)) match {
          case Some(prev) => prev.unionAll(part)
            .groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
          case None => part
        }
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/hll/batch_$batchId")
        ()
      }
      .start()
}

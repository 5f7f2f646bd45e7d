package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Streaming's exactly-once parquet sink AND cross-batch dedup state
  * that is BOUNDED by a watermark horizon — the [[SnapshotStream
  * .dedupedVisits]] discipline (`dropDuplicatesWithinWatermark` +
  * RocksDB state), so state size is horizon × arrival rate, never
  * stream lifetime — and the quarantine path can lag or replay
  * independently — a dropped line never blocks the corpus. */
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
    * minQuality, first occurrence of each content hash within the
    * `dedupTtl` horizon) append to `outDir/docs`; invalid lines land
    * in `outDir/quarantine` with the raw line. AvailableNow processes
    * the current backlog and stops — run from a scheduler for batch
    * semantics, or swap the trigger for continuous tailing.
    *
    * Dedup state is BOUNDED: `dropDuplicatesWithinWatermark` keys
    * state by content hash and EVICTS entries once the watermark
    * passes their event time + `dedupTtl`, so a duplicate landing
    * within the horizon is dropped and state size is horizon ×
    * arrival rate — never one key per distinct doc ever seen. A
    * re-crawl older than the horizon re-admits the doc; downstream
    * batch dedup ([[graft.ops.Dedup]]) owns whole-corpus exactness.
    * State lives in RocksDB ([[SnapshotStream.rocksDbStateConfs]],
    * applied here before start) — per-doc keys on the default on-heap
    * provider would OOM executors at corpus scale.
    *
    * `eventTime` defaults to processing time (`current_timestamp()`),
    * which makes `dedupTtl` a wall-clock TTL; pass a real event-time
    * column when the landing files carry one. */
  def ingest(spark: SparkSession, inDir: String, outDir: String, ckptDir: String,
             minQuality: Double = 0.0,
             dedupTtl: String = "24 hours",
             eventTime: Column = current_timestamp(),
             trigger: Trigger = Trigger.AvailableNow()): (StreamingQuery, StreamingQuery) = {
    // the RocksDB provider confs are scoped to a CLONED session (shared
    // SparkContext, isolated SQL conf) so this query's state-store
    // choice can't silently leak into other streaming queries the
    // caller's session runs
    val session = spark.newSession()
    SnapshotStream.rocksDbStateConfs.foreach { case (k, v) => session.conf.set(k, v) }
    val good = parsedDocs(session.readStream.text(inDir))
      .filter(col("is_valid"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))
      .withColumn("quality_score", graft.ops.TextAnalysis.qualityScoreCol)
      .filter(col("quality_score") >= minQuality)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("ingest_ts", eventTime)
      .withWatermark("ingest_ts", dedupTtl)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("ingest_ts")
      .writeStream
      .option("checkpointLocation", s"$ckptDir/docs")
      .option("path", s"$outDir/docs")
      .trigger(trigger)
      .start()
    val quarantine = parsedDocs(spark.readStream.text(inDir))
      .filter(!col("is_valid"))
      .select(col("value").as("raw_line"))
      .writeStream
      .option("checkpointLocation", s"$ckptDir/quarantine")
      .option("path", s"$outDir/quarantine")
      .trigger(trigger)
      .start()
    (good, quarantine)
  }

  /** The continuous form of [[ingest]] with the snapshot daemon's
    * lifecycle discipline ([[SnapshotStream.daemon]]): a periodic
    * trigger tails the landing dir forever, and a shutdown hook stops
    * both queries on SIGTERM. `StreamingQuery.stop()` interrupts the
    * in-flight micro-batch rather than letting it finish — the aborted
    * batch simply REPLAYS from the checkpoint on restart (exactly-once
    * via offset log + file-sink transactionality), which is how the
    * reference's GracefulKiller intent (never ship a torn batch) is
    * met on Spark: not by deferring the stop, but by making a torn
    * batch unobservable. */
  def daemon(spark: SparkSession, inDir: String, outDir: String, ckptDir: String,
             minQuality: Double = 0.0,
             dedupTtl: String = "24 hours",
             trigger: Trigger = Trigger.ProcessingTime("60 seconds")):
      (StreamingQuery, StreamingQuery) = {
    val (good, quarantine) =
      ingest(spark, inDir, outDir, ckptDir, minQuality, dedupTtl, trigger = trigger)
    sys.addShutdownHook {
      if (good.isActive) good.stop()
      if (quarantine.isActive) quarantine.stop()
    }
    (good, quarantine)
  }

  /** Per-batch ingest quality monitor — an INDEPENDENT query over the
    * same landing dir (own checkpoint, like the quarantine sink): for
    * every micro-batch, one stats row (lines, valid, quarantined,
    * below-quality, ingestable) overwritten to
    * `outDir/ingest_stats/batch_N` — the same replay-idempotent
    * batch-stamped layout as the sketch state, so a replayed batch
    * rewrites its own row and operators can watch quality drift
    * without ever scanning the corpus. State is ONE row per trigger —
    * nothing grows. */
  def ingestStats(spark: SparkSession, inDir: String, outDir: String,
                  ckptDir: String, minQuality: Double = 0.0): StreamingQuery =
    parsedDocs(spark.readStream.text(inDir))
      .writeStream
      .option("checkpointLocation", s"$ckptDir/ingest_stats")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stats = batch
          .withColumn("q", when(col("is_valid"),
            graft.ops.TextAnalysis.qualityScoreCol))
          .agg(
            count(lit(1)).as("n_lines"),
            sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
            sum(when(col("is_valid"), 0L).otherwise(1L)).as("n_quarantined"),
            sum(when(col("is_valid") && col("q") < minQuality, 1L).otherwise(0L))
              .as("n_below_quality"))
          .select(lit(batchId).as("batch_id"), col("n_lines"), col("n_valid"),
            col("n_quarantined"), col("n_below_quality"),
            (col("n_valid") - col("n_below_quality")).as("n_ingestable"))
        stats.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/ingest_stats/batch_$batchId")
        ()
      }
      .start()

  /** Streaming maintenance of the portable CMS term-frequency sketch
    * ([[graft.ops.TextAnalysis.cmsSketch]]): each micro-batch computes
    * its partial (row_i, cell, cnt) counters and sum-merges them into
    * the running state — the streaming form of the merge law
    * QualityOpsR5bSpec proves for the batch sketch.
    *
    * Exactly-once without transactions: the merged state for batch N
    * is written to `outDir/cms/batch_N` (state reads come from the
    * HIGHEST COMMITTED batch dir — `_SUCCESS` present — see
    * [[latestCms]]; a reused state root under a fresh checkpoint is
    * refused at batch 0, see [[requireFreshStateRoot]]). A replayed
    * batch N recomputes the same merge from batch N−1's state and
    * OVERWRITES its own dir — idempotent by construction. The
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
        requireFreshStateRoot(s, s"$outDir/cms", batchId)
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

  /** Batch ids of COMMITTED state dirs under `root0`: `batch_N`
    * directories carrying the `_SUCCESS` marker. Listed through the
    * Hadoop FileSystem API so the state layout works on HDFS/S3/any
    * mounted store, not just the local filesystem; a partially-written
    * dir (crash mid-overwrite, no `_SUCCESS`) is never treated as
    * state — its batch replays and rewrites it. */
  private def committedIds(spark: SparkSession, root0: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(root0)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("batch_\\d+"))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch_").toLong)
  }

  private def latestState(spark: SparkSession, root0: String,
                          below: Option[Long]): Option[DataFrame] = {
    val ids = committedIds(spark, root0).filter(id => below.forall(id < _))
    if (ids.isEmpty) None
    else Some(spark.read.parquet(s"$root0/batch_${ids.max}"))
  }

  /** Guard against silent state corruption when an output dir is
    * reused with a FRESH checkpoint: batch ids restart at 0, and once
    * the new run's id exceeds a stale `batch_N` left by the prior run,
    * the stale dir would win the "latest below N" pick and double-count
    * the old data into the new state (external [[latestCms]] readers
    * would see it immediately). A resume of the SAME checkpoint never
    * replays batch 0 with higher committed ids present, so at batch 0
    * any committed id ≥ 1 proves a mismatched (checkpoint, state-root)
    * pairing — refuse loudly instead of merging garbage. */
  private def requireFreshStateRoot(spark: SparkSession, root0: String,
                                    batchId: Long): Unit =
    if (batchId == 0) {
      val stale = committedIds(spark, root0).filter(_ >= 1)
      if (stale.nonEmpty) throw new IllegalStateException(
        s"state root $root0 holds batch dirs ${stale.sorted.mkString(", ")} " +
          "from a previous run but this checkpoint is at batch 0; " +
          "point the query at an empty state root (or resume the original checkpoint)")
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
        requireFreshStateRoot(s, s"$outDir/hll", batchId)
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

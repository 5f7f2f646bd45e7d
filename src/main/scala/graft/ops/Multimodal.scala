package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch feature extraction, decode behind a stub.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake — but the Spark-side plumbing is real: binary
  * columns flow through parquet, features are extracted per partition in
  * batches (the Scala analogue of `mapInPandas`), and the schema /
  * partitioning / batch shape is what a real codec would plug into.
  */
object Multimodal {

  /** A media record: binary payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      n_frames: Long, decode_status: String, feature0: Double)

  /** Oracle-checked feature projection over a synthesized binary column
    * (UTF-8 payload of `text`): byte length, header hex, portable
    * content hash, fake frame count. Everything per-row, codegen'd. */
  def binaryFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("text"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("header_hex"),
        md5(hex(col("payload"))).as("content_hash"),
        (length(col("payload")).cast("long") / 256).cast("long").as("n_frames"),
        detectType(hex(encode(substring(col("text"), 1, 4), "UTF-8"))).as("detected_type"),
        lit("stubbed-no-codec").as("decode_status"))
      .orderBy(col("doc_id"))

  /** Container-format sniffing from the 4-byte header (magic bytes) —
    * the dispatch a real decode stage keys on. Text payloads land on
    * "unknown"; the spec exercises real magic bytes. */
  def detectType(headerHex: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(headerHex.startsWith("89504E47"), "png")
      .when(headerHex.startsWith("FFD8FF"), "jpeg")
      .when(headerHex.startsWith("47494638"), "gif")
      .when(headerHex.startsWith("52494646"), "riff")
      .when(headerHex.startsWith("664C6143"), "flac")
      .otherwise("unknown")

  /** Deterministic stand-in for a codec: "decodes" a payload into one
    * scalar feature. A real deployment swaps this body for the codec
    * call; the batching around it doesn't change. */
  private def decodeStub(payload: Array[Byte]): (String, Double) = {
    var acc = 0L
    var i = 0
    while (i < payload.length) { acc = acc * 31 + (payload(i) & 0xff); i += 1 }
    ("stubbed-no-codec", (acc & 0xffffff).toDouble / 0xffffff)
  }

  /** The mapInPandas-shaped path: typed Dataset, per-partition batched
    * decode (batch size bounds peak memory per task — at 100 TB the
    * payloads dominate, so partitions are sized by
    * `spark.sql.files.maxPartitionBytes`, not row count). */
  def decodePipeline(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would process `batch` as one vectorized call
        batch.iterator.map { r =>
          val (status, f0) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
            r.payload.length.toLong / 256, status, f0)
        }
      }
    }
  }

  /** Frame sampling in its declarative form (oracle-checked): the
    * payload is a sequence of fixed-size frames; keep every 2nd. The
    * fan-out is `sequence`+`explode` (an inline generator, map-side, no
    * shuffle) and the per-frame slice is a codegen'd substring — the
    * exact plan shape a real video sampler has, with the codec swapped
    * for byte slicing. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        (length(col("text")) / 64).cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(2))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(expr("substr(text, frame_idx * 64 + 1, 64)")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  case class ResizedMedia(doc_id: Long, media_type: String, orig_bytes: Long,
      resized_bytes: Long, resized: Array[Byte])

  /** Deterministic stand-in for an image resize: keep every `factor`-th
    * byte. A real deployment swaps the body for the scaler call. */
  private def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Batched resize over the typed path (same mapInPandas-shaped
    * contract as decodePipeline): payload in, smaller payload out,
    * peak memory bounded by batchSize × payload size per task. */
  def resizePipeline(media: Dataset[MediaRecord], factor: Int = 4,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val small = resizeStub(r.payload, factor)
          ResizedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
            small.length.toLong, small)
        }
      }
    }
  }

  /** Build a MediaRecord dataset from the documents table (text bytes as
    * the opaque payload; media_type cycles deterministically). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Perceptual-hash near-dup over the binary payload — the media
    * analogue of [[Dedup.simhash]]: a 60-bit fingerprint built from
    * byte-level 4-byte shingles (stride 1 byte, over the hex view of
    * the payload), then the same 3×20-bit pigeonhole banding + exact
    * hamming ≤ 2 verify. A real deployment swaps the byte-shingle
    * fingerprint for a codec-side pHash/chromaprint; the banded
    * candidate join, the dedup decision, and the scale shape (shuffle
    * ONLY on (chunk, value), never an O(n²) pair scan) are identical
    * and are what this op locks in.
    *
    * Byte shingles — unlike token shingles — survive payloads with no
    * text structure at all, which is the point for media columns. */
  def phashDedup(spark: SparkSession, dir: String,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sim = Tables.documents(spark, dir)
      .select(col("doc_id"), hex(encode(col("text"), "UTF-8")).as("h"))
      .select(col("doc_id"), expr(
        """graft_simhash60(array_distinct(transform(
             sequence(1, greatest(length(h) - 7, 1), 2), i -> substr(h, i, 8))))""").as("sim"))
    Dedup.bandedHammingPairs(sim, 2, maxBucket)
  }
}

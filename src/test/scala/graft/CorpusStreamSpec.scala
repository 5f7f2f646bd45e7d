package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.CorpusStream

class CorpusStreamSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("streaming ingest dedups across micro-batches and quarantines bad lines") {
    val in = tmpDir("cstream-in"); val out = tmpDir("cstream-out")
    val ckpt = tmpDir("cstream-ckpt")
    Files.writeString(Paths.get(in, "batch1.jsonl"),
      """{"doc_id": 1, "text": "the quick brown fox and the lazy dog of a tale in a field", "lang": "en", "source": "web"}
        |{"doc_id": 2, "text": "a second document of the corpus to keep and to hold in full", "lang": "en", "source": "web"}
        |broken line one
        |""".stripMargin)
    val (g1, q1) = CorpusStream.ingest(spark, in, out, ckpt)
    g1.awaitTermination(60000); q1.awaitTermination(60000)
    // second drop: one duplicate text (new id), one new doc, one bad line
    Files.writeString(Paths.get(in, "batch2.jsonl"),
      """{"doc_id": 3, "text": "the quick brown fox and the lazy dog of a tale in a field", "lang": "en", "source": "web"}
        |{"doc_id": 4, "text": "a third document of the corpus to keep and to hold in full", "lang": "en", "source": "web"}
        |{"no_id": true}
        |""".stripMargin)
    val (g2, q2) = CorpusStream.ingest(spark, in, out, ckpt)
    g2.awaitTermination(60000); q2.awaitTermination(60000)

    val docs = spark.read.parquet(s"$out/docs")
    // doc 3's text is a cross-batch duplicate of doc 1's — state must drop it
    assert(docs.count() == 3, s"expected 3 docs, got ${docs.count()}")
    assert(docs.groupBy(col("content_hash")).count().filter(col("count") > 1).count() == 0)
    assert(docs.filter(col("doc_id") === 3).count() == 0, "cross-batch duplicate survived")
    val quarantine = spark.read.parquet(s"$out/quarantine")
    assert(quarantine.count() == 2)
  }

  test("ingest dedup state is watermark-bounded: in-horizon dup dropped, evicted key re-admitted") {
    val in = tmpDir("cstream-ttl-in"); val out = tmpDir("cstream-ttl-out")
    val ckpt = tmpDir("cstream-ttl-ckpt")
    val sharedText = "the quick brown fox and the lazy dog of a tale in a field"
    def doc(id: Int, ts: String) =
      s"""{"doc_id": $id, "text": "$sharedText", "lang": "en", "source": "$ts"}"""
    // event time rides in `source`; 1h TTL
    def run(): Unit = {
      val (g, q) = CorpusStream.ingest(spark, in, out, ckpt,
        dedupTtl = "1 hour", eventTime = to_timestamp(col("source")))
      g.awaitTermination(60000); q.awaitTermination(60000)
    }
    def other(id: Int, ts: String) =
      s"""{"doc_id": $id, "text": "an unrelated watermark advancing document number $id", "lang": "en", "source": "$ts"}"""
    Files.writeString(Paths.get(in, "t1.jsonl"), doc(1, "2026-01-01 00:00:00") + "\n")
    run()
    // doc 2: same text 30min later — within the 1h horizon, dup dropped
    Files.writeString(Paths.get(in, "t2.jsonl"), doc(2, "2026-01-01 00:30:00") + "\n")
    run()
    // two unrelated docs march the watermark well past doc 1's expiry
    // (event time + 1h TTL), forcing the eviction pass to run — robust
    // to whether eviction applies the pre- or post-batch watermark
    Files.writeString(Paths.get(in, "t3.jsonl"), other(10, "2026-01-01 05:00:00") + "\n")
    run()
    Files.writeString(Paths.get(in, "t4.jsonl"), other(11, "2026-01-01 06:00:00") + "\n")
    run()
    // doc 3: same text, far past the horizon — doc 1's key was EVICTED
    // (state is bounded by the horizon), so the text is re-admitted
    Files.writeString(Paths.get(in, "t5.jsonl"), doc(3, "2026-01-01 10:00:00") + "\n")
    run()
    val ids = spark.read.parquet(s"$out/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L), "first occurrence must be emitted")
    assert(!ids.contains(2L), "duplicate within the watermark horizon must be dropped")
    assert(ids.contains(3L),
      "duplicate past the horizon must be re-admitted — proves state eviction, i.e. bounded state")
  }

  test("sketch state refuses a reused state root under a fresh checkpoint") {
    val in = tmpDir("cms-stale-in"); val out = tmpDir("cms-stale-out")
    Files.writeString(Paths.get(in, "b1.jsonl"),
      """{"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "web"}
        |""".stripMargin)
    // first run commits batch_0; a second FILE advances the same
    // checkpoint to batch_1
    val ckpt1 = tmpDir("cms-stale-ckpt1")
    CorpusStream.cmsMaintain(spark, in, out, ckpt1).awaitTermination(60000)
    Files.writeString(Paths.get(in, "b2.jsonl"),
      """{"doc_id": 2, "text": "delta epsilon", "lang": "en", "source": "web"}
        |""".stripMargin)
    CorpusStream.cmsMaintain(spark, in, out, ckpt1).awaitTermination(60000)
    assert(CorpusStream.latestCms(spark, out).isDefined)
    // fresh checkpoint + same outDir: batch ids restart at 0 while
    // batch_1 state from the prior run survives — must fail loudly
    // instead of silently double-counting the old data
    val ckpt2 = tmpDir("cms-stale-ckpt2")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      CorpusStream.cmsMaintain(spark, in, out, ckpt2).awaitTermination(60000)
    }
    assert(ex.getMessage.contains("batch 0") || ex.getCause.getMessage.contains("batch 0"))
  }

  test("ingestStats writes one replay-idempotent stats row per batch") {
    val in = tmpDir("cstats-in"); val out = tmpDir("cstats-out")
    val ckpt = tmpDir("cstats-ckpt")
    Files.writeString(Paths.get(in, "s1.jsonl"),
      """{"doc_id": 1, "text": "a first valid document of reasonable length for the gate", "lang": "en", "source": "web"}
        |{"doc_id": 2, "text": "a second valid document of reasonable length for the gate", "lang": "en", "source": "web"}
        |not json at all
        |""".stripMargin)
    CorpusStream.ingestStats(spark, in, out, ckpt).awaitTermination(60000)
    val b0 = spark.read.parquet(s"$out/ingest_stats/batch_0").head()
    assert(b0.getAs[Long]("n_lines") == 3)
    assert(b0.getAs[Long]("n_valid") == 2)
    assert(b0.getAs[Long]("n_quarantined") == 1)
    assert(b0.getAs[Long]("n_ingestable") == 2)
    // a second drop lands in its own batch row; batch_0 is untouched
    Files.writeString(Paths.get(in, "s2.jsonl"),
      """{"doc_id": 3, "text": "a third valid document of reasonable length for the gate", "lang": "en", "source": "web"}
        |""".stripMargin)
    CorpusStream.ingestStats(spark, in, out, ckpt).awaitTermination(60000)
    val b1 = spark.read.parquet(s"$out/ingest_stats/batch_1").head()
    assert(b1.getAs[Long]("n_lines") == 1 && b1.getAs[Long]("n_valid") == 1)
    assert(spark.read.parquet(s"$out/ingest_stats/batch_0")
      .head().getAs[Long]("n_lines") == 3)
  }

  test("daemon ingests the backlog and terminates cleanly with AvailableNow") {
    val in = tmpDir("cdaemon-in"); val out = tmpDir("cdaemon-out")
    val ckpt = tmpDir("cdaemon-ckpt")
    Files.writeString(Paths.get(in, "d1.jsonl"),
      """{"doc_id": 1, "text": "a daemon-ingested document of reasonable length to keep", "lang": "en", "source": "web"}
        |""".stripMargin)
    val (g, q) = CorpusStream.daemon(spark, in, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    g.awaitTermination(60000); q.awaitTermination(60000)
    assert(!g.isActive && !q.isActive)
    assert(spark.read.parquet(s"$out/docs").count() == 1)
  }

  test("cmsMaintain merges micro-batch sketches into the exact batch sketch") {
    import spark.implicits._
    val in = tmpDir("cms-in"); val out = tmpDir("cms-out")
    val ckpt = tmpDir("cms-ckpt")
    Files.writeString(Paths.get(in, "b1.jsonl"),
      """{"doc_id": 1, "text": "alpha beta gamma alpha", "lang": "en", "source": "web"}
        |{"doc_id": 2, "text": "beta delta epsilon", "lang": "en", "source": "web"}
        |""".stripMargin)
    CorpusStream.cmsMaintain(spark, in, out, ckpt).awaitTermination(60000)
    Files.writeString(Paths.get(in, "b2.jsonl"),
      """{"doc_id": 3, "text": "alpha zeta zeta eta", "lang": "en", "source": "web"}
        |""".stripMargin)
    CorpusStream.cmsMaintain(spark, in, out, ckpt).awaitTermination(60000)

    val state = CorpusStream.latestCms(spark, out)
      .getOrElse(fail("no CMS state written"))
    // the incrementally-maintained state must equal the batch sketch
    // over the full token set — the streaming form of the merge law
    val allToks = Seq("alpha", "beta", "gamma", "alpha", "beta", "delta",
      "epsilon", "alpha", "zeta", "zeta", "eta").toDF("w")
    val expected = ops.TextAnalysis.cmsSketch(allToks)
    assert(state.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(state).count() == 0)
    // and both earlier states exist (batch_0 then batch_1)
    assert(CorpusStream.latestCms(spark, out, below = Some(1)).isDefined)
  }

  test("hllMaintain max-merges micro-batch registers into the batch registers") {
    val in = tmpDir("hll-in"); val out = tmpDir("hll-out")
    val ckpt = tmpDir("hll-ckpt")
    Files.writeString(Paths.get(in, "b1.jsonl"),
      """{"doc_id": 1, "text": "first document text", "lang": "en", "source": "web"}
        |{"doc_id": 2, "text": "second document text", "lang": "en", "source": "web"}
        |""".stripMargin)
    CorpusStream.hllMaintain(spark, in, out, ckpt).awaitTermination(60000)
    Files.writeString(Paths.get(in, "b2.jsonl"),
      """{"doc_id": 3, "text": "third document text", "lang": "en", "source": "web"}
        |{"doc_id": 4, "text": "first document text", "lang": "en", "source": "web"}
        |""".stripMargin)
    CorpusStream.hllMaintain(spark, in, out, ckpt).awaitTermination(60000)

    val state = CorpusStream.latestHll(spark, out)
      .getOrElse(fail("no HLL state written"))
    // streaming state == batch registers over the union of hashes
    // (doc 4 duplicates doc 1's text — same hash, no register change)
    import spark.implicits._
    val expected = graft.operators.Relational.hllRegisters(
      Seq("first document text", "second document text", "third document text",
        "first document text").toDF("text").select(md5(col("text")).as("k")))
    assert(state.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(state).count() == 0)
  }
}

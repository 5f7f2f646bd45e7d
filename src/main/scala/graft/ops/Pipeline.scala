package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Composed corpus-curation pipeline — the C4-style filter chain every
  * LLM training-data build runs (quality gate → language gate →
  * near-dup canonicalization), expressed as ONE DataFrame plan over
  * the individual operators. Demonstrates that the operator family
  * composes: each stage is the already-oracle-checked op, the gates
  * are plain filters, and the duplicate drop is a left_anti against
  * the clustering's non-canonical members — so the whole chain stays
  * declarative and Catalyst plans it end-to-end (filters collapse into
  * the shared documents scan; no staging tables between stages).
  *
  * At 100 TB each stage keeps its own scale story (map-side scoring,
  * LSH pair generation, contraction clustering); the composition adds
  * two joins on doc_id — the natural partitioning key for all of them.
  */
object Pipeline {
  /** Deterministic train/validation/test assignment (80/10/10) from
    * the engine-portable 60-bit content hash of the doc id — the
    * reproducible-split primitive every training build needs: pure
    * map-side projection, no shuffle, stable across engines, runs, and
    * cluster sizes (the portable-hash SQL spelling is rewritten to the
    * native H60 kernel by NativeHashRewrite where registered). */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: training docs (doc_id % 10 != 0) whose
    * shingle MinHash lands in the same LSH band bucket as any held-out
    * benchmark doc (doc_id % 10 == 0) — the n-gram-overlap screen run
    * before training so eval data can't leak into the corpus. The only
    * wide op is the (band, bucket) equi-join, fan-in bounded by
    * collision rate — identical scale shape to near-dup pairing. */
  /** Generic form: corpus docs whose MinHash band bucket collides with
    * any benchmark doc's. Both sides arrive as (doc_id, band, bkey)
    * relations (Dedup.lshBands over any documents-shaped table), so a
    * real deployment passes its actual benchmark set. */
  def decontaminateAgainst(corpusBands: DataFrame, benchBands: DataFrame): DataFrame =
    corpusBands
      .join(benchBands.select(col("band"), col("bkey"), col("doc_id").as("bench_id")),
        Seq("band", "bkey"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("bench_id")).as("n_benchmark_hits"))
      .orderBy(col("doc_id"))

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val bands = Dedup.lshBands(spark, dir)
    // oracle-gated demo split: every 10th doc is the held-out benchmark
    decontaminateAgainst(
      bands.filter(col("doc_id") % 10 =!= 0),
      bands.filter(col("doc_id") % 10 === 0))
  }

  /** Deterministic shard assignment + within-shard order — the final
    * "write the training corpus" step: 16 shards by portable hash, and
    * a reproducible interleave order inside each shard from a second,
    * salted hash (so shard order is decorrelated from doc_id AND from
    * the shard assignment itself). Pure projection + one per-shard
    * window; at 100 TB the window partitions by shard — exactly the
    * write-parallelism unit — so ordering never needs a global sort. */
  def shardOrder(spark: SparkSession, dir: String): DataFrame = {
    val h = (salt: String) =>
      s"CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '$salt')), 1, 15), 16, 10) AS BIGINT)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("ord_hash"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(s"${h("")} % 16").as("shard"),
        expr(h("-order")).as("ord_hash"))
      .withColumn("order_in_shard", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("order_in_shard"))
      .orderBy(col("doc_id"))
  }

  def corpusFilter(spark: SparkSession, dir: String): DataFrame = {
    // NOT cached: the pushed quality predicate does re-evaluate the
    // score expression in Filter + Project (2× the regexps), but an
    // A/B at sf1 measured the persistTracked variant at 20s vs 9.5s —
    // materializing two full doc-grain caches costs more than the
    // saved double-eval. Contrast shingleDfProfile, where the pushed
    // filter was PER-ELEMENT (O(shingles) regexp re-runs), not 2×.
    val quality = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val lang = TextAnalysis.langid(spark, dir)
      .select(col("doc_id"), col("predicted_lang"))
    // near-dup clustering keeps one canonical doc (the component min)
    // per duplicate group; every other member is dropped
    val nonCanonical = Dedup.components(spark, dir)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(quality, "doc_id")
      .filter(col("quality_score") >= 0.3)
      .join(lang, "doc_id")
      .filter(col("predicted_lang") === "en")
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** Concat-and-chunk sequence packing — the pre-training batching
    * step that concatenates a shard's documents end-to-end and cuts
    * every `budget` units (chars here as the token proxy; swap in
    * text_tokens for real token counts): each doc lands in the pack
    * containing its start offset. The running offset is ONE window sum
    * partitioned by shard — the write-parallelism unit — so packing
    * never needs a global sort, and pack ids are deterministic across
    * runs and cluster sizes (shard from the portable hash, order by
    * doc_id). */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 16")
          .as("shard"))
      .withColumn("start_off", sum(col("n_chars")).over(w) - col("n_chars"))
      .select(col("doc_id"), col("shard"),
        expr(s"start_off DIV $budget").as("pack_id"),
        expr(s"start_off % $budget").as("pack_offset"))
      .orderBy(col("doc_id"))
  }

  /** Dedup cascade report — the C4 → MinHash → SemDeDup funnel every
    * production curation pipeline runs, composed from the three
    * already-oracle-gated stages and reported as marginal attribution
    * in cascade order: exact text dedup first (keep min doc per
    * content hash), then MinHash-LSH near-dup canonicalization (keep
    * each cluster's minimum — provably never exact-removed, since an
    * exact twin of a cluster minimum would be a smaller same-cluster
    * member), then embedding SemDeDup (remove docs with a smaller
    * cosine-close same-cell neighbor). Each stage's keep-set is
    * computed corpus-wide (exactly how a 100 TB audit attributes
    * marginal removal without re-running downstream stages per
    * variant); the cascade is their ordered intersection.
    *
    * Shape at scale: stage flags are one window (content hash), one
    * converged label table (broadcast-gated), one cell-blocked pair
    * agg — all existing plans; the report is a single conditional agg
    * folded to 3 rows via stack. */
  def dedupCascade(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (row_number().over(w) > 1).cast("int").as("rm1"))
    val mh = Dedup.componentsMinLabel(spark, dir)
      .select(col("doc_id"), (col("component") =!= col("doc_id")).cast("int").as("rm2"))
    val sd = Similarity.semDedup(spark, dir)
      .select(col("vec_id").as("doc_id"), lit(1).as("rm3"))
    val f = ex
      .join(mh, Seq("doc_id"), "left")
      .join(sd, Seq("doc_id"), "left")
      .select(col("rm1"), coalesce(col("rm2"), lit(0)).as("rm2"),
        coalesce(col("rm3"), lit(0)).as("rm3"))
    f.agg(count(lit(1)).as("n0"), sum(col("rm1")).as("r1"),
        sum(when(col("rm1") === 0 && col("rm2") === 1, 1L).otherwise(0L)).as("r2"),
        sum(when(col("rm1") === 0 && col("rm2") === 0 && col("rm3") === 1, 1L)
          .otherwise(0L)).as("r3"))
      .selectExpr(
        """stack(3,
          |  CAST(1 AS BIGINT), 'exact',       n0,           r1,
          |  CAST(2 AS BIGINT), 'minhash_lsh', n0 - r1,      r2,
          |  CAST(3 AS BIGINT), 'semdedup',    n0 - r1 - r2, r3
          |) AS (stage_id, stage, n_in, n_removed)""".stripMargin, "n0")
      .select(col("stage_id"), col("stage"), col("n_in"), col("n_removed"),
        (col("n_in") - col("n_removed")).as("n_out"),
        round((col("n_in") - col("n_removed")) / col("n0").cast("double"), 6)
          .as("kept_frac"))
      .orderBy(col("stage_id"))
  }

  /** Padding-waste profile under power-of-two length bucketing — the
    * batching-efficiency audit run before choosing [[packSequences]]
    * over plain pad-to-bucket batching: each doc pads to the smallest
    * power of two ≥ its length, and per bucket we report docs, real
    * chars, padded chars, and the wasted fraction. The bucket is
    * INTEGER-derived (1 << bitlength(n_chars−1), via the base-2 string
    * both engines print identically) — never floor(log2(double)),
    * whose libm tail misbuckets exact powers of two.
    *
    * Shape at scale: map-side projection + one small-key agg with
    * map-side combine; ~60 buckets total regardless of corpus size. */
  def paddingWaste(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("n_chars")).filter(col("n_chars") > 0)
      .withColumn("pad_len",
        expr("CAST(shiftleft(CAST(1 AS BIGINT), length(bin(n_chars - 1))) AS BIGINT)"))
      .groupBy(col("pad_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (count(lit(1)) * col("pad_len")).as("padded_chars"),
        round(lit(1.0) - sum(col("n_chars")) /
          (count(lit(1)) * col("pad_len")).cast("double"), 6).as("waste_frac"))
      .orderBy(col("pad_len"))

  /** Deterministic stratified sampling: per-language keep rates
    * (rebalancing the corpus language mix) decided by a salted portable
    * hash of the doc id against a per-stratum permille threshold. Pure
    * map-side projection — no shuffle, no RNG state, reproducible
    * across engines and partitionings, and the sample composition is
    * auditable (the rate table IS the spec). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", 500)
      .when(col("lang") === "de", 250)
      .otherwise(100)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '-sample')), 1, 15), 16, 10) AS BIGINT) % 1000")
          .as("h"))
      .filter(col("h") < rate)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Uniform-mixture downsample: derive per-language acceptance rates
    * FROM the corpus so the kept corpus has (expected-)equal language
    * shares, downsample-only — the most-underrepresented language
    * keeps 100%, every other keeps n_min/n_lang. Unlike
    * [[stratifiedSample]] (fixed hand-tuned rates) the rates here are
    * corpus statistics — this is the data-mixing step a training build
    * runs to hit a target domain distribution (uniform here; any
    * target-weight vector is the same plan with t_l·n_min replaced by
    * the weight table).
    *
    * The keep decision is EXACT integer arithmetic
    * (h·n_lang < M·n_min — no float rate boundary to flap between
    * engines), keyed by the same deterministic md5 hash as every
    * sampling op. Shape at scale: one tiny partial agg (|langs| rows)
    * broadcast back onto the scan, then a map-side filter — the corpus
    * itself never shuffles. */
  def mixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val minN = counts.agg(min(col("n_lang")).as("n_min"))
    docs
      .select(col("doc_id"), col("lang"),
        expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '-mix')), 1, 15), 16, 10) AS BIGINT) % 1000000")
          .as("h"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(minN))
      .filter(col("h") * col("n_lang") < lit(1000000L) * col("n_min"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-width overlapping character chunking (width 256, stride
    * 192) — the context-window splitter for embedding/RAG indexing:
    * every doc yields ceil((len−width)/stride)+1 chunks (min 1), each
    * identified by (doc_id, chunk_id) with its start offset, length,
    * and content hash. Chunk count comes from pure integer arithmetic
    * (no float ceil — engines must agree exactly), the fan-out is a
    * per-row sequence+explode (no shuffle at all), and chunk text
    * leaves the operator as an md5 so the output stays narrow no
    * matter how wide the documents are. */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val width = 256L; val stride = 192L
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("len"))
      // integer ceil-div — Column./ would be DOUBLE division, and a
      // float ceil at an exact-multiple boundary is engine-dependent
      .withColumn("n_chunks",
        expr(s"CASE WHEN len > $width THEN (len - $width + $stride - 1) DIV $stride + 1 ELSE CAST(1 AS BIGINT) END"))
      .withColumn("chunk_id", explode(expr("sequence(CAST(0 AS BIGINT), n_chunks - 1)")))
      .select(
        col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        least(lit(width), col("len") - col("chunk_id") * stride).as("chunk_len"),
        md5(expr(s"substr(text, CAST(chunk_id * $stride + 1 AS INT), $width)")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Deterministic weighted sampling without replacement (A-Res /
    * Efraimidis–Spirakis): each doc draws u∈(0,1) from the portable
    * content hash and is ranked by ln(u)/weight — order-equivalent to
    * u^(1/w), numerically tamer — so heavier docs win
    * proportionally more often, yet the draw is pure projection:
    * reproducible across engines, runs, and partitionings, no RNG
    * state. The global top-k is orderBy+limit, which Spark plans as
    * TakeOrderedAndProject — per-partition heaps then a k-row driver
    * merge, never a global sort. */
  /** Corpus-composition report — the data-mix table every training
    * build is steered by (how much of each language/source, and what
    * share of the total char budget): one map-side-combinable agg to
    * (lang, source) grain, then the share against a window total over
    * the already-tiny aggregate (never over the corpus). */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy() // |lang×source| rows — a fine single partition
    agg
      .withColumn("char_share",
        round(col("sum_chars").cast("double") / sum(col("sum_chars")).over(w), 6))
      .select(col("lang"), col("source"), col("n_docs"), col("sum_chars"), col("char_share"))
      .orderBy(col("lang"), col("source"))
  }

  /** Per-language quality floor: keep docs at or above their
    * language's 25th quality percentile — the adaptive gate that
    * prunes each stratum against its own distribution instead of one
    * global constant (a constant tuned for English guts low-resource
    * languages). Exact interpolated percentile per language (a
    * |langs|-row agg, broadcast back); the threshold compares against
    * 6-dp-rounded scores on both engines, so the boundary is
    * engine-identical. */
  def qualityGate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scale.maybeBroadcast
    // score computed inline — ONE documents scan, no self-join on
    // doc_id just to attach a derived column
    val scored = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScoreCol.as("quality_score")))
    val thresh = scored.groupBy(col("lang"))
      .agg(round(expr("percentile(quality_score, 0.25)"), 6).as("p25"))
    scored.join(maybeBroadcast(thresh), Seq("lang"))
      .filter(col("quality_score") >= col("p25"))
      .select(col("doc_id"), col("lang"), col("quality_score"), col("p25"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end corpus build — the whole curation pipeline as ONE
    * callable: JSONL ingest (with quarantine sink) → inline quality +
    * language gates → exact dedup (min doc_id per content hash) →
    * per-language char-budget fill → deterministic sharded parquet.
    * Everything between ingest and write is a single Catalyst plan
    * over one scan of the good rows (gates are projections, the dedup
    * is one window, the budget one window) — no staging tables.
    * Returns (kept, quarantined) counts for the run report. */
  def buildCorpus(spark: SparkSession, inJsonl: String, outDir: String,
                  minQuality: Double = 0.3, keepLang: String = "en",
                  budgetChars: Long = 50000L): (Long, Long) = {
    val ingest = graft.sources.CorpusIO.readJsonl(spark, inJsonl)
    val scored = ingest.good
      .withColumn("quality_score", TextAnalysis.qualityScoreCol)
      .withColumn("predicted_lang", TextAnalysis.predictedLangCol)
      .filter(col("quality_score") >= minQuality &&
        col("predicted_lang") === keepLang)
    // exact dedup: keep the minimum doc_id per content hash
    val wDedup = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = scored
      .withColumn("dup_rank", row_number().over(wDedup))
      .filter(col("dup_rank") === 1).drop("dup_rank")
    val wBudget = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val kept = deduped
      .withColumn("cum_chars", sum(col("n_chars")).over(wBudget))
      .filter(col("cum_chars") <= budgetChars)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    graft.sources.CorpusIO.writeSharded(kept, outDir)
    ingest.quarantine.write.mode("overwrite").parquet(s"$outDir/_quarantine")
    (spark.read.parquet(outDir).count(), ingest.quarantine.count())
  }

  /** Exact n-gram contamination screen (the GPT-style complement of
    * the MinHash [[decontaminate]]): for every training doc, how many
    * of its distinct 5-gram shingles appear in ANY held-out benchmark
    * doc, and how many benchmark docs it collides with. The only wide
    * op is the shingle equi-join (train side × the much smaller
    * benchmark side); the two DISTINCT counts are separate two-level
    * aggs joined at doc grain — never a multi-countDistinct Expand of
    * the pair stream. */
  def contaminationNgram(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(raw"regexp_extract_all(text, '\\S+', 0)").as("toks"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(CASE WHEN size(toks) >= 5 THEN
             transform(sequence(0, size(toks) - 5),
               i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4]))
           ELSE array() END)""")).as("s"))
    val train = grams.filter(col("doc_id") % 10 =!= 0)
    val bench = grams.filter(col("doc_id") % 10 === 0)
      .select(col("s"), col("doc_id").as("bench_id"))
    import graft.operators.Scale.maybeBroadcast
    val pairs = graft.Caches.persistTracked(
      train.join(maybeBroadcast(bench), Seq("s"))
        .select(col("doc_id"), col("s"), col("bench_id")))
    val nShared = pairs.select(col("doc_id"), col("s")).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_ngrams"))
    val nBench = pairs.select(col("doc_id"), col("bench_id")).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bench_docs"))
    nShared.join(nBench, Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Greedy per-language char-budget selection: rank each language's
    * docs by quality (best first, doc_id tiebreak) and keep rows while
    * the running char total stays under the stratum's budget — the
    * "fill each language's token quota with its best material" step of
    * a data-mix plan. One window per language partition (the natural
    * parallelism unit); the running sum is exact integer math so the
    * cut is engine-identical. */
  def tokenBudget(spark: SparkSession, dir: String, budgetChars: Long = 50000L): DataFrame = {
    // single scan — the score is a projection, not a join
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextAnalysis.qualityScoreCol.as("quality_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    scored
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
      .filter(col("cum_chars") <= budgetChars)
      .select(col("doc_id"), col("lang"), col("quality_score"),
        col("n_chars"), col("cum_chars"))
      .orderBy(col("doc_id"))
  }

  def sampleWeighted(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        expr("(CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '-wsample')), 1, 15), 16, 10) AS BIGINT) % 1000000 + 0.5) / 1000000.0")
          .as("u"))
      // round before ranking so an ulp of ln() divergence between
      // engines can't flip the top-k boundary; doc_id breaks ties
      .withColumn("wkey", round(log(col("u")) / col("n_chars"), 9))
      .select(col("doc_id"), col("n_chars"), col("wkey"))
      .orderBy(col("wkey").desc, col("doc_id"))
      .limit(k)

  /** Shard manifest — the reproducibility record a dataset release
    * ships beside its shards: per shard (same hash-assignment as
    * [[shardOrder]]), the row count, total chars, and a content
    * checksum (md5 over the shard's doc hashes in doc_id order).
    * Re-running the manifest after any rebuild proves bit-identical
    * shards without comparing data. One (shard) agg; the checksum
    * concat is per-shard bounded (n/16 hashes of 32 chars).
    * collect_list is wrapped in array_sort so partial-agg arrival
    * order can never leak into the checksum. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '')), 1, 15), 16, 10) AS BIGINT) % 16")
          .as("shard"),
        // doc-id-prefixed so the sort equals doc_id order and the
        // digest still covers the content hash
        concat(format_string("%020d", col("doc_id")), lit(":"), md5(col("text"))).as("entry"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        md5(concat_ws(",", array_sort(collect_list(col("entry"))))).as("content_digest"))
      .orderBy(col("shard"))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc
    * by how much more likely its hashed-unigram bag is under the
    * TARGET domain's n-gram distribution (here lang='en') than under
    * the raw corpus's — weight = Σ_buckets count·ln(p_target/p_raw)
    * with add-one smoothing over 64 hash buckets. Docs that "sound
    * like" the target domain get positive weights; resampling by these
    * weights steers the data mix toward the target without a model.
    *
    * Shape at scale: tokens hash to buckets map-side (the portable-
    * hash spelling rewrites to the native H60 kernel); both
    * distributions are 64-row aggregates (partial map-side) joined
    * into one broadcast log-ratio table; the per-doc weight is ONE
    * shuffle to (doc_id, bucket) grain — ≤64 rows per doc — then a
    * map-side-combinable sum. Summing bucket-count × ratio instead of
    * per-token ratios keeps each doc's sum to ≤64 addends, so
    * cross-engine float-order drift stays far inside the 6-dp round. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val buckets = graft.Caches.persistTracked(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          explode(expr(raw"regexp_extract_all(lower(text), '\\S+', 0)")).as("w"))
        .select(col("doc_id"), col("lang"),
          expr("CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT) % 64").as("bucket"))
        .groupBy(col("doc_id"), col("lang"), col("bucket"))
        .agg(count(lit(1)).as("cnt")))
    val tgt = buckets.filter(col("lang") === "en")
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("ct"))
    val raw_ = buckets.groupBy(col("bucket")).agg(sum(col("cnt")).as("cr"))
    val totals = buckets.agg(
      sum(when(col("lang") === "en", col("cnt")).otherwise(lit(0L))).as("nt"),
      sum(col("cnt")).as("nr"))
    val llr = raw_.join(tgt, Seq("bucket"), "left")
      .crossJoin(totals)
      .select(col("bucket"),
        log(((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("nt") + lit(64))) /
          ((col("cr") + lit(1.0)) / (col("nr") + lit(64)))).as("llr"))
    buckets.join(broadcast(llr), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        round(sum(col("cnt") * col("llr")), 6).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** DSIR importance RESAMPLING — the actual selection step of Xie et
    * al. 2023: sample k docs without replacement with probability
    * proportional to softmax(β·weight) via the Gumbel-top-k trick
    * (gkey = β·weight − ln(−ln u), u hash-derived uniform; the k
    * largest gkeys ARE such a sample). β is the usual inverse
    * temperature of tempered resampling — this corpus's weights have
    * σ≈0.25 against Gumbel noise σ=π/√6≈1.28, so β=8 puts the signal
    * above the noise while keeping the sample stochastic. Composes
    * [[dsirWeights]] with the same deterministic-u +
    * round-before-rank discipline as [[sampleWeighted]], so both
    * engines pick the identical k docs.
    *
    * Shape at scale: everything dsirWeights does plus one map-side
    * projection and a TakeOrdered(k) — never a global sort. */
  def dsirResample(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    dsirWeights(spark, dir)
      .withColumn("u",
        expr("(CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '-dsir')), 1, 15), 16, 10) AS BIGINT) % 1000000 + 0.5) / 1000000.0"))
      .withColumn("gkey", round(lit(8.0) * col("weight") - log(-log(col("u"))), 6))
      .select(col("doc_id"), col("weight"), col("gkey"))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(k)

  /** Per-language tokenizer fertility — BPE-ish tokens per whitespace
    * word, the metric that prices a language's training cost (a lang
    * at fertility 2.0 pays twice the compute per word of one at 1.0)
    * and flags scripts the tokenizer fragments. One map-side
    * projection (two regexp counts per doc) into a |langs|-row agg —
    * the fact scan never shuffles at row grain. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).cast("long").as("nw"),
        size(expr(raw"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")).cast("long").as("nb"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"), sum(col("nb")).as("n_bpeish"),
        round(sum(col("nb")) / sum(col("nw")), 6).as("fertility"))
      .orderBy(col("lang"))

  /** Deterministic proportional source interleave — the mixture
    * scheduler of a multi-source training stream: within each source,
    * docs take a hash-derived order (pos_in_source); the interleave
    * key (pos − ½)/|source| then spreads every source uniformly over
    * [0,1), so reading in ikey order yields each source at exactly its
    * corpus proportion at every prefix — no coordination, no RNG
    * state. Unlike [[epochShuffle]] (unstratified global order), this
    * preserves the mixture at every point of the stream.
    *
    * Shape at scale: one hash exchange on source for the per-source
    * rank window (salt the window key by a shard nibble — the
    * [[epochShuffle]] trick — if one source dominates), a broadcast
    * |sources|-row size table, and the ikey order is range-partition
    * friendly (it IS the write order). */
  def interleaveSources(spark: SparkSession, dir: String): DataFrame = {
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hkey"), col("doc_id"))
    val sizes = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":il"))).as("hkey"))
      .withColumn("pos_in_source", row_number().over(wSrc).cast("long"))
      .join(broadcast(sizes), "source")
      .withColumn("ikey", round((col("pos_in_source") - lit(0.5)) / col("n"), 9))
      .select(col("source"), col("doc_id"), col("pos_in_source"), col("ikey"))
      .orderBy(col("ikey"), col("source"), col("doc_id"))
  }

  /** Deterministic epoch shuffle + sharding — the reproducible
    * data-order primitive of a training run: each epoch, every doc
    * gets a pseudorandom position derived ONLY from (epoch, doc_id),
    * so any worker recomputes its own shard's order with zero
    * coordination and a re-run yields the identical byte order.
    *
    * Shard = top md5 nibble mod nShards (pure map-side, no exchange
    * to decide placement); position = rank of the hash within
    * (epoch, shard). Global order is lexicographic (shard, pos).
    * Shape at scale: one hash-partition exchange on (epoch, shard)
    * then a per-shard local sort — bounded windows, never a global
    * total-order sort; shard files write partition-local. */
  def epochShuffle(spark: SparkSession, dir: String,
      epochs: Int = 2, nShards: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val keyed = docs
      .withColumn("epoch", explode(array((0 until epochs).map(e => lit(e.toLong)): _*)))
      .withColumn("hkey", md5(concat(lit("ep"), col("epoch").cast("string"),
        lit(":"), col("doc_id").cast("string"))))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substr(hkey, 1, 1))") - 1) % nShards).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard")).orderBy(col("hkey"), col("doc_id"))
    keyed.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .orderBy(col("epoch"), col("shard"), col("pos"))
  }

  /** Curriculum training order — short-to-long staging (the standard
    * LM curriculum heuristic: shorter documents first), deterministic
    * within stage: stage = length quartile against EXACT interpolated
    * corpus percentiles (the [[qualityGate]] discipline — corpus-
    * derived cutoffs, not magic constants), position = hash rank
    * within the stage so a re-run reproduces the identical order with
    * zero coordination ([[epochShuffle]]'s property, stratified by
    * difficulty).
    *
    * Shape at scale: the three quartiles are one 1-row agg broadcast
    * back; staging is then a map-side CASE; the position window
    * shuffles once on the stage key. Four stages cap window
    * parallelism here — at 100 TB the position key becomes
    * (stage, shard) exactly like epochShuffle's, offsets added per
    * shard manifest; the stage assignment itself is already
    * scale-free. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val qs = docs.agg(
      expr("percentile(n_chars, 0.25)").as("q1"),
      expr("percentile(n_chars, 0.5)").as("q2"),
      expr("percentile(n_chars, 0.75)").as("q3"))
    val staged = docs.crossJoin(broadcast(qs))
      .withColumn("stage",
        when(col("n_chars") <= col("q1"), 0L)
          .when(col("n_chars") <= col("q2"), 1L)
          .when(col("n_chars") <= col("q3"), 2L)
          .otherwise(3L))
      .withColumn("hkey", md5(concat(col("doc_id").cast("string"), lit("-curr"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stage")).orderBy(col("hkey"), col("doc_id"))
    staged.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("n_chars"), col("stage"), col("pos"))
      .orderBy(col("stage"), col("pos"))
  }

  /** Temperature-scaled multilingual sampling rates (the mT5/XLM-R
    * α-sampling recipe, α = 0.3): sampling share p_l ∝ n_l^α, which
    * flattens the language distribution — high-resource languages are
    * downweighted, low-resource ones upsampled — without the cliff of
    * uniform mixing. Reports, per language: doc count, raw corpus
    * share, temperature share, and the implied up/down-sampling
    * factor; [[mixtureResample]] (uniform) and [[stratifiedSample]]
    * (hand-tuned) are the α→0 and fully-manual endpoints of the same
    * dial, and this table is the input their rate columns come from.
    *
    * Shape at scale: one |langs|-row partial agg; everything after is
    * arithmetic on that tiny table (the Σ n^α normalizer comes from a
    * 1-row cross join, broadcast). */
  def temperatureMix(spark: SparkSession, dir: String, alpha: Double = 0.3): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("wt", pow(col("n_docs").cast("double"), lit(alpha)))
    val tot = counts.agg(sum(col("n_docs")).cast("double").as("n_tot"),
      sum(col("wt")).as("w_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        round(col("n_docs") / col("n_tot"), 6).as("raw_share"),
        round(col("wt") / col("w_tot"), 6).as("temp_share"),
        round((col("wt") / col("w_tot")) / (col("n_docs") / col("n_tot")), 6)
          .as("sample_factor"))
      .orderBy(col("lang"))
  }

  /** Length-bucketed batching manifest — the training-loader layout
    * that [[paddingWaste]]'s histogram argues FOR: docs grouped into
    * power-of-two token-length buckets, each bucket packed into
    * fixed-budget batches (4096 tokens, ⌊budget/cap⌋ docs per batch,
    * pad-to-cap), with per-bucket batch counts and the REALIZED
    * padding waste. Pure integer arithmetic end to end (bucket cap,
    * docs-per-batch, batch count), so both engines agree exactly.
    *
    * Shape at scale: one map-side token count + power-of-two bucket
    * projection, a ≤~20-group agg with map-side combine — the doc
    * stream is scanned once and never shuffled at doc grain. */
  def lengthBuckets(spark: SparkSession, dir: String,
      budget: Long = 4096L): DataFrame = {
    Tables.documents(spark, dir)
      .select(size(expr(raw"regexp_extract_all(text, '\\S+', 0)"))
        .cast("long").as("ntok"))
      .filter(col("ntok") > 0)
      .withColumn("cap",
        expr("CAST(shiftleft(CAST(1 AS BIGINT), length(bin(ntok - 1))) AS BIGINT)"))
      .groupBy(col("cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tok"))
      .withColumn("docs_per_batch",
        greatest(expr(s"$budget div cap"), lit(1L)))
      .withColumn("n_batches",
        expr("(n_docs + docs_per_batch - 1) div docs_per_batch"))
      .select(col("cap"), col("n_docs"), col("docs_per_batch"), col("n_batches"),
        round(lit(1.0) - col("sum_tok") /
          (col("n_batches") * col("docs_per_batch") * col("cap")).cast("double"), 6)
          .as("waste_frac"))
      .orderBy(col("cap"))
  }

  /** Per-shard mixture drift: KL(shard ‖ corpus) over the source
    * distribution, shards assigned by the portable md5 hash of doc_id
    * (mod 8) — the audit that proves (or disproves) that hash-sharding
    * preserved the domain mixture, read before trusting any per-shard
    * curriculum or resume point. KL terms p_s·ln(p_s/p_g) are rounded
    * to 9 dp and summed as DECIMAL (addition-order-independent); a
    * source absent from a shard contributes 0 (the 0·ln0 limit),
    * which the inner-join shape encodes for free.
    *
    * Shape at scale: one (shard, source) agg — map-side combinable —
    * then everything lives on the ≤8·|sources|-row grid; the global
    * distribution broadcasts back onto it. */
  def mixtureKl(spark: SparkSession, dir: String, shards: Int = 8): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"),
        expr(s"CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % $shards")
          .as("shard"))
    val cell = d.groupBy(col("shard"), col("source")).agg(count(lit(1)).as("c"))
    val shardTot = cell.groupBy(col("shard")).agg(sum(col("c")).as("st"))
    val srcTot = cell.groupBy(col("source")).agg(sum(col("c")).as("gt"))
    val grand = cell.agg(sum(col("c")).as("n"))
    cell
      .join(broadcast(shardTot), Seq("shard"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(grand))
      .withColumn("ps", col("c") / col("st").cast("double"))
      .withColumn("pg", col("gt") / col("n").cast("double"))
      .withColumn("term",
        round(col("ps") * log(col("ps") / col("pg")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
      .groupBy(col("shard"))
      .agg(first(col("st")).as("n_docs"),
        round(sum(col("term")).cast("double"), 6).as("kl_vs_corpus"),
        round(max(abs(col("ps") - col("pg"))), 6).as("max_share_delta"))
      .orderBy(col("shard"))
  }

  /** Dataset card rollup — the per-(source, lang) + per-source +
    * corpus-total summary table every dataset release ships (docs,
    * token and char volume, mean doc length): one GROUPING SETS pass,
    * so the card's three grains come from ONE scan with map-side
    * partial aggregation, never three jobs. The token count is the
    * whitespace tokenizer every text op here shares.
    *
    * Shape at scale: Expand×3 on the already-aggregated projection —
    * the classic cube plan; all measures are map-side combinable. */
  def dataCard(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).cast("long").as("ntok"))
      .createOrReplaceTempView("documents_card_v")
    spark.sql("""
      SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
             CAST(count(1) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             round(sum(n_chars) / CAST(count(1) AS DOUBLE), 6) AS mean_chars
      FROM documents_card_v
      GROUP BY GROUPING SETS ((source, lang), (source), ())
      ORDER BY source, lang""")
  }

  /** Order-independent dataset fingerprint — the data-versioning
    * identity a training run records so "same corpus?" is a 64-bit
    * comparison, not a re-scan: per source (plus an ALL row), the doc
    * count, total chars, and Σ h(doc_id|text) mod 2⁶⁰ where h folds the
    * first 15 hex digits of the row md5. Addition commutes, so the
    * fingerprint is independent of row order, partitioning, and cluster
    * size — two pipelines that produced the same logical corpus agree
    * bit-for-bit even if their shuffles never did.
    *
    * Shape at scale: ONE scan, map-side hash + fold, a |sources|-group
    * agg with map-side partials (the sum is associative — Spark's
    * partial aggregation IS the tree-reduce). The DECIMAL(38,0)
    * accumulator makes the sum exact before the mod. */
  def datasetHash(spark: SparkSession, dir: String): DataFrame = {
    val mod = "1152921504606846976" // 2^60
    val d = Tables.documents(spark, dir)
      .withColumn("h", md5(concat_ws("|", col("doc_id"), col("text"))))
      .withColumn("hv", expr(
        "aggregate(sequence(1, 15), 0L, (acc, k) -> acc * 16 + " +
        "CAST(instr('0123456789abcdef', substr(h, k, 1)) - 1 AS BIGINT))"))
    val per = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        expr(s"CAST(sum(CAST(hv AS DECIMAL(38,0))) % $mod AS BIGINT)")
          .as("fingerprint"))
    val total = d.agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        expr(s"CAST(sum(CAST(hv AS DECIMAL(38,0))) % $mod AS BIGINT)")
          .as("fingerprint"))
      .select(lit("ALL").as("source"), col("n_docs"), col("n_chars"),
        col("fingerprint"))
    per.select(col("source"), col("n_docs"), col("n_chars"), col("fingerprint"))
      .unionAll(total)
      .orderBy(col("source"))
  }

  /** Near-duplicate rate per source — the "which feed is spamming the
    * corpus" attribution behind [[domainMix]]'s raw shares: the
    * MinHash-LSH component labels ([[graft.ops.Dedup.components]] —
    * canonical = cluster min doc_id) joined back to the source column;
    * a doc is REMOVABLE when it belongs to a cluster and is not its
    * canonical. Per source: docs, clustered docs, removable docs, and
    * the removable share (exact rational, tie-free 6-dp) — the number
    * a data card quotes per provider and the input to renegotiating a
    * crawl's dedup budget.
    *
    * Shape at scale: the label table is LSH-collision-sized (≪ corpus);
    * ONE broadcast-gated left join onto the doc-grain (doc, source)
    * projection, one |sources|-group agg. */
  def sourceDupRate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scale.maybeBroadcast
    val labels = graft.Caches.persistTracked(
      graft.ops.Dedup.components(spark, dir))
    labels.count()
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(maybeBroadcast(labels), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("component").isNotNull, 1L).otherwise(0L))
          .as("n_clustered"),
        sum(when(col("component").isNotNull &&
            col("component") =!= col("doc_id"), 1L).otherwise(0L))
          .as("n_removable"))
      .select(col("source"), col("n_docs"), col("n_clustered"),
        col("n_removable"),
        expr("""CAST((2 * n_removable * 1000000 + n_docs) div (2 * n_docs)
               AS DOUBLE) / 1000000.0""").as("removable_share"))
      .orderBy(col("source"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as code, not prose (SURVEY.md §5): bucketed
  * co-located joins and salted skew joins. These are the knobs that
  * matter at 100 TB — at small SF they're exercised by tests that
  * assert the *plan shape* (no shuffle under bucketing; salt spreads a
  * hot key across partitions).
  */
object Scale {
  /** True if the type contains a map anywhere — such columns can't
    * feed xxhash64 (unhashable: map equality ignores entry order). */
  private[operators] def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
    case _ => false
  }


  /** Write both sides bucketed by the join key into the session
    * warehouse. Joins between them then co-locate: no Exchange on
    * either side (tests assert this). At 100 TB this is how the
    * fact⋈fact joins (e.g. vehicle_locations ⋈ ride_stops) avoid
    * re-shuffling per query. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner skips both
    * exchanges when bucket specs line up. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted join for skewed keys: the big (skewed) side gets a
    * content-derived salt in [0, salts); the small side is exploded
    * ×salts so every (key, salt) pair finds its match. Equivalent to
    * the plain join, but the hot key's rows spread over `salts`
    * reducers instead of one straggler.
    *
    * (AQE's skew-join handles sort-merge skew automatically; explicit
    * salting is for aggregations-after-join and for engines/paths AQE
    * doesn't cover — and it's deterministic, which AQE splitting need
    * not be.) */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // salt = hash of the row's hashable columns: stable under retries
    // AND under partition-layout changes (monotonically_increasing_id
    // is only stable for an identical layout). Map-typed columns are
    // excluded — xxhash64 rejects them at analysis. KNOWN LIMIT: exact
    // duplicate rows of a hot key share a salt, so a corpus that is
    // one row duplicated a billion times still lands on one reducer;
    // that degenerate shape needs dedup-before-join (dedup_exact),
    // not salting — no deterministic content-derived salt can split
    // indistinguishable rows.
    val hashable = big.schema.fields.filterNot(f =>
      graft.operators.Scale.containsMap(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty, "saltedJoin: no hashable columns on the big side")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(hashable.toIndexedSeq: _*), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filter pre-filter for a semi-join-shaped reduction: build a
    * compact bloom over the (small) key side, broadcast it, and drop
    * non-matching fact rows BEFORE the shuffle. False positives pass
    * through (the exact join after stays correct); true negatives — the
    * overwhelming majority at 100 TB — never leave the scan stage. */
  def bloomPrune(big: DataFrame, keys: DataFrame, keyCol: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    val bytes = graft.functions.BloomSupport.buildLong(keys, keyCol, expectedItems, fpp)
    big.filter(graft.functions.BloomSupport.mightContain(bytes, col(keyCol)))
  }

  /** Broadcast hint, gated on the optimizer's size estimate: under the
    * limit the small side ships to every executor (no shuffle); over it
    * the hint is withheld and the planner falls back to a shuffle join.
    * This is the guard rail for joins whose build side is *usually*
    * bounded (a vocabulary, a per-doc fingerprint set) but can explode
    * on a real web corpus — an unconditional broadcast() there is an
    * executor-OOM cliff at 100 TB, and AQE never overrides an explicit
    * hint. Estimates come from file sizes / cached-relation stats, so
    * the gate is meaningful wherever the input is a scan or a
    * materialized cache.
    *
    * An UNMATERIALIZED cache is the trap: InMemoryRelation falls back
    * to its child's estimate until the buffers load, and a per-doc
    * array column (fingerprint sets, minhash signatures) is many times
    * its parquet-text footprint — at 100× scale the estimate waved a
    * ~2 GB cache through the 256 MB gate (measured broadcast-build
    * OOM, dedup_winnow_pairs sf10). The gate therefore materializes
    * any cold cache under the plan before trusting stats — by counting
    * THE CACHED RELATION ITSELF (GraftShim.ofRows over the
    * InMemoryRelation node), never `df.count()`: df may stack joins
    * and aggregations ABOVE the cache, and counting the derived tree
    * re-executes all of it as a second action (measured: the r10
    * df.count() form cost dedup_apply / pipeline_source_dup_rate /
    * embed_pq_code_entropy a reproducible ×1.3–1.6 at sf0.1 — the
    * three unadjudicated BENCH_r10 flags, VARIANCE_r11.md). Plans
    * with no cache are untouched — no re-execution of uncached
    * expensive trees. */
  def maybeBroadcast(df: DataFrame, maxBytes: Long = 256L << 20,
      fallbackHint: Option[String] = None): DataFrame = {
    val qe = df.queryExecution
    qe.withCachedData.foreach {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation
          if !r.cacheBuilder.isCachedColumnBuffersLoaded =>
        // load exactly the cache buffers; nothing above them re-runs
        org.apache.spark.sql.graft.GraftShim.ofRows(df.sparkSession, r).count()
      case _ => ()
    }
    if (qe.optimizedPlan.stats.sizeInBytes <= maxBytes) broadcast(df)
    // opt-in per call site: a hash-equi join that fell past the gate
    // pays two avoidable n·log n sorts under the SMJ default; callers
    // whose per-partition build side is bounded (e.g. a blocked
    // self-join) pass Some("SHUFFLE_HASH") to keep the hash plan
    else fallbackHint.fold(df)(df.hint(_))
  }

  /** Top-frequency keys of a column — the input to a targeted salting
    * decision (salt only the hot keys, leave the long tail alone). */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col(key))

  /** Z-order (Morton) interleave of two integer key columns — the
    * multi-dimensional clustering layout behind lakehouse data
    * skipping: sorting by the interleaved bits makes every output file
    * tight in BOTH dimensions at once, so min/max footer stats prune
    * scans filtered on either key (a plain sort is tight in one
    * dimension and useless in the other). 16 bits per dimension —
    * rank/bucket the raw keys into [0, 65536) first at real scale.
    * Pure bit arithmetic (codegen'd), no shuffle beyond the
    * repartitionByRange on the z-value that the writer needs anyway. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    // interleave: a's bit i -> position 2i+1, b's bit i -> position 2i
    (0 until bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }

  /** Range-partition + sort the frame by the z-value of (keyA, keyB) —
    * the write layout that gives min/max pruning on both keys. Each
    * key is min/max-normalized into the full 16-bit domain first:
    * without that, a key with a small range occupies only low
    * interleave bits and the curve degenerates to a 1-d sort on the
    * wider key (z-order only helps when the dimensions get equal bit
    * weight). The normalization stats are one tiny agg broadcast back. */
  def zOrderBy(df: DataFrame, keyA: String, keyB: String,
               partitions: Int = 32): DataFrame = {
    val stats = df.agg(
      min(col(keyA)).cast("double").as("amin"), max(col(keyA)).cast("double").as("amax"),
      min(col(keyB)).cast("double").as("bmin"), max(col(keyB)).cast("double").as("bmax"))
    def norm(c: Column, lo: Column, hi: Column): Column =
      when(hi > lo, ((c.cast("double") - lo) / (hi - lo) * 65535.0).cast("long"))
        .otherwise(lit(0L))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(
        norm(col(keyA), col("amin"), col("amax")),
        norm(col(keyB), col("bmin"), col("bmax"))))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "amin", "amax", "bmin", "bmax")
  }
}

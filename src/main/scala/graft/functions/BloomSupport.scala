package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftShim

/** Codegen-native bloom-filter membership for semi-join pruning.
  *
  * Build and probe both run on [[GraftBloom]] (64-bit double hashing)
  * rather than `org.apache.spark.util.sketch.BloomFilter`: Spark's
  * sketch derives probe indices from two 32-bit Murmur3 hashes, and at
  * semi-join sizes (10⁷+ keys) its observed fp rate ran 3.6× the
  * requested one (17.8% at a requested 5% over 12 M keys, measured) —
  * which tripled the exchange the filter was built to cut. Probes are
  * native expressions with `doGenCode`, so membership participates in
  * whole-stage codegen; a Scala UDF here would break fusion in exactly
  * the scan stage the bloom exists to keep tight.
  */
object BloomSupport {

  /** Distributed build over a LONG key column; sized from the actual
    * key count unless the caller knows better. An undersized bloom
    * degrades silently toward fpp→1 (every probe falls through to the
    * exact join), which erases the optimization — so auto-sizing is the
    * default, at the cost of one count() over the (small) key side.
    *
    * Every concurrently-running partial-agg task holds a FULL bloom
    * buffer (bits/8 bytes) — at 100× scale that is ~90 MB × 32 local
    * cores = 3 GB of buffers, a measured executor OOM. The build scan
    * is therefore coalesced so concurrent buffers fit a fixed budget;
    * the scan is a cheap hash+bit-set pass, so fewer-but-larger tasks
    * cost seconds while staying flat in memory. (On a real cluster the
    * budget bounds per-EXECUTOR buffer memory the same way.) */
  def buildLong(keys: DataFrame, keyCol: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): Array[Byte] = {
    import org.apache.spark.sql.functions.col
    val n = math.max(expectedItems.getOrElse(keys.select(keyCol).count()), 1L)
    val bits = GraftBloom.optimalNumBits(n, fpp)
    val numWords = (bits / 64L).toInt
    val k = GraftBloom.optimalK(n, bits)
    val budgetBytes = 512L << 20
    val maxTasks = math.max(1L, budgetBytes / math.max(numWords * 8L, 1L)).toInt
    val scan = keys.select(col(keyCol).cast("long").as("k"))
    val build = if (scan.rdd.getNumPartitions > maxTasks) scan.coalesce(maxTasks) else scan
    val agg = GraftShim.column(GraftBloomAgg(
      GraftShim.expression(build.col("k")),
      org.apache.spark.sql.catalyst.expressions.Literal(numWords),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())
    build.agg(agg.as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `might_contain(<serialized bloom>, value)` as a Column predicate.
    * `value` must be LongType (the sketch hashes longs); hash wider
    * keys with xxhash64 first — on BOTH the build and probe sides.
    *
    * The literal form: fine up to a few MB of bloom. Past that use
    * [[mightContainBroadcast]] — expression-tree bytes are re-copied
    * and re-deserialized PER TASK when the task binary deserializes
    * (measured: a ~90 MB bloom × 32 local cores ≈ 6 GB, executor OOM),
    * while a broadcast bloom lives once per executor JVM. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftShim.column(GraftBloomProbeBytes(GraftShim.expression(value), bloomBytes))

  /** Broadcast-backed probe for LARGE blooms: ship the serialized
    * filter once per executor via TorrentBroadcast and deserialize it
    * once per JVM (process-wide cache keyed by broadcast id), so probe
    * memory is O(bloom) per executor instead of O(bloom × cores). */
  def broadcastBloom(spark: org.apache.spark.sql.SparkSession,
      bloomBytes: Array[Byte]): Broadcast[Array[Byte]] =
    spark.sparkContext.broadcast(bloomBytes)

  def mightContainBroadcast(bc: Broadcast[Array[Byte]], value: Column): Column =
    GraftShim.column(BloomProbe(GraftShim.expression(value), bc))
}

/** Probe against an expression-tree-carried serialized bloom. Each
  * task deserializes its own copy (task binaries are deserialized per
  * task), so this variant is for SMALL filters only. */
case class GraftBloomProbeBytes(child: Expression, bloomBytes: Array[Byte])
    extends GraftBloomProbeLike {
  @transient private lazy val filter: GraftBloom = GraftBloom.deserialize(bloomBytes)
  override protected def nullSafeEval(v: Any): Any =
    filter.mightContain(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("graftBloomBytes", bloomBytes, "byte[]")
    val bfTerm = ctx.addMutableState(classOf[GraftBloom].getName, "graftBloom",
      v => s"$v = graft.functions.GraftBloom.deserialize($bytesRef);")
    defineCodeGen(ctx, ev, c => s"$bfTerm.mightContain($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): GraftBloomProbeBytes =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_probe"
}

/** Probe against a TorrentBroadcast-shipped filter. The broadcast
  * handle is tiny in the expression tree; the filter deserializes once
  * per JVM via [[BloomProbeRegistry]] and is shared by every task
  * thread — the per-task-literal alternative multiplies a ~100 MB
  * filter by the executor's core count. Codegen resolves the filter
  * once per generated-class instance (task), then probes with a direct
  * non-virtual call per row, staying inside whole-stage codegen. */
case class BloomProbe(child: Expression, bloomBc: Broadcast[Array[Byte]])
    extends GraftBloomProbeLike {
  @transient private lazy val filter: GraftBloom =
    BloomProbeRegistry.filterFor(bloomBc)
  override protected def nullSafeEval(v: Any): Any =
    filter.mightContain(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloomBc,
      classOf[Broadcast[Array[Byte]]].getName)
    val bfTerm = ctx.addMutableState(classOf[GraftBloom].getName, "graftBloom",
      v => s"$v = graft.functions.BloomProbeRegistry.filterFor($bcRef);")
    defineCodeGen(ctx, ev, c => s"$bfTerm.mightContain($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_probe_bc"
}

/** Per-JVM deserialized-bloom cache (small LRU: a handful of live
  * probe-side filters at ~100 MB each is the working set; unbounded
  * growth across queries would be a leak).
  *
  * Keyed on (application id, broadcast id) — NOT on either alone, and
  * NOT on the Broadcast object's identity:
  *   - `bc.id` alone aliases across SparkContexts (ids restart at 0
  *     per context), so in a JVM that stops and rebuilds its session
  *     an id-keyed cache could hand a NEW broadcast an OLD context's
  *     filter — silent false negatives, i.e. dropped semi-join rows.
  *     The app id (unique per SparkContext, e.g. `local-<startMs>`)
  *     disambiguates.
  *   - object identity never aliases, but it also never HITS on
  *     executors: every task deserializes the task binary and gets a
  *     fresh Broadcast wrapper object, so an identity key re-reads
  *     `bc.value` (the ~100 MB deserialize) once per TASK instead of
  *     once per JVM, and fills the LRU with duplicate copies —
  *     defeating the cache exactly where it matters (measured shape
  *     of the round-10 per-task-literal OOM, reintroduced in miniature).
  * The app id comes from SparkEnv (present on driver and executors);
  * if the env is somehow gone (teardown races) we fall back to an
  * uncached deserialize rather than risk a cross-context hit. */
object BloomProbeRegistry {
  private val MaxEntries = 4
  private val cache =
    new java.util.LinkedHashMap[(String, Long), GraftBloom](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), GraftBloom]): Boolean =
        size() > MaxEntries
    }
  def filterFor(bc: Broadcast[Array[Byte]]): GraftBloom = {
    val env = org.apache.spark.SparkEnv.get
    val appId = if (env == null) "" else env.conf.get("spark.app.id", "")
    if (appId.isEmpty) GraftBloom.deserialize(bc.value)
    else cache.synchronized {
      val key = (appId, bc.id)
      val cached = cache.get(key)
      if (cached != null) cached
      else {
        val bf = GraftBloom.deserialize(bc.value)
        cache.put(key, bf)
        bf
      }
    }
  }
}

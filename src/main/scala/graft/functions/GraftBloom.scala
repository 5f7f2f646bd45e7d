package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bloom filter with 64-BIT double hashing (splitmix64 finalizer ×2,
  * Kirsch–Mitzenmacher index derivation in long arithmetic).
  *
  * Why not `org.apache.spark.util.sketch.BloomFilter`: Spark's sketch
  * derives its k probe indices from two 32-bit Murmur3 hashes with int
  * overflow folded by bit-complement. At the sizes a semi-join
  * reduction needs (10⁷–10⁸ keys, 10⁸ bits) that index stream is
  * visibly non-uniform: measured 17.8% observed fp at a requested 5%
  * (3.6× theory) over 12 M keys — which tripled the very shuffle the
  * filter existed to cut. With 64-bit mixing the observed rate sits at
  * theory (k = m/n·ln2 hash functions, fp ≈ (1−e^(−kn/m))^k).
  *
  * Keys are longs; hash wider values with xxhash64 first (both sides).
  * The filter re-mixes the key itself, so feeding already-hashed keys
  * is fine (splitmix of a hash is a hash).
  */
final class GraftBloom(val numWords: Int, val k: Int) extends Serializable {
  val words = new Array[Long](numWords)
  private val m: Long = numWords.toLong * 64L

  def put(key: Long): Unit = {
    val h1 = GraftBloom.mix(key)
    val h2 = GraftBloom.mix(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val bit = java.lang.Math.floorMod(h, m)
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      h += h2
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = {
    val h1 = GraftBloom.mix(key)
    val h2 = GraftBloom.mix(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val bit = java.lang.Math.floorMod(h, m)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  def mergeInPlace(other: GraftBloom): GraftBloom = {
    require(other.numWords == numWords && other.k == k,
      s"bloom shape mismatch: ($numWords,$k) vs (${other.numWords},${other.k})")
    var i = 0
    while (i < numWords) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + numWords * 8).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(GraftBloom.Magic).putInt(k).putInt(numWords)
    var i = 0
    while (i < numWords) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object GraftBloom {
  val Magic: Int = 0x47424c31 // "GBL1"

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** ceil(−n·ln p / ln²2), rounded up to a word boundary. */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    val bits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    ((math.max(bits, 64L) + 63L) / 64L) * 64L
  }

  def optimalK(n: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / n * math.log(2)).toInt)

  def create(n: Long, fpp: Double): GraftBloom = {
    val bits = optimalNumBits(n, fpp)
    new GraftBloom((bits / 64L).toInt, optimalK(n, bits))
  }

  def deserialize(bytes: Array[Byte]): GraftBloom = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, f"not a graft bloom (magic 0x$magic%08x)")
    val k = bb.getInt()
    val numWords = bb.getInt()
    val bloom = new GraftBloom(numWords, k)
    var i = 0
    while (i < numWords) { bloom.words(i) = bb.getLong(); i += 1 }
    bloom
  }
}

/** graft_bloom_agg(key BIGINT, numWords, k) → BINARY (serialized
  * [[GraftBloom]]): distributed bloom build as a map-side-combinable
  * aggregate. Partial buffers are full-size bit arrays — callers bound
  * how many build concurrently (see
  * [[BloomSupport.buildLong]]'s coalesce budget). Null keys skipped. */
case class GraftBloomAgg(
    child: Expression,
    numWordsExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftBloom] {

  private lazy val numWords: Int = numWordsExpr.eval().asInstanceOf[Number].intValue()
  private lazy val kHashes: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg key must be bigint, got ${child.dataType.simpleString}")
    else if (!numWordsExpr.foldable || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_bloom_agg shape must be foldable")
    else if (numWords <= 0 || kHashes <= 0 || kHashes > 64)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg shape out of range: numWords=$numWords k=$kHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, numWordsExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GraftBloom = new GraftBloom(numWords, kHashes)
  override def update(buf: GraftBloom, input: InternalRow): GraftBloom = {
    val v = child.eval(input)
    if (v != null) buf.put(v.asInstanceOf[Long])
    buf
  }
  override def merge(a: GraftBloom, b: GraftBloom): GraftBloom = a.mergeInPlace(b)
  override def eval(buf: GraftBloom): Any = buf.serialize()
  override def serialize(buf: GraftBloom): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): GraftBloom = GraftBloom.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftBloomAgg =
    copy(child = newChildren(0), numWordsExpr = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "graft_bloom_agg"
}

/** Shared probe logic for the two carrier variants below. */
trait GraftBloomProbeLike extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft bloom probe needs a LONG key (hash wider keys with xxhash64); got ${child.dataType}")
}

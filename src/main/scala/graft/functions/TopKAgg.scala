package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (score DESC, id ASC): the k best
  * (score, id, pay) triples seen so far, kept sorted best-first in
  * three parallel primitive arrays. Insertion is a shift into a
  * ≤k-element array — O(k) per row with zero allocation, which beats a
  * heap for the small k (5–20) these operators use.
  *
  * The score order is Spark's TOTAL order on doubles (NaN above every
  * other value, −0.0 = 0.0 — what sort/row_number use), not the
  * primitive `>`: a primitive comparison is always-false against NaN,
  * which would silently DROP NaN scores the window form ranks first
  * (e.g. a 0/0 cosine from a zero-norm vector). −0.0 is normalized to
  * 0.0 at insert so Double.compare's bit-level −0.0 < 0.0 can't
  * diverge from Spark's equal-keys tie (which falls through to id). */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val pays = new Array[Long](k)
  var n = 0

  @inline private def better(s: Double, i: Long, pos: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(pos)) // NaN > all, total
    c > 0 || (c == 0 && i < ids(pos))
  }

  def insert(s0: Double, i: Long, p: Long): Unit = {
    val s = if (s0 == 0.0d) 0.0d else s0 // −0.0 → 0.0 (Spark sort key)
    if (n == k && !better(s, i, n - 1)) return
    var pos = if (n < k) n else n - 1 // index the new triple lands at
    while (pos > 0 && better(s, i, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pays(pos) = pays(pos - 1)
      pos -= 1
    }
    scores(pos) = s; ids(pos) = i; pays(pos) = p
    if (n < k) n += 1
  }
}

/** graft_topk(score DOUBLE, id BIGINT, pay BIGINT, k) →
  * array<struct<score double, id bigint, pay bigint>> — the EXACT
  * top-k rows per group by (score DESC, id ASC), as a map-side
  * combinable aggregate.
  *
  * Why it exists: the idiomatic per-key top-k
  * (`row_number().over(Window.partitionBy(key).orderBy(...)) <= k`)
  * shuffles and sorts EVERY candidate row. For the kNN-shaped
  * operators the candidate set is n per key (an n² join output), so
  * the window moves n² rows through an exchange; this aggregate folds
  * each candidate into a k-slot buffer where the row is produced
  * (partial aggregation), so the exchange carries n buffers of k
  * triples — shuffle volume n·k instead of n². Same result, bit for
  * bit: the (score DESC, id ASC) order is total, so exact top-k is
  * engine-independent and the DuckDB window oracle reproduces it.
  *
  * Null scores/ids are skipped (a null cosine is a null candidate,
  * matching what `row_number` over a null-last ordering would rank
  * below every real row and the k-filter would drop).
  */
case class TopKTriples(
    score: Expression,
    id: Expression,
    pay: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"graft_topk score must be double, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"graft_topk id must be bigint, got ${id.dataType.simpleString}")
    else if (pay.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"graft_topk pay must be bigint, got ${pay.dataType.simpleString}")
    else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType ||
          kExpr.dataType == ShortType || kExpr.dataType == ByteType))
      TypeCheckResult.TypeCheckFailure("graft_topk k must be a foldable integer")
    else if (k <= 0 || k > 65536)
      TypeCheckResult.TypeCheckFailure(s"graft_topk k must be in [1, 65536], got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(score, id, pay, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKTriples.resultType

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = pay.eval(input)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) 0L else p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var j = 0
    while (j < b.n) { a.insert(b.scores(j), b.ids(j), b.pays(j)); j += 1 }
    a
  }

  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      rows(j) = new GenericInternalRow(
        Array[Any](buf.scores(j), buf.ids(j), buf.pays(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 24)
    bb.putInt(buf.k).putInt(buf.n)
    var j = 0
    while (j < buf.n) {
      bb.putDouble(buf.scores(j)).putLong(buf.ids(j)).putLong(buf.pays(j))
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt())
    val n = bb.getInt()
    var j = 0
    // triples arrive already sorted best-first; direct store, no shifts
    while (j < n) {
      buf.scores(j) = bb.getDouble(); buf.ids(j) = bb.getLong(); buf.pays(j) = bb.getLong()
      j += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTriples =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTriples =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKTriples =
    copy(score = newChildren(0), id = newChildren(1), pay = newChildren(2),
      kExpr = newChildren(3))
  override def prettyName: String = "graft_topk"
}

object TopKTriples {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("pay", LongType, nullable = false))), containsNull = false)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native (codegen'd) kernels for the embedding operators.
  *
  * The dot products / L2 distances behind ANN and cosine dedup are
  * expressible as `aggregate(zip_with(...))`, but Spark's higher-order
  * lambdas are interpreted (CodegenFallback) and allocate a zipped
  * array per row-pair. These run the same math in a tight loop inside
  * whole-stage codegen.
  *
  * Accumulation is in index order, double precision — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,z) -> acc+z)`, so
  * swapping them in changes nothing the DuckDB oracle can observe.
  */
object VectorKernels {
  /** both children must be array<double> — getDouble on any other
    * element encoding (e.g. decimal) reads garbage bits. containsNull
    * schemas are accepted (parquet list elements are near-always
    * `optional`); an ACTUAL null element errors at runtime below
    * instead of silently reading as 0.0. */
  def checkDoubleArrays(name: String, es: Seq[Expression]): TypeCheckResult = {
    val ok = es.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires (array<double>, array<double>), got " +
        es.map(_.dataType.simpleString).mkString(", "))
  }

  /** Ragged pairs and null elements fail fast — the alternative is a
    * silent truncation / read-as-0.0 that would corrupt similarity
    * scores without any visible error. */
  private def checkedLength(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"graft vector kernels require equal-length arrays, got $n vs ${b.numElements()}")
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        s"graft vector kernels require non-null elements (null at index $i)")
      i += 1
    }
    n
  }

  /** Σ aᵢ·bᵢ in index order. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkedLength(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Σ (aᵢ-bᵢ)² in index order. */
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = checkedLength(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  /** Spark's `round(x, 6)` for doubles, exactly (Round on DoubleType
    * goes through BigDecimal.valueOf(x).setScale(6, HALF_UP)) — the
    * kernel's argmin must order by the SAME rounded metric the oracle
    * SQL computes or ties resolve differently across engines. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Top-`k` nearest centroids of `v` out of `idx`, ordered by
    * (rounded distance asc, cell id asc) — the quantizer-routing
    * kernel behind kmeansAssign/kmeansRoute and the PQ encoder.
    * `sqrtDist` picks the reported/ordering metric: round6(√sq) (the
    * coarse-cell convention) or round6(sq) (the PQ-codeword
    * convention). Output: array<struct<dist, cell, sq>>.
    *
    * Why a kernel and not `array_min(transform(...))` over a centroid
    * literal (the first r11 attempt): Spark's higher-order lambdas are
    * interpreted (CodegenFallback) and allocate per element — at sf10
    * the 500k-vector × 1040-cell fold is 5.2e8 lambda dispatches plus
    * a 1040-struct array allocation PER ROW; ann_ivf measured 208s and
    * the PQ encoder (×8 subspaces) never finished. This loop is flat
    * JIT'd double math inside whole-stage codegen: the same 33 GFLOP
    * assignment is CPU-bound at memory speed. Ties keep the earlier
    * cell because iteration is in ascending cell order and both the
    * acceptance test and the insertion shift are strict. */
  def cellRoute(v: ArrayData, idx: CellIndex, k: Int,
      sqrtDist: Boolean): ArrayData = {
    val x = v.toDoubleArray()
    val cents = idx.cents
    val cellIds = idx.cells
    val m = cellIds.length
    val kk = if (k < m) k else m
    val bd = new Array[Double](kk)
    val bc = new Array[Long](kk)
    val bs = new Array[Double](kk)
    var filled = 0
    var c = 0
    while (c < m) {
      val cv = cents(c)
      if (cv.length != x.length) throw new IllegalArgumentException(
        s"graft_cell_route: vector dim ${x.length} != centroid dim ${cv.length}")
      var sq = 0.0
      var i = 0
      while (i < x.length) { val d = x(i) - cv(i); sq += d * d; i += 1 }
      val dist = round6(if (sqrtDist) math.sqrt(sq) else sq)
      if (filled < kk || dist < bd(kk - 1)) {
        var pos = if (filled < kk) filled else kk - 1
        while (pos > 0 && bd(pos - 1) > dist) {
          bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); bs(pos) = bs(pos - 1)
          pos -= 1
        }
        bd(pos) = dist; bc(pos) = cellIds(c); bs(pos) = sq
        if (filled < kk) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](filled) { j =>
        org.apache.spark.sql.catalyst.InternalRow(bd(j), bc(j), bs(j))
      })
  }
}

/** A centroid table pinned for the routing kernel: cell ids ascending,
  * one dense double[] per cell. Built once on the driver (|cells| is
  * the quantizer's training budget, thousands at most — past ~10⁵
  * cells routing itself becomes an ANN problem and this flat index is
  * the wrong structure), shipped to tasks once per stage via
  * addReferenceObj, never per row. */
final class CellIndex(val cells: Array[Long],
    val cents: Array[Array[Double]]) extends Serializable {
  require(cells.length == cents.length, "cells/cents length mismatch")
}

/** graft_cell_route(array<double>) → array<struct<dist,cell,sq>>:
  * top-k quantizer routing against a driver-built [[CellIndex]].
  * Constructed directly (GraftShim.column), not via the function
  * registry — the index is an object argument, like [[BloomProbe]]'s
  * broadcast. */
case class CellRoute(child: Expression, index: CellIndex, k: Int,
    sqrtDist: Boolean) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkDoubleArrays("graft_cell_route", Seq(child))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false),
    StructField("sq", DoubleType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.cellRoute(v.asInstanceOf[ArrayData], index, k, sqrtDist)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("graftCellIndex", index,
      classOf[CellIndex].getName)
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.cellRoute($v, $idxRef, $k, $sqrtDist)")
  }
  override def prettyName: String = "graft_cell_route"
  override protected def withNewChildInternal(newChild: Expression): CellRoute =
    copy(child = newChild)
}

/** graft_code_route(array<double>, s) → array<struct<dist,cell,sq>>:
  * per-subspace codeword routing — the PQ encoder's argmin, one
  * [[CellIndex]] per subspace, selected by the row's subspace id. */
case class CodeRoute(left: Expression, right: Expression,
    bySubspace: Array[CellIndex], k: Int, sqrtDist: Boolean)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_code_route requires (array<double>, bigint), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false),
    StructField("sq", DoubleType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(v: Any, s: Any): Any =
    VectorKernels.cellRoute(v.asInstanceOf[ArrayData],
      bySubspace(s.asInstanceOf[Long].toInt), k, sqrtDist)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftCodebook", bySubspace,
      classOf[Array[CellIndex]].getName)
    defineCodeGen(ctx, ev, (v, s) =>
      s"graft.functions.VectorKernels.cellRoute($v, $cbRef[(int) $s], $k, $sqrtDist)")
  }
  override def prettyName: String = "graft_code_route"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CodeRoute =
    copy(left = l, right = r)
}

/** graft_dot(array<double>, array<double>) → double. Input types are
  * enforced (getDouble on e.g. a decimal array reads garbage bits). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkDoubleArrays("graft_dot", Seq(left, right))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** graft_l2sq(array<double>, array<double>) → double. */
case class L2Squared(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkDoubleArrays("graft_l2sq", Seq(left, right))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.l2sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Squared =
    copy(left = l, right = r)
}

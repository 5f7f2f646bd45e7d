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

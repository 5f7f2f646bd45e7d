package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** As-of join: for every left row, the single latest right row of the
  * same key whose time is ≤ the left row's time (left-outer semantics —
  * unmatched left rows keep nulls on the right).
  *
  * Spark has no native as-of join, and composing it from built-ins
  * costs a row-multiplying range join + a window dedup. This is the
  * whole-operator path: a LogicalPlan + Strategy + physical exec whose
  * merge is a single forward pass over both children, co-partitioned by
  * key (ClusteredDistribution) and sorted by (key, time) — exactly one
  * shuffle per side and O(|L|+|R|) merge work per partition, the same
  * plan shape a 1000-executor cluster wants.
  *
  * Domain use: "where was each vehicle as of time T" over
  * siri_vehicle_location, or latest-view-before-purchase over events.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Option[Long] = None,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Option[Long] = None,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // rows leave exactly as the left child was partitioned/sorted — a
  // downstream groupBy/window on the same key plans zero extra exchanges
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** read the single-field time row as long (micros for timestamps,
    * native value for integral types) so tolerance can subtract. */
  private def timeAsLong(dt: org.apache.spark.sql.types.DataType): InternalRow => Long = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType => r => r.getLong(0)
      case IntegerType | DateType => r => r.getInt(0).toLong
      case other => throw new IllegalArgumentException(
        s"as-of tolerance unsupported for time type $other")
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val tol = toleranceMicros
    val fwd = forward
    // one reader serves both sides, so the physical encodings must
    // agree — getLong on an int-backed row would read wrong bytes and
    // silently mis-filter instead of erroring
    if (tol.isDefined && leftTime.dataType != rightTime.dataType)
      throw new IllegalArgumentException(
        s"as-of tolerance requires matching time types, got " +
          s"${leftTime.dataType.simpleString} vs ${rightTime.dataType.simpleString}")
    val toLong = if (tol.isDefined) timeAsLong(leftTime.dataType) else null
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // bind against a nullable view of the right schema — BindReferences
      // takes nullability from the input attrs, and unmatched rows carry
      // nulls in primitive columns
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))

      // lookahead right row (copied — sort iterators reuse row buffers)
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTimeVal: InternalRow = null
      // SQL equi-join semantics: null keys never match. The natural
      // ordering sorts nulls first and compares them EQUAL, so without
      // this skip a null-keyed left row would pair with a null-keyed
      // right row (diverging from DuckDB ASOF JOIN). Null-keyed right
      // rows are unreachable by any left row — drop them on pull.
      def pullRight(): Unit = {
        var done = false
        while (!done) {
          if (rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            if (!k.anyNull) {
              rRow = r.copy()
              rKey = rKeyProj(rRow).copy()
              rTimeVal = rTimeProj(rRow).copy()
              done = true
            }
          } else { rRow = null; rKey = null; rTimeVal = null; done = true }
        }
      }
      pullRight()

      var matchRow: InternalRow = null
      var matchKey: InternalRow = null
      var matchTime: Long = 0L

      if (fwd) {
        // FORWARD direction: first right row of the same key with
        // rTime ≥ lTime. The matched row is PEEKED, not consumed — it
        // can serve later left rows of the same key (their times only
        // grow). Rows skipped past (rTime < lTime for the current key)
        // can never match a later, even-later-timed left row.
        lIter.map { l =>
          val lKey = lKeyProj(l)
          if (lKey.anyNull) resultProj(joined(l, nullRight))
          else {
            val lT = lTimeProj(l)
            var advance = true
            while (advance && rRow != null) {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0 || (c == 0 && timeOrd.compare(rTimeVal, lT) < 0)) pullRight()
              else advance = false
            }
            val matched = rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
              (tol.isEmpty || toLong(rTimeVal) - toLong(lT) <= tol.get)
            resultProj(joined(l, if (matched) rRow else nullRight))
          }
        }
      } else lIter.map { l =>
        val lKey = lKeyProj(l)
        if (lKey.anyNull) {
          // null join key matches nothing — emit the unmatched shape
          resultProj(joined(l, nullRight))
        } else {
          val lT = lTimeProj(l)
          if (matchRow != null && keyOrd.compare(matchKey, lKey) != 0) {
            matchRow = null; matchKey = null
          }
          var advance = true
          while (advance && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) pullRight()
            else if (c == 0 && timeOrd.compare(rTimeVal, lT) <= 0) {
              matchRow = rRow; matchKey = rKey
              if (tol.isDefined) matchTime = toLong(rTimeVal)
              pullRight()
            } else advance = false
          }
          val withinTol = matchRow != null &&
            (tol.isEmpty || toLong(lT) - matchTime <= tol.get)
          resultProj(joined(l, if (withinTol) matchRow else nullRight))
        }
      }
    }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, fwd) :: Nil
    case _ => Nil
  }
}

/** User-facing builder. */
object AsOf {
  /** left-outer as-of join: for each left row, latest right row with
    * rightTime ≤ leftTime sharing `keys` (or, with
    * `direction = "forward"`, the EARLIEST right row with
    * rightTime ≥ leftTime — pandas merge_asof direction semantics).
    * Column names must be disjoint apart from the join keys you select
    * away afterwards. `toleranceMicros` bounds the lookback/lookahead:
    * a match farther than tolerance from leftTime is discarded (micros
    * for timestamp columns, native units for integral ones). */
  def join(leftDf: DataFrame, rightDf: DataFrame, leftKeys: Seq[String],
      rightKeys: Seq[String], leftTimeCol: String, rightTimeCol: String,
      toleranceMicros: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be backward|forward, got $direction")
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val node = AsOfJoin(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), toleranceMicros,
      forward = direction == "forward")
    org.apache.spark.sql.graft.GraftShim.ofRows(spark, node)
  }
}

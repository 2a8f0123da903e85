package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A first-class as-of join in the Catalyst stack — the optional "real
  * AsOfJoin physical node" of SURVEY §4 (custom work item 1): logical node →
  * planner strategy → physical exec, registered via
  * `SparkSessionExtensions.injectPlannerStrategy` ([[GraftExtensions]]).
  *
  * Physical algorithm = broadcast as-of: the (small) data side is collected
  * once, sorted by key and direction-filled (the reference's
  * fill-before-reindex, reference src/JoinHelpers.fs:49-53), broadcast, and
  * each probe row binary-searches it. The probe side's partitioning is
  * PRESERVED (`outputPartitioning = left.outputPartitioning`) — a billion
  * probes stay fully parallel and downstream operators see the partitioning
  * (no spurious re-shuffle), which the library-level mapPartitions variant
  * cannot promise to the planner.
  *
  * Keys must be LongType, the carried value DoubleType (cast upstream —
  * `AsOf.joinNative` does). Big-data×big-data as-of stays with
  * [[graft.operators.AsOf.join]]'s union+window plan.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    rightValue: Attribute,
    valueAttr: AttributeReference,
    smaller: Boolean) extends LogicalPlan {

  override def children: Seq[LogicalPlan] = Seq(left, right)
  override def output: Seq[Attribute] = left.output :+ valueAttr
  // valueAttr is born here, not derived from a child — declare it so
  // CheckAnalysis's missing-input check accepts the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valueAttr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan =
    copy(left = newChildren(0), right = newChildren(1))
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, rv, va, smaller) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, rv, va, smaller) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    rightValue: Attribute,
    valueAttr: AttributeReference,
    smaller: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ valueAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valueAttr)
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyBound = BindReferences.bindReference(rightKey: Expression, right.output)
    val valBound = BindReferences.bindReference(rightValue: Expression, right.output)

    // build side: sorted keys + direction-filled values (nulls in the data
    // become carried neighbors exactly like the reference's vector fill)
    val rows = right.executeCollect()
      .flatMap { r =>
        val k = keyBound.eval(r)
        if (k == null) None
        else Some((k.asInstanceOf[Long], Option(valBound.eval(r)).map(_.asInstanceOf[Double])))
      }
      .sortBy(_._1)
    val keys = rows.map(_._1)
    val vals = new Array[java.lang.Double](rows.length)
    if (smaller) {
      var prev: Option[Double] = None
      var i = 0
      while (i < rows.length) { prev = rows(i)._2.orElse(prev); vals(i) = prev.map(Double.box).orNull; i += 1 }
    } else {
      var next: Option[Double] = None
      var i = rows.length - 1
      while (i >= 0) { next = rows(i)._2.orElse(next); vals(i) = next.map(Double.box).orNull; i -= 1 }
    }
    val bc = sparkContext.broadcast((keys, vals))
    val lkBound = BindReferences.bindReference(leftKey: Expression, left.output)
    val isSmaller = smaller
    val outAttrs = output
    val leftAttrs = left.output

    left.execute().mapPartitions { iter =>
      val (ks, vs) = bc.value
      val joined = new JoinedRow
      val valRow = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(outAttrs, leftAttrs :+ valueAttr)
      iter.map { row =>
        val kAny = lkBound.eval(row)
        var v: java.lang.Double = null
        if (kAny != null && ks.nonEmpty) {
          val k = kAny.asInstanceOf[Long]
          // first index with ks(idx) > k
          var lo = 0
          var hi = ks.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ks(mid) <= k) lo = mid + 1 else hi = mid
          }
          if (isSmaller) { if (lo - 1 >= 0) v = vs(lo - 1) }
          else {
            var j = lo - 1
            while (j >= 0 && ks(j) == k) j -= 1
            if (j + 1 < ks.length) v = vs(j + 1)
          }
        }
        if (v == null) valRow.update(0, null) else valRow.update(0, v.doubleValue())
        proj(joined(row, valRow))
      }
    }
  }
}

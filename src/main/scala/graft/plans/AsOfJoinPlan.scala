package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

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
  * Keys may be long/int/date/timestamp (anything with a total order as a
  * long under the hood); carried value columns can be ANY type, several at
  * once — each filled independently like the reference's per-vector
  * `fillMissing`. Big-data×big-data as-of stays with
  * [[graft.operators.AsOf.join]]'s union+window plan.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    rightValues: Seq[Attribute],
    valueAttrs: Seq[AttributeReference],
    smaller: Boolean) extends LogicalPlan {

  override def children: Seq[LogicalPlan] = Seq(left, right)
  override def output: Seq[Attribute] = left.output ++ valueAttrs
  // valueAttrs are born here, not derived from a child — declare them so
  // CheckAnalysis's missing-input check accepts the node
  override def producedAttributes: AttributeSet = AttributeSet(valueAttrs)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan =
    copy(left = newChildren(0), right = newChildren(1))
}

object AsOfJoinNode {
  /** Key types the exec can binary-search (total order as a long). */
  def supportedKeyType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private[plans] def keyToLong(dt: DataType): Any => Long = dt match {
    case IntegerType | DateType => a => a.asInstanceOf[Int].toLong
    case _ => a => a.asInstanceOf[Long]
  }
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, rvs, vas, smaller) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, rvs, vas, smaller) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    rightValues: Seq[Attribute],
    valueAttrs: Seq[AttributeReference],
    smaller: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs
  override def producedAttributes: AttributeSet = AttributeSet(valueAttrs)
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyBound = BindReferences.bindReference(rightKey: Expression, right.output)
    val valBounds = rightValues.map(rv =>
      BindReferences.bindReference(rv: Expression, right.output))
    val rKeyToLong = AsOfJoinNode.keyToLong(rightKey.dataType)
    val nVals = rightValues.size

    // build side: sorted keys + per-column direction-filled values (nulls in
    // the data become carried neighbors exactly like the reference's vector
    // fill, independently per column)
    val rows = right.executeCollect()
      .flatMap { r =>
        val k = keyBound.eval(r)
        if (k == null) None
        else Some((rKeyToLong(k), valBounds.map(_.eval(r)).toArray))
      }
      .sortBy(_._1)
    val keys = rows.map(_._1)
    val vals = Array.ofDim[Any](rows.length, nVals)
    var c = 0
    while (c < nVals) {
      if (smaller) {
        var prev: Any = null
        var i = 0
        while (i < rows.length) {
          if (rows(i)._2(c) != null) prev = rows(i)._2(c)
          vals(i)(c) = prev
          i += 1
        }
      } else {
        var next: Any = null
        var i = rows.length - 1
        while (i >= 0) {
          if (rows(i)._2(c) != null) next = rows(i)._2(c)
          vals(i)(c) = next
          i -= 1
        }
      }
      c += 1
    }
    val bc = sparkContext.broadcast((keys, vals))
    val lkBound = BindReferences.bindReference(leftKey: Expression, left.output)
    val lKeyToLong = AsOfJoinNode.keyToLong(leftKey.dataType)
    val isSmaller = smaller
    val outAttrs = output
    val leftAttrs = left.output
    val vAttrs = valueAttrs

    left.execute().mapPartitions { iter =>
      val (ks, vs) = bc.value
      val joined = new JoinedRow
      val valRow = new GenericInternalRow(nVals)
      val proj = UnsafeProjection.create(outAttrs, leftAttrs ++ vAttrs)
      iter.map { row =>
        val kAny = lkBound.eval(row)
        var idx = -1
        if (kAny != null && ks.nonEmpty) {
          val k = lKeyToLong(kAny)
          // first index with ks(idx) > k
          var lo = 0
          var hi = ks.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ks(mid) <= k) lo = mid + 1 else hi = mid
          }
          if (isSmaller) { if (lo - 1 >= 0) idx = lo - 1 }
          else {
            var j = lo - 1
            while (j >= 0 && ks(j) == k) j -= 1
            if (j + 1 < ks.length) idx = j + 1
          }
        }
        var c = 0
        while (c < nVals) {
          valRow.update(c, if (idx < 0) null else vs(idx)(c))
          c += 1
        }
        proj(joined(row, valRow))
      }
    }
  }
}

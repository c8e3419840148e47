package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k-per-group as a first-class operator (SURVEY.md §2.F top-k
  * pushdown, generalized per group).
  *
  * The composable spelling — row_number().over(partitionBy(g).orderBy(o))
  * then filter(rn <= k) — shuffles EVERY input row on g and fully sorts
  * each partition. This operator is the aggregation-style shape instead:
  * a partial pass keeps a bounded k-heap per group per input partition
  * (map-side combine: at most k * groups * partitions candidate rows reach
  * the exchange), then a final pass re-heaps per group after a hash
  * shuffle. At 100 TB the exchange carries ~k rows per (group, mapper)
  * instead of the whole table, and nothing is ever fully sorted.
  *
  * Hive lineage: LimitPushdownOptimizer's ReduceSink top-N heap
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/optimizer/
  * LimitPushdownOptimizer.java], which Hive only applies per-reducer;
  * here it is a proper partial/final operator pair.
  */
case class GroupedTopKNode(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

/** Shared heap logic: per-partition iterator → top-k rows per group. */
private[plans] object TopKHeaps {
  def topKPerGroup(
      iter: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      cmp: Ordering[InternalRow],
      k: Int): Iterator[InternalRow] = {
    // max-heap on cmp: the heap head is the WORST retained row, evicted
    // when a better row arrives
    val heaps = new java.util.HashMap[UnsafeRow,
      java.util.PriorityQueue[UnsafeRow]]()
    val heapCmp = new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
    }
    iter.foreach { row =>
      val key = groupProj(row)
      var h = heaps.get(key)
      if (h == null) {
        h = new java.util.PriorityQueue[UnsafeRow](k + 1, heapCmp)
        heaps.put(key.copy(), h)
      }
      if (h.size < k) {
        h.add(row.asInstanceOf[UnsafeRow].copy())
      } else if (cmp.compare(row, h.peek()) < 0) {
        h.poll()
        h.add(row.asInstanceOf[UnsafeRow].copy())
      } // else: row is worse than the retained k — dropped map-side
    }
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap { h =>
      // emit in ordering order (heap is reverse-ordered)
      val buf = new Array[UnsafeRow](h.size)
      var i = buf.length - 1
      while (i >= 0) { buf(i) = h.poll(); i -= 1 }
      buf.iterator
    }
  }
}

abstract class GroupedTopKExecBase extends UnaryExecNode {
  def grouping: Seq[Expression]
  def ordering: Seq[SortOrder]
  def k: Int
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  protected def run(rdd: RDD[InternalRow]): RDD[InternalRow] = {
    val groupingExprs = grouping
    val orderingExprs = ordering
    val attrs = child.output
    val kk = k
    rdd.mapPartitions({ iter =>
      val proj = UnsafeProjection.create(groupingExprs, attrs)
      val toUnsafe = UnsafeProjection.create(attrs, attrs)
      val cmp = GenerateOrdering.generate(orderingExprs, attrs)
      TopKHeaps.topKPerGroup(iter.map(toUnsafe), proj, cmp, kk)
    }, preservesPartitioning = true)
  }
}

/** Partial stage: bounded heaps per input partition, no distribution
  * requirement — the map-side combine. */
case class GroupedTopKPartialExec(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends GroupedTopKExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = run(child.execute())
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Final stage: requires clustering on the group key (EnsureRequirements
  * inserts the hash exchange of candidate rows only). */
case class GroupedTopKFinalExec(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends GroupedTopKExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    (if (grouping.isEmpty) UnspecifiedDistribution
     else ClusteredDistribution(grouping)) :: Nil
  override protected def doExecute(): RDD[InternalRow] = run(child.execute())
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Planner strategy: lower the logical node to partial + final. */
object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(g, o, k, child) =>
      GroupedTopKFinalExec(g, o, k,
        GroupedTopKPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

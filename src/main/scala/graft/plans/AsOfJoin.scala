package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF join as a first-class operator (SURVEY.md §2.C / §7.3 tier
  * (c): LogicalPlan + SparkStrategy + SparkPlan) — the second full
  * custom operator beside [[GroupedTopKNode]].
  *
  * Semantics (direction `forward = false`, the default): for every
  * left row, the LATEST right row of the same key with
  * right.time <= left.time (ties among equal right times resolved
  * by the caller-supplied total tiebreak order); unmatched left rows
  * emit null right columns — i.e. kdb's `aj`, Pandas merge_asof
  * (direction="backward"), Flink temporal join. With `forward = true`
  * the comparisons mirror: the EARLIEST right row with
  * right.time >= left.time wins (first in (time, tiebreak) order on
  * equal times), and the staleness gate flips to
  * rightTime - leftTime <= tolerance — Pandas direction="forward".
  * With `nearest = true` (Pandas direction="nearest", the kdb
  * nearest-event shape) the merge keeps BOTH the backward candidate
  * (latest right at-or-before — ties to the HIGHEST (time, tiebreak))
  * and the forward lookahead (earliest right strictly after) and
  * emits whichever is temporally closer, exact-microsecond ties to
  * the backward side; the tolerance gates each side's own distance.
  * NOTE the same-time boundary: a right row at exactly left.time is a
  * BACKWARD candidate here (distance 0, always wins), whereas the
  * window formulation (q_join_nearest) splits same-time rows by id
  * interleaving — each contract is exact and separately oracled.
  *
  * The composable spelling (q_join_asof: tagged union + per-key
  * last-ignoring-nulls window) is correct but carries BOTH tables
  * through one union-wide sort and a window over the merged stream.
  * This operator is the sort-merge shape instead: each side is hash-
  * clustered on its own key and sorted (key, time) INDEPENDENTLY —
  * Spark's EnsureRequirements inserts co-partitioned exchanges and
  * external spilling sorts exactly as for a SortMergeJoin — and a
  * single forward two-pointer pass per partition emits matches with
  * O(1) state (one retained candidate row), never materializing a
  * per-key buffer. At 100 TB that is the same cost class as any
  * equi-join of the two tables; the window formulation's merged
  * union stream and its null-carrying lattice are gone.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[SortOrder],
    toleranceUs: Option[Long] = None,
    forward: Boolean = false,
    nearest: Boolean = false) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  require(!(forward && nearest),
    "as-of direction is one of backward (default), forward, nearest")
  require(!nearest || Seq(leftTime, rightTime).forall(t =>
    t.dataType == org.apache.spark.sql.types.TimestampType ||
      t.dataType == org.apache.spark.sql.types.LongType),
    "nearest as-of needs long-backed time columns (timestamp or long)")
  // the key comparator is generated from LEFT types and hash
  // co-partitioning is type-sensitive: an int-vs-long pair would
  // silently mis-match beyond 32 bits rather than fail — reject here
  require(leftKeys.zip(rightKeys).forall { case (l, r) =>
    l.dataType == r.dataType },
    s"as-of join key types must match pairwise: " +
      s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time column types must match: " +
      s"${leftTime.dataType} vs ${rightTime.dataType}")
  require(toleranceUs.isEmpty || Seq(leftTime, rightTime).forall(t =>
    t.dataType == org.apache.spark.sql.types.TimestampType ||
      t.dataType == org.apache.spark.sql.types.LongType),
    "as-of tolerance needs long-backed time columns (timestamp or long)")
  require(toleranceUs.forall(_ >= 0),
    s"as-of tolerance must be non-negative: $toleranceUs")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[SortOrder],
    left: SparkPlan, right: SparkPlan,
    toleranceUs: Option[Long] = None,
    forward: Boolean = false,
    nearest: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partitioned like SortMergeJoin: EnsureRequirements inserts
  // compatible hash exchanges for both children
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // each side sorted (keys, time[, tiebreak]) — external spilling sorts
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTiebreak))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      // canonical key/time row layouts so one generated comparator
      // serves both sides
      val keyAttrs = lk.map(e =>
        AttributeReference("k", e.dataType, nullable = true)())
      val keyOrd = GenerateOrdering.generate(
        keyAttrs.map(SortOrder(_, Ascending)), keyAttrs)
      val timeAttr = Seq(AttributeReference("t", lt.dataType,
        nullable = true)())
      val timeOrd = GenerateOrdering.generate(
        timeAttr.map(SortOrder(_, Ascending)), timeAttr)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(allOut, allOut)

      // O(1)-state forward merge: `pending` is the un-consumed right
      // lookahead; `lastMatch` the latest right row usable for the
      // current left key so far
      var pending: InternalRow = null
      var pendingKey: InternalRow = null
      var pendingTime: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null
      var lastMatchTime: InternalRow = null
      // kdb-wj staleness gate, checked at emit time: lTime only grows
      // within a key, so the arithmetic is one long compare per row
      // (times are long-backed by the node's require)
      val tol = toleranceUs.getOrElse(Long.MaxValue)

      // A match's TRUE time distance is non-negative and bounded by the
      // full long span (< 2^64), so the wrapped two's-complement
      // difference re-read as UNSIGNED is exact for every timestamp
      // pair — a signed `diff <= tol` misjudges spans past 2^63 (e.g.
      // left near Long.MinValue, right near Long.MaxValue wraps
      // negative and passes a tiny tolerance). tol >= 0 is required at
      // construction, so unsigned compare against it is also exact.
      def within(diff: Long): Boolean =
        java.lang.Long.compareUnsigned(diff, tol) <= 0

      def loadPending(): Unit =
        if (pending == null && rIter.hasNext) {
          val r = rIter.next()
          pending = r.copy()
          pendingKey = rKeyProj(pending).copy()
          pendingTime = rTimeProj(pending).copy()
        }

      if (forward) {
        // FORWARD merge is simpler than backward: the match IS the
        // lookahead row (never consumed on match — it may serve later
        // left rows of the same key too); only dead right rows (key
        // passed, or same key strictly before lTime — left times are
        // nondecreasing within a key) are consumed
        lIter.map { l =>
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l).copy()
          var advancing = true
          while (advancing) {
            loadPending()
            if (pending == null) advancing = false
            else {
              val ck = keyOrd.compare(pendingKey, lKey)
              if (ck < 0 ||
                  (ck == 0 && timeOrd.compare(pendingTime, lTime) < 0)) {
                pending = null
              } else advancing = false
            }
          }
          val matched = pending != null &&
            keyOrd.compare(pendingKey, lKey) == 0 &&
            (toleranceUs.isEmpty ||
              within(pendingTime.getLong(0) - lTime.getLong(0)))
          toUnsafe(joined(l, if (matched) pending else nullRight))
        }
      } else lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l).copy()
        if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
          lastMatch = null; lastMatchKey = null; lastMatchTime = null
        }
        var advancing = true
        while (advancing) {
          loadPending()
          if (pending == null) advancing = false
          else {
            val ck = keyOrd.compare(pendingKey, lKey)
            if (ck < 0) {
              // right rows of earlier keys can never match again
              pending = null
            } else if (ck == 0 && timeOrd.compare(pendingTime, lTime) <= 0) {
              lastMatch = pending; lastMatchKey = pendingKey
              lastMatchTime = pendingTime
              pending = null
            } else advancing = false
          }
        }
        val fresh = lastMatch != null &&
          (toleranceUs.isEmpty ||
            within(lTime.getLong(0) - lastMatchTime.getLong(0)))
        if (!nearest) {
          toUnsafe(joined(l, if (fresh) lastMatch else nullRight))
        } else {
          // NEAREST: the un-consumed lookahead (strictly after lTime —
          // same-time rows were consumed into lastMatch) competes with
          // the backward candidate on exact microsecond distance;
          // ties go backward. Each side gates on its own tolerance,
          // and both the gates and the back-vs-forward comparison use
          // UNSIGNED distance (see `within`): the isEmpty
          // short-circuit states the no-tolerance contract ("any
          // forward candidate qualifies") without a subtraction, and
          // pickBack stays exact even when one side's span exceeds
          // 2^63 µs (AsOfJoinSpec pins the extreme-timestamp case).
          val fwdOk = pending != null &&
            keyOrd.compare(pendingKey, lKey) == 0 &&
            (toleranceUs.isEmpty ||
              within(pendingTime.getLong(0) - lTime.getLong(0)))
          val pickBack = fresh && (!fwdOk ||
            java.lang.Long.compareUnsigned(
              lTime.getLong(0) - lastMatchTime.getLong(0),
              pendingTime.getLong(0) - lTime.getLong(0)) <= 0)
          toUnsafe(joined(l,
            if (pickBack) lastMatch
            else if (fwdOk) pending
            else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)
}

/** Planner strategy: lower the logical as-of node to the exec. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rtb, tol, fwd, near) =>
      AsOfJoinExec(lk, rk, lt, rt, rtb, planLater(l), planLater(r),
        tol, fwd, near) :: Nil
    case _ => Nil
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: lower the ubiquitous top-k-per-group idiom
  *
  *   Project([cols without rn],
  *     Filter(rn <= k,
  *       Window([rn := row_number() OVER (PARTITION BY g ORDER BY o)])))
  *
  * into [[GroupedTopKNode]] whenever the rank column itself is discarded —
  * the user keeps writing the standard window spelling (or SQL QUALIFY) and
  * silently gets the bounded-heap partial + spilling sort-based final
  * operator instead of a full shuffle + per-partition sort of every row.
  *
  * Semantics: row_number over a non-total ordering picks an arbitrary
  * representative among ties, and so does GroupedTopK — the rewrite
  * preserves the (already nondeterministic-under-ties) contract and is
  * exact when the ordering is total.
  *
  * Hive lineage: this is the optimizer-side generalization of Hive's
  * LimitPushdownOptimizer top-N key [hive: ql/src/java/org/apache/hadoop/
  * hive/ql/optimizer/LimitPushdownOptimizer.java], which only bounds the
  * reducer-side buffer; here the whole operator pair is swapped in.
  * Registered via GraftExtensions.injectOptimizerRule (runs in the
  * user-provided batch, after pushdown/pruning has settled the shape).
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** k such that the conjunct means rn <= k, if it does. */
  private def bound(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _))
      if a.exprId == rn.exprId => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _))
      if a.exprId == rn.exprId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute)
      if a.exprId == rn.exprId => Some(k)
    case GreaterThan(Literal(k: Int, _), a: Attribute)
      if a.exprId == rn.exprId => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, _))
      if a.exprId == rn.exprId && k == 1 => Some(1)
    case EqualTo(Literal(k: Int, _), a: Attribute)
      if a.exprId == rn.exprId && k == 1 => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(al @ Alias(
            WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, order, _)), _)),
            _, _, child, _))) =>
      val rn = al.toAttribute
      // the rank column must be dropped by the projection — if the user
      // keeps it, the operator (which does not produce ranks) cannot serve
      val rnDropped = !projectList.exists(_.references.contains(rn))
      val conjuncts = splitConjunctivePredicates(cond)
      // every conjunct must constrain ONLY rn (other predicates have been
      // pushed below the window by PushDownPredicates already)
      val ks = conjuncts.map {
        case IsNotNull(a: Attribute) if a.exprId == rn.exprId => Some(Int.MaxValue)
        case c => bound(c, rn)
      }
      val k = if (ks.forall(_.isDefined)) ks.flatten.min else -1
      if (rnDropped && order.nonEmpty && k >= 1 && k < Int.MaxValue)
        Project(projectList, GroupedTopKNode(part, order, k, child))
      else p
  }
}

package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic materialized-view rewrite — the optimizer-side analogue of
  * Hive 3's flagship MV feature [hive: ql/src/java/org/apache/hadoop/hive/
  * ql/metadata/HiveMaterializedViewsRegistry.java + Calcite's
  * MaterializedViewAggregateRule]: a `GROUP BY` aggregate over a fact table
  * is transparently answered from a precomputed partial-aggregate table
  * whenever the query's grouping columns are a subset of the MV's and every
  * aggregate is derivable from an MV partial (the standard aggregate-rollup
  * containment test).
  *
  * Rollup algebra: sum -> SUM(partial_sum), count -> SUM(partial_count),
  * min -> MIN(partial_min), max -> MAX(partial_max) — each partial is
  * re-aggregated over the MV's finer grouping, cast back to the query's
  * result type when decimal widening differs. avg/distinct are NOT
  * rewritten (avg needs sum+count pairing; distinct does not roll up).
  *
  * Matching is conservative by design: the fact scan must be bare (no
  * Filter between the Aggregate and the scan — a filtered query may touch
  * rows the MV has already collapsed), grouping expressions must be plain
  * fact columns, and aggregate calls are matched by a canonical rendering
  * (function + exact cast chain + column name) captured from the MV's own
  * defining query — so `sum(CAST(x AS DECIMAL(18,4)))` never silently
  * answers `sum(x)` with different float semantics.
  *
  * Scale rationale: at 100 TB the MV is the difference between re-scanning
  * the fact (O(fact)) and scanning a table the size of the group-key
  * cross-product (often 1e6x smaller); because the rewrite happens in the
  * optimizer, every consumer — SQL, DataFrame, BI dashboard — benefits
  * without query changes, which is exactly why warehouses ship it.
  *
  * Registered per-session via `experimental.extraOptimizations` (same
  * mechanism as [[RowNumberTopKRewrite]] via GraftExtensions); the
  * registry is keyed by the fact table's filesystem path, so the rule is
  * a no-op for every query until an MV is registered.
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {

  /** A registered MV: the scan of the materialized table, the fact group
    * columns it carries, and the canonical-key -> partial-column map. */
  private final case class MvDef(
      plan: LogicalPlan,
      groupCols: Set[String],
      aggCols: Map[String, String])

  private val registry = new ConcurrentHashMap[String, MvDef]()

  /** Register an MV for automatic rewrite.
    *
    * @param factPath   filesystem path of the fact table's parquet root
    * @param definition the MV's defining aggregate over the fact — its
    *                   analyzed plan supplies the group columns and the
    *                   canonical keys of the partials (output names must
    *                   equal the materialized table's column names)
    * @param mvTable    the materialized table (e.g. spark.read.parquet of
    *                   the MV path)
    */
  def register(factPath: String, definition: DataFrame,
               mvTable: DataFrame): Unit = {
    val agg = definition.queryExecution.analyzed.collectFirst {
      case a: Aggregate => a
    }.getOrElse(throw new IllegalArgumentException(
      "MV definition must be an Aggregate"))
    val groupCols = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case e => throw new IllegalArgumentException(
        s"MV group expression must be a plain column, got $e")
    }.toSet
    val aggCols = agg.aggregateExpressions.collect {
      case al @ Alias(ae: AggregateExpression, _) =>
        keyOf(ae.aggregateFunction) -> al.name
    }.toMap
    registry.put(normalize(factPath),
      MvDef(mvTable.queryExecution.analyzed, groupCols, aggCols))
  }

  /** Drop all registrations (test isolation). */
  def clear(): Unit = registry.clear()

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Canonical rendering of an aggregate call for matching: function name
    * + exact cast chain + leaf column names. Qualifier- and exprId-free,
    * so the same textual aggregate matches across plans. */
  private def keyOf(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case c: Cast => s"cast(${keyOf(c.child)} as ${c.dataType.sql})"
    case l: Literal => l.sql
    case other =>
      s"${other.prettyName}(${other.children.map(keyOf).mkString(",")})"
  }

  /** The fact path under the aggregate, if the subtree is a bare scan
    * (column-pruning Projects only — a Filter disqualifies the rewrite). */
  private def factPathOf(p: LogicalPlan): Option[String] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      factPathOf(child)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
        Some(fs.location.rootPaths.head.toUri.getPath)
      case _ => None
    }
    case _ => None
  }

  /** Roll the query's aggregate call up from the matching MV partial. */
  private def rolled(ae: AggregateExpression, mv: MvDef,
                     out: Map[String, Attribute]): Option[Expression] = {
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else for {
      mvCol <- mv.aggCols.get(keyOf(ae.aggregateFunction))
      partial <- out.get(mvCol)
    } yield {
      val f = ae.aggregateFunction match {
        case _: Min => Min(partial)
        case _: Max => Max(partial)
        case _ => Sum(partial) // sum AND count both roll up via SUM
      }
      val e = f.toAggregateExpression()
      if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
    }
  }

  /** Rewrite an expression onto the MV: aggregate calls roll up, grouping
    * columns re-bind by name, scalar wrappers (casts, arithmetic) carry
    * over; any other fact reference kills the rewrite. */
  private def rewriteExpr(e: Expression, mv: MvDef,
                          out: Map[String, Attribute]): Option[Expression] =
    e match {
      case ae: AggregateExpression => rolled(ae, mv, out)
      case a: AttributeReference =>
        if (mv.groupCols.contains(a.name)) out.get(a.name) else None
      case other =>
        val kids = other.children.map(rewriteExpr(_, mv, out))
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.flatten))
        else None
    }

  /** Result expressions keep their names AND exprIds so parent operators
    * (sorts, projects) resolve against the rewritten aggregate unchanged. */
  private def rewriteNamed(ne: NamedExpression, mv: MvDef,
                           out: Map[String, Attribute])
      : Option[NamedExpression] = ne match {
    case a: AttributeReference if mv.groupCols.contains(a.name) =>
      out.get(a.name).map(m => Alias(m, a.name)(exprId = a.exprId))
    case al @ Alias(child, name) =>
      rewriteExpr(child, mv, out).map(e => Alias(e, name)(exprId = al.exprId))
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = for {
    path <- factPathOf(agg.child)
    mv <- Option(registry.get(path))
    out = mv.plan.output.map(a => a.name -> a).toMap
    if agg.groupingExpressions.forall {
      case a: AttributeReference =>
        mv.groupCols.contains(a.name) && out.contains(a.name)
      case _ => false
    }
    rewritten = agg.aggregateExpressions.map(rewriteNamed(_, mv, out))
    if rewritten.forall(_.isDefined)
  } yield agg.copy(
    groupingExpressions = agg.groupingExpressions.map {
      case a: AttributeReference => out(a.name)
    },
    aggregateExpressions = rewritten.flatten,
    child = mv.plan)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
}

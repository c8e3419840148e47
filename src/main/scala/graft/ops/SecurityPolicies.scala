package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Row-filter + column-mask policy views — the HiveServer2/Ranger
  * dynamic-policy surface (Hive applies Ranger row-level filters and
  * column masking by rewriting the query over a filtered/masked view;
  * public behavior documented in the Apache Ranger Hive plugin).
  * Spark-first expression: a policy IS a view definition — a filter
  * Column plus per-column mask expressions — so Catalyst keeps
  * optimizing through it (the row filter pushes down to the scan like
  * any predicate; masks are codegen'd projections).
  *
  * SecuritySpec pins both semantics and the scale contract (filter
  * reaches PushedFilters THROUGH the policy view).
  */
object SecurityPolicies {

  /** Build the secured view of `df`: rows not matching `rowFilter` are
    * invisible; each (column -> mask expression) replaces the raw
    * column in place, preserving schema order. Unlisted columns pass
    * through. */
  def secureView(df: DataFrame, rowFilter: Column,
      masks: Map[String, Column]): DataFrame = {
    val unknown = masks.keySet -- df.columns.toSet
    require(unknown.isEmpty, s"mask policies for missing columns: $unknown")
    val projected = df.columns.map { c =>
      masks.get(c).map(_.as(c)).getOrElse(df(c))
    }
    df.filter(rowFilter).select(projected.toIndexedSeq: _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** Declared-query twin of SecuritySpec: customers through a policy
    * view — rows restricted to three nations, account balance masked to
    * its bucket, name masked to a prefix. The oracle is the same
    * filter+mask spelled in plain SQL, so the driver checks the policy
    * rewrite end to end (VERDICT r7 item 3). */
  val qPolicyView: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
    secureView(cust,
      rowFilter = col("c_nationkey").isin(1, 2, 3),
      masks = Map(
        "c_name" -> concat(substring(col("c_name"), 1, 9), lit("***")),
        "c_acctbal" ->
          (floor(col("c_acctbal") / 1000) * 1000).cast("double")))
      .orderBy(col("c_custkey"))
  }

  /** k-anonymity publish gate (Sweeney 2002) over the documents corpus:
    * quasi-identifier groups (source, lang, length bucket) smaller than
    * k=3 are generalized up a fixed ladder (lang -> '*'), and groups
    * still under k after generalization are suppressed into a single
    * residual row — so no published row identifies fewer than k docs.
    * The released-data analogue of the row-filter/mask policies above.
    *
    * Scale: the corpus collapses to the QI-group table in one
    * partial-aggregated scan; the ladder re-aggregation and the gate
    * run on group-cardinality rows, never the corpus. */
  val qPrivacyKanon: Q = (s, dir) => {
    val k = 3
    val g1 = Tables(s, dir, "documents")
      .select(col("source"), col("lang"),
        expr("n_chars div 500").as("len_bucket"))
      .groupBy(col("source"), col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val pub1 = g1.filter(col("n_docs") >= k)
      .select(col("source"), col("lang"), col("len_bucket"), col("n_docs"))
    val g2 = g1.filter(col("n_docs") < k)
      .groupBy(col("source"), col("len_bucket"))
      .agg(sum(col("n_docs")).as("n_docs"))
    val pub2 = g2.filter(col("n_docs") >= k)
      .select(col("source"), lit("*").as("lang"), col("len_bucket"),
        col("n_docs"))
    val suppressed = g2.filter(col("n_docs") < k)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"))
      .select(lit("*").as("source"), lit("*").as("lang"),
        lit(-1L).as("len_bucket"), col("n_docs"))
      .filter(col("n_docs") > 0)
    pub1.union(pub2).union(suppressed)
      .orderBy(col("source"), col("lang"), col("len_bucket"))
  }

  val queries: Map[String, Q] = Map(
    "q_policy_view" -> qPolicyView,
    "q_privacy_kanon" -> qPrivacyKanon)

  val oracle: Map[String, String] = Map(
    "q_policy_view" -> """
      SELECT c_custkey,
        substr(c_name, 1, 9) || '***' AS c_name,
        c_nationkey,
        CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS c_acctbal,
        c_mktsegment
      FROM customer
      WHERE c_nationkey IN (1, 2, 3)
      ORDER BY c_custkey""",
    "q_privacy_kanon" -> """
      WITH g1 AS (
        SELECT source, lang, n_chars // 500 AS len_bucket,
               count(*) AS n_docs
        FROM documents GROUP BY 1, 2, 3),
      pub1 AS (SELECT source, lang, len_bucket, n_docs
               FROM g1 WHERE n_docs >= 3),
      g2 AS (SELECT source, len_bucket,
                    CAST(sum(n_docs) AS BIGINT) AS n_docs
             FROM g1 WHERE n_docs < 3 GROUP BY 1, 2),
      pub2 AS (SELECT source, '*' AS lang, len_bucket, n_docs
               FROM g2 WHERE n_docs >= 3),
      sup AS (SELECT '*' AS source, '*' AS lang,
                     CAST(-1 AS BIGINT) AS len_bucket,
                     CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS n_docs
              FROM g2 WHERE n_docs < 3
              HAVING coalesce(sum(n_docs), 0) > 0)
      SELECT * FROM (
        SELECT * FROM pub1 UNION ALL
        SELECT * FROM pub2 UNION ALL
        SELECT * FROM sup)
      ORDER BY source, lang, len_bucket""")
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 25 (SURVEY.md §2.M): skyline
  * onion layers, a functional-dependency conformance audit, and
  * recommendation-exposure concentration metrics.
  *
  * Determinism contract (CorpusOps5-16): exact integer arithmetic;
  * integral divisions on non-negative operands. */
object CorpusOps17 {

  /** Skyline onion peeling (Chang et al., "The onion technique",
    * SIGMOD 2000): layer 1 is the Pareto frontier of parts on
    * (price ↓, size ↓), layer k the frontier of what remains — the
    * ranking structure preference queries page through. Each layer
    * reuses q_skyline_frontier's LINEAR two-window dominance test
    * (never the quadratic join; the oracle runs the quadratic form),
    * and peeling is an anti-join of the shrinking remainder.
    *
    * Scale: 3 bounded iterations over the PART dimension; each pass
    * is one range-window sort of the remainder. */
  val qSkylineLayers: Q = (s, dir) => {
    def frontier(p: DataFrame): DataFrame = {
      val wCheaper = Window.orderBy(col("price_cents"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy(col("price_cents"))
      p.withColumn("msc", min(col("size")).over(wCheaper))
        .withColumn("mss", min(col("size")).over(wSame))
        .filter(!((col("msc").isNotNull && col("msc") <= col("size")) ||
          col("mss") < col("size")))
        .select(col("p_partkey"), col("price_cents"), col("size"))
    }
    var rest = Tables(s, dir, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("size"))
    var out: DataFrame = null
    for (layer <- 1 to 3) {
      val f = frontier(rest).withColumn("layer", lit(layer.toLong))
      out = if (out == null) f else out.unionAll(f)
      rest = rest.join(f.select(col("p_partkey")), Seq("p_partkey"),
        "left_anti")
    }
    out.select(col("layer"), col("p_partkey"), col("price_cents"),
        col("size"))
      .orderBy(col("layer"), col("price_cents"), col("size"),
        col("p_partkey"))
  }

  /** Functional-dependency conformance audit (the validation half of
    * FD discovery à la TANE, Huhtala et al. 1999, over DECLARED
    * candidates): for each X → Y, the number of X-groups, the groups
    * carrying more than one Y value (violations), and the violation
    * permille. One holds-by-key control (o_orderkey → o_custkey), one
    * plausible-but-false business rule (o_custkey → o_orderpriority),
    * one cross-column within lineitem (l_partkey → l_returnflag).
    * The data-contract check a warehouse runs before declaring a
    * column derivable.
    *
    * Scale: each audit is one partial-aggregated groupBy on X with a
    * distinct-Y count; output is one row per declared FD. */
  val qDqFdAudit: Q = (s, dir) => {
    def audit(df: DataFrame, x: String, y: String, name: String) =
      df.groupBy(col(x)).agg(countDistinct(col(y)).as("ny"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("ny") > 1, 1L).otherwise(0L)).as("violations"))
        .select(lit(name).as("fd"), col("n_groups"), col("violations"),
          expr("violations * 1000 div n_groups").as("violation_permille"))
    val orders = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    audit(orders, "o_orderkey", "o_custkey", "o_orderkey->o_custkey")
      .unionAll(audit(orders, "o_custkey", "o_orderpriority",
        "o_custkey->o_orderpriority"))
      .unionAll(audit(li, "l_partkey", "l_returnflag",
        "l_partkey->l_returnflag"))
      .orderBy(col("fd"))
  }

  /** Recommendation-exposure audit over the item-item CF output
    * (q_rec_itemcos): catalog coverage (how much of the catalog ever
    * appears in a top-5 list) and the exposure Gini (how concentrated
    * the recommendation slots are across recommended items — the
    * popularity-bias number, Abdollahpouri et al., RecSys 2019).
    * Exact integers end-to-end; the Gini reuses the rank identity
    * with a (count, item) tie-break.
    *
    * Scale: the audit runs over the top-k lists (≤ 5·|items| rows);
    * everything is dimension-sized. */
  val qRecExposure: Q = (s, dir) => {
    val recs = CorpusOps13.qRecItemCos(s, dir)
    val catalog = Tables(s, dir, "lineitem")
      .select(col("l_partkey")).distinct().agg(count(lit(1)).as("n_items"))
    val expo = recs.groupBy(col("partner")).agg(count(lit(1)).as("slots"))
    val ranked = expo.withColumn("i", row_number().over(
      Window.orderBy(col("slots"), col("partner"))))
    ranked
      .agg(count(lit(1)).as("n_recommended"), sum(col("slots")).as("n_slots"),
        sum(col("i") * col("slots")).as("sixy"))
      .crossJoin(broadcast(catalog))
      .select(col("n_items"), col("n_recommended"), col("n_slots"),
        expr("n_recommended * 1000 div n_items").as("coverage_permille"),
        expr("""(2 * sixy - (n_recommended + 1) * n_slots) * 1000000
                div (n_recommended * n_slots)""").as("exposure_gini_micro"))
  }

  val queries: Map[String, Q] = Map(
    "q_skyline_layers" -> qSkylineLayers,
    "q_dq_fd_audit" -> qDqFdAudit,
    "q_rec_exposure" -> qRecExposure)

  private val itemcosSql = CorpusOps13.oracle("q_rec_itemcos")

  val oracle: Map[String, String] = Map(
    "q_skyline_layers" -> """
      WITH p AS (SELECT p_partkey,
                   CAST(round(p_retailprice * 100) AS BIGINT)
                     AS price_cents,
                   CAST(p_size AS BIGINT) AS size
                 FROM part),
      l1 AS (SELECT * FROM p a WHERE NOT EXISTS (
               SELECT 1 FROM p b
               WHERE b.price_cents <= a.price_cents AND b.size <= a.size
                 AND (b.price_cents < a.price_cents OR b.size < a.size))),
      r1 AS (SELECT * FROM p WHERE p_partkey NOT IN
               (SELECT p_partkey FROM l1)),
      l2 AS (SELECT * FROM r1 a WHERE NOT EXISTS (
               SELECT 1 FROM r1 b
               WHERE b.price_cents <= a.price_cents AND b.size <= a.size
                 AND (b.price_cents < a.price_cents OR b.size < a.size))),
      r2 AS (SELECT * FROM r1 WHERE p_partkey NOT IN
               (SELECT p_partkey FROM l2)),
      l3 AS (SELECT * FROM r2 a WHERE NOT EXISTS (
               SELECT 1 FROM r2 b
               WHERE b.price_cents <= a.price_cents AND b.size <= a.size
                 AND (b.price_cents < a.price_cents OR b.size < a.size)))
      SELECT layer, p_partkey, price_cents, size FROM (
        SELECT CAST(1 AS BIGINT) AS layer, * FROM l1
        UNION ALL SELECT CAST(2 AS BIGINT), * FROM l2
        UNION ALL SELECT CAST(3 AS BIGINT), * FROM l3)
      ORDER BY layer, price_cents, size, p_partkey""",
    "q_dq_fd_audit" -> """
      WITH a1 AS (SELECT o_orderkey, count(DISTINCT o_custkey) AS ny
                  FROM orders GROUP BY 1),
      a2 AS (SELECT o_custkey, count(DISTINCT o_orderpriority) AS ny
             FROM orders GROUP BY 1),
      a3 AS (SELECT l_partkey, count(DISTINCT l_returnflag) AS ny
             FROM lineitem GROUP BY 1),
      u AS (
        SELECT 'o_orderkey->o_custkey' AS fd, count(*) AS n_groups,
          CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS violations
        FROM a1
        UNION ALL
        SELECT 'o_custkey->o_orderpriority', count(*),
          CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM a2
        UNION ALL
        SELECT 'l_partkey->l_returnflag', count(*),
          CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM a3)
      SELECT fd, n_groups, violations,
        violations * 1000 // n_groups AS violation_permille
      FROM u ORDER BY fd""",
    "q_rec_exposure" -> s"""
      WITH recs AS (SELECT * FROM ($itemcosSql)),
      catalog AS (SELECT count(DISTINCT l_partkey) AS n_items
                  FROM lineitem),
      expo AS (SELECT partner, count(*) AS slots
               FROM recs GROUP BY 1),
      ranked AS (SELECT slots,
                   CAST(row_number() OVER (ORDER BY slots, partner)
                     AS BIGINT) AS i
                 FROM expo),
      agg AS (SELECT count(*) AS n_recommended,
                CAST(sum(slots) AS BIGINT) AS n_slots,
                CAST(sum(i * slots) AS BIGINT) AS sixy
              FROM ranked)
      SELECT n_items, n_recommended, n_slots,
        n_recommended * 1000 // n_items AS coverage_permille,
        (2 * sixy - (n_recommended + 1) * n_slots) * 1000000
          // (n_recommended * n_slots) AS exposure_gini_micro
      FROM agg CROSS JOIN catalog""")
}

package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.Tables._

/** Second wave of TPC-H-shaped headline queries (q6/q10/q14/q18 shapes
  * adapted to the fixture schema), widening the classic-analytics
  * evidence beyond q1/q3/q5. All money math follows the exact-decimal
  * discipline (SURVEY §5.4): products stay inside DECIMAL(22,12), sums
  * round to scale 4 before the one double cast.
  *
  * Scale notes: q6 is a pure scan-filter-agg (pushdown does the work);
  * q10 joins the fact once and broadcasts the dims; q14 is a single
  * fact-dim join with conditional aggregation; q18 is a self-aggregated
  * semi-join lowered through a broadcast of the qualifying keys.
  */
object TpchMore {

  private def revenue(priceCol: String, discCol: String) =
    dsumExact(discPrice(col(priceCol), col(discCol)))

  /** TPC-H Q6 shape: forecast revenue from a discount band. */
  val q6Forecast: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(dec10(col("l_extendedprice")) *
          col("l_discount").cast(DecimalType(5, 4))), 4)
        .cast("double").as("revenue"))
  }

  /** TPC-H Q10 shape: revenue lost to returned items, top 20 customers. */
  val q10Returned: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1996-07-01"))
    val cust = Tables(s, dir, "customer")
    val nat = Tables(s, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(revenue("l_extendedprice", "l_discount").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14 shape: share of one month's revenue from PROMO parts.
    * Numerator and denominator are exact decimals rounded to scale 4;
    * the single double division is then bit-identical cross-engine. */
  val q14PromoShare: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-03-01") &&
        col("l_shipdate") < ts("1996-04-01"))
    val part = Tables(s, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          round(sum(when(col("p_type") === "PROMO",
              discPrice(col("l_extendedprice"), col("l_discount")))
            .otherwise(lit(0).cast(DecimalType(22, 12)))), 4)
            .cast("double") /
          round(sum(discPrice(col("l_extendedprice"), col("l_discount"))), 4)
            .cast("double")).as("promo_share"))
  }

  /** TPC-H Q18 shape: large-volume orders (sum qty > 150), top 25. */
  val q18LargeOrders: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    val ord = Tables(s, dir, "orders")
    val cust = Tables(s, dir, "customer")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        fmtTs(col("o_orderdate")).as("odate"),
        dec(col("o_totalprice")).cast("double").as("total"),
        col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(25)
  }

  /** TPC-H Q7 shape: shipping volume between two nations by year.
    * Fact joins once each to the customer-nation and supplier-nation
    * sides; both dim chains broadcast. */
  val q7Volume: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val ord = Tables(s, dir, "orders")
    val cust = Tables(s, dir, "customer")
    val sup = Tables(s, dir, "supplier")
    val nat = Tables(s, dir, "nation")
    val cn = cust.join(broadcast(nat),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val sn = sup.join(broadcast(
        nat.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .filter((col("cust_nation") === "NATION_11" &&
          col("supp_nation") === "NATION_20") ||
        (col("cust_nation") === "NATION_20" &&
          col("supp_nation") === "NATION_11"))
      .groupBy(col("cust_nation"), col("supp_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenue("l_extendedprice", "l_discount").as("revenue"))
      .orderBy(col("cust_nation"), col("supp_nation"), col("l_year"))
  }

  /** TPC-H Q13 shape: distribution of order counts per customer
    * (LEFT join keeps zero-order customers in the histogram). */
  val q13OrderDist: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
    val ord = Tables(s, dir, "orders")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15 shape: the top-revenue supplier(s) of a quarter via a
    * revenue CTE joined against its own max — no window needed. */
  val q15TopSupplier: Q = (s, dir) => {
    val rev = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(revenue("l_extendedprice", "l_discount").as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mr"))
    rev.join(broadcast(mx), col("total_revenue") === col("mr"))
      .join(broadcast(Tables(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 shape: revenue from small-quantity orders of a brand —
    * the correlated "below 20% of this part's average quantity" scalar
    * subquery, decorrelated by Catalyst into an aggregate + join. */
  val q17SmallQty: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part").filter(col("p_brand") === "Brand#23")
    val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
      .agg((davg(col("l_quantity")) * 0.2).as("qty_cut"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("ap_key"))
      .filter(col("l_quantity") < col("qty_cut"))
      // rounded-decimal sum FIRST, then one double division — a post-
      // division round on a noisy double would hit the half-even trap
      .agg((round(sum(dec10(col("l_extendedprice"))), 4).cast("double")
        / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q19 shape: disjunctive multi-band predicates (OR of ANDs)
    * over the fact-dim join — exercises CNF conversion + partial
    * pushdown of the shared p_partkey equi-key. */
  val q19Disjunct: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(revenue("l_extendedprice", "l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4 shape: order-priority counts for orders having at least
    * one large-quantity line — a correlated EXISTS lowered to a
    * LeftSemi join. */
  val q4Priority: Q = (s, dir) => {
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1997-01-01"))
    val bigLines = Tables(s, dir, "lineitem")
      .filter(col("l_quantity") >= 45).select(col("l_orderkey"))
    ord.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q22 shape: well-funded inactive customers — balance above the
    * positive-balance average (scalar subquery) AND no orders in the
    * window (anti join; every fixture customer orders eventually, so
    * inactivity is per-month as a real churn query would ask). */
  val q22Inactive: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("ab"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1996-02-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val queries: Map[String, Q] = Map(
    "q4_order_priority" -> q4Priority,
    "q22_inactive_customers" -> q22Inactive,
    "q6_forecast_revenue" -> q6Forecast,
    "q7_volume_shipping" -> q7Volume,
    "q10_returned_items" -> q10Returned,
    "q13_order_distribution" -> q13OrderDist,
    "q14_promo_share" -> q14PromoShare,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_qty_revenue" -> q17SmallQty,
    "q18_large_orders" -> q18LargeOrders,
    "q19_disjunctive_preds" -> q19Disjunct)

  val oracle: Map[String, String] = Map(
    "q4_order_priority" -> """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q22_inactive_customers" -> """
      WITH ab AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) /
               count(c_acctbal) AS ab
        FROM customer WHERE c_acctbal > 0)
      SELECT c_mktsegment, count(*) AS numcust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
          AS totacctbal
      FROM customer, ab
      WHERE c_acctbal > ab
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1996-01-01'
                          AND o_orderdate < TIMESTAMP '1996-02-01')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q6_forecast_revenue" -> """
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,4)) *
               CAST(l_discount AS DECIMAL(5,4))), 4) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q10_returned_items" -> """
      SELECT c_custkey, c_name, n_name,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
          CAST(1 - l_discount AS DECIMAL(5,4))), 4)
          AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q14_promo_share" -> """
      SELECT 100.0 *
        CAST(round(sum(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
               CAST(1 - l_discount AS DECIMAL(5,4))
          ELSE CAST(0 AS DECIMAL(22,12)) END), 4) AS DOUBLE) /
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
          CAST(1 - l_discount AS DECIMAL(5,4))), 4)
          AS DOUBLE) AS promo_share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'""",
    "q18_large_orders" -> """
      WITH big AS (
        SELECT l_orderkey,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 150)
      SELECT c_name, c_custkey, o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
        CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS total,
        sum_qty
      FROM big JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY sum_qty DESC, o_orderkey LIMIT 25""",
    "q7_volume_shipping" -> """
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        CAST(year(l_shipdate) AS INT) AS l_year,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
          CAST(1 - l_discount AS DECIMAL(5,4))), 4) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE (cn.n_name = 'NATION_11' AND sn.n_name = 'NATION_20')
         OR (cn.n_name = 'NATION_20' AND sn.n_name = 'NATION_11')
      GROUP BY 1, 2, 3 ORDER BY cust_nation, supp_nation, l_year""",
    "q13_order_distribution" -> """
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q15_top_supplier" -> """
      WITH rev AS (
        SELECT l_suppkey,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
            CAST(1 - l_discount AS DECIMAL(5,4))), 4) AS DOUBLE)
            AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      ORDER BY s_suppkey""",
    "q17_small_qty_revenue" -> """
      WITH cut AS (
        SELECT l_partkey AS ap_key,
          (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) /
            count(l_quantity)) * 0.2 AS qty_cut
        FROM lineitem GROUP BY l_partkey)
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(10,4))), 4)
          AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
      JOIN cut ON l_partkey = ap_key
      WHERE l_quantity < qty_cut""",
    "q19_disjunctive_preds" -> """
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
          CAST(1 - l_discount AS DECIMAL(5,4))), 4) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 30)""")
}

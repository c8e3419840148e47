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

  val queries: Map[String, Q] = Map(
    "q6_forecast_revenue" -> q6Forecast,
    "q10_returned_items" -> q10Returned,
    "q14_promo_share" -> q14PromoShare,
    "q18_large_orders" -> q18LargeOrders)

  val oracle: Map[String, String] = Map(
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
      ORDER BY sum_qty DESC, o_orderkey LIMIT 25""")
}

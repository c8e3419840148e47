package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.Tables._

/** Third wave of TPC-H-shaped queries — the eight shapes (q2/q8/q9/q11/
  * q12/q16/q20/q21) that complete the full 22-query dial-tone. The
  * fixture star schema has no `partsupp` and no
  * `l_commitdate`/`l_receiptdate`/`l_shipmode` columns
  * (FIXTURES.md), so:
  *   - the part-supplier bridge is derived from lineitem's observed
  *     (l_partkey, l_suppkey) pairs — same join topology, same
  *     correlated-subquery shapes;
  *   - "late" is l_shipdate > o_orderdate + N days;
  *   - q12's ship-mode axis becomes l_returnflag (3 values).
  * Money math follows the exact-decimal discipline (SURVEY §5.4).
  *
  * Scale notes: every dim or derived dim that joins a fact is
  * broadcast; the only fact-fact operations are q21's lineitem-orders
  * join (one shuffle on l_orderkey; the EXISTS/NOT EXISTS pair runs as
  * per-order aggregates over the persisted join projection, so lineitem
  * is scanned once — pinned in PlanSpec) and the bridge aggregations
  * (map-side partial on (part,supp)).
  */
object TpchFull {

  private def revenue(priceCol: String, discCol: String) =
    dsumExact(discPrice(col(priceCol), col(discCol)))

  /** TPC-H Q2 shape: min-cost supplier per part within a region.
    * Bridge supplycost = min(l_extendedprice) per (part, supplier) —
    * min over doubles is order-independent, so no decimal needed.
    * The correlated "cost = (SELECT min ...)" decorrelates into a
    * per-part min + self-join, both broadcast-sized. */
  val q2MinCost: Q = (s, dir) => {
    val bridge = Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("supplycost"))
    val euroSup = Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val ps = bridge.join(broadcast(euroSup),
      col("l_suppkey") === col("s_suppkey"))
    val minCost = ps.groupBy(col("l_partkey").as("mp_key"))
      .agg(min(col("supplycost")).as("min_cost"))
    ps.join(broadcast(minCost),
        col("l_partkey") === col("mp_key") &&
          col("supplycost") === col("min_cost"))
      .join(broadcast(Tables(s, dir, "part")
          .filter(col("p_type") === "LARGE" && col("p_size") <= 10)),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q8 shape: one nation's market share inside a region's
    * market by order year. Numerator and denominator are each exact
    * decimal sums rounded to scale 4; the one double division is then
    * bit-identical cross-engine. */
  val q8MarketShare: Q = (s, dir) => {
    val nat = Tables(s, dir, "nation")
    val custAmerica = Tables(s, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")
          .filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val supNation = Tables(s, dir, "supplier")
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val vol = discPrice(col("l_extendedprice"), col("l_discount"))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custAmerica), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .join(broadcast(Tables(s, dir, "part")
          .filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((round(sum(when(col("supp_nation") === "NATION_1", vol)
            .otherwise(lit(0).cast(DecimalType(16, 8)))), 4)
          .cast("double") /
        round(sum(vol), 4).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape: product-line profit by supplier nation and year.
    * Cost stands in as 20% of retail list (no partsupp.supplycost in
    * the fixtures); the profit expression stays one exact decimal:
    * (16,8) - (27,12) -> (28,12), sum precision 38 — at the cap, no
    * precision loss. */
  val q9Profit: Q = (s, dir) => {
    val amount = discPrice(col("l_extendedprice"), col("l_discount")) -
      dec10(col("l_quantity")) * dec10(col("p_retailprice")) *
        lit(0.2).cast(DecimalType(5, 4))
    Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")
          .filter(col("p_name").like("%red%"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(amount), 4).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape: parts whose inventory value (here: shipped
    * value through one nation's suppliers) exceeds a fraction of the
    * nation-wide total — the classic "HAVING > (SELECT sum(...) * x)"
    * scalar-subquery shape, decorrelated into a broadcast cross join. */
  val q11ImportantStock: Q = (s, dir) => {
    val natSup = Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = dec10(col("l_quantity")) * dec10(col("l_extendedprice"))
    val base = Tables(s, dir, "lineitem")
      .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
    val perPart = base.groupBy(col("l_partkey").as("ps_partkey"))
      .agg(round(sum(value), 4).cast("double").as("part_value"))
    val total = base.agg((round(sum(value), 4).cast("double") *
      lit(0.001)).as("cut"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > col("cut"))
      .select(col("ps_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("ps_partkey"))
  }

  /** TPC-H Q12 shape: late-shipment priority mix. The fixture has no
    * l_shipmode/l_receiptdate, so the mode axis is l_returnflag and
    * "late" is shipped > 60 days after the order date. */
  val q12LateLines: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      .join(Tables(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        count_if(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .as("high_line_count"),
        count_if(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q16 shape: distinct supplier count per part attribute
    * combo, with a brand/type/size exclusion list and a supplier
    * blacklist anti-join (negative balance stands in for the
    * "complaints" comment scan). */
  val q16SupplierCnt: Q = (s, dir) => {
    val bridge = Tables(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val badSup = Tables(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    bridge
      .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(Tables(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#3" &&
            !col("p_type").startsWith("MEDIUM") &&
            col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape: suppliers who shipped an outsized share of a
    * part family in a year (availqty > half the shipped total becomes
    * pair share > 10% of the part total), semi-joined back to the
    * supplier dim and filtered to one region. */
  val q20Excess: Q = (s, dir) => {
    val shipped = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      .join(broadcast(Tables(s, dir, "part")
          .filter(col("p_name").like("small%"))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val pairQty = shipped.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(dsum(col("l_quantity")).as("pair_qty"))
    val partTot = shipped.groupBy(col("l_partkey").as("pt_key"))
      .agg(dsum(col("l_quantity")).as("part_qty"))
    val excess = pairQty
      .join(broadcast(partTot), col("l_partkey") === col("pt_key"))
      .filter(col("pair_qty") > col("part_qty") * 0.1)
      .select(col("l_suppkey")).distinct()
    Tables(s, dir, "supplier")
      .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .join(broadcast(Tables(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape: suppliers whose line was the lone late one on a
    * finished multi-supplier order — EXISTS(other supplier) +
    * NOT EXISTS(other late supplier) as semi + anti self-joins that
    * share one l_orderkey shuffle. */
  val q21Waiting: Q = (s, dir) => {
    // One narrow (orderkey, suppkey, late) projection of the
    // lineitem–orders join, persisted: the r6/r7 formulation ran the
    // EXISTS/NOT EXISTS as semi + anti self-joins, which re-scanned and
    // re-shuffled lineitem three times (the scale-notes comment claimed
    // reuse the static plan never had — VERDICT r7 item 7). The
    // subquery pair decorrelates into per-order supplier counts
    // instead: a supplier's late line waits iff the order has >= 2
    // distinct suppliers (EXISTS another line) and exactly 1 distinct
    // late supplier (NOT EXISTS another late one — itself). Both aggs
    // and the stats join cluster on l_orderkey, the partitioning the
    // orders join already produced, so the whole query moves lineitem
    // through ONE exchange and reads the persisted projection (17
    // bytes/row, MEMORY_AND_DISK) at every consumer. Pinned in
    // PlanSpec: a single lineitem scan in the executed plan.
    val li = graft.CacheScope.track(Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 75 DAYS")).as("late"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("late"), 1).otherwise(0)).as("supp_late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("supp_late")).as("n_late"))
    li.filter(col("late"))
      .join(perOrder, "l_orderkey")
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .join(broadcast(Tables(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q2_min_cost_supplier" -> q2MinCost,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9Profit,
    "q11_important_stock" -> q11ImportantStock,
    "q12_late_lines" -> q12LateLines,
    "q16_supplier_cnt" -> q16SupplierCnt,
    "q20_excess_shippers" -> q20Excess,
    "q21_waiting_suppliers" -> q21Waiting)

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supplier" -> """
      WITH bridge AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
      ps AS (
        SELECT b.*, s_name, s_acctbal, n_name
        FROM bridge b
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
      SELECT s_acctbal, s_name, n_name, p_partkey, supplycost
      FROM ps JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'LARGE' AND p_size <= 10
        AND supplycost = (SELECT min(supplycost) FROM ps p2
                          WHERE p2.l_partkey = ps.l_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "q8_market_share" -> """
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(round(sum(CASE WHEN sn.n_name = 'NATION_1'
            THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
                 CAST(1 - l_discount AS DECIMAL(5,4))
            ELSE CAST(0 AS DECIMAL(16,8)) END), 4) AS DOUBLE) /
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
            CAST(1 - l_discount AS DECIMAL(5,4))), 4) AS DOUBLE)
          AS mkt_share
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND EXISTS (
          SELECT 1 FROM customer
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region ON cn.n_regionkey = r_regionkey
          WHERE c_custkey = o_custkey AND r_name = 'AMERICA')
      GROUP BY 1 ORDER BY o_year""",
    "q9_product_profit" -> """
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(round(sum(
          CAST(l_extendedprice AS DECIMAL(12,4)) *
            CAST(1 - l_discount AS DECIMAL(5,4)) -
          CAST(l_quantity AS DECIMAL(12,4)) *
            CAST(p_retailprice AS DECIMAL(12,4)) *
            CAST(0.2 AS DECIMAL(5,4))), 4) AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "q11_important_stock" -> """
      WITH base AS (
        SELECT l_partkey,
          CAST(l_quantity AS DECIMAL(12,4)) *
            CAST(l_extendedprice AS DECIMAL(12,4)) AS value
        FROM lineitem
        WHERE EXISTS (
          SELECT 1 FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          WHERE s_suppkey = l_suppkey AND n_name = 'NATION_3'))
      SELECT l_partkey AS ps_partkey,
        CAST(round(sum(value), 4) AS DOUBLE) AS part_value
      FROM base GROUP BY l_partkey
      HAVING CAST(round(sum(value), 4) AS DOUBLE) >
        (SELECT CAST(round(sum(value), 4) AS DOUBLE) * 0.001 FROM base)
      ORDER BY part_value DESC, ps_partkey""",
    "q12_late_lines" -> """
      SELECT l_returnflag,
        count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
          AS high_line_count,
        count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
          AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q16_supplier_cnt" -> """
      SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#3'
        AND p_type NOT LIKE 'MEDIUM%'
        AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q20_excess_shippers" -> """
      WITH shipped AS (
        SELECT l_suppkey, l_partkey, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey
                      AND p_name LIKE 'small%')),
      pair AS (
        SELECT l_suppkey, l_partkey,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
            AS pair_qty
        FROM shipped GROUP BY l_suppkey, l_partkey),
      tot AS (
        SELECT l_partkey AS pt_key,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
            AS part_qty
        FROM shipped GROUP BY l_partkey)
      SELECT s_suppkey, s_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM pair JOIN tot ON l_partkey = pt_key
        WHERE pair_qty > part_qty * 0.1)
      ORDER BY s_suppkey""",
    "q21_waiting_suppliers" -> """
      WITH li AS (
        SELECT l_orderkey, l_suppkey,
          l_shipdate > o_orderdate + INTERVAL 75 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F')
      SELECT s_name, count(*) AS numwait
      FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM li l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
}

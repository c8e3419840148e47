package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Join surface (SURVEY.md §2.C): shuffle (sort-merge) joins, broadcast
  * (map) joins, semi/anti existence joins, outer joins, cross join,
  * non-equi band join, and multi-way star joins.
  *
  * Hive lineage: CommonJoinOperator / MapJoinOperator
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/exec/CommonJoinOperator.java,
  * MapJoinOperator.java]; auto map-join conversion
  * [hive: ql/.../optimizer/MapJoinProcessor.java].
  *
  * Scale design: dimension tables (region/nation/supplier/customer at star
  * ratios) are explicitly `broadcast()` so the 100 TB fact table never
  * shuffles for them; fact-fact joins (orders ⋈ lineitem) shuffle on the
  * join key, which AQE re-plans at runtime (skew split / local shuffle
  * fallback) — nothing here hand-schedules what Catalyst already does.
  */
object Joins {

  /** TPC-H Q3-style: customer ⋈ orders ⋈ lineitem, revenue top-10. */
  val q3Shipping: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(s, dir, "orders")
      .filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val l = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") > ts("1996-06-30 00:00:00"))
    broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsumExact(discPrice(col("l_extendedprice"), col("l_discount")))
        .as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 6-table star join with the extra n=s nation equality. */
  val q5LocalSupplier: Q = (s, dir) => {
    val r = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables(s, dir, "nation")
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val l = Tables(s, dir, "lineitem")
    val sup = Tables(s, dir, "supplier")
    broadcast(r).join(broadcast(n), col("r_regionkey") === col("n_regionkey"))
      .join(c, col("n_nationkey") === col("c_nationkey"))
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsumExact(discPrice(col("l_extendedprice"), col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** LEFT OUTER: every nation, with its supplier count (0 for none). */
  val qJoinLeft: Q = (s, dir) => {
    val n = Tables(s, dir, "nation")
    val sup = Tables(s, dir, "supplier")
    n.join(sup, col("n_nationkey") === col("s_nationkey"), "left")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("s_suppkey")).as("n_supp"))
      .orderBy(col("n_nationkey"))
  }

  /** RIGHT OUTER (mirror of left; exercises the distinct plan path). */
  val qJoinRight: Q = (s, dir) => {
    val n = Tables(s, dir, "nation")
    val sup = Tables(s, dir, "supplier")
    sup.join(n, col("s_nationkey") === col("n_nationkey"), "right")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("s_suppkey")).as("n_supp"))
      .orderBy(col("n_nationkey"))
  }

  /** FULL OUTER between customers and their order rollup. */
  val qJoinFull: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
    val oa = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("spend"))
    c.join(oa, col("c_custkey") === col("o_custkey"), "full")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy(col("custkey"))
  }

  /** LEFT SEMI (EXISTS): segments of customers who have ordered. */
  val qJoinSemi: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** LEFT ANTI (NOT EXISTS): customers with no large order. */
  val qJoinAnti: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** CROSS JOIN (guarded-cartesian in Hive; explicit here, dims only). */
  val qJoinCross: Q = (s, dir) => {
    val r = Tables(s, dir, "region")
    val n = Tables(s, dir, "nation")
    r.crossJoin(n)
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Non-equi (theta) band join: lineitem quantities into literal bands.
    * The band table is tiny → BroadcastNestedLoopJoin, the only sane
    * physical shape for a non-equi predicate at scale. */
  val qJoinNonEqui: Q = (s, dir) => {
    import s.implicits._
    val bands = Seq((0.0, 10.0, "low"), (10.0, 25.0, "mid"),
      (25.0, 40.0, "high"), (40.0, 1e9, "max"))
      .toDF("lo", "hi", "band")
    val li = Tables(s, dir, "lineitem")
    li.join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("band"))
  }

  /** Part/supplier enrichment join keyed on two fact FKs at once. */
  val qJoinPartSupp: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    val sup = Tables(s, dir, "supplier")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("cnt"),
        dsumExact(discPrice(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
        countDistinct(col("s_suppkey")).as("nd_supp"))
      .orderBy(col("p_type"))
  }

  /** AS-OF join (each click matched to the latest purchase at-or-before
    * its timestamp, per user) — the time-series operator (kdb+ `aj`,
    * DuckDB/QuestDB ASOF JOIN) Spark has no primitive for. Spelled
    * scalably as a TAGGED UNION + one window pass:
    * both streams union into a single (user, ts)-ordered sequence and
    * `last(pid) IGNORE NULLS` over the running frame carries the most
    * recent purchase forward — ONE shuffle on user_id total, no per-row
    * range probe, no O(clicks x purchases) join (the naive band-join
    * spelling explodes; this is the merge-scan shape an as-of needs at
    * 100 TB). Purchases sort before clicks on equal ts => inclusive
    * (pts <= ts) semantics. Oracle: DuckDB's native ASOF LEFT JOIN. */
  val qJoinAsof: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("pid", lit(null).cast("long"))
      .withColumn("is_r", lit(0))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
      .withColumn("event_id", lit(null).cast("long"))
      .withColumn("is_r", lit(1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_r").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    clicks.unionByName(buys)
      .withColumn("asof_pid", last(col("pid"), ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
      .select(col("user_id"), col("event_id").as("click_id"),
        fmtTsUs(col("ts")).as("click_ts"), col("asof_pid"))
      .orderBy(col("user_id"), col("click_id"))
  }

  /** Manual skew-salting for a JOIN (complements the AQE runtime skew
    * split pinned in SqlSurfaceSpec and the salted two-stage agg): the
    * probe side gets a deterministic salt in [0, R), the build side is
    * replicated R times, and the join key becomes (key, salt) — a single
    * hot key fans out over R reducers instead of one. Values are
    * oracle-identical to the plain join. */
  val qJoinSalted: Q = (s, dir) => {
    val R = 8
    val fact = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        (col("l_linenumber") % R).as("salt"))
    val dim = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        explode(sequence(lit(0), lit(R - 1))).as("salt"))
    fact.join(dim,
        col("l_orderkey") === col("o_orderkey") &&
          fact("salt") === dim("salt"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** Bucketed RANGE join: purchases within 30 minutes after each click,
    * across ALL users — a pure interval predicate with no equi key, which
    * Spark would otherwise execute as an O(n x m) nested-loop. The
    * standard fix (interval bucketing, as in Databricks' range-join
    * optimization): quantize time into 30-minute buckets; a click in
    * bucket b can only match purchases in buckets {b, b+1}, so the click
    * side explodes to 2 probe rows and candidates come from a SHUFFLED
    * EQUI-JOIN on the bucket with the exact range predicate as residual
    * — shuffle O(n + m), never a broadcast loop over all pairs. */
  val qJoinRangeBucketed: Q = (s, dir) => {
    val bucketSec = 1800L
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("cts"),
        expr(s"unix_timestamp(ts) div $bucketSec").as("cb"))
      .select(col("click_id"), col("cts"),
        explode(array(col("cb"), col("cb") + 1)).as("pb"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"),
        expr(s"unix_timestamp(ts) div $bucketSec").as("pb"))
    clicks.join(buys,
        Seq("pb")) // equi-join on the bucket; range check is residual
      .filter(col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_purchases"),
        min(col("purchase_id")).as("first_pid"))
      .orderBy(col("click_id"))
  }

  /** UNIQUEJOIN PRESERVE analogue [hive: ql/src/java/org/apache/hadoop/
    * hive/ql/parse/SemanticAnalyzer.java, genUniqueJoinTree]: an N-way
    * key-aligned full outer join where every PRESERVEd table contributes
    * its unmatched keys — expressed as chained full-outer using-column
    * joins (Spark coalesces the join key), then summarized by
    * key-presence pattern. Scale: all three sides shuffle once on the
    * key; AQE coalesces the tiny post-join partitions. */
  val qJoinUnique: Q = (s, dir) => {
    val o = Tables(s, dir, "orders").select(col("o_orderkey"))
    def side(m: Int) = o.filter(col("o_orderkey") % m === 0)
      .select(col("o_orderkey").as("k"), lit(1).as(s"m$m"))
    side(3)
      .join(side(5), Seq("k"), "full_outer")
      .join(side(7), Seq("k"), "full_outer")
      .select(col("m3").isNotNull.as("in3"), col("m5").isNotNull.as("in5"),
        col("m7").isNotNull.as("in7"))
      .groupBy(col("in3"), col("in5"), col("in7"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("in3"), col("in5"), col("in7"))
  }

  /** Blocked fuzzy string self-join (entity matching): customer names
    * within edit distance 1, candidates generated by DELETION-
    * NEIGHBORHOOD blocking — each name emits its length+1 one-char-
    * deleted variants; two strings at distance <= 1 (substitution,
    * insertion or deletion) always share a variant, so the variant
    * equi-join is an EXACT blocking and the levenshtein verify loses
    * nothing vs the all-pairs scan (cf. FastSS, Bocek et al. 2007 —
    * public deletion-neighborhood dedup literature).
    *
    * Scale: shuffle is O(rows x name_len) variant pairs, never
    * O(rows^2); the oracle replays all-pairs levenshtein in DuckDB,
    * which both engines implement as the same exact integer DP.
    *
    * r8 plan rework (promoted into the bench headline, was 8.9 s at
    * sf0.1): (1) the join key is xxhash64(variant) — an 8-byte shuffle
    * key instead of a full name substring; a 64-bit collision can only
    * ADD a candidate, which the levenshtein verify then rejects;
    * (2) the shuffle_hash hint makes both self-join sides identical
    * shuffle exchanges, so ReuseExchange computes the variant explode
    * once (a broadcast wrapper defeats reuse — same finding as the
    * simhash pair scan, r4); (3) the pair dedup runs on bare
    * (ida, idb, dist) rows AFTER the levenshtein verify (optimization
    * r18, guide §2.3 shuffle fewer bytes): the verify rejects ~73% of
    * candidates (probed at sf0.1: 977k raw → 262k accepted, and only
    * ~2% of raw pairs are variant-duplicated), so deduping the
    * accepted stream shrinks the distinct exchange ~3.6× for a ~2%
    * re-verify of duplicated pairs — value-identical because dist is
    * a function of the pair, so filter∘distinct ≡ distinct∘filter;
    * the wide strings still never enter the dedup shuffle. Unhinted
    * name join-backs: Catalyst broadcasts the entity table while it
    * fits, AQE degrades to a shuffled join when it doesn't. */
  val qJoinFuzzy: Q = (s, dir) => {
    val c = Tables(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    // variants: the name itself (distance-0 anchor for insert/delete
    // pairs) plus every one-char deletion
    val variants = c.select(col("id"), explode(expr(
      """array_union(
           array(name),
           transform(sequence(1, length(name)),
             i -> concat(substring(name, 1, i - 1),
                         substring(name, i + 1, length(name)))))"""))
      .as("v"))
      .select(col("id"), xxhash64(col("v")).as("h"))
    val cand = variants.as("a")
      .join(variants.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
    cand
      .join(c.select(col("id").as("ida"), col("name").as("na")), "ida")
      .join(c.select(col("id").as("idb"), col("name").as("nb")), "idb")
      .withColumn("dist", levenshtein(col("na"), col("nb")))
      .filter(col("dist") <= 1)
      .select(col("ida"), col("idb"), col("dist"))
      .distinct()
      .orderBy(col("ida"), col("idb"))
  }

  /** Point-in-time (PIT) join against an SCD2 dimension — the
    * warehouse-standard "which dim version was valid when the fact
    * happened" lookup (Kimball type-2 lookup; the batch twin of a
    * temporal table join). The dimension is the per-customer status
    * version history (same derivation as q_dim_scd2: a new version at
    * every status change, valid [from, next_from)); each lineitem
    * (fact at l_shipdate, via its order's customer) picks the version
    * valid at ship time. Every fact matches EXACTLY one version
    * (versions partition [first-order, infinity) and shipdate >=
    * orderdate >= first valid_from), reported as per-status lineitem
    * counts and exact-decimal revenue.
    *
    * Scale: the join carries the customer equi-key, so it executes as
    * a co-partitioned hash join with the validity range as a post-
    * filter — per-key state is that customer's version count (tiny,
    * bounded by change frequency), never a cross product; the version
    * build is one windowed pass over the dim source. */
  val qJoinPitScd2: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val dim = Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderstatus"))
      .withColumn("prev_st", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev_st").isNull ||
        col("o_orderstatus") =!= col("prev_st"))
      .withColumn("next_from", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey").as("d_custkey"),
        col("o_orderstatus").as("status_at_ship"),
        col("o_orderdate").as("valid_from"), col("next_from"))
    val fact = Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_shipdate"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    fact.join(dim,
        col("o_custkey") === col("d_custkey") &&
          col("l_shipdate") >= col("valid_from") &&
          (col("next_from").isNull || col("l_shipdate") < col("next_from")))
      .groupBy(col("status_at_ship"))
      .agg(count(lit(1)).as("n_lineitems"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("cents")).as("cents"))
      .orderBy(col("status_at_ship"))
  }

  val queries: Map[String, Q] = Map(
    "q_join_pit_scd2" -> qJoinPitScd2,
    "q_join_fuzzy" -> qJoinFuzzy,
    "q_join_unique" -> qJoinUnique,
    "q_join_asof" -> qJoinAsof,
    "q_join_salted" -> qJoinSalted,
    "q_join_range_bucketed" -> qJoinRangeBucketed,
    "q3_shipping_priority" -> q3Shipping,
    "q5_local_supplier" -> q5LocalSupplier,
    "q_join_left" -> qJoinLeft,
    "q_join_right" -> qJoinRight,
    "q_join_full" -> qJoinFull,
    "q_join_semi" -> qJoinSemi,
    "q_join_anti" -> qJoinAnti,
    "q_join_cross" -> qJoinCross,
    "q_join_nonequi" -> qJoinNonEqui,
    "q_join_partsupp" -> qJoinPartSupp)

  private val revenue =
    "round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(5,4))), 4)"

  val oracle: Map[String, String] = Map(
    "q_join_pit_scd2" -> """
      WITH ch AS (SELECT o_custkey, o_orderkey, o_orderdate,
                    o_orderstatus,
                    lag(o_orderstatus) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS prev_st
                  FROM orders),
      dim AS (SELECT o_custkey AS d_custkey,
                o_orderstatus AS status_at_ship,
                o_orderdate AS valid_from,
                lead(o_orderdate) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS next_from
              FROM ch
              WHERE prev_st IS NULL OR o_orderstatus <> prev_st),
      fact AS (SELECT o.o_custkey, l.l_shipdate,
                 CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem l JOIN orders o
                 ON l.l_orderkey = o.o_orderkey)
      SELECT status_at_ship, count(*) AS n_lineitems,
        count(DISTINCT o_custkey) AS n_customers,
        CAST(sum(cents) AS BIGINT) AS cents
      FROM fact JOIN dim ON o_custkey = d_custkey
        AND l_shipdate >= valid_from
        AND (next_from IS NULL OR l_shipdate < next_from)
      GROUP BY status_at_ship ORDER BY status_at_ship""",
    "q_join_fuzzy" -> """
      SELECT a.c_custkey AS ida, b.c_custkey AS idb,
        CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY ida, idb""",
    "q_join_unique" -> """
      WITH t3 AS (SELECT o_orderkey AS k, 1 AS m3 FROM orders
                  WHERE o_orderkey % 3 = 0),
           t5 AS (SELECT o_orderkey AS k, 1 AS m5 FROM orders
                  WHERE o_orderkey % 5 = 0),
           t7 AS (SELECT o_orderkey AS k, 1 AS m7 FROM orders
                  WHERE o_orderkey % 7 = 0)
      SELECT m3 IS NOT NULL AS in3, m5 IS NOT NULL AS in5,
             m7 IS NOT NULL AS in7, count(*) AS cnt
      FROM t3 FULL JOIN t5 USING (k) FULL JOIN t7 USING (k)
      GROUP BY 1, 2, 3 ORDER BY in3, in5, in7""",
    "q_join_asof" -> """
      SELECT c.user_id, c.event_id AS click_id,
        strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        p.event_id AS asof_pid
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts <= c.ts
      ORDER BY c.user_id, click_id""",
    "q_join_salted" -> """
      SELECT o_orderstatus, count(*) AS cnt,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_join_range_bucketed" -> """
      SELECT c.event_id AS click_id, count(*) AS n_purchases,
        min(p.event_id) AS first_pid
      FROM events c JOIN events p
        ON c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      GROUP BY c.event_id ORDER BY click_id""",
    "q3_shipping_priority" -> s"""
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             CAST($revenue AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" -> s"""
      SELECT n_name, CAST($revenue AS DOUBLE) AS revenue
      FROM region
      JOIN nation ON r_regionkey = n_regionkey
      JOIN customer ON n_nationkey = c_nationkey
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_join_left" -> """
      SELECT n_nationkey, n_name, count(s_suppkey) AS n_supp
      FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
      GROUP BY n_nationkey, n_name ORDER BY n_nationkey""",
    "q_join_right" -> """
      SELECT n_nationkey, n_name, count(s_suppkey) AS n_supp
      FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_nationkey, n_name ORDER BY n_nationkey""",
    "q_join_full" -> """
      WITH oa AS (
        SELECT o_custkey, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey)
      SELECT coalesce(c_custkey, o_custkey) AS custkey,
             coalesce(n_orders, 0) AS n_orders,
             coalesce(spend, 0.0) AS spend
      FROM customer FULL JOIN oa ON c_custkey = o_custkey
      ORDER BY custkey""",
    "q_join_semi" -> """
      SELECT c_mktsegment, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_join_anti" -> """
      SELECT c_mktsegment, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_join_cross" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""",
    "q_join_nonequi" -> """
      SELECT band, count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'),
                   (25.0, 40.0, 'high'), (40.0, 1e9, 'max')) b(lo, hi, band)
        ON l_quantity >= lo AND l_quantity < hi
      GROUP BY band ORDER BY band""",
    "q_join_partsupp" -> s"""
      SELECT p_type, count(*) AS cnt,
             CAST($revenue AS DOUBLE) AS revenue,
             count(DISTINCT s_suppkey) AS nd_supp
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY p_type ORDER BY p_type""")
}

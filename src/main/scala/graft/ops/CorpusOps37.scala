package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 24 (SURVEY.md §2.K/§2.M):
  * the Hive `TRANSFORM ... USING` script pipe upgraded from spec-only
  * to a fully oracled query, the log-rank two-group survival test
  * (completing the Kaplan-Meier family), and isotonic calibration
  * (pool-adjacent-violators via the minimax closed form) over the
  * classifier decile bins.
  *
  * Determinism contract as the other r10 waves: exact integers
  * everywhere, DECIMAL(38,0)/HUGEINT promotion before any product
  * that can exceed int64, floor division only.
  */
object CorpusOps37 {

  /** Hive ScriptOperator parity as DATA, not just a spec: rows pipe
    * through an external awk process (`TRANSFORM ... USING`, the
    * Hive streaming-script surface; script shipped like ADD FILE)
    * computing the per-row quantity×price product in cents², then the
    * engine aggregates the script's stdout per order. awk's printf
    * "%.0f" keeps the product exact (< 2^53). The oracle computes the
    * same product·sum entirely in SQL — so the pipe's serialization,
    * the script arithmetic, and the re-parse are all value-checked.
    * The explicit ROW FORMAT DELIMITED '\t' clauses matter: Spark's
    * script-transform DEFAULT delimiter is U+0001 on both sides, and
    * a field-blind passthrough script masks that (the U+0001-joined
    * line re-splits correctly) while any field-aware script silently
    * reads the whole row as one column.
    *
    * Scale: the script runs per-partition as a child process with
    * streaming stdin/stdout (no materialization); the filter bounds
    * the piped volume and is pushed to the scan. The aggregate after
    * re-parse is an ordinary partial-aggregated hash agg. */
  val qTransformScript: Q = (s, dir) => {
    val sh = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_w24_prod.sh")
    val script = "#!/usr/bin/env bash\n" +
      "exec awk -F'\\t' '{ printf \"%s\\t%.0f\\n\", $1, $2 * $3 }'\n"
    java.nio.file.Files.write(sh.toPath,
      script.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("px_c"))
      .createOrReplaceTempView("li_tx_w24")
    s.sql(s"""
      SELECT CAST(k AS BIGINT) AS k,
             CAST(sum(CAST(prod AS BIGINT)) AS BIGINT) AS prod_sum
      FROM (
        SELECT TRANSFORM(l_orderkey, qty_c, px_c)
          ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
          USING 'bash ${sh.getAbsolutePath}'
          AS (k STRING, prod STRING)
          ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
        FROM li_tx_w24) t
      GROUP BY 1 ORDER BY 1""")
  }

  /** Log-rank test (Mantel 1966; Peto & Peto 1972) comparing the
    * survival of BUILDING-segment customers against the rest, on the
    * same lifetime/censoring definition as q_surv_km. At each
    * distinct lifetime with ≥1 event: risk sets n, n1, events d, d1;
    * E1 accumulates d·n1/n and the hypergeometric variance
    * d·n1·(n−n1)·(n−d) / (n²·(n−1)), both in exact micro units with
    * the numerator promoted to DECIMAL(38,0) BEFORE the multiply
    * (at corpus scale d·n1·(n−n1)·(n−d)·10⁶ tops int64). The chi²
    * statistic (O1−E1)²/V follows with the same promotion on the
    * squared difference.
    *
    * Scale: orders collapse to per-customer rows (the segment join is
    * broadcast at fixture scale, co-partitioned on custkey beyond),
    * then to the bounded lifetime axis; the risk-set cumsums are
    * windows over that calendar-bounded axis, same as q_surv_km. */
  val qSurvLogrank: Q = (s, dir) => {
    val seg = Tables(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("grp"))
    val cust = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("first_o"),
        max(col("o_orderdate")).as("last_o"))
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
    val cutoff = cust.agg(max(col("last_o")).as("cutoff"))
    val lifetimes = cust.crossJoin(broadcast(cutoff))
      .select(datediff(col("last_o"), col("first_o")).cast("long")
          .as("t_days"),
        when(col("last_o") < date_sub(col("cutoff"), 30), 1L)
          .otherwise(0L).as("event"), col("grp"))
    val byT = lifetimes.groupBy(col("t_days"))
      .agg(sum(col("event") * col("grp")).as("d1"),
        sum(col("event")).as("d"),
        sum(col("grp")).as("x1"),
        count(lit(1)).as("x"))
    val tot = lifetimes.agg(sum(col("grp")).as("n1_tot"),
      count(lit(1)).as("n_tot"))
    val w = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = byT.crossJoin(broadcast(tot))
      .withColumn("n", col("n_tot") -
        coalesce(sum(col("x")).over(w), lit(0L)))
      .withColumn("n1", col("n1_tot") -
        coalesce(sum(col("x1")).over(w), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("e1_micro",
        expr("CAST(d AS DECIMAL(38,0)) * n1 * 1000000 div n"))
      .withColumn("v_micro", when(col("n") < 2, 0L).otherwise(
        expr("""CAST(d AS DECIMAL(38,0)) * n1 * (n - n1) * (n - d)
                * 1000000
                div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))""")))
    terms
      .agg(first(col("n1_tot")).as("n1_tot"),
        first(col("n_tot") - col("n1_tot")).as("n0_tot"),
        sum(col("d1")).as("o1"),
        sum(col("e1_micro")).as("e1_micro"),
        sum(col("v_micro")).as("v_micro"))
      .withColumn("chi2_milli",
        expr("""CAST(o1 * 1000000 - e1_micro AS DECIMAL(38,0))
                * (o1 * 1000000 - e1_micro) * 1000
                div nullif(v_micro * 1000000, 0)"""))
  }

  /** Isotonic calibration of the classifier decile bins (Zadrozny &
    * Elkan, KDD 2002; Barlow et al. 1972): the PAV fit via the exact
    * minimax closed form iso(i) = max_{j≤i} min_{k≥i} rate(j..k) —
    * identical to pool-adjacent-violators on the bin sequence, but
    * expressible as pure joins over the 10-bin grid, so both engines
    * replay it with zero iteration. Pooled rates are permille floor
    * divisions, making every min/max comparison integer-exact.
    *
    * Scale: everything after the decile binning operates on ≤10 rows
    * (the 55-interval grid is constant-size); the binning itself is
    * the bucket-offset decomposition (no single-partition sort). The
    * monotone fit is the serving-time calibration map. */
  val qCalibrationIsotonic: Q = (s, dir) => {
    val sc = graft.CacheScope.track(
      CorpusOps10.scored(s, dir).persist())
    val bins = ScaleWindows.bucketedNtile(sc, 10,
        expr("score_milli div 64"), false,
        Seq(col("score_milli").asc, col("doc_id").asc), "bin")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
      .select(col("bin").cast("long").as("bin"), col("n"), col("p"))
    val grid = bins.as("j").join(broadcast(bins.as("k")),
        col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"))
      .join(broadcast(bins.as("b")),
        col("b.bin") >= col("j") && col("b.bin") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(expr("sum(p) * 1000 div sum(n)").as("a"))
    val innerMin = bins.select(col("bin").as("i"))
      .join(broadcast(grid),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("a")).as("m"))
    val iso = innerMin.groupBy(col("i"))
      .agg(max(col("m")).as("iso_permille"))
    bins.join(broadcast(iso), col("bin") === col("i"))
      .select(col("bin"), col("n").as("n_docs"), col("p").as("n_pos"),
        expr("p * 1000 div n").as("raw_permille"), col("iso_permille"))
      .orderBy(col("bin"))
  }

  val queries: Map[String, Q] = Map(
    "q_transform_script" -> qTransformScript,
    "q_surv_logrank" -> qSurvLogrank,
    "q_calibration_isotonic" -> qCalibrationIsotonic)

  val oracle: Map[String, String] = Map(
    "q_transform_script" -> """
      SELECT l_orderkey AS k,
        CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)
          * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          AS prod_sum
      FROM lineitem WHERE l_orderkey % 97 = 0
      GROUP BY 1 ORDER BY 1""",
    "q_surv_logrank" -> """
      WITH seg AS (SELECT c_custkey,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS grp FROM customer),
      cust AS (SELECT o_custkey, min(o_orderdate) AS first_o,
                 max(o_orderdate) AS last_o
               FROM orders GROUP BY 1),
      cj AS (SELECT cust.*, seg.grp FROM cust
             JOIN seg ON seg.c_custkey = cust.o_custkey),
      cut AS (SELECT max(last_o) AS cutoff FROM cj),
      lt AS (SELECT CAST(date_diff('day', first_o, last_o) AS BIGINT)
               AS t_days,
               CASE WHEN last_o < cutoff - INTERVAL 30 DAY
                 THEN 1 ELSE 0 END AS event, grp
             FROM cj CROSS JOIN cut),
      by_t AS (SELECT t_days,
                 CAST(sum(event * grp) AS BIGINT) AS d1,
                 CAST(sum(event) AS BIGINT) AS d,
                 CAST(sum(grp) AS BIGINT) AS x1,
                 CAST(count(*) AS BIGINT) AS x
               FROM lt GROUP BY 1),
      tot AS (SELECT CAST(sum(grp) AS BIGINT) AS n1_tot,
                CAST(count(*) AS BIGINT) AS n_tot FROM lt),
      terms AS (SELECT *,
                  n_tot - CAST(coalesce(sum(x) OVER (ORDER BY t_days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS n,
                  n1_tot - CAST(coalesce(sum(x1) OVER (ORDER BY t_days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS n1
                FROM by_t CROSS JOIN tot),
      ev AS (SELECT *,
               CAST(CAST(d AS HUGEINT) * n1 * 1000000 // n AS BIGINT)
                 AS e1_micro,
               CASE WHEN n < 2 THEN 0 ELSE
                 CAST(CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d)
                   * 1000000
                   // (CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT)
               END AS v_micro
             FROM terms WHERE d > 0)
      SELECT any_value(n1_tot) AS n1_tot,
        any_value(n_tot - n1_tot) AS n0_tot,
        CAST(sum(d1) AS BIGINT) AS o1,
        CAST(sum(e1_micro) AS BIGINT) AS e1_micro,
        CAST(sum(v_micro) AS BIGINT) AS v_micro,
        CAST(CAST(sum(d1) * 1000000 - sum(e1_micro) AS HUGEINT)
          * (sum(d1) * 1000000 - sum(e1_micro)) * 1000
          // nullif(CAST(sum(v_micro) AS HUGEINT) * 1000000, 0)
          AS BIGINT) AS chi2_milli
      FROM ev""",
    "q_calibration_isotonic" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      binned AS (SELECT *, ntile(10) OVER (ORDER BY score_milli, doc_id)
                   AS bin FROM scored),
      bins AS (SELECT CAST(bin AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(pos) AS BIGINT) AS p
               FROM binned GROUP BY 1),
      grid AS (SELECT j.bin AS j, k.bin AS k,
                 CAST(CAST(sum(b.p) AS BIGINT) * 1000
                   // CAST(sum(b.n) AS BIGINT) AS BIGINT) AS a
               FROM bins j JOIN bins k ON j.bin <= k.bin
               JOIN bins b ON b.bin BETWEEN j.bin AND k.bin
               GROUP BY 1, 2),
      inner_min AS (SELECT i.bin AS i, g.j, min(g.a) AS m
                    FROM bins i JOIN grid g
                      ON g.j <= i.bin AND g.k >= i.bin
                    GROUP BY 1, 2),
      iso AS (SELECT i, CAST(max(m) AS BIGINT) AS iso_permille
              FROM inner_min GROUP BY 1)
      SELECT b.bin, b.n AS n_docs, b.p AS n_pos,
        b.p * 1000 // b.n AS raw_permille, iso.iso_permille
      FROM bins b JOIN iso ON iso.i = b.bin ORDER BY b.bin""")
}

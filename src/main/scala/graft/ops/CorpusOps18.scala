package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 waves 26-27 (SURVEY.md §2.M):
  * discriminative keyphrase extraction, repurchase-cycle gap
  * percentiles, an embedding-norm QA profile, the discount-lift
  * regression, the relative-rank window battery and WAPE/bias
  * forecast scoring.
  *
  * Determinism contract (CorpusOps5-17): exact int64/DECIMAL(38,0)
  * arithmetic up to at most one final IEEE division; integral
  * divisions on non-negative operands. */
object CorpusOps18 {

  /** Discriminative keyphrases per source via the one-sided chi-squared
    * score (the "characteristic terms" extraction used for corpus
    * slicing; Manning & Schütze §5.3): for word w in source s with the
    * 2×2 contingency (a = count in s, b = count elsewhere, against
    * token totals), score_micro = N·(a·d − b·c)²·1e6 div margins —
    * keeping only words OVER-represented (a·d > b·c). Top-5 per source
    * by (score desc, word), lowered to WindowGroupLimit.
    *
    * Exactness: the squared numerator rides DECIMAL(38,0)/HUGEINT;
    * one integral division per cell. TF-IDF ranks terms per DOCUMENT;
    * this ranks them per SLICE against the rest of the corpus.
    *
    * Scale: token counts partial-aggregate; the per-word table is
    * vocabulary-sized; margins broadcast. */
  val qTextKeyphrase: Q = (s, dir) => {
    val tok = Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("a"))
    val perW = tok.groupBy(col("w")).agg(sum(col("a")).as("cw"))
    val perS = tok.groupBy(col("source")).agg(sum(col("a")).as("cs"))
    val tot = tok.agg(sum(col("a")).as("n"))
    tok.join(broadcast(perW), Seq("w"))
      .join(broadcast(perS), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("b", col("cw") - col("a"))    // word elsewhere
      .withColumn("c", col("cs") - col("a"))    // other words in s
      .withColumn("d", col("n") - col("cw") - col("cs") + col("a"))
      // a·d is promoted to DECIMAL(38,0) BEFORE the multiply (ADVICE
      // r9): at corpus-scale token totals the long product wraps
      // silently; the oracle promotes the same operand to HUGEINT
      .filter(col("a").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * col("d") > col("b").cast(org.apache.spark.sql.types
        .DecimalType(38, 0)) * col("c"))
      .withColumn("chi2_micro", expr(
        """CAST(CAST(n AS DECIMAL(38, 0)) *
             (CAST(a AS DECIMAL(38, 0)) * d - CAST(b AS DECIMAL(38, 0)) * c) *
             (CAST(a AS DECIMAL(38, 0)) * d - CAST(b AS DECIMAL(38, 0)) * c)
             * 1000000
           div (CAST(cw AS DECIMAL(38, 0)) * (n - cw) * cs * (n - cs))
           AS BIGINT)"""))
      .withColumn("rnk", row_number().over(Window
        .partitionBy(col("source"))
        .orderBy(col("chi2_micro").desc, col("w"))))
      .filter(col("rnk") <= 5)
      .select(col("source"), col("rnk"), col("w"), col("a"),
        col("chi2_micro"))
      .orderBy(col("source"), col("rnk"))
  }

  /** Repurchase-cycle profile: days between consecutive orders per
    * customer, rolled up to exact discrete gap percentiles per market
    * segment — the purchase-cadence number behind replenishment
    * forecasting and churn windows.
    *
    * Exactness: gaps are integer datediffs off ONE customer-keyed lag
    * window; percentile_disc picks actual values.
    *
    * Scale: the lag window and the per-customer rollup share the
    * customer partitioning; the segment rollup is dimension-sized. */
  val qOrderGapPercentiles: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables(s, dir, "orders")
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), col("prev")).cast("long").as("gap_d"))
    gaps.join(Tables(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"),
        expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY gap_d) AS BIGINT)")
          .as("p50_gap_days"),
        expr("CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY gap_d) AS BIGINT)")
          .as("p90_gap_days"),
        max(col("gap_d")).as("max_gap_days"))
      .orderBy(col("c_mktsegment"))
  }

  /** Embedding-norm QA profile per label: the squared-L2 distribution
    * (min / median / max, exact micro² units) plus degenerate-vector
    * counts — the sanity gate before any cosine index build (a
    * near-zero norm makes cosine meaningless; a norm outlier usually
    * marks a failed encode).
    *
    * Exactness: n2 is the exact integer quantized dot (EmbQuant);
    * percentile_disc picks an actual n2.
    *
    * Scale: map-side scoring; per-label rollup is label-bounded. */
  val qEmbNormProfile: Q = (s, dir) => {
    val emb = EmbQuant.quantized(s, dir)
      .select(col("label"),
        EmbQuant.dotq(col("q"), col("q")).as("n2"))
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("n2")).as("min_n2"),
        expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY n2) AS BIGINT)")
          .as("med_n2"),
        max(col("n2")).as("max_n2"),
        sum(when(col("n2") < 1000000L, 1L).otherwise(0L))
          .as("n_degenerate"))
      .orderBy(col("label"))
  }

  /** Discount-lift regression per return flag: OLS slope of quantity
    * on the discount (in basis points) — "does a deeper discount move
    * volume?" quantified with the exact integer num/den decomposition
    * (the q_ts_trend discipline; the slope sign is the finding, so
    * num and den stay integer columns and the ratio is the one IEEE
    * division).
    *
    * Scale: ONE partial-aggregated scan — the five sums fold
    * map-side; no shuffle beyond the |flags| rollup. */
  val qDiscountLift: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_discount") * 10000).cast("long").as("x_bp"),
        round(col("l_quantity")).cast("long").as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x_bp")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x_bp") * col("y")).as("sxy"),
        sum(col("x_bp") * col("x_bp")).as("sxx"))
      .select(col("l_returnflag"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("qty_per_bp", col("slope_num").cast("double") /
        col("slope_den").cast("double"))
      .orderBy(col("l_returnflag"))
  }

  /** Relative-rank window battery — percent_rank, cume_dist and
    * ntile(4) over a pinned total order (the §2.E rows the ranking
    * query didn't cover). Both relative ranks derive from integer
    * ranks by ONE division each ((rank−1)/(n−1), cum_n/n), so the
    * doubles are bit-identical cross-engine; emitted for the top-3
    * orders per status to keep the board row small while still
    * crossing partition boundaries. */
  val qWindowRelRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(s, dir, "orders")
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), col("rn"), col("o_orderkey"),
        col("pr"), col("cd"), col("quartile"))
      .orderBy(col("o_orderstatus"), col("rn"))
  }

  /** WAPE + bias for the seasonal-naive backtest — the two numbers
    * MAPE hides (WAPE weights errors by volume; bias separates over-
    * from under-forecasting). Same lag-7/28-day window as
    * q_forecast_backtest. WAPE is an exact non-negative integral
    * division; the bias numerator is SIGNED, so it ships as the exact
    * integer plus one IEEE ratio (the module contract's signed-ratio
    * rule). */
  val qForecastWape: Q = (s, dir) => {
    val wLag = Window.orderBy(col("day"))
    val wAll = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    dailyRevenue2(s, dir)
      .withColumn("f", lag(col("cents"), 7).over(wLag))
      .withColumn("max_day", max(col("day")).over(wAll))
      .filter(col("f").isNotNull &&
        col("day") > date_sub(col("max_day"), 28))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cents") - col("f"))).as("abs_err"),
        sum(col("cents") - col("f")).as("bias_num"),
        sum(col("cents")).as("actual"))
      .select(col("n_days"), col("abs_err"), col("bias_num"), col("actual"),
        expr("abs_err * 1000000 div actual").as("wape_micro"),
        (col("bias_num").cast("double") / col("actual").cast("double"))
          .as("bias_ratio"))
  }

  // the shared daily-revenue rollup lives in CorpusOps14 (one home,
  // one oracle CTE)
  private def dailyRevenue2(s: org.apache.spark.sql.SparkSession,
      dir: String) = CorpusOps14.dailyRevenue(s, dir)

  val queries: Map[String, Q] = Map(
    "q_text_keyphrase" -> qTextKeyphrase,
    "q_order_gap_percentiles" -> qOrderGapPercentiles,
    "q_emb_norm_profile" -> qEmbNormProfile,
    "q_discount_lift" -> qDiscountLift,
    "q_window_relrank" -> qWindowRelRank,
    "q_forecast_wape" -> qForecastWape)

  val oracle: Map[String, String] = Map(
    "q_text_keyphrase" -> """
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                   FROM documents),
      cell AS (SELECT source, w, CAST(count(*) AS BIGINT) AS a
               FROM tok GROUP BY 1, 2),
      pw AS (SELECT w, CAST(sum(a) AS BIGINT) AS cw FROM cell GROUP BY 1),
      ps AS (SELECT source, CAST(sum(a) AS BIGINT) AS cs
             FROM cell GROUP BY 1),
      tot AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cell),
      sc AS (SELECT source, w, a,
               cw - a AS b, cs - a AS c, n - cw - cs + a AS d,
               cw, cs, n
             FROM cell JOIN pw USING (w) JOIN ps USING (source)
               CROSS JOIN tot),
      scored AS (SELECT source, w, a,
                   CAST(CAST(n AS HUGEINT) *
                       (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) *
                       (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                       * 1000000
                     // (CAST(cw AS HUGEINT) * (n - cw) * cs * (n - cs))
                     AS BIGINT) AS chi2_micro
                 FROM sc
                 WHERE CAST(a AS HUGEINT) * d > CAST(b AS HUGEINT) * c)
      SELECT source,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY chi2_micro DESC, w) AS INT) AS rnk,
        w, a, chi2_micro
      FROM scored QUALIFY rnk <= 5 ORDER BY source, rnk""",
    "q_order_gap_percentiles" -> """
      WITH gaps AS (SELECT o_custkey,
                      CAST(date_diff('day',
                        lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey),
                        o_orderdate) AS BIGINT) AS gap_d
                    FROM orders
                    QUALIFY lag(o_orderdate, 1) OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) IS NOT NULL)
      SELECT c_mktsegment, count(*) AS n_gaps,
        quantile_disc(gap_d, 0.50) AS p50_gap_days,
        quantile_disc(gap_d, 0.90) AS p90_gap_days,
        max(gap_d) AS max_gap_days
      FROM gaps JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_emb_norm_profile" -> """
      WITH e AS (SELECT vec_id, label, r.i AS i,
                   CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                     AS BIGINT) AS v
                 FROM embeddings, range(1, 65) r(i)),
      n2 AS (SELECT label, vec_id, CAST(sum(v * v) AS BIGINT) AS n2
             FROM e GROUP BY 1, 2)
      SELECT label, count(*) AS n_vecs, min(n2) AS min_n2,
        quantile_disc(n2, 0.50) AS med_n2, max(n2) AS max_n2,
        CAST(sum(CASE WHEN n2 < 1000000 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_degenerate
      FROM n2 GROUP BY label ORDER BY label""",
    "q_discount_lift" -> """
      WITH li AS (SELECT l_returnflag,
                    CAST(round(l_discount * 10000) AS BIGINT) AS x_bp,
                    CAST(round(l_quantity) AS BIGINT) AS y
                  FROM lineitem),
      agg AS (SELECT l_returnflag, count(*) AS n,
                CAST(sum(x_bp) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x_bp * y) AS BIGINT) AS sxy,
                CAST(sum(x_bp * x_bp) AS BIGINT) AS sxx
              FROM li GROUP BY 1)
      SELECT l_returnflag, n,
        n * sxy - sx * sy AS slope_num,
        n * sxx - sx * sx AS slope_den,
        CAST(n * sxy - sx * sy AS DOUBLE) /
          CAST(n * sxx - sx * sx AS DOUBLE) AS qty_per_bp
      FROM agg ORDER BY l_returnflag""",
    "q_window_relrank" -> """
      WITH w AS (SELECT o_orderstatus, o_orderkey,
                   percent_rank() OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey) AS pr,
                   cume_dist() OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey) AS cd,
                   CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey) AS INT)
                     AS quartile,
                   CAST(row_number() OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey) AS INT)
                     AS rn
                 FROM orders)
      SELECT o_orderstatus, rn, o_orderkey, pr, cd, quartile
      FROM w WHERE rn <= 3 ORDER BY o_orderstatus, rn""",
    "q_forecast_wape" -> """
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
      lagd AS (SELECT day, cents,
                 lag(cents, 7) OVER (ORDER BY day) AS f,
                 max(day) OVER () AS max_day
               FROM d),
      bt AS (SELECT * FROM lagd
             WHERE f IS NOT NULL AND day > max_day - INTERVAL 28 DAY)
      SELECT count(*) AS n_days,
        CAST(sum(abs(cents - f)) AS BIGINT) AS abs_err,
        CAST(sum(cents - f) AS BIGINT) AS bias_num,
        CAST(sum(cents) AS BIGINT) AS actual,
        CAST(sum(abs(cents - f)) AS BIGINT) * 1000000
          // CAST(sum(cents) AS BIGINT) AS wape_micro,
        CAST(sum(cents - f) AS DOUBLE) / CAST(sum(cents) AS DOUBLE)
          AS bias_ratio
      FROM bt""")
}

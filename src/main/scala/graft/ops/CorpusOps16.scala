package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 24 (SURVEY.md §2.M):
  * position-based multi-touch attribution, the month-pair cohort
  * overlap (retention) matrix, and lexical-diversity indices.
  *
  * Determinism contract (CorpusOps5-15): exact int64/DECIMAL(38,0)
  * arithmetic; integer divisions on non-negative operands; every
  * fractional split states its remainder rule. */
object CorpusOps16 {

  /** Position-based (U-shaped, 40/20/40) multi-touch attribution:
    * each converting user's view/click touches BEFORE their first
    * purchase share the conversion credit — first and last touch 400
    * permille each, middles split the remaining 200 equally. Exact
    * integer remainder rules (the part naive implementations fudge):
    * 1 touch → 1000; 2 touches → 500/500; n ≥ 3 → middles get
    * 200 div (n−2) each and the EARLIEST middle absorbs the
    * remainder, so every journey's credits sum to exactly 1000
    * (conservation pinned in the spec). Complements q_attr_touch
    * (first/last-only).
    *
    * Scale: the first-purchase rollup and the touch windows are one
    * user-keyed shuffle; the credit rollup partial-aggregates. */
  val qAttrPosition: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
      .select(col("user_id"), col("fp.ts").as("pts"),
        col("fp.event_id").as("pid"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .join(firstBuy, Seq("user_id"))
      .filter(col("ts") < col("pts") ||
        (col("ts") === col("pts") && col("event_id") < col("pid")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wN = Window.partitionBy(col("user_id"))
    val credited = touches
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("credit_permille",
        when(col("n") === 1, 1000L)
          .when(col("n") === 2, 500L)
          .when(col("rn") === 1 || col("rn") === col("n"), 400L)
          .otherwise(expr("200 div (n - 2)") +
            when(col("rn") === 2, expr("200 % (n - 2)")).otherwise(0L)))
    credited.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_permille")).as("credit_permille_total"))
      .orderBy(col("event_type"))
  }

  /** Month-pair cohort overlap (the retention triangle): for every
    * active month m and horizon k = 1..6, how many of month m's
    * active customers ordered again in m+k. The +k fan-out of the
    * DEDUPED (customer, month) pairs replaces the month×month range
    * join (the q_rollup_dau shape on a coarser axis).
    *
    * Scale: user-months partial-aggregate on the fact; the fan-out is
    * map-side ×6; both rollups partial-aggregate. */
  val qCohortOverlap: Q = (s, dir) => {
    val um = Tables(s, dir, "orders")
      .select(col("o_custkey").as("u"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("ym"))
      .distinct()
    val active = um.groupBy(col("ym")).agg(count(lit(1)).as("active_m1"))
    val both = um
      .select(col("u"), col("ym"),
        explode(expr("sequence(1, 6)")).as("k"))
      .select(col("u"), col("ym"), col("k").cast("long").as("k"),
        (col("ym") + col("k")).as("ym2"))
      .join(um.select(col("u"), col("ym").as("ym2")), Seq("u", "ym2"))
      .groupBy(col("ym"), col("k")).agg(count(lit(1)).as("both"))
    both.join(broadcast(active), Seq("ym"))
      .select(
        concat(expr("ym div 12"), lit("-"),
          lpad((col("ym") % 12 + 1).cast("string"), 2, "0")).as("month"),
        col("k"), col("active_m1"), col("both"),
        expr("both * 1000 div active_m1").as("retention_permille"))
      .orderBy(col("month"), col("k"))
  }

  /** Lexical-diversity indices per source: Simpson's index (the
    * probability two sampled tokens coincide — Simpson, Nature 1949)
    * and the type-token ratio, both exact: D_micro =
    * Σ c(c−1)·1e6 div (N(N−1)) with the numerator on DECIMAL(38,0)
    * (c(c−1) sums approach N²), TTR_micro = types·1e6 div N. The
    * corpus-health dial for repetitive/templated sources.
    *
    * Scale: token counts partial-aggregate; per-source state is the
    * vocabulary table. */
  val qTextSimpson: Q = (s, dir) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val tok = Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    tok.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum((col("c") * (col("c") - 1)).cast(dec38)).as("coincide"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("""CAST(coincide * 1000000
                div (CAST(n_tokens AS DECIMAL(38, 0)) * (n_tokens - 1))
                AS BIGINT)""").as("simpson_micro"),
        expr("n_types * 1000000 div n_tokens").as("ttr_micro"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_attr_position" -> qAttrPosition,
    "q_cohort_overlap" -> qCohortOverlap,
    "q_text_simpson" -> qTextSimpson)

  val oracle: Map[String, String] = Map(
    "q_attr_position" -> """
      WITH fp AS (SELECT user_id, min(ts) AS pts FROM events
                  WHERE event_type = 'purchase' GROUP BY 1),
      fpid AS (SELECT e.user_id, e.ts AS pts,
                 min(e.event_id) AS pid
               FROM events e JOIN fp ON e.user_id = fp.user_id
                 AND e.ts = fp.pts AND e.event_type = 'purchase'
               GROUP BY 1, 2),
      touches AS (SELECT e.user_id, e.ts, e.event_id, e.event_type
                  FROM events e JOIN fpid f ON e.user_id = f.user_id
                  WHERE e.event_type IN ('view', 'click')
                    AND (e.ts < f.pts OR (e.ts = f.pts
                      AND e.event_id < f.pid))),
      ranked AS (SELECT *,
                   CAST(row_number() OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS BIGINT) AS rn,
                   CAST(count(*) OVER (PARTITION BY user_id)
                     AS BIGINT) AS n
                 FROM touches),
      credited AS (SELECT event_type,
                     CASE WHEN n = 1 THEN 1000
                       WHEN n = 2 THEN 500
                       WHEN rn = 1 OR rn = n THEN 400
                       ELSE 200 // (n - 2) +
                         CASE WHEN rn = 2 THEN 200 % (n - 2)
                           ELSE 0 END
                     END AS credit_permille
                   FROM ranked)
      SELECT event_type, count(*) AS n_touches,
        CAST(sum(credit_permille) AS BIGINT) AS credit_permille_total
      FROM credited GROUP BY 1 ORDER BY event_type""",
    "q_cohort_overlap" -> """
      WITH um AS (SELECT DISTINCT o_custkey AS u,
                    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                      AS BIGINT) AS ym
                  FROM orders),
      active AS (SELECT ym, count(*) AS active_m1 FROM um GROUP BY 1),
      fan AS (SELECT u, ym, CAST(k AS BIGINT) AS k, ym + k AS ym2
              FROM um, unnest(generate_series(1, 6)) AS g(k)),
      both_ AS (SELECT f.ym, f.k, count(*) AS both
                FROM fan f JOIN um ON um.u = f.u AND um.ym = f.ym2
                GROUP BY 1, 2)
      SELECT CAST(b.ym // 12 AS VARCHAR) || '-' ||
          lpad(CAST(b.ym % 12 + 1 AS VARCHAR), 2, '0') AS month,
        b.k, a.active_m1, CAST(b.both AS BIGINT) AS both,
        CAST(b.both AS BIGINT) * 1000 // a.active_m1
          AS retention_permille
      FROM both_ b JOIN active a ON a.ym = b.ym
      ORDER BY month, k""",
    "q_text_simpson" -> """
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                   FROM documents),
      counts AS (SELECT source, w, count(*) AS c
                 FROM tok GROUP BY 1, 2),
      agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                count(*) AS n_types,
                CAST(sum(CAST(c * (c - 1) AS HUGEINT)) AS HUGEINT)
                  AS coincide
              FROM counts GROUP BY 1)
      SELECT source, n_tokens, n_types,
        CAST(coincide * 1000000
          // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT)
          AS simpson_micro,
        n_types * 1000000 // n_tokens AS ttr_micro
      FROM agg ORDER BY source""")
}

package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 15 (SURVEY.md §2.M):
  * the sample-ratio-mismatch guardrail and degree assortativity.
  *
  * Determinism contract as the other r10 waves.
  */
object CorpusOps32 {

  /** Sample-ratio-mismatch (SRM) guardrail — the first check every
    * experimentation platform runs before reading ANY metric (Fabijan
    * et al., "Diagnosing sample ratio mismatch", KDD 2019): a χ²
    * goodness-of-fit of the observed arm counts against the PLANNED
    * split, for two designs over the same md5 user hash — the 50/50
    * A/B and a 900/100 holdout. χ² = (n_a·1000 − n·p)² · 10⁶ /
    * (n·p·(1000−p)) in micro units with the numerator promoted to
    * DECIMAL(38,0) before squaring; flagged above the α=0.05, df=1
    * critical value 3.841.
    *
    * Scale: user table built by one partial-aggregated scan; both
    * scenarios are arithmetic over a 2-cell count table. */
  val qAbSrm: Q = (s, dir) => {
    val users = graft.CacheScope.track(
      Tables(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("h",
          conv(substring(md5(col("user_id").cast("string")), 1, 8),
            16, 10).cast("long"))
        .persist())
    def scenario(name: String, inA: org.apache.spark.sql.Column,
        pPermille: Long) = {
      users.agg(
        sum(when(inA, 1L).otherwise(0L)).as("n_a"),
        count(lit(1)).as("n"))
        .select(lit(name).as("scenario"),
          col("n_a"), (col("n") - col("n_a")).as("n_b"),
          lit(pPermille).as("planned_permille"),
          expr(s"""CAST(CAST(n_a * 1000 - n * $pPermille AS DECIMAL(38, 0))
                        * (n_a * 1000 - n * $pPermille) * 1000000
                   DIV (CAST(n AS DECIMAL(38, 0)) * $pPermille
                        * (1000 - $pPermille)) AS BIGINT)""")
            .as("chi2_micro"))
        .withColumn("srm_detected", col("chi2_micro") > 3841000L)
    }
    scenario("ab_50_50", col("h") % 2 === 0, 500L)
      .union(scenario("holdout_90_10", col("h") % 10 =!= 0, 900L))
      .orderBy(col("scenario"))
  }

  /** Degree assortativity of the co-purchase graph (Newman,
    * "Assortative mixing in networks", PRL 2002): the Pearson
    * correlation of endpoint degrees over all directed edge
    * occurrences — positive means hubs buy with hubs (social-network
    * shape), negative means hubs bridge the periphery
    * (technological/dependency shape). Symmetric orientation makes
    * Σx = Σy, so r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²); milli units
    * via the floor-shift division (numerator can be negative), moment
    * products promoted to DECIMAL(38,0).
    *
    * Scale: degrees come from one aggregate of the undirected edge
    * list; the moment pass is one join of edges against the
    * broadcastable degree table + a single-row aggregate. */
  val qGraphAssortativity: Q = (s, dir) => {
    val e0 = graft.CacheScope.track(GraphOps.copurchaseEdges(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val und = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    und
      .join(broadcast(deg.select(col("u"), col("d").as("du"))), Seq("u"))
      .join(broadcast(deg.select(col("u").as("v"), col("d").as("dv"))),
        Seq("v"))
      .agg(count(lit(1)).as("m2"),
        sum(col("du")).as("sx"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("du") * col("dv")).as("sxy"))
      .select(col("m2"), col("sx"),
        expr("""(CAST(m2 AS DECIMAL(38, 0)) * sxy - CAST(sx AS
                  DECIMAL(38, 0)) * sx) * 1000""").as("num_k"),
        expr("""CAST(m2 AS DECIMAL(38, 0)) * sxx - CAST(sx AS
                  DECIMAL(38, 0)) * sx""").as("den"))
      .select(col("m2").as("edge_ends"), col("sx").as("degree_mass"),
        expr("CAST((num_k + 10 * den) DIV den - 10 AS BIGINT)")
          .as("r_milli"))
  }

  val queries: Map[String, Q] = Map(
    "q_ab_srm" -> qAbSrm,
    "q_graph_assortativity" -> qGraphAssortativity)

  val oracle: Map[String, String] = Map(
    "q_ab_srm" -> """
      WITH u AS (SELECT DISTINCT user_id,
              CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                AS BIGINT) AS h
            FROM events),
      ab AS (SELECT 'ab_50_50' AS scenario,
               CAST(sum(CASE WHEN h % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
               CAST(count(*) AS BIGINT) AS n, 500 AS p FROM u),
      ho AS (SELECT 'holdout_90_10' AS scenario,
               CAST(sum(CASE WHEN h % 10 <> 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
               CAST(count(*) AS BIGINT) AS n, 900 AS p FROM u),
      b AS (SELECT * FROM ab UNION ALL SELECT * FROM ho)
      SELECT scenario, n_a, n - n_a AS n_b,
        CAST(p AS BIGINT) AS planned_permille,
        CAST(CAST(n_a * 1000 - n * p AS HUGEINT)
               * (n_a * 1000 - n * p) * 1000000
             // (CAST(n AS HUGEINT) * p * (1000 - p)) AS BIGINT)
          AS chi2_micro,
        CAST(CAST(n_a * 1000 - n * p AS HUGEINT)
               * (n_a * 1000 - n * p) * 1000000
             // (CAST(n AS HUGEINT) * p * (1000 - p)) AS BIGINT)
          > 3841000 AS srm_detected
      FROM b ORDER BY scenario""",
    "q_graph_assortativity" -> (GraphOps.copurchaseCte + """,
      und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
              FROM und GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m2,
              CAST(sum(a.d) AS BIGINT) AS sx,
              CAST(sum(a.d * a.d) AS BIGINT) AS sxx,
              CAST(sum(a.d * b.d) AS BIGINT) AS sxy
            FROM und JOIN deg a ON und.u = a.u
                     JOIN deg b ON und.v = b.u)
      SELECT m2 AS edge_ends, sx AS degree_mass,
        CAST(((CAST(m2 AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx)
                * 1000
              + 10 * (CAST(m2 AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx))
             // (CAST(m2 AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
             - 10 AS BIGINT) AS r_milli
      FROM m"""))
}

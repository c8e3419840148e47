package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Corpus + analytics operators, r10 wave 13 (SURVEY.md §2.D/§2.M):
  * the SQL-standard regr_* aggregate battery, per-community cut
  * conductance, and the Markov-chain distribution evolution over the
  * event-type transition matrix.
  *
  * Determinism contract as the other r10 waves; the regr_* battery is
  * the one float-moment family here and rides the q_agg_stats
  * round(…, 4) discipline.
  */
object CorpusOps30 {

  /** SQL-standard bivariate regression aggregates (regr_count /
    * regr_avgx / regr_avgy / regr_slope / regr_intercept / regr_r2 —
    * the SQL:2003 family Hive exposes through the same names) of
    * extended price on quantity per return flag. Both engines
    * accumulate float moments with order-dependent last bits, so
    * every double is rounded to 4 decimals (slope/intercept/means are
    * thousands-scale; the wobble is ~1e-10) — the q_agg_stats
    * discipline.
    *
    * Scale: one partial-aggregable scan, 3 output rows. */
  val qAggRegr: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)")
          .as("n"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)"), 4)
          .as("avg_x"),
        round(expr("regr_avgy(l_extendedprice, l_quantity)"), 4)
          .as("avg_y"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4)
          .as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4)
          .as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6)
          .as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Per-community cut conductance φ(C) = cut(C) / min(vol(C),
    * vol(V∖C)) over the 3-round LPA partition (Kannan, Vempala &
    * Vetta, "On clusterings: good, bad and spectral", JACM 2004) —
    * the boundary-quality complement of q_graph_modularity's density
    * score: low φ = the community's edges stay inside. cut = vol −
    * 2·e_in and every term is an exact integer count; φ in milli.
    *
    * Scale: the LPA labels come from the shared [[CorpusOps26.lpa3]]
    * join loop; the conductance pass is the same two label joins +
    * community aggregates as modularity. */
  val qGraphConductance: Q = (s, dir) => {
    val (e0, und, labels) = CorpusOps26.lpa3(s, dir)
    val lab = graft.CacheScope.track(
      labels.persist(StorageLevel.MEMORY_AND_DISK))
    val m = e0.agg(count(lit(1)).as("m"))
    val eIn = e0
      .join(lab.select(col("node").as("u"), col("label").as("lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community")).agg(count(lit(1)).as("e_in"))
    val vol = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .join(lab.select(col("node").as("u"), col("label")), Seq("u"))
      .groupBy(col("label").as("community")).agg(sum(col("d")).as("vol"))
    val sizes = lab.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
    sizes
      .join(vol, Seq("community"))
      .join(eIn, Seq("community"), "left")
      .na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(m))
      .withColumn("cut", col("vol") - col("e_in") * 2)
      .withColumn("phi_milli", expr(
        """CASE WHEN least(vol, 2*m - vol) = 0 THEN 0
                ELSE cut * 1000 div least(vol, 2*m - vol) END"""))
      .orderBy(col("n_nodes").desc, col("community")).limit(25)
      .select(col("community"), col("n_nodes"), col("vol"), col("cut"),
        col("phi_milli"))
      .orderBy(col("community"))
  }

  /** Markov-chain distribution evolution: starting uniform over event
    * types, push the distribution through the exact-permille
    * transition matrix (q_path_transitions' construction) for three
    * steps — π_{k+1}[t] = Σ_f π_k[f]·P[f,t] div 1000, micro units,
    * truncating renormalization documented (each step loses < |types|
    * micro per entry, spec-bounded) — the "where does a user END UP"
    * read of the per-step matrix.
    *
    * Scale: the matrix and the distribution are |types|² / |types|
    * rows; only the matrix build touches the corpus (one user-sorted
    * lead pass + hash agg). */
  val qPathStationary: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("row_total"))
    val mat = graft.CacheScope.track(
      pairs.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"),
          expr("cnt * 1000 div row_total").as("p"))
        .persist())
    val types = graft.CacheScope.track(
      Tables(s, dir, "events").select(col("event_type").as("t"))
        .distinct().persist())
    var pi = types.withColumn("pi", lit(1000000L))
    val steps = (1 to 3).map { _ =>
      val nxt = mat.join(pi.select(col("t").as("from_type"), col("pi")),
          Seq("from_type"))
        .groupBy(col("to_type").as("t"))
        .agg(expr("sum(pi * p) div 1000").as("pi_n"))
      pi = types.join(nxt, Seq("t"), "left")
        .select(col("t"), coalesce(col("pi_n"), lit(0L)).as("pi"))
      pi
    }
    types
      .join(steps(0).select(col("t"), col("pi").as("pi1_micro")), Seq("t"))
      .join(steps(1).select(col("t"), col("pi").as("pi2_micro")), Seq("t"))
      .join(steps(2).select(col("t"), col("pi").as("pi3_micro")), Seq("t"))
      .select(col("t").as("event_type"), col("pi1_micro"),
        col("pi2_micro"), col("pi3_micro"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q_agg_regr" -> qAggRegr,
    "q_graph_conductance" -> qGraphConductance,
    "q_path_stationary" -> qPathStationary)

  val oracle: Map[String, String] = Map(
    "q_agg_regr" -> """
      SELECT l_returnflag,
        CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
        round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y,
        round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        round(regr_intercept(l_extendedprice, l_quantity), 4)
          AS intercept,
        round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_graph_conductance" -> (CorpusOps27.lpaRoundsSql + """,
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
      ein AS (SELECT lu.label AS community,
                CAST(count(*) AS BIGINT) AS e_in
              FROM e0 JOIN r3 lu ON e0.u = lu.node
                      JOIN r3 lv ON e0.v = lv.node
              WHERE lu.label = lv.label GROUP BY 1),
      vol AS (SELECT l.label AS community, CAST(sum(d.d) AS BIGINT)
                AS vol
              FROM (SELECT u, CAST(count(*) AS BIGINT) AS d
                    FROM und GROUP BY 1) d
              JOIN r3 l ON d.u = l.node GROUP BY 1),
      sz AS (SELECT label AS community, CAST(count(*) AS BIGINT)
               AS n_nodes
             FROM r3 GROUP BY 1),
      per AS (SELECT sz.community, sz.n_nodes, vol.vol,
                vol.vol - 2 * coalesce(ein.e_in, 0) AS cut,
                CASE WHEN least(vol.vol, 2*m.m - vol.vol) = 0 THEN 0
                     ELSE (vol.vol - 2 * coalesce(ein.e_in, 0)) * 1000
                          // least(vol.vol, 2*m.m - vol.vol) END
                  AS phi_milli
              FROM sz JOIN vol USING (community)
                      LEFT JOIN ein USING (community)
                      CROSS JOIN m),
      top AS (SELECT * FROM per
              ORDER BY n_nodes DESC, community LIMIT 25)
      SELECT community, n_nodes, vol, cut, phi_milli FROM top
      ORDER BY community"""),
    "q_path_stationary" -> """
      WITH seq AS (SELECT event_type AS from_type,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS to_type
            FROM events),
      pairs AS (SELECT from_type, to_type, count(*) AS cnt
                FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_total
              FROM pairs GROUP BY 1),
      mat AS (SELECT p.from_type, p.to_type,
                CAST(p.cnt * 1000 // t.row_total AS BIGINT) AS p
              FROM pairs p JOIN tot t USING (from_type)),
      ty AS (SELECT DISTINCT event_type AS t FROM events),
      p0 AS (SELECT t, CAST(1000000 AS BIGINT) AS pi FROM ty),
      s1 AS (SELECT mat.to_type AS t,
               CAST(sum(p0.pi * mat.p) // 1000 AS BIGINT) AS pi
             FROM mat JOIN p0 ON mat.from_type = p0.t GROUP BY 1),
      p1 AS (SELECT ty.t, coalesce(s1.pi, 0) AS pi
             FROM ty LEFT JOIN s1 USING (t)),
      s2 AS (SELECT mat.to_type AS t,
               CAST(sum(p1.pi * mat.p) // 1000 AS BIGINT) AS pi
             FROM mat JOIN p1 ON mat.from_type = p1.t GROUP BY 1),
      p2 AS (SELECT ty.t, coalesce(s2.pi, 0) AS pi
             FROM ty LEFT JOIN s2 USING (t)),
      s3 AS (SELECT mat.to_type AS t,
               CAST(sum(p2.pi * mat.p) // 1000 AS BIGINT) AS pi
             FROM mat JOIN p2 ON mat.from_type = p2.t GROUP BY 1),
      p3 AS (SELECT ty.t, coalesce(s3.pi, 0) AS pi
             FROM ty LEFT JOIN s3 USING (t))
      SELECT ty.t AS event_type, p1.pi AS pi1_micro, p2.pi AS pi2_micro,
        p3.pi AS pi3_micro
      FROM ty JOIN p1 USING (t) JOIN p2 USING (t) JOIN p3 USING (t)
      ORDER BY event_type""")
}

package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Corpus + analytics operators, r10 wave 10 (SURVEY.md §2.M):
  * domain upsampling epochs for data-constrained mixing, the
  * modularity score of the LPA communities, and Welch's two-sample
  * t-test on the quality-score split.
  *
  * Determinism contract as the other r10 waves; where a statistic
  * inherently ends in a square root or compound fraction (t², Welch
  * df) the final value is ONE double expression with an identical
  * tree in both engines — the q_sim_topk cosine discipline — over
  * exact integer moment sums.
  */
object CorpusOps27 {

  /** Domain upsampling plan under a uniform target mix
    * (data-constrained scaling per Muennighoff et al. 2023: when a
    * domain is smaller than its target share, you REPEAT it — up to a
    * ~4-epoch budget beyond which repetition stops helping): per
    * source, observed whitespace tokens, the uniform target share,
    * the exact repeat factor in milli-epochs, the 4000-milli cap, and
    * the effective (post-cap) token contribution with its deficit.
    *
    * Scale: one partial-aggregable token-count scan collapses the
    * corpus to |sources| rows; everything else is arithmetic on that
    * tiny table plus one 1-row broadcast total. */
  val qMixUpsample: Q = (s, dir) => {
    val tok = Tables(s, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .groupBy(col("source"))
      .agg(sum(col("ntok")).as("tokens"))
    val tot = tok.agg(sum(col("tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    tok.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        expr("total_tokens div n_sources").as("target_tokens"),
        expr("(total_tokens div n_sources) * 1000 div tokens")
          .as("repeat_milli"),
        least(expr("(total_tokens div n_sources) * 1000 div tokens"),
          lit(4000L)).as("capped_milli"))
      .withColumn("effective_tokens",
        expr("tokens * capped_milli div 1000"))
      .withColumn("deficit_tokens",
        greatest(col("target_tokens") - col("effective_tokens"), lit(0L)))
      .orderBy(col("source"))
  }

  /** Modularity of the 3-round LPA partition (Newman & Girvan 2004,
    * Q = Σ_c [e_c/m − (d_c/2m)²]) over the co-purchase graph: per
    * community (top 25 by size), the intra-community edge count, the
    * degree mass, and the milli-modularity contribution — computed
    * with an explicit FLOOR division (shift-by-+10·den trick) because
    * per-community contributions CAN be negative and Spark's `div`
    * truncates toward zero while DuckDB's `//` floors. A TOTAL row
    * (community = -1) carries the whole partition's modularity over
    * ALL communities, not just the displayed 25.
    *
    * Scale: the 3 LPA rounds are the q_graph_labelprop join loop; the
    * modularity pass is two more equi-joins of the edge list against
    * the label table (both endpoints) plus community-level
    * aggregates. */
  val qGraphModularity: Q = (s, dir) => {
    val (e0, und, labels) = CorpusOps26.lpa3(s, dir)
    val lab = graft.CacheScope.track(
      labels.persist(StorageLevel.MEMORY_AND_DISK))
    val m = e0.agg(count(lit(1)).as("m"))
    // intra-community edges: both endpoints carry the same label
    val eIn = e0
      .join(lab.select(col("node").as("u"), col("label").as("lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community")).agg(count(lit(1)).as("e_in"))
    val dSum = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .join(lab.select(col("node").as("u"), col("label")), Seq("u"))
      .groupBy(col("label").as("community")).agg(sum(col("d")).as("d_sum"))
    val sizes = lab.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
    val per = sizes
      .join(dSum, Seq("community"))
      .join(eIn, Seq("community"), "left")
      .na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(m))
      // floor((4*m*e_in - d_sum^2) * 1000 / (4*m*m)) via the +10·den
      // shift: numerator can be negative, and floor == div only after
      // the shift makes it positive in BOTH engines
      .withColumn("q_milli", expr(
        """((4*m*e_in - d_sum*d_sum) * 1000 + 10 * (4*m*m))
           div (4*m*m) - 10"""))
    val total = per.agg(
      sum(col("n_nodes")).as("n_nodes"), sum(col("e_in")).as("e_in"),
      sum(col("d_sum")).as("d_sum"), sum(col("q_milli")).as("q_milli"))
      .select(lit(-1L).as("community"), col("n_nodes"), col("e_in"),
        col("d_sum"), col("q_milli"))
    per.orderBy(col("n_nodes").desc, col("community")).limit(25)
      .select(col("community"), col("n_nodes"), col("e_in"),
        col("d_sum"), col("q_milli"))
      .union(total)
      .orderBy(col("community"))
  }

  /** Welch's unequal-variance two-sample t-test (Welch, Biometrika
    * 1947) on the quality-classifier score split by the language
    * label: exact integer moment sums (n, Σx, Σx² per group), then t²
    * and the Welch–Satterthwaite df as single double expressions with
    * identical trees in both engines. The machine answer to "do en
    * and non-en docs score differently, and is the gap real" — the
    * parametric complement of the Mann-Whitney AUC already in the
    * eval family.
    *
    * Scale: the classifier scan is the only per-doc stage; the test
    * itself runs on a 2-row group table. */
  val qStatsTtest: Q = (s, dir) => {
    val g = CorpusOps10.scored(s, dir)
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("score_milli")).as("sx"),
        sum(col("score_milli") * col("score_milli")).as("sxx"))
    val p = g.filter(col("pos") === 1)
      .select(col("n").as("n1"), col("sx").as("s1"), col("sxx").as("ss1"))
    val q = g.filter(col("pos") === 0)
      .select(col("n").as("n0"), col("sx").as("s0"), col("sxx").as("ss0"))
    p.crossJoin(q)
      .withColumn("dmean", expr(
        "CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0"))
      .withColumn("se1", expr(
        """(CAST(n1 AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1)
           / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))"""))
      .withColumn("se0", expr(
        """(CAST(n0 AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)
           / (CAST(n0 AS DOUBLE) * n0 * (n0 - 1))"""))
      .select(col("n1"), col("n0"), col("dmean"),
        expr("dmean * dmean / (se1 + se0)").as("t2"),
        expr("""(se1 + se0) * (se1 + se0) /
                (se1 * se1 / (n1 - 1) + se0 * se0 / (n0 - 1))""")
          .as("welch_df"))
  }

  val queries: Map[String, Q] = Map(
    "q_mix_upsample" -> qMixUpsample,
    "q_graph_modularity" -> qGraphModularity,
    "q_stats_ttest" -> qStatsTtest)

  private[ops] val lpaRoundsSql = GraphOps.copurchaseCte + """,
      und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
      r1 AS (SELECT u AS node, label FROM (
               SELECT und.u, l.label,
                 row_number() OVER (PARTITION BY und.u
                   ORDER BY count(*) DESC, l.label ASC) AS rk
               FROM und JOIN l0 l ON und.v = l.node GROUP BY und.u, l.label)
             WHERE rk = 1),
      r2 AS (SELECT u AS node, label FROM (
               SELECT und.u, l.label,
                 row_number() OVER (PARTITION BY und.u
                   ORDER BY count(*) DESC, l.label ASC) AS rk
               FROM und JOIN r1 l ON und.v = l.node GROUP BY und.u, l.label)
             WHERE rk = 1),
      r3 AS (SELECT u AS node, label FROM (
               SELECT und.u, l.label,
                 row_number() OVER (PARTITION BY und.u
                   ORDER BY count(*) DESC, l.label ASC) AS rk
               FROM und JOIN r2 l ON und.v = l.node GROUP BY und.u, l.label)
             WHERE rk = 1)"""

  val oracle: Map[String, String] = Map(
    "q_mix_upsample" -> """
      WITH tok AS (SELECT source,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
            FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                CAST(count(*) AS BIGINT) AS n_sources
              FROM tok)
      SELECT source, tokens,
        total_tokens // n_sources AS target_tokens,
        (total_tokens // n_sources) * 1000 // tokens AS repeat_milli,
        least((total_tokens // n_sources) * 1000 // tokens, 4000)
          AS capped_milli,
        tokens * least((total_tokens // n_sources) * 1000 // tokens, 4000)
          // 1000 AS effective_tokens,
        greatest(total_tokens // n_sources
          - tokens * least((total_tokens // n_sources) * 1000 // tokens,
                           4000) // 1000, 0) AS deficit_tokens
      FROM tok CROSS JOIN tot ORDER BY source""",
    "q_graph_modularity" -> (lpaRoundsSql + """,
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
      ein AS (SELECT lu.label AS community, CAST(count(*) AS BIGINT)
                AS e_in
              FROM e0 JOIN r3 lu ON e0.u = lu.node
                      JOIN r3 lv ON e0.v = lv.node
              WHERE lu.label = lv.label GROUP BY 1),
      ds AS (SELECT l.label AS community, CAST(sum(d.d) AS BIGINT)
               AS d_sum
             FROM (SELECT u, CAST(count(*) AS BIGINT) AS d
                   FROM und GROUP BY 1) d
             JOIN r3 l ON d.u = l.node GROUP BY 1),
      sz AS (SELECT label AS community, CAST(count(*) AS BIGINT)
               AS n_nodes
             FROM r3 GROUP BY 1),
      per AS (SELECT sz.community, sz.n_nodes,
                coalesce(ein.e_in, 0) AS e_in, ds.d_sum,
                ((4*m.m*coalesce(ein.e_in, 0) - ds.d_sum*ds.d_sum) * 1000
                  + 10 * (4*m.m*m.m)) // (4*m.m*m.m) - 10 AS q_milli
              FROM sz JOIN ds USING (community)
                      LEFT JOIN ein USING (community)
                      CROSS JOIN m),
      top AS (SELECT * FROM per
              ORDER BY n_nodes DESC, community LIMIT 25),
      total AS (SELECT CAST(-1 AS BIGINT) AS community,
                  CAST(sum(n_nodes) AS BIGINT) AS n_nodes,
                  CAST(sum(e_in) AS BIGINT) AS e_in,
                  CAST(sum(d_sum) AS BIGINT) AS d_sum,
                  CAST(sum(q_milli) AS BIGINT) AS q_milli
                FROM per)
      SELECT community, n_nodes, e_in, d_sum, q_milli FROM top
      UNION ALL
      SELECT community, n_nodes, e_in, d_sum, q_milli FROM total
      ORDER BY community"""),
    "q_stats_ttest" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      g AS (SELECT pos, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(score_milli) AS BIGINT) AS sx,
              CAST(sum(score_milli * score_milli) AS BIGINT) AS sxx
            FROM scored GROUP BY 1),
      p AS (SELECT n AS n1, sx AS s1, sxx AS ss1 FROM g WHERE pos = 1),
      q AS (SELECT n AS n0, sx AS s0, sxx AS ss0 FROM g WHERE pos = 0),
      t AS (SELECT n1, n0,
              CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS dmean,
              (CAST(n1 AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1)
                / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) AS se1,
              (CAST(n0 AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)
                / (CAST(n0 AS DOUBLE) * n0 * (n0 - 1)) AS se0
            FROM p CROSS JOIN q)
      SELECT n1, n0, dmean,
        dmean * dmean / (se1 + se0) AS t2,
        (se1 + se0) * (se1 + se0) /
          (se1 * se1 / (n1 - 1) + se0 * se0 / (n0 - 1)) AS welch_df
      FROM t""")
}

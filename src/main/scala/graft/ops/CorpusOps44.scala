package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r12 wave 32 (SURVEY.md §2.M): the
  * unbiased pass@k estimator (Chen et al., "Evaluating Large Language
  * Models Trained on Code", 2021 — the HumanEval metric) over
  * per-source sample pools, and distinct-n lexical diversity (Li et
  * al., NAACL 2016) — two eval-pipeline staples.
  *
  * Determinism: pass@k's estimator 1 − C(n−c,k)/C(n,k) is computed as
  * the exact falling-factorial ratio Π_{i<k}(n−c−i) / Π_{i<k}(n−i) in
  * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact for n up to ~10⁷
  * at k = 5 (beyond that a deployment moves the product to log space;
  * the fixture and any per-source sample pool sit far below);
  * negative factors clamp to 0 (c > n−k ⇒ pass@k = 1). "Success" is
  * the deterministic global-mean cut: score·n_all > sum_all, exact by
  * cross-multiplication.
  */
object CorpusOps44 {

  /** pass@k per source, k ∈ {1, 2, 5}: treat each source as a task
    * and its docs as n sampled attempts; an attempt passes when its
    * classifier score beats the corpus mean (exact integer cut). The
    * unbiased estimator uses the falling-factorial form above — NOT
    * the naive (c/n)ᵏ-style plug-in, which is biased for small n
    * (Chen et al. 2021, §2.1).
    *
    * Scale: one classifier scan (the only per-doc work) → |sources|
    * rows; the combinatorics are per-row column arithmetic. */
  val qEvalPassAtK: Q = (s, dir) => {
    val sc = CorpusOps10.scored(s, dir)
      .join(Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
    val scp = graft.CacheScope.track(sc.persist())
    val tot = scp.agg(count(lit(1)).as("n_all"),
      sum(col("score_milli")).as("s_all"))
    val agg = scp.crossJoin(broadcast(tot))
      .select(col("source"),
        when(col("score_milli") * col("n_all") > col("s_all"), 1L)
          .otherwise(0L).as("ok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("c"))
    agg.select(col("source"), col("n"), col("c"),
        expr(passKExpr(1)).as("pass1_permille"),
        expr(passKExpr(2)).as("pass2_permille"),
        expr(passKExpr(5)).as("pass5_permille"))
      .orderBy(col("source"))
  }

  /** pass@k permille over columns `n` (attempts) and `c` (passes).
    * n < k guard: the falling-factorial denominator n·(n-1)···(n-k+1)
    * contains a zero factor, so the unguarded form silently NULLs.
    * Contract: with fewer than k attempts every k-subset is the whole
    * pool, so pass@k = 1 ⟺ any attempt passed, else 0 (the c = 0
    * numerator path already yields 0 via the greatest() clamp, but
    * only the explicit CASE keeps the denominator off the zero).
    * Package-visible so the n < k fixture spec can exercise the guard
    * directly (the corpus pools all hold ≥ 25 attempts). */
  private[graft] def passKExpr(k: Int, n: String = "n",
      c: String = "c"): String = {
    val num = (0 until k)
      .map(i => s"CAST(greatest($n - $c - $i, 0) AS DECIMAL(38,0))")
      .mkString(" * ")
    val den = (0 until k)
      .map(i => s"CAST($n - $i AS DECIMAL(38,0))")
      .mkString(" * ")
    s"CAST(CASE WHEN $n < $k THEN (CASE WHEN $c > 0 THEN 1000 ELSE 0" +
      s" END) ELSE 1000 - (1000 * $num) div ($den) END AS BIGINT)"
  }

  /** Distinct-n lexical diversity per source (Li et al., "A
    * Diversity-Promoting Objective Function for Neural Conversation
    * Models", NAACL 2016): distinct unigrams / total tokens and
    * distinct bigrams / total bigrams, in permille — the degenerate-
    * text tripwire (mode collapse / boilerplate floods crater
    * distinct-2 long before eyeballs catch them).
    *
    * Scale: two partial-aggregated (source, gram) counts — the gram
    * stream never shuffles wider than the distinct vocab per source. */
  val qTextDistinctN: Q = (s, dir) => {
    val toks = Tables(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("t"))
    val uni = toks
      .select(col("source"), explode(col("t")).as("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("tokens"),
        count_distinct(col("g")).as("distinct1"))
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(t) - 1),
           i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""))
        .as("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("bigrams"),
        count_distinct(col("g")).as("distinct2"))
    uni.join(bi, Seq("source"))
      .select(col("source"), col("tokens"), col("distinct1"),
        col("bigrams"), col("distinct2"),
        expr("distinct1 * 1000 div tokens").as("d1_permille"),
        expr("distinct2 * 1000 div bigrams").as("d2_permille"))
      .orderBy(col("source"))
  }

  /** Unbiased best-of-n score estimation (the WebGPT/BoN discipline —
    * Nakano et al. 2021 appendix; Stiennon et al. 2020): for each
    * candidate pool, E[max score among a uniform n-subset] has the
    * closed form Σᵢ score₍ᵢ₎ · C(i−1, n−1) / C(m, n) over the
    * ascending order statistics — the rejection-sampling value a
    * preference pipeline reads before paying for n samples per
    * prompt. Pools = up to 16 docs per (source, doc_id div 320)
    * window (dense per-source 16-pools under the fixture's
    * round-robin source assignment); n ∈ {1, 2, 4}; pools smaller
    * than n take the pool max (every n-subset is the whole pool —
    * the pass@k n < k contract). All arithmetic exact: the binomial
    * weights are tiny (C(15, 3) = 455), per-group sums fit Long with
    * 10⁵× headroom, floor division only at the two declared points.
    *
    * Scale: one classifier scan; the order-statistic window runs per
    * 16-row pool (never global); the rollup is |sources| rows. */
  val qEvalBestOfN: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val sc = CorpusOps10.scored(s, dir)
      .join(Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), expr("doc_id div 320").as("grp"),
        col("score_milli").as("sc"), col("doc_id"))
    val w = Window.partitionBy(col("source"), col("grp"))
      .orderBy(col("sc"), col("doc_id"))
    val g = sc.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("source"), col("grp"))
      .agg(count(lit(1)).as("m"), max(col("sc")).as("mx"),
        sum(col("sc")).as("s1"),
        sum(col("sc") * (col("i") - 1)).as("s2"),
        sum(col("sc") *
          expr("(i-1) * (i-2) * (i-3) div 6")).as("s4"))
    val e = g.select(col("source"), col("m"),
      expr("s1 div m").as("e1"),
      when(col("m") >= 2, expr("s2 div (m * (m-1) div 2)"))
        .otherwise(col("mx")).as("e2"),
      when(col("m") >= 4,
          expr("s4 div (m * (m-1) * (m-2) * (m-3) div 24)"))
        .otherwise(col("mx")).as("e4"))
    e.groupBy(col("source"))
      .agg(count(lit(1)).as("n_groups"), sum(col("m")).as("attempts"),
        expr("sum(e1) div count(1)").as("bo1_milli"),
        expr("sum(e2) div count(1)").as("bo2_milli"),
        expr("sum(e4) div count(1)").as("bo4_milli"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_eval_pass_at_k" -> qEvalPassAtK,
    "q_eval_best_of_n" -> qEvalBestOfN,
    "q_text_distinct_n" -> qTextDistinctN)

  private def passKSql(k: Int): String = {
    val num = (0 until k)
      .map(i => s"CAST(greatest(n - c - $i, 0) AS HUGEINT)")
      .mkString(" * ")
    val den = (0 until k)
      .map(i => s"CAST(n - $i AS HUGEINT)")
      .mkString(" * ")
    // n < k guard mirrors the Spark expression exactly (see qEvalPassAtK)
    s"CAST(CASE WHEN n < $k THEN (CASE WHEN c > 0 THEN 1000 ELSE 0 END)" +
      s" ELSE 1000 - (1000 * $num) // ($den) END AS BIGINT)"
  }

  val oracle: Map[String, String] = Map(
    "q_eval_best_of_n" -> s"""
      WITH scored AS MATERIALIZED (${CorpusOps10.scoredSql}),
      sc AS (SELECT d.source, d.doc_id // 320 AS grp,
               s.score_milli AS sc, d.doc_id
             FROM scored s JOIN documents d USING (doc_id)),
      rk AS (SELECT source, grp, sc,
               CAST(row_number() OVER (PARTITION BY source, grp
                 ORDER BY sc, doc_id) AS BIGINT) AS i
             FROM sc),
      g AS (SELECT source, grp, CAST(count(*) AS BIGINT) AS m,
              CAST(max(sc) AS BIGINT) AS mx,
              CAST(sum(sc) AS BIGINT) AS s1,
              CAST(sum(sc * (i - 1)) AS BIGINT) AS s2,
              CAST(sum(sc * ((i-1) * (i-2) * (i-3) // 6)) AS BIGINT)
                AS s4
            FROM rk GROUP BY 1, 2),
      e AS (SELECT source, m,
              s1 // m AS e1,
              CASE WHEN m >= 2 THEN s2 // (m * (m-1) // 2)
                   ELSE mx END AS e2,
              CASE WHEN m >= 4
                   THEN s4 // (m * (m-1) * (m-2) * (m-3) // 24)
                   ELSE mx END AS e4
            FROM g)
      SELECT source, CAST(count(*) AS BIGINT) AS n_groups,
        CAST(sum(m) AS BIGINT) AS attempts,
        CAST(sum(e1) // count(*) AS BIGINT) AS bo1_milli,
        CAST(sum(e2) // count(*) AS BIGINT) AS bo2_milli,
        CAST(sum(e4) // count(*) AS BIGINT) AS bo4_milli
      FROM e GROUP BY source ORDER BY source""",
    "q_eval_pass_at_k" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                CAST(sum(score_milli) AS BIGINT) AS s_all FROM scored),
      sc AS (SELECT d.source,
               CASE WHEN s.score_milli * (SELECT n_all FROM tot)
                    > (SELECT s_all FROM tot) THEN 1 ELSE 0 END AS ok
             FROM scored s JOIN documents d USING (doc_id)),
      agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(ok) AS BIGINT) AS c
              FROM sc GROUP BY 1)
      SELECT source, n, c,
        ${passKSql(1)} AS pass1_permille,
        ${passKSql(2)} AS pass2_permille,
        ${passKSql(5)} AS pass5_permille
      FROM agg ORDER BY source""",
    "q_text_distinct_n" -> """
      WITH toks AS (SELECT source, string_split(text, ' ') AS t
                    FROM documents),
      uni AS (SELECT source, CAST(count(*) AS BIGINT) AS tokens,
                CAST(count(DISTINCT g) AS BIGINT) AS distinct1
              FROM (SELECT source, unnest(t) AS g FROM toks)
              GROUP BY 1),
      bi AS (SELECT source, CAST(count(*) AS BIGINT) AS bigrams,
               CAST(count(DISTINCT g) AS BIGINT) AS distinct2
             FROM (SELECT source,
                     unnest(list_transform(range(1, len(t)),
                       i -> t[i] || ' ' || t[i + 1])) AS g
                   FROM toks WHERE len(t) >= 2)
             GROUP BY 1)
      SELECT source, tokens, distinct1, bigrams, distinct2,
        distinct1 * 1000 // tokens AS d1_permille,
        distinct2 * 1000 // bigrams AS d2_permille
      FROM uni JOIN bi USING (source) ORDER BY source""")
}

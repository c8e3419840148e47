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
  private[graft] def passKExpr(k: Int): String = {
    val num = (0 until k)
      .map(i => s"CAST(greatest(n - c - $i, 0) AS DECIMAL(38,0))")
      .mkString(" * ")
    val den = (0 until k)
      .map(i => s"CAST(n - $i AS DECIMAL(38,0))")
      .mkString(" * ")
    s"CAST(CASE WHEN n < $k THEN (CASE WHEN c > 0 THEN 1000 ELSE 0 END)" +
      s" ELSE 1000 - (1000 * $num) div ($den) END AS BIGINT)"
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

  val queries: Map[String, Q] = Map(
    "q_eval_pass_at_k" -> qEvalPassAtK,
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

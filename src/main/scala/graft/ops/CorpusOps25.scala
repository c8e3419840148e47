package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 9 (SURVEY.md §2.D/§2.L/§2.M):
  * association rules over the market-basket pairs, a deterministic
  * statistical mode, the l-diversity publish audit that complements
  * k-anonymity, and quality-curriculum data ordering.
  *
  * Determinism contract as the other r10 waves: exact integer
  * arithmetic (permille/micro fixed-point), total ORDER BY, ties
  * broken by key columns.
  */
object CorpusOps25 {

  /** Association rules (Agrawal & Srikant, "Fast algorithms for mining
    * association rules", VLDB 1994) over the same deduped
    * (order, part) baskets as q_basket_pairs: each supported pair
    * {a, b} yields BOTH directed rules a→b and b→a, scored by
    * confidence (permille of a-baskets that also hold b) and lift
    * (micro-ratio of observed co-rate to independence). The top-20 by
    * (confidence, lift) is the actionable rule list; lift is direction-
    * symmetric but confidence is not — the asymmetry is the point of
    * rules vs pairs.
    *
    * Scale: identical candidate shape to q_basket_pairs — the pair
    * fan-out partial-aggregates on (pa, pb) BEFORE the support prune,
    * item counts and the basket total are broadcast, and the rule
    * doubling happens after the prune on the tiny rule table. */
  val qBasketRules: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val liP = graft.CacheScope.track(
      li.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nOrders = liP.agg(
      countDistinct(col("l_orderkey")).as("n_orders"))
    val itemCnt = liP.groupBy(col("l_partkey").as("p"))
      .agg(count(lit(1)).as("cnt"))
    val pairs = liP.as("a")
      .join(liP.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 2)
    // explode both rule directions from ONE pair stream (optimization
    // r17): the union of two projections duplicated the pair fan-out's
    // post-shuffle aggregation across the branches (the shuffle itself
    // was exchange-reused; the final agg + support prune over the
    // candidate pairs was not). Same multiset, one pass.
    val rules = pairs
      .select(explode(array(
          struct(col("pa").as("antecedent"), col("pb").as("consequent")),
          struct(col("pb").as("antecedent"), col("pa").as("consequent"))))
          .as("r"),
        col("supp"))
      .select(col("r.antecedent"), col("r.consequent"), col("supp"))
    rules
      .join(broadcast(itemCnt.as("ca")),
        col("antecedent") === col("ca.p"))
      .join(broadcast(itemCnt.as("cb")),
        col("consequent") === col("cb.p"))
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("supp"),
        expr("supp * 1000 div `ca`.cnt").as("conf_permille"),
        expr("(supp * n_orders * 1000000L) div " +
          "(`ca`.cnt * `cb`.cnt)").as("lift_micro"))
      .orderBy(col("conf_permille").desc, col("lift_micro").desc,
        col("antecedent"), col("consequent"))
      .limit(20)
      .orderBy(col("antecedent"), col("consequent"))
  }

  /** Deterministic statistical mode per group — the multi-modal
    * tie broken to the SMALLEST value, so the answer is a function of
    * the data, not the execution order (Spark's own `mode` and
    * DuckDB's leave ties unspecified; neither engine's builtin is
    * hash-stable under shuffle, which is why this spells the arg-max
    * explicitly). Emits the mode of l_linenumber per return flag with
    * its frequency, share, and the group's distinct-value count.
    *
    * Scale: two partial-aggregable hash aggregates — (flag, value)
    * counts, then one max(struct) arg-max per flag. No windows, no
    * sorts beyond the 3-row output. */
  val qAggMode: Q = (s, dir) => {
    val c = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linenumber").as("v"))
      .agg(count(lit(1)).as("cnt"))
    c.groupBy(col("l_returnflag"))
      .agg(max(struct(col("cnt"), (-col("v")).as("negv"))).as("mx"),
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct"))
      .select(col("l_returnflag"),
        (-col("mx.negv")).cast("long").as("mode_val"),
        col("mx.cnt").as("mode_cnt"),
        col("n_distinct"),
        expr("`mx`.cnt * 1000 div n_rows").as("share_permille"))
      .orderBy(col("l_returnflag"))
  }

  /** Distinct-l-diversity audit (Machanavajjhala et al., "l-diversity:
    * privacy beyond k-anonymity", ICDE 2006) over the publish
    * quasi-identifier groups of q_privacy_kanon, with `lang` as the
    * sensitive attribute: a group where every doc shares one language
    * leaks the sensitive value even when it is k-anonymous. Emits per
    * QI group (source, 100-char length bucket) the size, the distinct
    * sensitive count l, the majority-language share, and the
    * well-diverse gate (l >= 2 AND majority <= 800 permille — the
    * simplified recursive-(c,l) test).
    *
    * Scale: the corpus collapses to (QI, lang) cardinalities in one
    * partial-aggregated scan; everything after runs on group rows. */
  val qPrivacyLdiversity: Q = (s, dir) => {
    val g = Tables(s, dir, "documents")
      .select(col("source"), expr("n_chars div 100").as("len_bucket"),
        col("lang"))
      .groupBy(col("source"), col("len_bucket"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
    g.groupBy(col("source"), col("len_bucket"))
      .agg(sum(col("cnt")).as("n_docs"),
        count(lit(1)).as("l_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(col("source"), col("len_bucket"), col("n_docs"),
        col("l_distinct"),
        expr("top_cnt * 1000 div n_docs").as("majority_permille"),
        (col("l_distinct") >= 2 &&
          expr("top_cnt * 1000 div n_docs") <= 800).as("is_diverse"))
      .orderBy(col("source"), col("len_bucket"))
  }

  /** Quality-curriculum data ordering (curriculum learning per Bengio
    * et al., ICML 2009, as applied to corpus scheduling): rank docs
    * within each source by the q_quality_classifier score, then
    * interleave sources round-robin — round r serves every source's
    * r-th best doc — so early training batches are high-quality AND
    * source-balanced. Emits the first 100 curriculum positions.
    *
    * Scale: the per-source rank is NOT a per-source window (a handful
    * of 100-TB sources would each be a single-partition sort); it is
    * the global [[ScaleWindows.bucketedRowNumber]] under
    * (source, score DESC, doc_id) — bucketed by a source-major
    * composite key, so parallelism follows bucket count, not source
    * count — minus each source's broadcast base rank. */
  val qCurriculumOrder: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents").select(col("doc_id"),
      col("source"), expr("CAST(substr(source, 4) AS INT)").as("srcnum"))
    val df = CorpusOps10.scored(s, dir).select(col("doc_id"),
      col("score_milli")).join(docs, Seq("doc_id"))
    // order-monotone composite bucket: source-major, then coarse
    // descending-score bands (score_milli <= ~2e6, so div 4096 keeps
    // the per-source band count ~500 — bounded, broadcastable)
    val bucket = col("srcnum").cast("long") * 1000000L -
      expr("score_milli div 4096")
    val ranked = ScaleWindows.bucketedRowNumber(df, bucket, false,
      Seq(col("srcnum").asc, col("score_milli").desc, col("doc_id").asc),
      "grn")
    val base = ranked.groupBy(col("source").as("src_b"))
      .agg(min(col("grn")).as("base"))
    ranked.join(broadcast(base), col("source") === col("src_b"))
      .select((col("grn") - col("base") + 1).as("round"),
        col("source"), col("srcnum"), col("doc_id"), col("score_milli"))
      .orderBy(col("round"), col("srcnum"))
      .limit(100)
      .select(col("round"), col("source"), col("doc_id"),
        col("score_milli"))
      .orderBy(col("round"), col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_basket_rules" -> qBasketRules,
    "q_agg_mode" -> qAggMode,
    "q_privacy_ldiversity" -> qPrivacyLdiversity,
    "q_curriculum_order" -> qCurriculumOrder)

  val oracle: Map[String, String] = Map(
    "q_basket_rules" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
      ic AS (SELECT l_partkey AS p, count(*) AS cnt FROM li GROUP BY 1),
      pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS supp
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      rules AS (
        SELECT pa AS antecedent, pb AS consequent, supp FROM pairs
        UNION ALL
        SELECT pb AS antecedent, pa AS consequent, supp FROM pairs),
      t AS (
        SELECT antecedent, consequent, supp,
          CAST(supp * 1000 // ca.cnt AS BIGINT) AS conf_permille,
          CAST((supp * n.n_orders * 1000000) // (ca.cnt * cb.cnt)
            AS BIGINT) AS lift_micro
        FROM rules JOIN ic ca ON rules.antecedent = ca.p
                   JOIN ic cb ON rules.consequent = cb.p
                   CROSS JOIN n
        ORDER BY conf_permille DESC, lift_micro DESC,
          antecedent, consequent LIMIT 20)
      SELECT antecedent, consequent, supp, conf_permille, lift_micro
      FROM t ORDER BY antecedent, consequent""",
    "q_agg_mode" -> """
      WITH c AS (SELECT l_returnflag, l_linenumber AS v, count(*) AS cnt
                 FROM lineitem GROUP BY 1, 2),
      m AS (SELECT l_returnflag, v, cnt,
              row_number() OVER (PARTITION BY l_returnflag
                ORDER BY cnt DESC, v ASC) AS rk
            FROM c),
      g AS (SELECT l_returnflag, CAST(sum(cnt) AS BIGINT) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_distinct
            FROM c GROUP BY 1)
      SELECT m.l_returnflag, CAST(m.v AS BIGINT) AS mode_val,
        m.cnt AS mode_cnt, g.n_distinct,
        CAST(m.cnt * 1000 // g.n_rows AS BIGINT) AS share_permille
      FROM m JOIN g USING (l_returnflag)
      WHERE m.rk = 1 ORDER BY m.l_returnflag""",
    "q_privacy_ldiversity" -> """
      WITH g AS (SELECT source, n_chars // 100 AS len_bucket, lang,
                   count(*) AS cnt
                 FROM documents GROUP BY 1, 2, 3)
      SELECT source, len_bucket,
        CAST(sum(cnt) AS BIGINT) AS n_docs,
        CAST(count(*) AS BIGINT) AS l_distinct,
        CAST(max(cnt) * 1000 // sum(cnt) AS BIGINT) AS majority_permille,
        count(*) >= 2 AND max(cnt) * 1000 // sum(cnt) <= 800
          AS is_diverse
      FROM g GROUP BY 1, 2 ORDER BY source, len_bucket""",
    "q_curriculum_order" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      d AS (SELECT s.doc_id, s.score_milli, doc.source,
              CAST(substr(doc.source, 4) AS INT) AS srcnum
            FROM scored s JOIN documents doc USING (doc_id)),
      r AS (SELECT doc_id, score_milli, source, srcnum,
              row_number() OVER (PARTITION BY source
                ORDER BY score_milli DESC, doc_id) AS round
            FROM d),
      t AS (SELECT CAST(round AS BIGINT) AS round, source, doc_id,
              score_milli
            FROM r ORDER BY round, srcnum LIMIT 100)
      SELECT round, source, doc_id, score_milli
      FROM t ORDER BY round, source""")
}

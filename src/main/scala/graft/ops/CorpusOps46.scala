package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + similarity operators, r15 wave 35 (SURVEY.md §2.M):
  * exact-substring duplication profiling (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022 — the
  * ExactSubstr criterion), greedy k-center seeding (Gonzalez 1985 —
  * the farthest-point init k-means++/coreset pipelines start from),
  * interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
  * KenLM smoothing CCNet-style filters upgrade to from add-one), and
  * a label-supervised retrieval recall@k eval (the BEIR-style check a
  * pipeline runs on an embedding model before trusting its ANN
  * index).
  *
  * Determinism contract: exact int64/DECIMAL(38,0) arithmetic with
  * floor division at declared points; IEEE doubles only from
  * identical expression trees in both engines (cosines, log2 of
  * shared integers) with rank-deterministic tie-breaks.
  */
object CorpusOps46 {

  /** Exact-substring duplication profile (Lee et al. 2022): a
    * document's token positions covered by any L = 8-token window
    * that occurs ≥ 2 times ANYWHERE in the corpus (including within
    * the same document — the ExactSubstr criterion dedups
    * self-repetition too). Reports per doc the covered-token count
    * and permille — the signal the paper's suffix-array pass feeds a
    * span-cut step with; the profile is the decision table (which
    * docs, how much) without the destructive cut.
    *
    * Determinism: windows are hashed to the 60-bit md5-prefix bridge
    * (identical integers in both engines); coverage is the exact
    * interval union Σ min(L, next_pos − pos) over each doc's sorted
    * duplicated positions.
    *
    * Scale: one corpus scan fans out one gram per token position
    * (fixed-width 60-bit keys, map-side partial agg); the ≥2 filter
    * and the position semi-join shuffle on the gram hash —
    * co-partitioned, never broadcast (duplicated-gram volume grows
    * with the corpus); the coverage window partitions by doc_id. A
    * 64-bit-hash collision can mark a false duplicate at ~2⁻⁶⁰ rate —
    * the q_dedup_minhash banding caveat, documented not hidden. */
  val qDedupSubstring: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val L = 8
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val g = graft.CacheScope.track(toks
      .filter(size(col("t")) >= L)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(t) - ${L - 1}),
            i -> struct(CAST(i AS BIGINT) AS pos,
                        CAST(conv(substring(md5(concat_ws(' ',
                          slice(t, i, $L))), 1, 15), 16, 10) AS BIGINT)
                          AS h))""")).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.h").as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dup = g.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cov = g.join(dup, Seq("h"), "left_semi")
      .withColumn("nxt", lead(col("pos"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(sum(least(lit(L.toLong),
        coalesce(col("nxt") - col("pos"), lit(L.toLong)))).as("dup"))
    toks.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_permille", expr("dup_tokens * 1000 div n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Greedy k-center seeding (Gonzalez, "Clustering to minimize the
    * maximum intercluster distance", TCS 1985): start from the
    * lowest-id vector, then k − 1 rounds of "take the point farthest
    * from every chosen center" — the 2-approximation farthest-point
    * init that seeds k-means++/coreset/IVF-retrain pipelines. Emits
    * (round, center_id, radius_d2): the radius column is the max-min
    * squared distance BEFORE that center joined — the coverage-radius
    * curve a capacity planner reads (it is non-increasing by
    * construction, pinned in Wave35Spec).
    *
    * Determinism: exact int64 d² on the micro-quantized components;
    * argmax ties break to the lower vec_id.
    *
    * Scale: the running min-d² table carries (vec_id, q, n2, md) and
    * each round is ONE map-side `least` rewrite against the collected
    * center vector (a typedLit literal — the rebalance's bounded-
    * scalar scheduler discipline: 1-row argmax collect + 1-row vector
    * fetch per round, plan linear in rounds, no joins at all after
    * the seed scan). k scans of the corpus total. */
  val qSimKcenter: Q = (s, dir) => {
    val k = 8
    val emb = graft.CacheScope.track(EmbQuant.quantized(s, dir)
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("n2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def d2To(vec: Seq[Long], vn2: Long) =
      col("n2") + lit(vn2) -
        lit(2L) * EmbQuant.dotq(col("q"), typedLit(vec))
    val seed = emb.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("q"), col("n2")).collect()(0)
    var md = graft.CacheScope.track(emb
      .select(col("vec_id"), col("q"), col("n2"),
        d2To(seed.getSeq[Long](1), seed.getLong(2)).as("md"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val picks = scala.collection.mutable
      .Buffer[(Long, Long, Long)]((0L, seed.getLong(0), 0L))
    for (r <- 1 until k) {
      val top = md.orderBy(col("md").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("md"), col("q"), col("n2"))
        .collect()(0)
      picks += ((r.toLong, top.getLong(0), top.getLong(1)))
      md = graft.CacheScope.track(md
        .select(col("vec_id"), col("q"), col("n2"),
          least(col("md"),
            d2To(top.getSeq[Long](2), top.getLong(3))).as("md"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    import s.implicits._
    picks.toSeq.toDF("round", "center_id", "radius_d2")
      .orderBy(col("round"))
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney, ICASSP
    * 1995; Chen & Goodman 1999 §3 — the KenLM default a CCNet-style
    * perplexity filter graduates to from add-one): P(w2|w1) =
    * max(c12 − D, 0)/c1 + D·N1+(w1·)/c1 · Pcont(w2) with D = 3/4 and
    * the continuation probability Pcont = (N1+(·w2) + 1)/(N1+(··) +
    * V) (add-one-smoothed so unseen events stay finite; an unseen
    * CONTEXT backs off to Pcont alone). Trained on the trusted src0
    * slice, scores every other document — the q_text_perplexity
    * upgrade that stops over-penalizing rare-but-valid continuations.
    *
    * Determinism: with D = 3/4 the probability is the exact integer
    * ratio [max(4·c12 − 3, 0)·(Nbb + V) + 3·N1p·(N1m + 1)] /
    * [4·c1·(Nbb + V)]; the numerator rides DECIMAL(38,0)/HUGEINT
    * (both engines convert the same integer to the same IEEE double
    * for one log2), the denominator decomposes into per-term
    * fixed-point logs — the micro-bits discipline, so per-doc sums
    * are shuffle-order-invariant.
    *
    * Scale: the LM tables (c12/c1/N1m) ride the
    * `spark.graft.lm.broadcastTypeLimit` measured-cardinality gate
    * exactly like q_text_perplexity/q_select_rho (bigram types grow
    * with the corpus); the 1-row Nbb/V frames stay broadcast; per-doc
    * scores partial-aggregate. */
  val qTextKneserNey: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val bg = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("source"),
        explode(when(size(col("t")) >= 2,
          expr("""transform(sequence(1, size(t) - 1),
                  i -> struct(element_at(t, i) as w1,
                              element_at(t, i + 1) as w2))"""))
          .otherwise(array())).as("b"))
      .select(col("doc_id"), col("source"), col("b.w1"), col("b.w2"))
    val c12 = graft.CacheScope.track(
      bg.filter(col("source") === "src0")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val lmLimit = AutoBroadcast.limit(
      s, "spark.graft.lm.broadcastTypeLimit", 2000000L)
    val nTypes = c12.count()
    // c1 = context totals, n1p = distinct continuations of w1; n1m =
    // distinct contexts of w2 — all marginals of the persisted c12
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val n1m = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1m"))
    val gl = c12.agg(count(lit(1)).as("nbb"))
    val v = docs.filter(col("source") === "src0")
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bg.filter(col("source") =!= "src0")
      .join(AutoBroadcast.gate(c12, nTypes, lmLimit),
        Seq("w1", "w2"), "left")
      .join(AutoBroadcast.gate(c1, nTypes, lmLimit), Seq("w1"), "left")
      .join(AutoBroadcast.gate(n1m, nTypes, lmLimit), Seq("w2"), "left")
      .crossJoin(broadcast(gl)).crossJoin(broadcast(v))
      .withColumn("bits_micro", expr(
        """CASE WHEN c1 IS NOT NULL THEN
             CAST(round(log2(4 * c1) * 1e6) AS BIGINT)
             + CAST(round(log2(nbb + v) * 1e6) AS BIGINT)
             - CAST(round(log2(CAST(
                 CAST(greatest(4 * coalesce(c12, 0) - 3, 0)
                      AS DECIMAL(38,0)) * (nbb + v)
                 + CAST(3 * n1p AS DECIMAL(38,0))
                   * (coalesce(n1m, 0) + 1) AS DOUBLE)) * 1e6)
                 AS BIGINT)
           ELSE
             CAST(round(log2(nbb + v) * 1e6) AS BIGINT)
             - CAST(round(log2(coalesce(n1m, 0) + 1) * 1e6) AS BIGINT)
           END"""))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits_micro")).as("kn_nll_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("kn_nll_micro"),
        expr("kn_nll_micro div n_bigrams").as("bits_per_bigram_micro"))
      .orderBy(col("doc_id"))
  }

  /** Label-supervised retrieval recall@10 — the eval a pipeline runs
    * on an embedding model before trusting its ANN index (the
    * BEIR/MTEB retrieval-metric shape with the corpus's own labels as
    * relevance): for each of the 50 lowest-id query vectors,
    * brute-force cosine top-10 over the whole corpus (self excluded),
    * a hit = neighbor sharing the query's label; per label, recall =
    * Σ hits / Σ min(10, |label| − 1) in permille (the attainable-hit
    * normalizer: a 4-member class can contribute at most 3).
    *
    * Determinism: exact int64 dots; cosines are identical IEEE
    * expression trees; top-10 ties break on the candidate id.
    *
    * Scale: the bounded query set broadcasts, candidates STREAM (one
    * pass, no candidate-side shuffle — the q_sim_topk baseline
    * shape); per-query top-10 is a bounded window; the class-size
    * normalizer is a |labels|-row broadcast. */
  val qEvalRetrievalRecall: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.CacheScope.track(EmbQuant.quantized(s, dir)
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("label").as("ql"),
        col("q").as("qq"), col("n2").as("qn2"))
    val sc = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("ql"), col("label").as("cl"),
        col("vec_id").as("cid"),
        (EmbQuant.dotq(col("q"), col("qq")).cast("double") /
          (sqrt(col("n2").cast("double")) *
            sqrt(col("qn2").cast("double")))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    val per = sc.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .groupBy(col("qid"), col("ql"))
      .agg(sum(when(col("ql") === col("cl"), 1L).otherwise(0L))
        .as("qhits"))
    val cls = emb.groupBy(col("label")).agg(count(lit(1)).as("nlab"))
    per.join(broadcast(cls), per("ql") === cls("label"))
      .groupBy(col("ql"))
      .agg(count(lit(1)).as("n_queries"), sum(col("qhits")).as("hits"),
        sum(least(lit(10L), col("nlab") - 1)).as("den"))
      .select(col("ql").cast("long").as("label"), col("n_queries"),
        col("hits"), expr("hits * 1000 div den")
          .as("recall_at10_permille"))
      .orderBy(col("label"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_substring" -> qDedupSubstring,
    "q_sim_kcenter" -> qSimKcenter,
    "q_text_kneser_ney" -> qTextKneserNey,
    "q_eval_retrieval_recall" -> qEvalRetrievalRecall)

  /** [[graft.ops.Similarity.quantSql]] with the label carried — the
    * retrieval-recall oracle needs it for relevance. */
  private val quantLabelSql =
    "SELECT vec_id, label, r.i AS i, CAST(round(CAST(embedding[r.i] " +
      "AS DOUBLE) * 1000000) AS BIGINT) AS v " +
      "FROM embeddings, range(1, 65) r(i)"

  /** One unrolled k-center round for the q_sim_kcenter oracle: pick
    * the argmax of md{r−1} (ties to the lower vec_id), then fold the
    * distance to the picked center into md{r}. MATERIALIZED is
    * load-bearing (the unrolled-chain lesson of r12/r14). */
  private def kcenterRoundSql(r: Int): String = {
    val p = r - 1
    s"""
      pk$r AS MATERIALIZED (SELECT vec_id AS c, md AS radius FROM md$p
                ORDER BY md DESC, vec_id LIMIT 1),
      md$r AS MATERIALIZED (SELECT m.vec_id, least(m.md, d.d2) AS md
               FROM md$p m JOIN
                 (SELECT a.vec_id,
                    CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
                  FROM e a JOIN e b ON b.vec_id = (SELECT c FROM pk$r)
                    AND b.i = a.i
                  GROUP BY 1) d USING (vec_id))"""
  }

  val oracle: Map[String, String] = Map(
    "q_dedup_substring" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents),
      g AS (SELECT doc_id, i AS pos,
              CAST('0x' || substring(md5(
                list_aggr(a[i:i+7], 'string_agg', ' ')), 1, 15)
                AS BIGINT) AS h
            FROM (SELECT *, unnest(range(1, len(a) - 6)) AS i FROM toks)
            WHERE len(a) >= 8),
      dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
      dp AS (SELECT doc_id, pos,
               lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
             FROM g WHERE h IN (SELECT h FROM dup)),
      cov AS (SELECT doc_id,
                CAST(sum(least(8, coalesce(nxt - pos, 8))) AS BIGINT)
                  AS dup
              FROM dp GROUP BY doc_id),
      n AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens FROM toks)
      SELECT n.doc_id, n.n_tokens,
        coalesce(cov.dup, 0) AS dup_tokens,
        coalesce(cov.dup, 0) * 1000 // n.n_tokens AS dup_permille
      FROM n LEFT JOIN cov ON n.doc_id = cov.doc_id
      ORDER BY n.doc_id""",
    "q_sim_kcenter" -> s"""
      WITH e AS MATERIALIZED (${graft.ops.Similarity.quantSql}),
      sd AS (SELECT min(vec_id) AS c FROM e),
      md0 AS MATERIALIZED (SELECT a.vec_id,
               CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS md
             FROM e a JOIN e b ON b.vec_id = (SELECT c FROM sd)
               AND b.i = a.i
             GROUP BY 1),
      ${(1 to 7).map(kcenterRoundSql).mkString(",")}
      SELECT round, center_id, radius_d2 FROM (
        SELECT CAST(0 AS BIGINT) AS round,
          (SELECT CAST(c AS BIGINT) FROM sd) AS center_id,
          CAST(0 AS BIGINT) AS radius_d2
        ${(1 to 7).map(r =>
          s"UNION ALL SELECT CAST($r AS BIGINT), CAST(c AS BIGINT), " +
            s"CAST(radius AS BIGINT) FROM pk$r").mkString(" ")})
      ORDER BY round""",
    "q_text_kneser_ney" -> """
      WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                    FROM documents),
      bg AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
             FROM (SELECT *, unnest(range(1, len(t))) AS i FROM toks)
             WHERE len(t) >= 2),
      c12 AS MATERIALIZED (SELECT w1, w2,
               CAST(count(*) AS BIGINT) AS c12
             FROM bg WHERE source = 'src0' GROUP BY 1, 2),
      c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p
             FROM c12 GROUP BY 1),
      n1m AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1m
              FROM c12 GROUP BY 1),
      gl AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM c12),
      v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
            FROM (SELECT unnest(t) AS w FROM toks WHERE source = 'src0')),
      sc AS (SELECT b.doc_id,
               CASE WHEN c1.c1 IS NOT NULL THEN
                 CAST(round(log2(4 * c1.c1) * 1e6) AS BIGINT)
                 + CAST(round(log2(gl.nbb + v.v) * 1e6) AS BIGINT)
                 - CAST(round(log2(CAST(
                     CAST(greatest(4 * coalesce(c12.c12, 0) - 3, 0)
                          AS HUGEINT) * (gl.nbb + v.v)
                     + CAST(3 * c1.n1p AS HUGEINT)
                       * (coalesce(n1m.n1m, 0) + 1) AS DOUBLE)) * 1e6)
                     AS BIGINT)
               ELSE
                 CAST(round(log2(gl.nbb + v.v) * 1e6) AS BIGINT)
                 - CAST(round(log2(coalesce(n1m.n1m, 0) + 1) * 1e6)
                     AS BIGINT)
               END AS bits_micro
             FROM bg b
             LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
             LEFT JOIN c1 ON b.w1 = c1.w1
             LEFT JOIN n1m ON b.w2 = n1m.w2
             CROSS JOIN gl CROSS JOIN v
             WHERE b.source <> 'src0')
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        CAST(sum(bits_micro) AS BIGINT) AS kn_nll_micro,
        CAST(sum(bits_micro) // count(*) AS BIGINT)
          AS bits_per_bigram_micro
      FROM sc GROUP BY doc_id ORDER BY doc_id""",
    "q_eval_retrieval_recall" -> s"""
      WITH e AS MATERIALIZED ($quantLabelSql),
      n AS MATERIALIZED (SELECT vec_id,
             CAST(sum(v * v) AS BIGINT) AS n2,
             CAST(min(label) AS BIGINT) AS label
           FROM e GROUP BY 1),
      dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot
               FROM e a JOIN e b ON a.vec_id < 50
                 AND b.vec_id <> a.vec_id AND a.i = b.i
               GROUP BY 1, 2),
      sc AS (SELECT d.qid, d.cid,
               CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(nc.n2 AS DOUBLE)) *
                  sqrt(CAST(nq.n2 AS DOUBLE))) AS cos,
               nq.label AS ql, nc.label AS cl
             FROM dots d
             JOIN n nq ON d.qid = nq.vec_id
             JOIN n nc ON d.cid = nc.vec_id),
      topk AS (SELECT * FROM (SELECT *, row_number() OVER (
                 PARTITION BY qid ORDER BY cos DESC, cid) AS rk
               FROM sc) WHERE rk <= 10),
      per AS (SELECT qid, ql,
                CAST(sum(CASE WHEN ql = cl THEN 1 ELSE 0 END) AS BIGINT)
                  AS qhits
              FROM topk GROUP BY 1, 2),
      cls AS (SELECT label, CAST(count(*) AS BIGINT) AS nlab
              FROM n GROUP BY 1)
      SELECT p.ql AS label, CAST(count(*) AS BIGINT) AS n_queries,
        CAST(sum(p.qhits) AS BIGINT) AS hits,
        CAST(sum(p.qhits) * 1000 // sum(least(10, c.nlab - 1))
          AS BIGINT) AS recall_at10_permille
      FROM per p JOIN cls c ON p.ql = c.label
      GROUP BY 1 ORDER BY 1""")
}

package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + similarity operators, r15 wave 35 (SURVEY.md §2.M):
  * exact-substring duplication profiling (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022 — the
  * ExactSubstr criterion), greedy k-center seeding (Gonzalez 1985 —
  * the farthest-point init k-means++/coreset pipelines start from),
  * interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
  * KenLM smoothing CCNet-style filters upgrade to from add-one), a
  * label-supervised retrieval recall@k eval with its MRR twin (the
  * BEIR-style checks a pipeline runs on an embedding model before
  * trusting its ANN index), and the Gopher/MassiveText quality-rule
  * battery (Rae et al. 2021 Appendix A1.1).
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
  val qDedupSubstring: Q = (s, dir) =>
    substringProfileFrom(
      Tables(s, dir, "documents").select(col("doc_id"), col("text")), 8)

  /** The profile pipeline behind [[qDedupSubstring]] and
    * `Graft.substringDupProfile`: `docs` = (doc_id, text). */
  private[graft] def substringProfileFrom(
      docs: org.apache.spark.sql.DataFrame, L: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    // the optional audit shard gate rides the gram hash itself: all
    // occurrences of one gram share its shard, so a sampled window's
    // >=2 verdict stays EXACT — sampling thins which windows are
    // audited (coverage ~ k/64 of the full figure), never corrupts one
    val g = graft.CacheScope.track(AuditSample.gateHash(toks
      .filter(size(col("t")) >= L)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(t) - ${L - 1}),
            i -> struct(CAST(i AS BIGINT) AS pos,
                        CAST(conv(substring(md5(concat_ws(' ',
                          slice(t, i, $L))), 1, 15), 16, 10) AS BIGINT)
                          AS h))""")).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.h").as("h")),
      col("h"))
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
  val qSimKcenter: Q = (s, dir) =>
    kcenterFrom(EmbQuant.quantized(s, dir)
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("n2")), 8)

  /** The seeding loop behind [[qSimKcenter]] and `Graft.kcenterInit`:
    * `emb0` = (vec_id, q, n2), q micro-quantized int64. */
  private[graft] def kcenterFrom(emb0: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val s = emb0.sparkSession
    val emb = graft.CacheScope.track(emb0
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
    var exhausted = false
    for (r <- 1 until k if !exhausted) {
      val top = md.orderBy(col("md").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("md"), col("q"), col("n2"))
        .collect()(0)
      // max-min distance 0 = every remaining point coincides with a
      // chosen center (k exceeds the distinct-point count): stop
      // instead of emitting duplicate zero-radius centers — the
      // Gonzalez contract is "k centers OR the whole point set"
      // (edge pinned in Wave35Spec)
      if (top.getLong(1) == 0L) exhausted = true
      else {
        picks += ((r.toLong, top.getLong(0), top.getLong(1)))
        md = graft.CacheScope.track(md
          .select(col("vec_id"), col("q"), col("n2"),
            least(col("md"),
              d2To(top.getSeq[Long](2), top.getLong(3))).as("md"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      }
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
  val qTextKneserNey: Q = (s, dir) =>
    kneserNeyFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        (col("source") === "src0").as("trusted")))

  /** The scorer behind [[qTextKneserNey]] and `Graft.kneserNeyScore`:
    * `docs0` = (doc_id, text, trusted) — trusted rows train the LM,
    * untrusted rows are scored. */
  private[graft] def kneserNeyFrom(docs0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs0.sparkSession
    val docs = docs0
    val bg = docs
      .select(col("doc_id"), col("trusted"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("trusted"),
        explode(when(size(col("t")) >= 2,
          expr("""transform(sequence(1, size(t) - 1),
                  i -> struct(element_at(t, i) as w1,
                              element_at(t, i + 1) as w2))"""))
          .otherwise(array())).as("b"))
      .select(col("doc_id"), col("trusted"), col("b.w1"), col("b.w2"))
    val c12 = graft.CacheScope.track(
      bg.filter(col("trusted"))
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
    val v = docs.filter(col("trusted"))
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bg.filter(!col("trusted"))
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
  val qEvalRetrievalRecall: Q = (s, dir) =>
    retrievalRecallFrom(EmbQuant.quantized(s, dir))

  /** The recall pipeline behind [[qEvalRetrievalRecall]] and
    * `Graft.retrievalRecall`: `emb0` = (vec_id, label, q). `bound`
    * maps a set size k to the query-set predicate — the declared
    * query keeps the literal `vec_id < k` (oracle-replayed); facades
    * pass [[BoundedIds.cutoffs]] so non-dense ids still draw a full
    * query set. */
  private[graft] def retrievalRecallFrom(
      emb0: org.apache.spark.sql.DataFrame,
      bound: Int => org.apache.spark.sql.Column =
        BoundedIds.literal("vec_id"))
      : org.apache.spark.sql.DataFrame = {
    val per = topkLabeledFrom(emb0, bound)
      .groupBy(col("qid"), col("ql"))
      .agg(sum(when(col("ql") === col("cl"), 1L).otherwise(0L))
        .as("qhits"))
    val cls = emb0.groupBy(col("label")).agg(count(lit(1)).as("nlab"))
    per.join(broadcast(cls), per("ql") === cls("label"))
      .groupBy(col("ql"))
      .agg(count(lit(1)).as("n_queries"), sum(col("qhits")).as("hits"),
        sum(least(lit(10L), col("nlab") - 1)).as("den"))
      .select(col("ql").cast("long").as("label"), col("n_queries"),
        col("hits"), expr("hits * 1000 div den")
          .as("recall_at10_permille"))
      .orderBy(col("label"))
  }

  /** Labeled brute-force top-10 stream shared by
    * [[qEvalRetrievalRecall]] and [[qEvalMrr]]: one persisted
    * quantized scan, bounded query broadcast, per-query window.
    * `emb0` = (vec_id, label, q). */
  private def topkLabeledFrom(emb0: org.apache.spark.sql.DataFrame,
      bound: Int => org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.CacheScope.track(emb0
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val queries = emb.filter(bound(50))
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
    sc.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
  }

  /** Mean reciprocal rank @10 on the same labeled retrieval task as
    * [[qEvalRetrievalRecall]] (the second standard retrieval metric —
    * MRR rewards putting ONE relevant item early, recall rewards
    * finding them all; a pipeline reads both before trusting an
    * embedding model): per query, rr = 1/rank of the FIRST same-label
    * neighbor in the cosine top-10 (0 if none), reported per label as
    * the floored mean of exact micro units (1e6 div rank — both
    * engines floor the same integers).
    *
    * Scale: identical to the recall eval — one candidate pass, no
    * candidate shuffle, bounded windows. */
  val qEvalMrr: Q = (s, dir) =>
    mrrFrom(EmbQuant.quantized(s, dir))

  /** The MRR pipeline behind [[qEvalMrr]] and `Graft.retrievalMrr`:
    * `emb0` = (vec_id, label, q); `bound` as in
    * [[retrievalRecallFrom]]. */
  private[graft] def mrrFrom(emb0: org.apache.spark.sql.DataFrame,
      bound: Int => org.apache.spark.sql.Column =
        BoundedIds.literal("vec_id"))
      : org.apache.spark.sql.DataFrame = {
    val firstHit = topkLabeledFrom(emb0, bound)
      .filter(col("ql") === col("cl"))
      .groupBy(col("qid"), col("ql"))
      .agg(min(col("rk")).cast("long").as("frank"))
    val allq = emb0.filter(bound(50))
      .select(col("vec_id").as("qid"), col("label").as("ql"))
    allq.join(firstHit, Seq("qid", "ql"), "left")
      .select(col("ql"),
        coalesce(expr("1000000 div frank"), lit(0L)).as("rr_micro"))
      .groupBy(col("ql"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("rr_micro")).as("rr_sum"))
      .select(col("ql").cast("long").as("label"), col("n_queries"),
        expr("rr_sum div n_queries").as("mrr_at10_micro"))
      .orderBy(col("label"))
  }

  /** Gopher/MassiveText quality-rule battery (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", Appendix A1.1 — the named rule set web-scale
    * text pipelines implement verbatim): per document, the four rules
    * the fixture can discriminate — (1) ≥ 50 words, (2) mean word
    * length in [3, 10] (exact milli: 1000·chars/words via
    * cross-multiplication, no division), (3) ≥ 2 stopword hits (the
    * en/fr/de/es profile union — the "contains common words" rule),
    * (4) ≥ 80% of words contain an alphabetic character. Reports per
    * source the per-rule pass counts and the conjunction — the
    * filter-attrition table a pipeline owner reads before switching
    * the battery on.
    *
    * Scale: one corpus scan, per-doc HOF arithmetic (codegen'd, no
    * shuffle before the |sources| rollup). */
  val qTextGopherRules: Q = (s, dir) =>
    gopherRulesFrom(
      Tables(s, dir, "documents").select(col("source"), col("text")),
      "source")

  /** The rule battery behind [[qTextGopherRules]] and
    * `Graft.gopherRules`: `docs` = (grp, text). */
  private[graft] def gopherRulesFrom(docs: org.apache.spark.sql.DataFrame,
      grp: String): org.apache.spark.sql.DataFrame =
    gopherFlagged(docs, Seq(grp))
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_minwords")).as("pass_minwords"),
        sum(col("r_wordlen")).as("pass_wordlen"),
        sum(col("r_stopwords")).as("pass_stopwords"),
        sum(col("r_alpha")).as("pass_alpha"),
        sum(col("r_all")).as("pass_all"))
      .orderBy(col(grp))

  /** The per-document rule flags behind [[gopherRulesFrom]] and the
    * r15 attrition waterfall (CorpusOps47): evaluates the four Gopher
    * A1.1 rules on a frame carrying `text`, returning the `keep`
    * pass-through columns plus `nw` (whitespace-token count) and the
    * five 0/1 flag columns. One map-side scan, no shuffle — callers
    * aggregate. */
  private[graft] def gopherFlagged(docs: org.apache.spark.sql.DataFrame,
      keep: Seq[String]): org.apache.spark.sql.DataFrame = {
    val stops = Seq("the", "a", "and", "of", "to", "in", "is",
      "le", "la", "et", "de", "les", "un",
      "der", "die", "und", "das", "ein", "ist",
      "el", "los", "y", "que", "en")
    val stopList = stops.map(w => s"'$w'").mkString(", ")
    val keepC = keep.map(col)
    docs
      .select(keepC :+ split(col("text"), " ").as("t"): _*)
      .select(keepC ++ Seq(
        size(col("t")).cast("long").as("nw"),
        expr("""CAST(aggregate(t, 0, (a, w) -> a + length(w))
                AS BIGINT)""").as("nchars"),
        expr(s"size(filter(t, w -> w IN ($stopList)))").cast("long")
          .as("stophits"),
        expr("size(filter(t, w -> w rlike '[a-zA-Z]'))").cast("long")
          .as("alphaw")): _*)
      .select(keepC ++ Seq(col("nw"),
        when(col("nw") >= 50, 1L).otherwise(0L).as("r_minwords"),
        // 3 <= chars/words <= 10 by cross-multiplication
        when(col("nchars") >= col("nw") * 3 &&
          col("nchars") <= col("nw") * 10, 1L).otherwise(0L)
          .as("r_wordlen"),
        when(col("stophits") >= 2, 1L).otherwise(0L).as("r_stopwords"),
        when(col("alphaw") * 1000 >= col("nw") * 800, 1L).otherwise(0L)
          .as("r_alpha")): _*)
      .withColumn("r_all",
        col("r_minwords") * col("r_wordlen") *
          col("r_stopwords") * col("r_alpha"))
  }

  /** Per-rank DCG weights round(1e6 / log2(rank + 1)) for ranks 1..10
    * and their prefix sums — fixed integer LITERALS in both engines
    * (computed once here, embedded in the SQL), so nDCG needs no
    * runtime log. */
  private[graft] val dcgW: Seq[Long] = (1 to 10).map(i =>
    math.round(1e6 / (math.log(i + 1) / math.log(2))))
  private val dcgPs: Seq[Long] = dcgW.scanLeft(0L)(_ + _).tail

  /** nDCG@10 on the labeled retrieval task — the third standard
    * retrieval metric next to [[qEvalRetrievalRecall]] and
    * [[qEvalMrr]] (position-discounted gain): per query, DCG = Σ over
    * same-label hits of round(1e6/log2(rank+1)); the ideal DCG packs
    * the attainable hits (min(10, |label|−1)) into the top ranks.
    * Per label: Σ DCG · 1000 div Σ IDCG (micro units cancel). The
    * rank weights are fixed integer literals in BOTH engines, so the
    * whole metric is exact integer arithmetic over the shared top-10
    * stream. */
  val qEvalNdcg: Q = (s, dir) =>
    ndcgFrom(EmbQuant.quantized(s, dir))

  /** The nDCG pipeline behind [[qEvalNdcg]] and `Graft.retrievalNdcg`:
    * `emb0` = (vec_id, label, q); `bound` as in
    * [[retrievalRecallFrom]]. */
  private[graft] def ndcgFrom(emb0: org.apache.spark.sql.DataFrame,
      bound: Int => org.apache.spark.sql.Column =
        BoundedIds.literal("vec_id"))
      : org.apache.spark.sql.DataFrame = {
    val wArr = dcgW.mkString("array(CAST(", " AS BIGINT), CAST(",
      " AS BIGINT))")
    val psArr = dcgPs.mkString("array(CAST(", " AS BIGINT), CAST(",
      " AS BIGINT))")
    val dcg = topkLabeledFrom(emb0, bound)
      .groupBy(col("qid"), col("ql"))
      .agg(sum(when(col("ql") === col("cl"),
        expr(s"element_at($wArr, rk)")).otherwise(0L)).as("dcg_micro"))
    val cls = emb0.groupBy(col("label")).agg(count(lit(1)).as("nlab"))
    dcg.join(broadcast(cls), dcg("ql") === cls("label"))
      .groupBy(col("ql"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("dcg_micro")).as("dcgs"),
        sum(expr(s"element_at($psArr, " +
          "CAST(least(10, nlab - 1) AS INT))")).as("idcgs"))
      .select(col("ql").cast("long").as("label"), col("n_queries"),
        expr("dcgs * 1000 div idcgs").as("ndcg_at10_permille"))
      .orderBy(col("label"))
  }

  /** Weighted reservoir sampling, algorithm A-ES (Efraimidis &
    * Spirakis, IPL 2006 — the one-pass weighted-sample primitive a
    * mixture pipeline uses to draw a budgeted subset with probability
    * ∝ utility weight): each row ranks by key = u^(1/w) — computed as
    * ln(u)/w, monotone-equivalent — and the global top-k IS the
    * sample. Weight here = document length (any positive utility
    * column works; the facade takes it as a parameter). u derives
    * from the 60-bit md5 bridge ((h mod 999999 + 1)/1e6 — identical
    * integers, hence identical IEEE doubles, in both engines); keys
    * are fixed-point nano units, ties break on doc_id.
    *
    * Scale: one scan + a top-k (TakeOrdered — never a global sort);
    * deterministic "randomness" from content hashes, the same
    * discipline as the corpus's md5 resampling grid. */
  val qSampleAes: Q = (s, dir) =>
    reservoirFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("w")), 50)

  /** The A-ES pipeline behind [[qSampleAes]] and
    * `Graft.weightedSample`: `docs` = (doc_id, source, w), w > 0. */
  private[graft] def reservoirFrom(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("h", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), " +
          "16, 10) AS BIGINT)"))
      .withColumn("key_nano", expr(
        // w <= 0 would silently invert/blow up the A-ES key (ln(u)/w
        // flips sign at negative weights, divides by zero at 0) and
        // return a wrong sample — raise instead (the katz/bestOfN
        // overflow-guard discipline)
        "CASE WHEN w <= 0 THEN CAST(raise_error(" +
          "'weightedSample: weights must be positive') AS BIGINT) " +
          "ELSE CAST(round(ln((h % 999999 + 1) / 1000000.0) / w * 1e9) " +
          "AS BIGINT) END"))
      .orderBy(col("key_nano").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("source"), col("w"), col("key_nano"))
      .orderBy(col("doc_id"))

  /** The DESTRUCTIVE half of the Lee et al. 2022 exact-substring
    * pass: [[qDedupSubstring]] profiles what IS duplicated; this
    * query reports what a keep-first span cut would REMOVE — for
    * every ≥2-occurrence 8-token window, all occurrences except the
    * globally first (ordered by doc_id, pos) mark their positions for
    * cutting; per source, the interval-union cut-token count and
    * permille — the corpus-shrinkage estimate an owner signs off on
    * BEFORE running a destructive dedup.
    *
    * Scale: the same one-gram-per-token stream as the profile; the
    * occurrence rank is a window per gram hash (co-partitioned on h,
    * never broadcast); the cut coverage windows per doc. */
  val qDedupSubstringCut: Q = (s, dir) =>
    substringCutFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("source").as("grp"), col("text")),
      "grp", 8)
      .withColumnRenamed("grp", "source")

  /** The cut estimate behind [[qDedupSubstringCut]] and
    * `Graft.substringCut`: `docs` = (doc_id, grp, text). */
  private[graft] def substringCutFrom(
      docs: org.apache.spark.sql.DataFrame, grp: String, L: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), col(grp), split(col("text"), " ").as("t"))
    // same gram-hash shard gate as the profile (see substringProfileFrom)
    val g = AuditSample.gateHash(toks
      .filter(size(col("t")) >= L)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(t) - ${L - 1}),
            i -> struct(CAST(i AS BIGINT) AS pos,
                        CAST(conv(substring(md5(concat_ws(' ',
                          slice(t, i, $L))), 1, 15), 16, 10) AS BIGINT)
                          AS h))""")).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.h").as("h")),
      col("h"))
    val wh = Window.partitionBy(col("h"))
    val occ = g
      .withColumn("orank", row_number().over(
        wh.orderBy(col("doc_id"), col("pos"))))
      .withColumn("c", count(lit(1)).over(wh))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cov = occ.filter(col("c") >= 2 && col("orank") >= 2)
      .withColumn("nxt", lead(col("pos"), 1).over(wd))
      .groupBy(col("doc_id"))
      .agg(sum(least(lit(L.toLong),
        coalesce(col("nxt") - col("pos"), lit(L.toLong)))).as("cut"))
    toks.select(col("doc_id"), col(grp),
        size(col("t")).cast("long").as("nt"))
      .join(cov, Seq("doc_id"), "left")
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"),
        sum(coalesce(col("cut"), lit(0L))).as("cut_tokens"))
      .select(col(grp), col("n_docs"), col("total_tokens"),
        col("cut_tokens"),
        expr("cut_tokens * 1000 div total_tokens").as("cut_permille"))
      .orderBy(col(grp))
  }

  /** The recall/cost frontier of the `spark.graft.ivf.cells` knob as
    * an ORACLED query — the tuning table a deployment reads before
    * setting the IVF family's one production scale dial (r14 verdict
    * item 2's measurement, promoted to data): for K ∈ {8, 16, 32}
    * coarse cells (lowest-K-id seeding, the library convention) and
    * nprobe = 4, each of the 50 query vectors scans its probed cells'
    * members; recall@10 = fraction of the brute-force cosine top-10
    * found among the candidates. More cells = fewer candidates
    * scanned (cost ↓) at some recall — the frontier quantifies the
    * margin-mine/SemDeDup blocking tradeoff exactly.
    *
    * Scale: per K, the centroid table is K rows (broadcast); the
    * candidate stream is the posting-list equi-join on cid
    * (co-partitioned); the brute-force truth is the bounded
    * 50-query one-pass scan shared with the retrieval evals. */
  val qSimIvfCellsSweep: Q = (s, dir) =>
    cellsFrontierFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")))

  /** The frontier behind [[qSimIvfCellsSweep]] and
    * `Graft.ivfCellsFrontier`: `emb0` = (vec_id, q), q
    * micro-quantized int64; `bound` as in [[retrievalRecallFrom]]
    * (covers the seed sets k ∈ {8, 16, 32} AND the 50-query set). */
  private[graft] def cellsFrontierFrom(
      emb0: org.apache.spark.sql.DataFrame,
      bound: Int => org.apache.spark.sql.Column =
        BoundedIds.literal("vec_id"))
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.CacheScope.track(emb0
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("n2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val true10 = graft.CacheScope.track(topkFrom(emb, bound).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rows = Seq(8, 16, 32).map { k =>
      val cents = emb.filter(bound(k))
        .select(col("vec_id").as("cid"), col("q").as("cq"),
          col("n2").as("cn2"))
      def scored(vecs: org.apache.spark.sql.DataFrame) = vecs
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          (EmbQuant.dotq(col("q"), col("cq")).cast("double") /
            (sqrt(col("n2").cast("double")) *
              sqrt(col("cn2").cast("double")))).as("ccos"))
      val wv = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val asg = scored(emb)
        .withColumn("rk", row_number().over(wv)).filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"))
      val probes = scored(emb.filter(bound(50)))
        .withColumn("rk", row_number().over(wv)).filter(col("rk") <= 4)
        .select(col("vec_id").as("qid"), col("cid"))
      // ONE pass per K (optimization r17): the r15 shape consumed the
      // UNPERSISTED candidate join twice (stats agg + truth join), and
      // the K-cell assignment window behind it — a full scored scan —
      // ran twice per sweep point. true10 is unique on (qid, cid), so
      // the LEFT join cannot duplicate a candidate row — the three
      // counts are value-identical.
      probes.join(asg, Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid2"))
        .join(true10.select(col("qid"), col("cid").as("cid2"),
          lit(1L).as("tf")), Seq("qid", "cid2"), "left")
        .agg(countDistinct(col("qid")).as("n_queries"),
          count(lit(1)).as("candidates"),
          count(col("tf")).as("hits"))
        .select(lit(k.toLong).as("cells"), col("n_queries"),
          col("candidates"),
          when(col("n_queries") === 0, lit(0L))
            .otherwise(expr("hits * 1000 div (10 * n_queries)"))
            .as("recall_at10_permille"))
    }
    rows.reduce(_ unionByName _).orderBy(col("cells"))
  }

  /** Label-free brute-force cosine top-10 per query vector (the 50
    * lowest-id queries via `bound`, self excluded) — the ground truth
    * [[qSimIvfCellsSweep]] measures recall against. `emb` = (vec_id,
    * q, n2). */
  private[ops] def topkFrom(emb: org.apache.spark.sql.DataFrame,
      bound: Int => org.apache.spark.sql.Column =
        BoundedIds.literal("vec_id"))
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(bound(50))
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        col("n2").as("qn2"))
    val sc = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        (EmbQuant.dotq(col("q"), col("qq")).cast("double") /
          (sqrt(col("n2").cast("double")) *
            sqrt(col("qn2").cast("double")))).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    sc.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("qid"), col("cid"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_substring" -> qDedupSubstring,
    "q_dedup_substring_cut" -> qDedupSubstringCut,
    "q_sim_ivf_cells_sweep" -> qSimIvfCellsSweep,
    "q_sim_kcenter" -> qSimKcenter,
    "q_text_kneser_ney" -> qTextKneserNey,
    "q_eval_retrieval_recall" -> qEvalRetrievalRecall,
    "q_eval_mrr" -> qEvalMrr,
    "q_eval_ndcg" -> qEvalNdcg,
    "q_sample_aes" -> qSampleAes,
    "q_text_gopher_rules" -> qTextGopherRules)

  /** One K-block of the q_sim_ivf_cells_sweep oracle: K-cell coarse
    * assignment + nprobe=4 probes + posting-list candidates + recall
    * vs the shared true10 truth, emitting row$K. The max_by
    * (ccos, −cid) tie-break mirrors as row_number (ccos DESC, cid). */
  private def cellsSweepBlockSql(k: Int): String = s"""
      cents$k AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $k),
      cn$k AS (SELECT cid, CAST(sum(v*v) AS BIGINT) AS cn2
               FROM cents$k GROUP BY 1),
      asg$k AS (SELECT vec_id, cid FROM (
          SELECT a.vec_id, c.cid,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              CAST(sum(a.v * c.v) AS BIGINT) /
                (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cn.cn2 AS DOUBLE)))
              DESC, c.cid) AS rk
          FROM e a JOIN cents$k c ON a.i = c.i
          JOIN n ON a.vec_id = n.vec_id JOIN cn$k cn ON c.cid = cn.cid
          GROUP BY a.vec_id, c.cid, n.n2, cn.cn2) WHERE rk = 1),
      probes$k AS (SELECT vec_id AS qid, cid FROM (
          SELECT a.vec_id, c.cid,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              CAST(sum(a.v * c.v) AS BIGINT) /
                (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cn.cn2 AS DOUBLE)))
              DESC, c.cid) AS rk
          FROM e a JOIN cents$k c ON a.i = c.i
          JOIN n ON a.vec_id = n.vec_id JOIN cn$k cn ON c.cid = cn.cid
          WHERE a.vec_id < 50
          GROUP BY a.vec_id, c.cid, n.n2, cn.cn2) WHERE rk <= 4),
      cand$k AS (SELECT p.qid, a.vec_id AS cid2 FROM probes$k p
                 JOIN asg$k a ON a.cid = p.cid WHERE a.vec_id <> p.qid),
      hit$k AS (SELECT t.qid, count(*) AS hits FROM true10 t
                JOIN cand$k c ON t.qid = c.qid AND t.cid = c.cid2
                GROUP BY 1),
      vol$k AS (SELECT qid, CAST(count(*) AS BIGINT) AS nc
                FROM cand$k GROUP BY 1),
      row$k AS (SELECT CAST($k AS BIGINT) AS cells,
          CAST((SELECT count(DISTINCT qid) FROM cand$k) AS BIGINT)
            AS n_queries,
          CAST((SELECT sum(nc) FROM vol$k) AS BIGINT) AS candidates,
          CAST((SELECT coalesce(sum(hits), 0) FROM hit$k) * 1000 //
            (10 * (SELECT count(DISTINCT qid) FROM cand$k)) AS BIGINT)
            AS recall_at10_permille)"""

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
    "q_dedup_substring_cut" -> """
      WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS a
                    FROM documents),
      g AS (SELECT doc_id, i AS pos,
              CAST('0x' || substring(md5(
                list_aggr(a[i:i+7], 'string_agg', ' ')), 1, 15)
                AS BIGINT) AS h
            FROM (SELECT *, unnest(range(1, len(a) - 6)) AS i FROM toks)
            WHERE len(a) >= 8),
      occ AS (SELECT doc_id, pos,
                row_number() OVER (PARTITION BY h
                  ORDER BY doc_id, pos) AS orank,
                count(*) OVER (PARTITION BY h) AS c
              FROM g),
      cutp AS (SELECT doc_id, pos,
                 lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
               FROM occ WHERE c >= 2 AND orank >= 2),
      cov AS (SELECT doc_id,
                CAST(sum(least(8, coalesce(nxt - pos, 8))) AS BIGINT)
                  AS cut
              FROM cutp GROUP BY doc_id),
      n AS (SELECT doc_id, source, CAST(len(a) AS BIGINT) AS nt
            FROM toks)
      SELECT n.source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n.nt) AS BIGINT) AS total_tokens,
        CAST(sum(coalesce(cov.cut, 0)) AS BIGINT) AS cut_tokens,
        CAST(sum(coalesce(cov.cut, 0)) * 1000 // sum(n.nt) AS BIGINT)
          AS cut_permille
      FROM n LEFT JOIN cov ON n.doc_id = cov.doc_id
      GROUP BY 1 ORDER BY 1""",
    "q_sim_ivf_cells_sweep" -> s"""
      WITH e AS MATERIALIZED (${graft.ops.Similarity.quantSql}),
      n AS MATERIALIZED (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS n2
                         FROM e GROUP BY 1),
      dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot
               FROM e a JOIN e b ON a.vec_id < 50
                 AND b.vec_id <> a.vec_id AND a.i = b.i
               GROUP BY 1, 2),
      true10 AS MATERIALIZED (SELECT qid, cid FROM (
          SELECT d.qid, d.cid, row_number() OVER (PARTITION BY d.qid
            ORDER BY CAST(d.dot AS DOUBLE) /
              (sqrt(CAST(nc.n2 AS DOUBLE)) * sqrt(CAST(nq.n2 AS DOUBLE)))
              DESC, d.cid) AS rk
          FROM dots d
          JOIN n nq ON d.qid = nq.vec_id
          JOIN n nc ON d.cid = nc.vec_id) WHERE rk <= 10),
      ${Seq(8, 16, 32).map(cellsSweepBlockSql).mkString(",")}
      SELECT * FROM row8 UNION ALL SELECT * FROM row16
      UNION ALL SELECT * FROM row32 ORDER BY cells""",
    "q_text_gopher_rules" -> """
      WITH t AS (SELECT source, string_split(text, ' ') AS a
                 FROM documents),
      d AS (SELECT source,
              CAST(len(a) AS BIGINT) AS nw,
              CAST(list_sum(list_transform(a, w -> length(w)))
                AS BIGINT) AS nchars,
              CAST(len(list_filter(a, w -> w IN ('the','a','and','of',
                'to','in','is','le','la','et','de','les','un','der',
                'die','und','das','ein','ist','el','los','y','que',
                'en'))) AS BIGINT) AS stophits,
              CAST(len(list_filter(a, w ->
                regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS alphaw
            FROM t),
      r AS (SELECT source,
              CASE WHEN nw >= 50 THEN 1 ELSE 0 END AS r_minwords,
              CASE WHEN nchars >= nw * 3 AND nchars <= nw * 10
                   THEN 1 ELSE 0 END AS r_wordlen,
              CASE WHEN stophits >= 2 THEN 1 ELSE 0 END AS r_stopwords,
              CASE WHEN alphaw * 1000 >= nw * 800
                   THEN 1 ELSE 0 END AS r_alpha
            FROM d)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(r_minwords) AS BIGINT) AS pass_minwords,
        CAST(sum(r_wordlen) AS BIGINT) AS pass_wordlen,
        CAST(sum(r_stopwords) AS BIGINT) AS pass_stopwords,
        CAST(sum(r_alpha) AS BIGINT) AS pass_alpha,
        CAST(sum(r_minwords * r_wordlen * r_stopwords * r_alpha)
          AS BIGINT) AS pass_all
      FROM r GROUP BY source ORDER BY source""",
    "q_eval_mrr" -> s"""
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
      fh AS (SELECT qid, ql, CAST(min(rk) AS BIGINT) AS frank
             FROM topk WHERE ql = cl GROUP BY 1, 2),
      allq AS (SELECT vec_id AS qid, label AS ql FROM n
               WHERE vec_id < 50),
      rr AS (SELECT a.ql, coalesce(1000000 // fh.frank, 0) AS rr_micro
             FROM allq a LEFT JOIN fh ON a.qid = fh.qid
               AND a.ql = fh.ql)
      SELECT ql AS label, CAST(count(*) AS BIGINT) AS n_queries,
        CAST(sum(rr_micro) // count(*) AS BIGINT) AS mrr_at10_micro
      FROM rr GROUP BY 1 ORDER BY 1""",
    "q_eval_ndcg" -> s"""
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
      dcg AS (SELECT qid, ql,
                CAST(sum(CASE WHEN ql = cl
                  THEN ([${dcgW.mkString(", ")}])[rk]
                  ELSE 0 END) AS BIGINT) AS dcg_micro
              FROM topk GROUP BY 1, 2),
      cls AS (SELECT label, CAST(count(*) AS BIGINT) AS nlab
              FROM n GROUP BY 1)
      SELECT d.ql AS label, CAST(count(*) AS BIGINT) AS n_queries,
        CAST(sum(d.dcg_micro) * 1000 //
          sum(([${dcgPs.mkString(", ")}])[least(10, c.nlab - 1)])
          AS BIGINT) AS ndcg_at10_permille
      FROM dcg d JOIN cls c ON d.ql = c.label
      GROUP BY 1 ORDER BY 1""",
    "q_sample_aes" -> """
      WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
              CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                1, 15) AS BIGINT) AS h
            FROM documents),
      k AS (SELECT doc_id, source, w,
              CAST(round(ln((h % 999999 + 1) / 1000000.0) / w * 1e9)
                AS BIGINT) AS key_nano
            FROM d),
      t AS (SELECT * FROM k ORDER BY key_nano DESC, doc_id LIMIT 50)
      SELECT doc_id, source, w, key_nano FROM t ORDER BY doc_id""",
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

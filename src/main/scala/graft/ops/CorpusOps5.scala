package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-pipeline operators, r9 waves (SURVEY.md §2.M): BM25 retrieval
  * scoring, the Gopher quality-rule battery, character-level
  * Shannon-entropy filtering, the inverted-index posting build + its
  * incremental delta merge, n-gram novelty scoring, a Zipf
  * rank-frequency fit, token-budget selection, the shard balance
  * manifest, negative-pair sampling and the corpus data card — the
  * passes a pretraining pipeline runs between raw crawl and tokenizer.
  *
  * Determinism contract (shared with the rest of §2.M): every score is
  * assembled from PER-VALUE fixed-point logs (round(log2(x) * 1e6) as
  * int64 — the micro-bits trick of q_text_perplexity/q_text_collocations)
  * or exact integer cross-multiplication, so both engines run identical
  * integer arithmetic and every query hash-matches. All operands here are
  * non-negative, so Spark's truncating `div` and DuckDB's flooring `//`
  * agree on every division.
  */
object CorpusOps5 {

  /** round(log2(c) * 1e6) as int64 — per-value fixed-point log. */
  private def lg(c: Column): Column = round(log2(c) * lit(1e6)).cast("long")

  private val bm25Terms = Seq("data", "stream", "query")
  private def bm25TermsSql = bm25Terms.map(t => s"'$t'").mkString(", ")

  /** BM25 top-20 retrieval (Robertson et al., TREC-3 "Okapi at TREC-3",
    * 1994) for a fixed 3-term query, with the Lucene idf variant
    * log((N + 1) / (df + 0.5)) — always positive, so no negative
    * operand ever reaches a division. k1 = 1.2, b = 0.75.
    *
    * Fixed-point assembly: idf_micro = lg(2N + 2) - lg(2df + 1)
    * (the 2x clears the 0.5s into exact integers); the tf-saturation
    * term (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl / avgdl)) is
    * cleared of fractions by multiplying through by 100 * avgdl_micro:
    * sat_milli = (tf * 220 * A * 1000) div (tf * 100 * A + 30 * A
    * + 90 * dl * 1e6), A = avgdl in micro-tokens. Integer end-to-end.
    *
    * Scale shape: the posting list is filtered to the query terms
    * BEFORE the tf aggregation, so only matching (doc, term) pairs
    * shuffle — query-sized, not corpus-sized; df and the (N, avgdl)
    * scalar are broadcast; top-20 lowers to TakeOrderedAndProject. */
  val qTextBm25: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), col("a"), size(col("a")).cast("long").as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      expr("sum(dl) * 1000000 div count(*)").as("avgdl_micro"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("a")).as("term"))
      .filter(col("term").isInCollection(bm25Terms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        lg(col("n_docs") * 2 + 2) - lg(col("df") * 2 + 1))
      .withColumn("sat_milli", expr(
        """(tf * 220 * avgdl_micro * 1000) div
           (tf * 100 * avgdl_micro + 30 * avgdl_micro + 90 * dl * 1000000)"""))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("matched_terms"),
        sum(col("tf")).as("total_tf"),
        sum(expr("idf_micro * sat_milli div 1000")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(20)
  }

  private val gopherStops = Seq("the", "a", "and", "of", "to", "in", "is")
  private def gopherStopsSql = gopherStops.map(t => s"'$t'").mkString(", ")

  /** Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * table A1), reported as a per-source scorecard: how many docs pass
    * each rule, and how many survive all of them. Rules, adapted to
    * this corpus and kept EXACT by integer cross-multiplication
    * (never a float ratio):
    *   r_wordcount  word count in [30, 120]
    *   r_meanlen    mean word length in [3, 10] chars:
    *                3*nw <= (n_chars - nw + 1) <= 10*nw
    *   r_symbol     symbol-to-word ratio < 10%: 10 * #('#' or '...') < nw
    *   r_stopword   >= 2 distinct English stopwords present
    *   r_uniq       unique-token ratio >= 20%: 5 * distinct >= nw
    *
    * Scale: one scan, per-doc map-side flags, one partial-aggregated
    * shuffle to the handful of sources. */
  val qQualityGopher: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    val nw = size(toks).cast("long")
    val nc = length(col("text")).cast("long")
    val sym = (length(col("text")) -
      length(regexp_replace(col("text"), "#|\\.\\.\\.", ""))).cast("long")
    val stops = size(filter(array_distinct(toks),
      x => x.isInCollection(gopherStops)))
    val uniq = size(array_distinct(toks)).cast("long")
    def b(c: Column): Column = c.cast("long")
    Tables(s, dir, "documents")
      .select(col("source"),
        b(nw.between(30, 120)).as("r_wordcount"),
        b(nc - nw + 1 >= nw * 3 && nc - nw + 1 <= nw * 10).as("r_meanlen"),
        b(sym * 10 < nw).as("r_symbol"),
        b(stops >= 2).as("r_stopword"),
        b(uniq * 5 >= nw).as("r_uniq"))
      .withColumn("kept",
        col("r_wordcount") * col("r_meanlen") * col("r_symbol") *
          col("r_stopword") * col("r_uniq"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_wordcount")).as("pass_wordcount"),
        sum(col("r_meanlen")).as("pass_meanlen"),
        sum(col("r_symbol")).as("pass_symbol"),
        sum(col("r_stopword")).as("pass_stopword"),
        sum(col("r_uniq")).as("pass_uniq"),
        sum(col("kept")).as("kept"))
      .orderBy(col("source"))
  }

  /** Character-level Shannon entropy per document, in micro-bits —
    * the low-entropy filter (boilerplate / repeated-char junk) of
    * CCNet-style pipelines. H = log2(n) - (1/n) * sum_c cnt_c*log2(cnt_c),
    * assembled from per-value fixed-point logs so the score is exact
    * integer arithmetic: ent_micro = lg(n) - (sum cnt*lg(cnt)) div n.
    *
    * Scale: the char explode partial-aggregates map-side to at most
    * |alphabet| rows per doc before the (doc, char) shuffle, and the
    * per-doc reduce is alphabet-bounded — linear in input bytes with
    * a tiny shuffle, no window, no sort until the final presentation
    * ORDER BY. */
  val qTextEntropy: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt") * lg(col("cnt"))).as("s"))
      .select(col("doc_id"), col("n"),
        (lg(col("n")) - expr("s div n")).as("ent_micro"))
      .withColumn("low_entropy", col("ent_micro") < 3000000L)
      .orderBy(col("doc_id"))
  }

  /** Inverted-index build (the retrieval-side sink of a corpus
    * pipeline): per 3-gram phrase key, document frequency, total
    * occurrences and the sorted posting list. Keys are 3-grams, not
    * unigrams — this corpus's unigram vocabulary is stop-like (df ≈ N
    * for every term), and a df-capped unigram index would be empty;
    * phrase keys are how a phrase/proximity index shards anyway. The
    * df ∈ [2, 50] band drops both singletons (no retrieval value) and
    * stop-like keys (corpus-sized postings — the q_dedup_jaccard
    * df-cap discipline), and an md5-prefix 1/16 shard sample keeps the
    * dumped slice verify-sized at every SF (the md5-parity trick of
    * q_sim_ann_lsh — both engines derive the same shard). Postings
    * emit comma-joined (the string_agg precedent of q_agg_collect).
    *
    * Scale: occurrence counts partial-aggregate map-side to (gram,
    * doc) rows; df and the posting list build ride ONE gram-keyed
    * shuffle; the df-cap bounds every reducer's list state. */
  val qIndexPostings: Q = (s, dir) =>
    postingAgg(gramTf(Tables(s, dir, "documents")))
      .filter(col("df").between(2, 50))
      .orderBy(col("g"))

  /** Per-document n-gram novelty (the memorization-risk / uniqueness
    * scorer): the share of a doc's distinct 3-grams that occur in NO
    * other document, as an exact integer permille = novel * 1000 div
    * n_grams. High-novelty docs are the memorization-risk tail; zero-
    * novelty docs are pure boilerplate.
    *
    * Scale: distinct (gram, doc) pairs partial-aggregate before the
    * gram-keyed df shuffle; df == 1 grams join back doc-keyed. Both
    * shuffles carry gram-level rows, never raw text. */
  val qTextNovelty: Q = (s, dir) => {
    val grams = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(a) - 2),
           i -> concat_ws(' ', element_at(a, i), element_at(a, i + 1),
                          element_at(a, i + 2)))""")).as("g"))
      .distinct()
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(df, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("novel_grams"))
      .select(col("doc_id"), col("n_grams"), col("novel_grams"),
        expr("novel_grams * 1000 div n_grams").as("novelty_permille"))
      .orderBy(col("doc_id"))
  }

  /** Zipf rank-frequency fit over the top-1000 vocabulary: the OLS
    * slope of log2(freq) on log2(rank) — the corpus-health diagnostic
    * (natural text ≈ −1; synthetic/boilerplate drifts toward 0).
    * Logs are per-value fixed-point MILLI-bits (1e3 — micro would
    * overflow int64 in the n·Σxy cross term at n = 1000); the OLS
    * numerator n·Σxy − Σx·Σy and denominator n·Σxx − Σx·Σx are exact
    * int64, and the slope itself is ONE IEEE division of those two
    * integers (the numerator is negative — Zipf slopes are — and
    * Spark's truncating div and DuckDB's flooring // disagree on
    * negatives, so integer division is out; a single double division
    * of identical integers is bit-deterministic in both engines).
    *
    * Scale: vocab count is one partial-aggregated shuffle; the top-1000
    * lowers to TakeOrderedAndProject; the regression reduces 1000 rows
    * to one — driver-sized by construction. */
  val qTextZipf: Q = (s, dir) => {
    def lgm(c: Column): Column = round(log2(c) * lit(1e3)).cast("long")
    val top = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(1000)
      .select(col("freq"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("w"))).as("rank"))
    top.select(lgm(col("rank")).as("x"), lgm(col("freq")).as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), col("sx"), col("sy"),
        expr("n * sxy - sx * sy").as("slope_num"),
        expr("n * sxx - sx * sx").as("slope_den"))
      .withColumn("slope",
        col("slope_num").cast("double") / col("slope_den").cast("double"))
  }

  /** Shared posting-build front end: sharded (gram, doc_id, tf) rows
    * over an input docs frame — the same 3-gram + md5 1/16 shard
    * discipline as [[qIndexPostings]]. */
  private def gramTf(docs: org.apache.spark.sql.DataFrame) = docs
    .select(col("doc_id"), split(col("text"), " ").as("a"))
    .filter(size(col("a")) >= 3)
    .select(col("doc_id"), explode(expr(
      """transform(sequence(1, size(a) - 2),
         i -> concat_ws(' ', element_at(a, i), element_at(a, i + 1),
                        element_at(a, i + 2)))""")).as("g"))
    .groupBy(col("g"), col("doc_id")).agg(count(lit(1)).as("tf"))
    .filter(substring(md5(col("g")), 1, 1) === "0")

  private def postingAgg(tf: org.apache.spark.sql.DataFrame) = tf
    .groupBy(col("g"))
    .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
      array_join(sort_array(collect_list(col("doc_id"))), ",")
        .as("postings"))

  /** Incremental index maintenance: merge a small delta batch's
    * postings into the stored base index WITHOUT rebuilding it — the
    * index twin of q_dedup_incremental. Base = doc_id % 10 != 0
    * (the "stored" index), delta = doc_id % 10 == 0 (the new batch);
    * the merge is a gram-keyed full-outer join that adds dfs and
    * concatenates posting lists (doc sets are disjoint, so
    * sorted-concat == sorted-union). The df ∈ [2, 50] publish band
    * applies to the MERGED index, so a delta doc can promote a
    * base singleton into the published slice — the case a naive
    * "append only new grams" merge gets wrong.
    *
    * Scale: the base aggregation is the one-time stored artifact (at
    * 100 TB it is read, not recomputed); the delta aggregation is
    * batch-sized; the merge shuffles gram-keyed rows with df-capped
    * list state. */
  val qIndexDelta: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val base = postingAgg(gramTf(docs.filter(col("doc_id") % 10 =!= 0)))
      .select(col("g"), col("df").as("df_base"),
        col("total_tf").as("tf_base"), col("postings").as("p_base"))
    val delta = postingAgg(gramTf(docs.filter(col("doc_id") % 10 === 0)))
      .select(col("g"), col("df").as("df_delta"),
        col("total_tf").as("tf_delta"), col("postings").as("p_delta"))
    base.join(delta, Seq("g"), "full_outer")
      .select(col("g"),
        coalesce(col("df_base"), lit(0L)).as("df_base"),
        coalesce(col("df_delta"), lit(0L)).as("df_delta"),
        (coalesce(col("df_base"), lit(0L))
          + coalesce(col("df_delta"), lit(0L))).as("df_merged"),
        (coalesce(col("tf_base"), lit(0L))
          + coalesce(col("tf_delta"), lit(0L))).as("tf_merged"),
        mergedPostings(col("p_base"), col("p_delta")).as("postings_merged"))
      .filter(col("df_merged").between(2, 50))
      .orderBy(col("g"))
  }

  /** Merge two optional comma-joined posting strings: re-split to
    * LONGs (doc ids sort numerically, not lexically), concat, sort,
    * re-join. */
  private def mergedPostings(a: Column, b: Column): Column = {
    def ids(c: Column): Column =
      when(c.isNull, array().cast("array<bigint>"))
        .otherwise(transform(split(c, ","), x => x.cast("long")))
    array_join(transform(sort_array(concat(ids(a), ids(b))),
      x => x.cast("string")), ",")
  }

  /** Token-budget corpus selection: take the highest-quality docs
    * whose cumulative token count fits a 10k-token budget — the "fill
    * the training budget by quality order" selection step (quality
    * here = unique-token permille, an exact integer).
    *
    * The global quality-ordered cumulative sum is decomposed so no
    * corpus-sized partition ever sorts in one place (the
    * q_pack_sequences sharded-cumsum discipline, keyed by QUALITY
    * BUCKET instead of hash shard): per-bucket token totals (bounded
    * rows) get a tiny cross-bucket prefix window; within-bucket
    * cumsums ride a per-bucket sort; cum = bucket offset + in-bucket
    * running sum. Exactly equals the naive global window (the DuckDB
    * oracle runs the naive form — the equality IS the test).
    *
    * Scale: one shuffle on bucket for the within-bucket window; the
    * cross-bucket window runs over ~20 rows however large the corpus. */
  val qBudgetSelect: Q = (s, dir) => {
    val budget = 10000L
    val scored = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), size(col("a")).cast("long").as("ntok"),
        expr("size(array_distinct(a)) * 1000 div size(a)").as("qpm"))
      .withColumn("bucket", expr("qpm div 50"))
    val offsets = scored.groupBy(col("bucket"))
      .agg(sum(col("ntok")).as("btok"))
      .withColumn("offset",
        coalesce(sum(col("btok")).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("bucket").desc)
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(col("qpm").desc, col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    scored.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tokens", col("offset") + sum(col("ntok")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("qpm"), col("ntok"), col("cum_tokens"))
      .orderBy(col("cum_tokens"))
  }

  /** Shard manifest: balance report for an md5-sharded corpus write —
    * per shard (first hex nibble of md5(doc_id): 16 shards), doc /
    * token / byte counts and the exact-permille skew vs the uniform
    * share. The publish-side sanity check before a 100 TB write:
    * a shard at 2× the mean means a straggler executor and a hot
    * reader partition later.
    *
    * Scale: map-side shard assignment, one partial-aggregated shuffle
    * to 16 rows, totals broadcast back. */
  val qShardManifest: Q = (s, dir) => {
    val sharded = Tables(s, dir, "documents")
      .select(substring(md5(col("doc_id").cast("string")), 1, 1)
          .as("shard"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        col("n_chars"))
    val perShard = sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"),
        sum(col("n_chars")).as("bytes"))
    val totals = perShard.agg(sum(col("n_docs")).as("total_docs"))
    perShard.crossJoin(broadcast(totals))
      .select(col("shard"), col("n_docs"), col("tokens"), col("bytes"),
        expr("n_docs * 16 * 1000 div total_docs").as("skew_permille"))
      .orderBy(col("shard"))
  }

  /** Negative-pair sampling for contrastive training: each document
    * draws 3 pseudo-random partners via a Weyl/Knuth multiplicative
    * stride (doc_id * 2654435761 + j * 40503) mod N — deterministic,
    * join-free partner ASSIGNMENT (no cross join, no rand()), then one
    * equi-join fetches partner metadata. Self-pairs are dropped; the
    * same-source collision rate each anchor would train against is the
    * audit column (a high rate means the "negatives" aren't).
    *
    * Scale: partner ids are computed map-side; the only shuffle is the
    * partner equi-join (doc-keyed); N rides a 1-row broadcast. The
    * contiguous-id assumption (ids 0..N-1) holds for this fixture and
    * is the standard post-"assign dense ids" state of an embedding
    * pipeline; with sparse ids, a zipWithIndex pass densifies first. */
  val qNegSample: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val pairs = docs.crossJoin(broadcast(n))
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(1, 3), j ->
             (doc_id * 2654435761 + j * 40503) % n_docs)"""))
        .as("partner_id"))
      .filter(col("partner_id") =!= col("doc_id"))
    pairs.join(docs.select(col("doc_id").as("partner_id"),
        col("source").as("partner_source")), Seq("partner_id"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_negatives"),
        sum(when(col("source") === col("partner_source"), 1L)
          .otherwise(0L)).as("same_source"),
        array_join(transform(sort_array(collect_list(col("partner_id"))),
          x => x.cast("string")), ",").as("partners"))
      .orderBy(col("doc_id"))
  }

  /** Corpus data card: the one-row summary every published dataset
    * ships (docs, tokens, chars, vocab, languages, sources, exact-dup
    * rate via content fingerprints, mean doc length in exact permille).
    * One scan for the per-doc stats + one fingerprint aggregation;
    * every figure is an exact integer, so the card is reproducible
    * bit-for-bit from any engine.
    *
    * Scale: two scans (stats, fingerprints), both partial-aggregated;
    * distinct counts are gram/fingerprint-keyed shuffles. The card is
    * 1 row regardless of corpus size. */
  val qCorpusDatacard: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val toks = docs.select(col("doc_id"), col("n_chars"),
      split(col("text"), " ").as("a"), col("lang"), col("source"))
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("a"))).cast("long").as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val vocab = toks.select(explode(col("a")).as("w"))
      .agg(countDistinct(col("w")).as("vocab_size"))
    val dups = docs.select(md5(array_join(sort_array(array_distinct(
        split(lower(col("text")), " "))), " ")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1).as("exact_dup_docs"))
    stats.crossJoin(broadcast(vocab)).crossJoin(broadcast(dups))
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_sources"), col("vocab_size"),
        col("exact_dup_docs"),
        expr("n_tokens * 1000 div n_docs").as("mean_tokens_permille"),
        expr("exact_dup_docs * 1000 div n_docs").as("dup_permille"))
  }

  /** Inter-source duplication matrix: for every source pair, how many
    * distinct 3-grams they share, as a permille of the smaller side's
    * gram set — the "which sources copy from each other" diagnostic
    * that decides what to dedup BEFORE mixing (the cross-dataset
    * overlap analysis of the Pile/Dolma dataset reports). Grams ride
    * the same md5 1/16 shard sample as the posting build, so the
    * matrix is a uniform-sample estimate with identical sampling in
    * both engines.
    *
    * Scale: distinct (gram, source) pairs partial-aggregate map-side;
    * the self-join fans out at most C(|sources|, 2) rows PER GRAM —
    * bounded by the source count squared, never by corpus size — and
    * the result is a sources² matrix. */
  val qDupMatrix: Q = (s, dir) => {
    val gs = Tables(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 3)
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(a) - 2),
           i -> concat_ws(' ', element_at(a, i), element_at(a, i + 1),
                          element_at(a, i + 2)))""")).as("g"))
      .distinct()
      .filter(substring(md5(col("g")), 1, 1) === "0")
    val counts = gs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = gs.as("x")
      .join(gs.as("y"),
        col("x.g") === col("y.g") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(broadcast(counts.select(col("source").as("src_a"),
        col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(counts.select(col("source").as("src_b"),
        col("n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        col("n_a"), col("n_b"),
        expr("shared_grams * 1000 div least(n_a, n_b)")
          .as("overlap_permille"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Phrase-index READ path (completing build [[qIndexPostings]] /
    * maintain [[qIndexDelta]]): a two-key retrieval query over the
    * published index. The query keys are the two highest-df published
    * grams (deterministic: df DESC, gram — a worst-case "hot phrase"
    * probe); docs are ranked AND-first (match count, then total tf) —
    * the standard coordinate-level ranking of a boolean retrieval
    * engine.
    *
    * Scale: the probe touches exactly two posting lists (df-capped at
    * 50 by the publish band), broadcast against the tf rows of those
    * keys only — query cost is bounded by the df cap, never corpus
    * size. */
  val qIndexPhraseQuery: Q = (s, dir) => {
    val tf = gramTf(Tables(s, dir, "documents"))
    val idx = postingAgg(tf).filter(col("df").between(2, 50))
    val keys = idx.orderBy(col("df").desc, col("g")).limit(2)
      .agg(min(col("g")).as("g1"), max(col("g")).as("g2"))
    tf.join(broadcast(keys),
        col("g") === col("g1") || col("g") === col("g2"))
      .groupBy(col("g1"), col("g2"), col("doc_id"))
      .agg(countDistinct(col("g")).as("grams_matched"),
        sum(col("tf")).as("total_tf"))
      .orderBy(col("grams_matched").desc, col("total_tf").desc,
        col("doc_id"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q_index_phrase_query" -> qIndexPhraseQuery,
    "q_dup_matrix" -> qDupMatrix,
    "q_neg_sample" -> qNegSample,
    "q_corpus_datacard" -> qCorpusDatacard,
    "q_budget_select" -> qBudgetSelect,
    "q_shard_manifest" -> qShardManifest,
    "q_index_delta" -> qIndexDelta,
    "q_text_bm25" -> qTextBm25,
    "q_quality_gopher" -> qQualityGopher,
    "q_text_entropy" -> qTextEntropy,
    "q_index_postings" -> qIndexPostings,
    "q_text_novelty" -> qTextNovelty,
    "q_text_zipf" -> qTextZipf)

  val oracle: Map[String, String] = Map(
    "q_index_phrase_query" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
      gr AS (SELECT doc_id,
               a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
             FROM (SELECT *, unnest(range(1, len(a) - 1)) AS i FROM toks)),
      tf AS (SELECT g, doc_id, count(*) AS tf FROM gr
             GROUP BY 1, 2 HAVING substr(md5(g), 1, 1) = '0'),
      idx AS (SELECT g, count(*) AS df FROM tf GROUP BY g
              HAVING count(*) BETWEEN 2 AND 50),
      keys AS (SELECT min(g) AS g1, max(g) AS g2 FROM
                 (SELECT g FROM idx ORDER BY df DESC, g LIMIT 2)),
      hits AS (SELECT k.g1, k.g2, tf.doc_id, tf.g, tf.tf
               FROM tf CROSS JOIN keys k
               WHERE tf.g = k.g1 OR tf.g = k.g2)
      SELECT g1, g2, doc_id, count(DISTINCT g) AS grams_matched,
             CAST(sum(tf) AS BIGINT) AS total_tf
      FROM hits GROUP BY 1, 2, 3
      ORDER BY grams_matched DESC, total_tf DESC, doc_id LIMIT 20""",
    "q_text_bm25" -> s"""
      WITH docs AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents),
      d AS (SELECT doc_id, a, CAST(len(a) AS BIGINT) AS dl FROM docs),
      stats AS (SELECT count(*) AS n_docs,
                       CAST(sum(dl) AS BIGINT) * 1000000 // count(*)
                         AS avgdl_micro
                FROM d),
      tf AS (SELECT doc_id, dl, term, count(*) AS tf
             FROM (SELECT doc_id, dl, unnest(a) AS term FROM d)
             WHERE term IN ($bm25TermsSql)
             GROUP BY 1, 2, 3),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT tf.doc_id, tf.tf,
               CAST(round(log2(n_docs * 2 + 2) * 1e6) AS BIGINT)
                 - CAST(round(log2(df.df * 2 + 1) * 1e6) AS BIGINT)
                 AS idf_micro,
               (tf.tf * 220 * avgdl_micro * 1000) //
                 (tf.tf * 100 * avgdl_micro + 30 * avgdl_micro
                  + 90 * tf.dl * 1000000) AS sat_milli
             FROM tf JOIN df USING (term) CROSS JOIN stats)
      SELECT doc_id, count(*) AS matched_terms,
             CAST(sum(tf) AS BIGINT) AS total_tf,
             CAST(sum(idf_micro * sat_milli // 1000) AS BIGINT)
               AS score_micro
      FROM sc GROUP BY doc_id
      ORDER BY score_micro DESC, doc_id LIMIT 20""",
    "q_quality_gopher" -> s"""
      WITH f AS (SELECT source,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
        CAST(length(text) AS BIGINT) AS nc,
        CAST(length(text)
          - length(regexp_replace(text, '#|\\.\\.\\.', '', 'g'))
          AS BIGINT) AS sym,
        len(list_filter(list_distinct(string_split(text, ' ')),
            x -> x IN ($gopherStopsSql))) AS stops,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq
        FROM documents),
      r AS (SELECT source,
        CAST(nw BETWEEN 30 AND 120 AS BIGINT) AS r_wordcount,
        CAST(nc - nw + 1 >= nw * 3 AND nc - nw + 1 <= nw * 10 AS BIGINT)
          AS r_meanlen,
        CAST(sym * 10 < nw AS BIGINT) AS r_symbol,
        CAST(stops >= 2 AS BIGINT) AS r_stopword,
        CAST(uniq * 5 >= nw AS BIGINT) AS r_uniq
        FROM f)
      SELECT source, count(*) AS n_docs,
        CAST(sum(r_wordcount) AS BIGINT) AS pass_wordcount,
        CAST(sum(r_meanlen) AS BIGINT) AS pass_meanlen,
        CAST(sum(r_symbol) AS BIGINT) AS pass_symbol,
        CAST(sum(r_stopword) AS BIGINT) AS pass_stopword,
        CAST(sum(r_uniq) AS BIGINT) AS pass_uniq,
        CAST(sum(r_wordcount * r_meanlen * r_symbol * r_stopword * r_uniq)
          AS BIGINT) AS kept
      FROM r GROUP BY source ORDER BY source""",
    "q_dup_matrix" -> """
      WITH toks AS (SELECT source, string_split(text, ' ') AS a
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
      gs AS (SELECT DISTINCT source,
               a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
             FROM (SELECT *, unnest(range(1, len(a) - 1)) AS i FROM toks)
             ),
      sh AS (SELECT source, g FROM gs WHERE substr(md5(g), 1, 1) = '0'),
      counts AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      pairs AS (SELECT x.source AS src_a, y.source AS src_b,
                  count(*) AS shared_grams
                FROM sh x JOIN sh y
                  ON x.g = y.g AND x.source < y.source
                GROUP BY 1, 2)
      SELECT src_a, src_b, shared_grams, ca.n AS n_a, cb.n AS n_b,
             shared_grams * 1000 // least(ca.n, cb.n) AS overlap_permille
      FROM pairs JOIN counts ca ON pairs.src_a = ca.source
                 JOIN counts cb ON pairs.src_b = cb.source
      ORDER BY src_a, src_b""",
    "q_neg_sample" -> """
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      p AS (SELECT d.doc_id, d.source,
              (d.doc_id * 2654435761 + j.j * 40503) % n.n_docs
                AS partner_id
            FROM documents d CROSS JOIN n
                 CROSS JOIN (SELECT unnest(range(1, 4)) AS j) j
            WHERE (d.doc_id * 2654435761 + j.j * 40503) % n.n_docs
                  <> d.doc_id),
      jn AS (SELECT p.doc_id, p.source, p.partner_id,
               d2.source AS partner_source
             FROM p JOIN documents d2 ON p.partner_id = d2.doc_id)
      SELECT doc_id, source, count(*) AS n_negatives,
        CAST(sum(CASE WHEN source = partner_source THEN 1 ELSE 0 END)
          AS BIGINT) AS same_source,
        array_to_string(list_transform(list_sort(list(partner_id)),
          x -> CAST(x AS VARCHAR)), ',') AS partners
      FROM jn GROUP BY doc_id, source ORDER BY doc_id""",
    "q_corpus_datacard" -> """
      WITH t AS (SELECT doc_id, n_chars, lang, source,
                   string_split(text, ' ') AS a, lower(text) AS lt
                 FROM documents),
      stats AS (SELECT count(*) AS n_docs,
                  CAST(sum(len(a)) AS BIGINT) AS n_tokens,
                  CAST(sum(n_chars) AS BIGINT) AS n_chars,
                  count(DISTINCT lang) AS n_langs,
                  count(DISTINCT source) AS n_sources
                FROM t),
      vocab AS (SELECT count(DISTINCT w) AS vocab_size
                FROM (SELECT unnest(a) AS w FROM t)),
      f AS (SELECT md5(array_to_string(list_sort(list_distinct(
              string_split(lt, ' '))), ' ')) AS fp FROM t),
      dups AS (SELECT CAST(sum(c - 1) AS BIGINT) AS exact_dup_docs
               FROM (SELECT fp, count(*) AS c FROM f GROUP BY fp))
      SELECT n_docs, n_tokens, n_chars, n_langs, n_sources, vocab_size,
        exact_dup_docs,
        n_tokens * 1000 // n_docs AS mean_tokens_permille,
        exact_dup_docs * 1000 // n_docs AS dup_permille
      FROM stats CROSS JOIN vocab CROSS JOIN dups""",
    "q_budget_select" -> """
      WITH s AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            * 1000 // len(string_split(text, ' ')) AS qpm
        FROM documents),
      c AS (SELECT doc_id, qpm, ntok,
              CAST(sum(ntok) OVER (ORDER BY qpm DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM s)
      SELECT doc_id, qpm, ntok, cum_tokens
      FROM c WHERE cum_tokens <= 10000 ORDER BY cum_tokens""",
    "q_shard_manifest" -> """
      WITH s AS (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   AS shard,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                 n_chars
                 FROM documents),
      p AS (SELECT shard, count(*) AS n_docs,
              CAST(sum(ntok) AS BIGINT) AS tokens,
              CAST(sum(n_chars) AS BIGINT) AS bytes
            FROM s GROUP BY shard),
      t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM p)
      SELECT shard, n_docs, tokens, bytes,
             n_docs * 16 * 1000 // total_docs AS skew_permille
      FROM p CROSS JOIN t ORDER BY shard""",
    "q_index_delta" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
      gr AS (SELECT doc_id,
               a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
             FROM (SELECT *, unnest(range(1, len(a) - 1)) AS i FROM toks)),
      tf AS (SELECT g, doc_id, count(*) AS tf FROM gr
             GROUP BY 1, 2 HAVING substr(md5(g), 1, 1) = '0'),
      base AS (SELECT g, count(*) AS df_base,
                 CAST(sum(tf) AS BIGINT) AS tf_base,
                 list_sort(list(doc_id)) AS p_base
               FROM tf WHERE doc_id % 10 <> 0 GROUP BY g),
      delta AS (SELECT g, count(*) AS df_delta,
                  CAST(sum(tf) AS BIGINT) AS tf_delta,
                  list_sort(list(doc_id)) AS p_delta
                FROM tf WHERE doc_id % 10 = 0 GROUP BY g),
      m AS (SELECT coalesce(base.g, delta.g) AS g,
              coalesce(df_base, 0) AS df_base,
              coalesce(df_delta, 0) AS df_delta,
              coalesce(df_base, 0) + coalesce(df_delta, 0) AS df_merged,
              coalesce(tf_base, 0) + coalesce(tf_delta, 0) AS tf_merged,
              array_to_string(list_sort(
                coalesce(p_base, []) || coalesce(p_delta, [])), ',')
                AS postings_merged
            FROM base FULL OUTER JOIN delta ON base.g = delta.g)
      SELECT g, df_base, df_delta, df_merged, tf_merged, postings_merged
      FROM m WHERE df_merged BETWEEN 2 AND 50 ORDER BY g""",
    "q_index_postings" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
      g AS (SELECT doc_id,
              a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
            FROM (SELECT *, unnest(range(1, len(a) - 1)) AS i FROM toks)),
      tf AS (SELECT g, doc_id, count(*) AS tf FROM g
             GROUP BY 1, 2 HAVING substr(md5(g), 1, 1) = '0'),
      idx AS (SELECT g, count(*) AS df,
                CAST(sum(tf) AS BIGINT) AS total_tf,
                array_to_string(list_sort(list(doc_id)), ',') AS postings
              FROM tf GROUP BY g)
      SELECT g, df, total_tf, postings FROM idx
      WHERE df BETWEEN 2 AND 50 ORDER BY g""",
    "q_text_novelty" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
      grams AS (SELECT DISTINCT doc_id,
                  a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
                FROM (SELECT *, unnest(range(1, len(a) - 1)) AS i
                      FROM toks)),
      df AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
      j AS (SELECT doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS novel_grams
            FROM grams JOIN df USING (g) GROUP BY doc_id)
      SELECT doc_id, n_grams, novel_grams,
             novel_grams * 1000 // n_grams AS novelty_permille
      FROM j ORDER BY doc_id""",
    "q_text_zipf" -> """
      WITH freq AS (SELECT w, count(*) AS freq
                    FROM (SELECT unnest(string_split(text, ' ')) AS w
                          FROM documents) GROUP BY w),
      top AS (SELECT freq, CAST(row_number() OVER
                  (ORDER BY freq DESC, w) AS BIGINT) AS rank
              FROM freq ORDER BY freq DESC, w LIMIT 1000),
      xy AS (SELECT CAST(round(log2(rank) * 1e3) AS BIGINT) AS x,
                    CAST(round(log2(freq) * 1e3) AS BIGINT) AS y
             FROM top),
      agg AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM xy)
      SELECT n, sx, sy,
        n * sxy - sx * sy AS slope_num,
        n * sxx - sx * sx AS slope_den,
        CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
      FROM agg""",
    "q_text_entropy" -> """
      WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                  FROM documents),
      cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
      e AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(cnt * CAST(round(log2(cnt) * 1e6) AS BIGINT))
                AS BIGINT) AS s
            FROM cc GROUP BY 1)
      SELECT doc_id, n,
        CAST(round(log2(n) * 1e6) AS BIGINT) - s // n AS ent_micro,
        (CAST(round(log2(n) * 1e6) AS BIGINT) - s // n) < 3000000
          AS low_entropy
      FROM e ORDER BY doc_id""")
}

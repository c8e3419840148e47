package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r16 wave 43 (SURVEY.md §2.M): the unigram-LM
  * (SentencePiece-style) tokenizer TRAINER (Kudo, "Subword
  * Regularization", ACL 2018) — the OTHER algorithm real pipelines
  * choose between besides BPE — plus its fertility table, completing
  * the tokenizer family (BPE already ships train / apply / fertility /
  * vocab-curve).
  *
  * The training loop here is the declared exact-arithmetic rendering
  * of Kudo's EM: candidate pieces are the frequency-weighted word
  * substrings (the suffix-array seeding, bounded to length ≤ 4),
  * piece costs are −log2 probabilities in exact integer MICRO-BITS
  * (round(log2(x)·1e6) of exact integers — the q_text_perplexity
  * discipline, identical in both engines), the E-step is a VITERBI
  * min-cost segmentation of every dictionary word (ties: cost asc,
  * piece length desc — deterministic), the M-step re-estimates costs
  * from freq-weighted piece usage, and the pruning schedule keeps all
  * single characters (with an add-one count floor, so every word
  * stays segmentable) plus the top-40 multi-char pieces by usage.
  * Two E-steps total, all constants declared.
  *
  * Scale: the corpus collapses to the (word, freq) dictionary in ONE
  * scan (the q_bpe_train shape); every EM stage is dictionary-sized;
  * the vocabulary is BOUNDED (≤ alphabet + 60 pieces), so it collects
  * to a literal map (the k-means centroid discipline) and the Viterbi
  * DP is a pure MAP-SIDE higher-order-function pass over the
  * dictionary — no join, no shuffle, at any corpus size. The DuckDB
  * oracle computes the SAME DP by unrolled per-position CTE joins
  * against the vocab table (the kmRoundSql discipline) — two
  * genuinely different execution strategies, one value gate.
  */
object CorpusOps49 {

  private val MaxWordLen = 16
  private val MaxPieceLen = 4
  private val SeedMulti = 60
  private val KeepMulti = 40

  /** round(log2(col)·1e6) — the shared integer micro-bits bridge. */
  private def lg(c: Column): Column = round(log2(c) * lit(1e6)).cast("long")
  private def lgSql(x: String): String =
    s"CAST(round(log2($x) * 1e6) AS BIGINT)"

  /** One corpus scan → the frequency-weighted word dictionary. Words
    * longer than [[MaxWordLen]] chars are excluded (declared: the DP
    * horizon; CJK-free space-tokenized corpora rarely exceed it). */
  private def dictOf(docsText: DataFrame): DataFrame =
    docsText.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Candidate pieces: every substring of length 1..4 of every
    * dictionary word, weighted by word frequency per occurrence. */
  private def candOf(dict: DataFrame): DataFrame =
    dict.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(1, $MaxPieceLen), l ->
          CASE WHEN length(word) >= l THEN
            transform(sequence(1, length(word) - l + 1),
              i -> substring(word, i, l))
          ELSE CAST(array() AS array<string>) END))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("w"))

  /** Viterbi segmentation of every dictionary word against a BOUNDED
    * literal vocabulary map (piece → cost_micro): `dp[p]` = min cost
    * of the first p chars, tie-break (cost asc, length desc) via the
    * struct-min trick (nl = −l, so lexicographic min prefers longer
    * pieces on equal cost); `bt` backtraces the piece sequence.
    * Returns (word, freq, ps = the piece array). Pure map-side.
    *
    * The (l, lookup) inner transform (optimization r18, guide §4):
    * `element_at` on a literal map is a LINEAR key scan, and the old
    * form evaluated it twice per (position, length) — once for the
    * null guard, once for the cost. Binding the lookup in a nested
    * transform halves the dominant per-word cost; the outer IF
    * reproduces the old null semantics exactly (NULL when p < l or
    * the piece is out of vocab, null-cost structs preserved). */
  private def segment(dict: DataFrame, vocab: Map[String, Long])
      : DataFrame =
    dict.withColumn("vm", typedLit(vocab))
      .withColumn("dp", expr(s"""
        aggregate(
          sequence(1, length(word)),
          array(named_struct('c', CAST(0 AS BIGINT), 'nl', 0)),
          (acc, p) -> concat(acc, array(
            array_min(filter(
              transform(
                transform(sequence(1, $MaxPieceLen), l ->
                  named_struct('l', l,
                    'v', IF(p >= l, element_at(vm,
                           substring(word, p - l + 1, l)), NULL))),
                e -> IF(e.v IS NOT NULL,
                   named_struct(
                     'c', element_at(acc, p - e.l + 1).c + e.v,
                     'nl', CAST(-e.l AS INT)),
                   NULL)),
              x -> x IS NOT NULL)))))"""))
      .withColumn("bt", expr(s"""
        aggregate(
          sequence(1, $MaxWordLen),
          named_struct('pos', length(word),
                       'ps', CAST(array() AS array<string>)),
          (st, i) -> IF(st.pos > 0,
            named_struct(
              'pos', st.pos + element_at(dp, st.pos + 1).nl,
              'ps', concat(st.ps, array(substring(word,
                st.pos + element_at(dp, st.pos + 1).nl + 1,
                -element_at(dp, st.pos + 1).nl)))),
            st))"""))
      .select(col("word"), col("freq"), col("bt.ps").as("ps"))

  private def countsOf(seg: DataFrame): DataFrame =
    seg.select(col("freq"), explode(col("ps")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Collect a bounded (piece, cost) frame to the literal-map form
    * the map-side DP consumes. */
  private def toMap(v: DataFrame): Map[String, Long] =
    v.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The full two-E-step training loop. Returns (final piece table,
    * word → n_pieces under the final model). Costs are computed IN
    * SPARK SQL (never driver-side math) so the log2 micro-bits match
    * the oracle bit-for-bit. */
  private[graft] def unigramCore(docsText: DataFrame)
      : (DataFrame, DataFrame) = {
    val dict = graft.CacheScope.track(dictOf(docsText)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cand = graft.CacheScope.track(candOf(dict)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // seed vocab: every single char + top-60 multi-char substrings by
    // weight; initial cost = lg(totW) − lg(w) over the SELECTED set
    val chars = cand.filter(length(col("piece")) === 1)
    val seed = chars.unionByName(
      cand.filter(length(col("piece")) >= 2)
        .orderBy(col("w").desc, col("piece")).limit(SeedMulti))
    val tot0 = seed.agg(sum(col("w")).as("tot"))
    val v0 = toMap(seed.crossJoin(broadcast(tot0))
      .select(col("piece"), (lg(col("tot")) - lg(col("w"))).as("cost")))
    // E-step 1 + prune/re-cost: chars ALWAYS survive with an add-one
    // count floor (segmentability invariant); multi = top-40 by usage
    val cnt0 = countsOf(segment(dict, v0))
    val kept = chars.select(col("piece"))
      .join(cnt0, Seq("piece"), "left")
      .select(col("piece"),
        greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
      .unionByName(cnt0.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(KeepMulti))
    val tot1 = kept.agg(sum(col("cnt")).as("tot"))
    val v1 = toMap(kept.crossJoin(broadcast(tot1))
      .select(col("piece"), (lg(col("tot")) - lg(col("cnt"))).as("cost")))
    // E-step 2 → the shipped piece table + per-word piece counts
    val seg1 = graft.CacheScope.track(segment(dict, v1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cnt1 = countsOf(seg1)
    val tot2 = cnt1.agg(sum(col("cnt")).as("tot"))
    val pieces = cnt1.crossJoin(broadcast(tot2))
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("cnt").as("used_count"),
        (lg(col("tot")) - lg(col("cnt"))).as("cost_micro"))
      .orderBy(col("piece"))
    val wordSeg = seg1
      .select(col("word"), size(col("ps")).cast("long").as("n_pieces"))
    (pieces, wordSeg)
  }

  /** Unigram-LM tokenizer TRAINING loop (Kudo ACL 2018, declared
    * form): emits the final piece table (piece, piece_len,
    * used_count, cost_micro) after seed → E-step → prune/re-cost →
    * E-step. The hash gate against the unrolled-CTE oracle proves the
    * map-side HOF Viterbi ≡ the join-based DP. */
  val qTokUnigramTrain: Q = (s, dir) =>
    unigramCore(Tables(s, dir, "documents").select(col("text")))._1

  /** Per-source fertility (pieces per token, milli) under the FINAL
    * unigram model — the health metric read side-by-side with
    * q_bpe_fertility when choosing the tokenizer algorithm. The
    * per-word piece counts come from the training loop's second
    * E-step; the join back to per-source word frequencies is
    * dictionary-sized and co-partitioned on the word. */
  val qTokUnigramFertility: Q = (s, dir) =>
    unigramFertilityFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** The fertility table behind [[qTokUnigramFertility]] and
    * `Graft.unigramFertility`: `docs` = (grp, text). */
  private[graft] def unigramFertilityFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val (_, wordSeg) = unigramCore(docs.select(col("text")))
    val sw = docs
      .select(col(grp), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy(col(grp), col("word")).agg(count(lit(1)).as("freq"))
    sw.join(wordSeg, Seq("word"))
      .groupBy(col(grp))
      .agg(sum(col("freq")).as("n_tokens"),
        sum(col("freq") * col("n_pieces")).as("n_pieces"))
      .select(col(grp), col("n_tokens"), col("n_pieces"),
        expr("n_pieces * 1000 div n_tokens").as("fertility_milli"))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_tok_unigram_train" -> qTokUnigramTrain,
    "q_tok_unigram_fertility" -> qTokUnigramFertility)

  // ---------------------------------------------------------------
  // oracle: the same EM, DP unrolled per position (kmRoundSql style)
  // ---------------------------------------------------------------

  /** Per-position DP CTEs for round r against vocab table v{r}:
    * dp{r}_p = min-cost parse of the first p chars (cost asc, piece
    * length desc), plus the unioned (word, p, c, l) lookup dpa{r}. */
  private def dpSql(r: Int): String = {
    val dp0 =
      s"dp${r}_0 AS (SELECT word, CAST(0 AS BIGINT) AS c, 0 AS l FROM dict)"
    val steps = (1 to MaxWordLen).map { p =>
      val branches = (1 to MaxPieceLen).filter(_ <= p).map { l =>
        s"""SELECT d.word, d.c + v.cost AS c, $l AS l
            FROM dp${r}_${p - l} d JOIN v$r v
              ON v.piece = substring(d.word, ${p - l + 1}, $l)
            WHERE length(d.word) >= $p"""
      }.mkString(" UNION ALL ")
      s"""dp${r}_$p AS MATERIALIZED (
          SELECT word, c, l FROM (
            SELECT word, c, l,
              row_number() OVER (PARTITION BY word
                ORDER BY c, l DESC) AS rk
            FROM ($branches)) WHERE rk = 1)"""
    }
    val dpa = s"""dpa$r AS MATERIALIZED (${(1 to MaxWordLen).map(p =>
      s"SELECT word, $p AS p, c, l FROM dp${r}_$p")
      .mkString(" UNION ALL ")})"""
    (dp0 +: steps :+ dpa).mkString(",\n")
  }

  /** Backtrace CTEs for round r: walk the chosen l backwards from
    * length(word), emitting one piece per step; cnt{r} = the
    * freq-weighted piece usage table. */
  private def btSql(r: Int): String = {
    val bt0 = s"""bt${r}_0 AS (SELECT word, freq, length(word) AS pos,
        CAST(NULL AS VARCHAR) AS piece FROM dict)"""
    val steps = (1 to MaxWordLen).map { k =>
      s"""bt${r}_$k AS MATERIALIZED (
          SELECT b.word, b.freq,
            CASE WHEN b.pos > 0 THEN b.pos - d.l ELSE b.pos END AS pos,
            CASE WHEN b.pos > 0
                 THEN substring(b.word, b.pos - d.l + 1, d.l) END AS piece
          FROM bt${r}_${k - 1} b LEFT JOIN dpa$r d
            ON d.word = b.word AND d.p = b.pos)"""
    }
    val cnt = s"""cnt$r AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
          ${(1 to MaxWordLen).map(k =>
      s"SELECT piece, freq FROM bt${r}_$k WHERE piece IS NOT NULL")
      .mkString(" UNION ALL ")}) u
        GROUP BY piece)"""
    (bt0 +: steps :+ cnt).mkString(",\n")
  }

  /** Everything through the second E-step's usage table cnt1 —
    * shared by both oracles. */
  private[graft] def coreSql: String = s"""
    dict AS MATERIALIZED (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents) u
      WHERE length(word) BETWEEN 1 AND $MaxWordLen
      GROUP BY word),
    cand AS MATERIALIZED (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS w FROM (
        SELECT substring(word, i, l) AS piece, freq FROM (
          SELECT word, freq, l,
            unnest(range(1, length(word) - l + 2)) AS i
          FROM (SELECT word, freq,
                  unnest([${(1 to MaxPieceLen).mkString(", ")}]) AS l
                FROM dict) e
          WHERE length(word) >= l) o) g
      GROUP BY piece),
    seed AS MATERIALIZED (
      SELECT piece, w FROM cand WHERE length(piece) = 1
      UNION ALL
      SELECT piece, w FROM (
        SELECT piece, w FROM cand WHERE length(piece) >= 2
        ORDER BY w DESC, piece LIMIT $SeedMulti) m),
    t0 AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM seed),
    v0 AS MATERIALIZED (
      SELECT piece, ${lgSql("tot")} - ${lgSql("w")} AS cost
      FROM seed CROSS JOIN t0),
    ${dpSql(0)},
    ${btSql(0)},
    kept AS MATERIALIZED (
      SELECT c.piece, greatest(coalesce(n.cnt, 0), 1) AS cnt
      FROM (SELECT piece FROM cand WHERE length(piece) = 1) c
      LEFT JOIN cnt0 n ON c.piece = n.piece
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM cnt0 WHERE length(piece) >= 2
        ORDER BY cnt DESC, piece LIMIT $KeepMulti) m),
    t1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM kept),
    v1 AS MATERIALIZED (
      SELECT piece, ${lgSql("tot")} - ${lgSql("cnt")} AS cost
      FROM kept CROSS JOIN t1),
    ${dpSql(1)},
    ${btSql(1)}"""

  val oracle: Map[String, String] = Map(
    "q_tok_unigram_train" -> s"""
      WITH $coreSql,
      t2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM cnt1)
      SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len,
        cnt AS used_count,
        ${lgSql("tot")} - ${lgSql("cnt")} AS cost_micro
      FROM cnt1 CROSS JOIN t2 ORDER BY piece""",
    "q_tok_unigram_fertility" -> s"""
      WITH $coreSql,
      ws AS MATERIALIZED (
        SELECT word, count(*) AS wnp FROM (
          ${(1 to MaxWordLen).map(k =>
      s"SELECT word, piece FROM bt1_$k WHERE piece IS NOT NULL")
      .mkString(" UNION ALL ")}) u
        GROUP BY word),
      sw AS (SELECT source, word, count(*) AS freq FROM (
               SELECT source, unnest(string_split(text, ' ')) AS word
               FROM documents) x
             WHERE length(word) BETWEEN 1 AND $MaxWordLen
             GROUP BY source, word)
      SELECT source, CAST(sum(freq) AS BIGINT) AS n_tokens,
        CAST(sum(freq * wnp) AS BIGINT) AS n_pieces,
        CAST(sum(freq * wnp) * 1000 // sum(freq) AS BIGINT)
          AS fertility_milli
      FROM sw JOIN ws USING (word)
      GROUP BY source ORDER BY source""")
}

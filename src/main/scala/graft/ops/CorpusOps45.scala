package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r12 wave 33 (SURVEY.md §2.M):
  * length-controlled win rate (the AlpacaEval-2 discipline — Dubois
  * et al. 2024 — applied as exact stratified Mann-Whitney) and the
  * pairwise source-vocabulary overlap matrix (mixture-design aid).
  *
  * Exactness: win probabilities use the 2×-scaled Mann-Whitney count
  * (2·wins + ties, the q_classifier_auc discipline) so ties take
  * exact half credit in integers; the length control stratifies into
  * fixed token-count bins and averages PER-BIN permilles with equal
  * weights — floor division only.
  */
object CorpusOps45 {

  /** Win rate of every source against the declared baseline (src0) on
    * the classifier quality score, RAW and LENGTH-CONTROLLED: longer
    * docs tend to score differently, so the raw pairwise win rate
    * partly measures verbosity. The LC variant buckets docs into
    * fixed length bins (ntok div 64, capped at 15), computes the
    * exact per-bin Mann-Whitney win permille against the baseline's
    * same-bin docs, and averages bins with EQUAL weight (only bins
    * where both sides appear). A big raw-vs-LC gap flags a
    * length-confounded ranking (Dubois et al. 2024).
    *
    * Scale: per (source, bin, score) counts — the corpus collapses to
    * the score axis per stratum; the win count rides the cumulative-
    * count decomposition (never a doc×doc join), the same shape as
    * [[CorpusOps39]]'s tournament. */
  val qEvalLcWinrate: Q = (s, dir) => {
    val sc = CorpusOps10.scored(s, dir)
      .join(Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("ntok")),
        Seq("doc_id"))
      .select(col("source"), expr("least(ntok div 64, 15)").as("bin"),
        col("score_milli"))
    val g = graft.CacheScope.track(sc
      .groupBy(col("source"), col("bin"), col("score_milli"))
      .agg(count(lit(1)).as("n")).persist())
    val base = g.filter(col("source") === "src0")
      .select(col("bin"), col("score_milli"), col("n").as("nb"))
    // per (bin, score): baseline docs strictly below / equal
    val wBelow = Window.partitionBy(col("bin"))
      .orderBy(col("score_milli"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val axis = g.select(col("bin"), col("score_milli")).distinct()
    val baseCum = axis
      .join(base, Seq("bin", "score_milli"), "left")
      .na.fill(0L, Seq("nb"))
      .withColumn("below", coalesce(sum(col("nb")).over(wBelow), lit(0L)))
      .select(col("bin"), col("score_milli"), col("nb"), col("below"))
    val perBin = g.filter(col("source") =!= "src0")
      .join(baseCum, Seq("bin", "score_milli"))
      .groupBy(col("source"), col("bin"))
      .agg(sum(col("n") * (lit(2L) * col("below") + col("nb")))
          .as("win2"),
        sum(col("n")).as("ns"))
    val binTot = graft.CacheScope.track(base.groupBy(col("bin"))
      .agg(sum(col("nb")).as("n0")).persist())
    val scoredBins = perBin.join(binTot, Seq("bin"))
      .filter(col("n0") > 0)
      .select(col("source"), col("bin"),
        expr("win2 * 1000 div (2 * ns * n0)").as("bin_permille"),
        col("win2"), (lit(2L) * col("ns") * col("n0")).as("den2"))
    scoredBins.groupBy(col("source"))
      .agg(count(lit(1)).as("n_bins"),
        expr("sum(win2) * 1000 div sum(den2)").as("raw_win_permille"),
        expr("sum(bin_permille) div count(1)").as("lc_win_permille"))
      .withColumn("lc_gap",
        col("raw_win_permille") - col("lc_win_permille"))
      .orderBy(col("source"))
  }

  /** Pairwise source vocabulary overlap: per source the top-10 tokens
    * by (count DESC, token) — the deterministic "signature vocab" —
    * then Jaccard permille over every source pair (a < b). The
    * mixture-design diagnostic: near-duplicate vocab signatures mark
    * sources that contribute redundant coverage to the blend.
    *
    * Scale: one (source, token) count scan; the top-10 window is
    * per-source partitioned; the pair join runs on |S|·10 rows. */
  val qVocabOverlap: Q = (s, dir) => {
    val counts = Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("tok"))
    val top = graft.CacheScope.track(counts
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("source"), col("tok")).persist())
    val sizes = top.groupBy(col("source")).agg(count(lit(1)).as("k"))
    val inter = top.as("a").join(top.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("inter"))
    sizes.as("x").join(sizes.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("sa"), col("y.source").as("sb"),
        col("x.k").as("ka"), col("y.k").as("kb"))
      .join(inter, Seq("sa", "sb"), "left")
      .na.fill(0L, Seq("inter"))
      .select(col("sa"), col("sb"), col("inter"),
        (col("ka") + col("kb") - col("inter")).as("uni"),
        expr("inter * 1000 div (ka + kb - inter)").as("jaccard_permille"))
      .orderBy(col("sa"), col("sb"))
  }

  /** Best-fit-decreasing sequence packing (the classic bin-packing
    * heuristic, Johnson 1973, applied to LLM context windows): docs
    * sort by (len DESC, doc_id) within their shard and each goes into
    * the FULLEST bin that still fits (min remaining ≥ len, lowest bin
    * index on ties), else opens a new 1024-token bin — the
    * no-straddle alternative to q_pack_efficiency's concat-and-chunk
    * (which splits documents across block boundaries). Output per
    * shard: docs, token total, bins used, fill permille, and the
    * contiguous-packing lower bound ceil(total/1024) for contrast —
    * the table a training-throughput owner reads before picking a
    * packer.
    *
    * Scale: packing is inherently sequential WITHIN a shard, so the
    * fold runs as ONE `aggregate` higher-order expression per shard
    * row — and the shards are FIXED-SIZE 512-doc blocks (doc_id div
    * 512), NOT a fixed count: per-step work is O(bins) ≤ O(512) by
    * construction, shard count grows with the corpus and shards pack
    * in parallel — linear total. The first cut sharded doc_id % 8
    * (fixed COUNT, growing size) and the immutable-array fold went
    * quadratic per shard: StressBench measured **270× at 10× data**;
    * this bounded-shard re-shard brought it back to ~1× (the same
    * blocked-state discipline every dedup join here follows). Lens
    * clamp to the 1024 cap (an over-long doc fills one bin
    * exactly). */
  val qPackBestfit: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), expr("doc_id div 512").as("shard"),
        least(size(split(col("text"), " ")).cast("long"), lit(1024L))
          .as("len"))
    val bestIdx = "array_position(st, array_min(" +
      "filter(st, c -> c >= d.len)))"
    docs.groupBy(col("shard"))
      .agg(sort_array(collect_list(struct((-col("len")).as("nl"),
          col("doc_id"), col("len")))).as("ds"),
        count(lit(1)).as("n_docs"), sum(col("len")).as("total_len"))
      .withColumn("bins", expr(
        s"""aggregate(ds, CAST(array() AS ARRAY<BIGINT>), (st, d) ->
             CASE WHEN size(filter(st, c -> c >= d.len)) = 0
                  THEN concat(st, array(CAST(1024 AS BIGINT) - d.len))
                  ELSE transform(sequence(1, size(st)), i ->
                    IF(i = $bestIdx,
                       element_at(st, CAST(i AS INT)) - d.len,
                       element_at(st, CAST(i AS INT))))
             END)"""))
      .select(col("shard"), col("n_docs"), col("total_len"),
        size(col("bins")).cast("long").as("bins"),
        expr("total_len * 1000 div (size(bins) * 1024)")
          .as("fill_permille"),
        expr("(total_len + 1023) div 1024").as("contig_lower_bound"))
      .orderBy(col("shard"))
  }

  /** MATTR — moving-average type-token ratio (Covington & McFall,
    * JQL 2010): the length-independent lexical-diversity standard.
    * Plain TTR shrinks with document length (Zipf), so cross-length
    * comparisons lie; MATTR slides a fixed 25-token window and
    * averages the per-window type counts — every window contributes
    * the same denominator regardless of document length. Per source:
    * docs measured (≥ 25 tokens), window count, and MATTR in permille
    * (Σ types · 1000 div (windows · 25), exact floor arithmetic; the
    * per-window type count is an integer, so no floats anywhere).
    *
    * Scale: per-doc windows are a higher-order expression INSIDE the
    * scan (O(len·w) per doc, w = 25 fixed) — no explode of the
    * window×token stream, no shuffle wider than |sources|. */
  val qTextMattr: Q = (s, dir) => {
    val W = 25
    val docs = Tables(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= W)
      .select(col("source"),
        (size(col("t")) - (W - 1)).cast("long").as("n_windows"),
        expr(s"""aggregate(sequence(1, size(t) - ${W - 1}),
             CAST(0 AS BIGINT), (acc, i) ->
               acc + size(array_distinct(slice(t, i, $W))))""")
          .as("types_sum"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("windows"),
        sum(col("types_sum")).as("types_sum"))
      .select(col("source"), col("n_docs"), col("windows"),
        expr(s"types_sum * 1000 div (windows * $W)")
          .as("mattr_permille"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_eval_lc_winrate" -> qEvalLcWinrate,
    "q_vocab_overlap" -> qVocabOverlap,
    "q_pack_bestfit" -> qPackBestfit,
    "q_text_mattr" -> qTextMattr)

  val oracle: Map[String, String] = Map(
    "q_eval_lc_winrate" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      sc AS (SELECT d.source,
               least(len(string_split(d.text, ' ')) // 64, 15) AS bin,
               s.score_milli
             FROM scored s JOIN documents d USING (doc_id)),
      g AS (SELECT source, bin, score_milli,
              CAST(count(*) AS BIGINT) AS n
            FROM sc GROUP BY 1, 2, 3),
      base AS (SELECT bin, score_milli, n AS nb FROM g
               WHERE source = 'src0'),
      axis AS (SELECT DISTINCT bin, score_milli FROM g),
      base_cum AS (
        SELECT bin, score_milli, coalesce(nb, 0) AS nb,
          CAST(coalesce(sum(coalesce(nb, 0)) OVER (PARTITION BY bin
            ORDER BY score_milli ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS BIGINT) AS below
        FROM axis LEFT JOIN base USING (bin, score_milli)),
      per_bin AS (
        SELECT g.source, g.bin,
          CAST(sum(g.n * (2 * bc.below + bc.nb)) AS BIGINT) AS win2,
          CAST(sum(g.n) AS BIGINT) AS ns
        FROM g JOIN base_cum bc USING (bin, score_milli)
        WHERE g.source <> 'src0'
        GROUP BY 1, 2),
      bin_tot AS (SELECT bin, CAST(sum(nb) AS BIGINT) AS n0
                  FROM base GROUP BY 1),
      scored_bins AS (
        SELECT source, per_bin.bin,
          win2 * 1000 // (2 * ns * n0) AS bin_permille,
          win2, 2 * ns * n0 AS den2
        FROM per_bin JOIN bin_tot USING (bin) WHERE n0 > 0)
      SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
        CAST(sum(win2) * 1000 // sum(den2) AS BIGINT)
          AS raw_win_permille,
        CAST(sum(bin_permille) // count(*) AS BIGINT)
          AS lc_win_permille,
        CAST(sum(win2) * 1000 // sum(den2)
          - sum(bin_permille) // count(*) AS BIGINT) AS lc_gap
      FROM scored_bins GROUP BY source ORDER BY source""",
    "q_pack_bestfit" -> """
      WITH RECURSIVE docs AS (
        SELECT doc_id, doc_id // 512 AS shard,
          least(CAST(len(string_split(text, ' ')) AS BIGINT), 1024)
            AS len
        FROM documents),
      ordered AS (SELECT shard, doc_id, len,
                    CAST(row_number() OVER (PARTITION BY shard
                      ORDER BY len DESC, doc_id) AS BIGINT) AS idx
                  FROM docs),
      state AS (
        SELECT shard, CAST(0 AS BIGINT) AS idx,
          CAST([] AS BIGINT[]) AS bins
        FROM (SELECT DISTINCT shard FROM docs)
        UNION ALL
        SELECT s.shard, o.idx,
          CASE WHEN len(list_filter(s.bins, c -> c >= o.len)) = 0
               THEN list_append(s.bins, 1024 - o.len)
               ELSE list_transform(range(1, len(s.bins) + 1), i ->
                 CASE WHEN i = list_position(s.bins,
                        list_min(list_filter(s.bins, c -> c >= o.len)))
                      THEN s.bins[i] - o.len ELSE s.bins[i] END)
          END
        FROM state s JOIN ordered o
          ON o.shard = s.shard AND o.idx = s.idx + 1),
      final AS (SELECT shard, bins FROM state s
                WHERE idx = (SELECT max(idx) FROM ordered o2
                             WHERE o2.shard = s.shard)),
      tots AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len) AS BIGINT) AS total_len
               FROM docs GROUP BY 1)
      SELECT t.shard, t.n_docs, t.total_len,
        CAST(len(f.bins) AS BIGINT) AS bins,
        t.total_len * 1000 // (CAST(len(f.bins) AS BIGINT) * 1024)
          AS fill_permille,
        (t.total_len + 1023) // 1024 AS contig_lower_bound
      FROM tots t JOIN final f USING (shard)
      ORDER BY t.shard""",
    "q_text_mattr" -> """
      WITH docs AS (
        SELECT source, string_split(text, ' ') AS t FROM documents),
      per AS (
        SELECT source,
          CAST(len(t) - 24 AS BIGINT) AS n_windows,
          CAST(list_sum(list_transform(range(1, len(t) - 23),
            i -> len(list_distinct(t[i:i+24])))) AS BIGINT) AS types_sum
        FROM docs WHERE len(t) >= 25)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_windows) AS BIGINT) AS windows,
        CAST(sum(types_sum) AS BIGINT) * 1000
          // (CAST(sum(n_windows) AS BIGINT) * 25) AS mattr_permille
      FROM per GROUP BY source ORDER BY source""",
    "q_vocab_overlap" -> """
      WITH counts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
                      FROM (SELECT source, unnest(string_split(text, ' '))
                              AS tok FROM documents)
                      GROUP BY 1, 2),
      top AS (SELECT source, tok FROM counts
              QUALIFY row_number() OVER (PARTITION BY source
                ORDER BY c DESC, tok) <= 10),
      sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS k
                FROM top GROUP BY 1),
      inter AS (SELECT a.source AS sa, b.source AS sb,
                  CAST(count(*) AS BIGINT) AS inter
                FROM top a JOIN top b
                  ON a.tok = b.tok AND a.source < b.source
                GROUP BY 1, 2)
      SELECT x.source AS sa, y.source AS sb,
        coalesce(i.inter, 0) AS inter,
        x.k + y.k - coalesce(i.inter, 0) AS uni,
        coalesce(i.inter, 0) * 1000 // (x.k + y.k - coalesce(i.inter, 0))
          AS jaccard_permille
      FROM sizes x JOIN sizes y ON x.source < y.source
      LEFT JOIN inter i ON i.sa = x.source AND i.sb = y.source
      ORDER BY sa, sb""")
}

package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Corpus + analytics operators, r10 wave 2 (SURVEY.md §2.M):
  * classifier precision/recall threshold sweep, near-dup cluster-size
  * histogram, Broder containment pairs, bucket-decomposed Spearman
  * rank correlation, and per-group MAD robust scale.
  *
  * Determinism contract (CorpusOps5 discipline): exact int64/decimal
  * arithmetic throughout, non-negative integer divisions, zero-denominator
  * guards via `greatest(x, 1)` (identical in both engines — DuckDB
  * errors on `// 0` where Spark yields null, so neither form is ever
  * evaluated).
  */
object CorpusOps20 {

  /** Precision/recall/F1 threshold sweep over the fastText-style
    * quality classifier ([[CorpusOps10.scored]]): the operating-point
    * table a pipeline reads before picking the keep-threshold — the
    * natural complement of q_classifier_auc (ranking quality) and
    * q_calibration_bins (probability quality).
    *
    * Exactness: tp/fp/fn are exact counts; the three rates are integer
    * permille with `greatest(denom, 1)` guards.
    *
    * Scale: docs collapse to DISTINCT-SCORE rows (bounded by the
    * weight-table range, not the corpus) before the 5-row threshold
    * cross join; everything after is threshold-table-sized. */
  val qClassifierPrCurve: Q = (s, dir) => {
    val thresholds = Seq(900000L, 1050000L, 1100000L, 1150000L, 1250000L)
    val byScore = CorpusOps10.scored(s, dir)
      .groupBy(col("score_milli"))
      .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("ng"))
    val th = s.createDataFrame(s.sparkContext.parallelize(
        thresholds.map(org.apache.spark.sql.Row(_)), 1),
      new org.apache.spark.sql.types.StructType()
        .add("threshold", org.apache.spark.sql.types.LongType))
    byScore.crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("score_milli") >= col("threshold"), col("p"))
          .otherwise(0L)).as("tp"),
        sum(when(col("score_milli") >= col("threshold"), col("ng"))
          .otherwise(0L)).as("fp"),
        sum(when(col("score_milli") < col("threshold"), col("p"))
          .otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        expr("tp * 1000 div greatest(tp + fp, 1)").as("precision_permille"),
        expr("tp * 1000 div greatest(tp + fn, 1)").as("recall_permille"),
        expr("2 * tp * 1000 div greatest(2 * tp + fp + fn, 1)")
          .as("f1_permille"))
      .orderBy(col("threshold"))
  }

  /** Near-dup cluster-SIZE histogram over the connected components of
    * [[Dedup.qDedupComponents]]: how many clusters of 2, 3, ... docs
    * the jaccard graph contains, and the doc mass in each band — the
    * one-page summary a dedup run publishes ("N docs sit in M clusters;
    * keeping one per cluster drops D docs").
    *
    * Scale: rides the components output (already iterative-safe);
    * the two rollups shuffle component-count then size-count rows. */
  val qDedupClusterSizes: Q = (s, dir) => {
    Dedup.qDedupComponents(s, dir)
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  /** Broder CONTAINMENT pairs (Broder 1997, "On the resemblance and
    * containment of documents"): for candidate doc pairs sharing a
    * df-capped 3-shingle, C(A,B) = |S(A)∩S(B)| / |S(A)| — the metric
    * that catches near-SUBSET relations (a doc quoting most of a
    * shorter one) which symmetric Jaccard resemblance under-scores.
    * Emits pairs where either direction ≥ 800 permille.
    *
    * Scale: the q_dedup_jaccard discipline exactly — shingles hash to
    * 8-byte xxhash64 keys for the shuffle, the df>100 hot-shingle list
    * is removed by anti-join BEFORE the pair join, intersections
    * partial-aggregate. Exactness: containment is integer permille;
    * the oracle replays string-keyed shingles (no-collision assumption
    * shared with q_dedup_jaccard, hash-verified every round). */
  val qDedupContainment: Q = (s, dir) => {
    val sh = graft.CacheScope.track(Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(array_distinct(when(size(col("t")) >= 3,
          expr("""transform(sequence(1, size(t) - 2),
                  i -> concat_ws(' ', element_at(t, i),
                                 element_at(t, i + 1),
                                 element_at(t, i + 2)))"""))
          .otherwise(array()))).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
      .persist())
    val hot = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 100).select(col("h"))
    val kept = sh.join(hot, Seq("h"), "left_anti")
    val keptP = graft.CacheScope.track(kept.persist())
    // attach each doc's shingle-set size BEFORE the pair join
    // (optimization r18 — the Dedup.jaccardPairStreamOf r17 rework,
    // which this operator's shape predated): the r10 form joined
    // sizes into the PAIR stream afterwards, exchanging the
    // (da, db, i) stream twice more (by da, then by db). The doc-keyed
    // exchange the sizes aggregate needs is shared with the attach
    // join, the pair stream is exchanged exactly once (the partial
    // agg), and na / nb ride the group key — functions of da / db, so
    // the groups and every output value are identical. shuffle_hash
    // skips the per-side sort; both sides stay identical exchanges, so
    // ReuseExchange computes the size-attached subtree once.
    val sizes = keptP.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shN = keptP.join(sizes, Seq("doc_id"))
    val inter = shN.as("a").join(shN.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
    inter
      .select(col("da"), col("db"), col("i"), col("na"), col("nb"),
        expr("i * 1000 div na").as("c_ab_permille"),
        expr("i * 1000 div nb").as("c_ba_permille"))
      .filter(greatest(col("c_ab_permille"), col("c_ba_permille")) >= 800)
      .orderBy(col("da"), col("db"))
  }

  /** Spearman rank correlation between document length (tokens) and
    * lexical quality (unique-token permille) — the "does my quality
    * score just measure length?" audit every filter deployment runs.
    * rho = 1 − 6·Σd² / (n(n²−1)) over tie-broken global ranks.
    *
    * Scale: BOTH global ranks come from
    * [[ScaleWindows.bucketedRowNumber]] — broadcast bucket offsets +
    * per-bucket windows, NO single-partition sort (the r9 verdict's
    * named scale-killer, avoided by construction in new operators).
    * The DuckDB oracle runs the naive global row_number — the hash
    * match is the decomposition's proof. Σd² accumulates in
    * DECIMAL(38,0) (d ≤ n, so d² tops int64 past ~3M docs); the
    * emitted column is BIGINT at fixture scale. */
  val qCorrSpearman: Q = (s, dir) => {
    val scored = graft.CacheScope.track(Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), size(col("a")).cast("long").as("ntok"),
        expr("size(array_distinct(a)) * 1000 div size(a)").as("qpm"))
      .persist())
    val r1 = graft.CacheScope.track(
      ScaleWindows.bucketedRowNumber(scored, expr("ntok div 64"), false,
        Seq(col("ntok").asc, col("doc_id").asc), "rank_len").persist())
    val r2 = ScaleWindows.bucketedRowNumber(r1, expr("qpm div 50"), false,
      Seq(col("qpm").asc, col("doc_id").asc), "rank_q")
    // first factor promoted to DECIMAL(38,0) BEFORE the square (the
    // ADVICE r9 overflow-ordering rule): d ≤ n, so d² wraps int64 past
    // ~3e9 docs; the oracle promotes the same operand to HUGEINT
    r2.agg(count(lit(1)).as("n"),
        sum((col("rank_len") - col("rank_q")).cast(DecimalType(38, 0)) *
          (col("rank_len") - col("rank_q")))
          .as("sd2"))
      .select(col("n"), col("sd2").cast("long").as("sum_d2"),
        (lit(1.0) - (lit(6.0) * col("sd2").cast("double")) /
          (col("n").cast("double") *
            (col("n").cast("double") * col("n").cast("double") - lit(1.0))))
          .as("rho"))
  }

  /** Median absolute deviation per return flag over line revenue in
    * exact cents — the robust scale estimate that complements
    * q_robust_stats' IQR fences (MAD resists 50% contamination vs the
    * IQR's 25%). Reports the type-1 median, the MAD, and the count
    * beyond 3·MAD (the robust outlier screen; the 1.4826 gaussian
    * consistency constant is deliberately NOT applied — it is a float
    * convention, and the 3·MAD cut is the exact-integer form).
    *
    * Scale: two rank windows per flag group (3 groups — dimension-
    * bounded partitions, same cost class as q_robust_stats), each
    * followed by a 3-row broadcast back onto the scan. */
  val qRobustMad: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val cents = graft.CacheScope.track(Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      .persist())
    def medianOf(df: org.apache.spark.sql.DataFrame, vc: String,
        out: String) = {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col(vc), col("l_orderkey"), col("l_linenumber"))
      val wn = Window.partitionBy(col("l_returnflag"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          max(when(expr("rn = (n + 1) div 2"), col(vc))).as(out))
    }
    val med = medianOf(cents, "v", "med_cents")
      .select(col("l_returnflag"), col("n"), col("med_cents"))
    val dev = cents.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("ad", abs(col("v") - col("med_cents")))
    val mad = medianOf(dev, "ad", "mad_cents")
      .select(col("l_returnflag"), col("mad_cents"))
    dev.join(broadcast(mad), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"), max(col("med_cents")).as("med_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(col("ad") > lit(3L) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_beyond_3mad"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q] = Map(
    "q_classifier_pr_curve" -> qClassifierPrCurve,
    "q_dedup_cluster_sizes" -> qDedupClusterSizes,
    "q_dedup_containment" -> qDedupContainment,
    "q_corr_spearman" -> qCorrSpearman,
    "q_robust_mad" -> qRobustMad)

  val oracle: Map[String, String] = Map(
    "q_classifier_pr_curve" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      by_score AS (SELECT score_milli, CAST(sum(pos) AS BIGINT) AS p,
                     CAST(sum(1 - pos) AS BIGINT) AS ng
                   FROM scored GROUP BY 1),
      th AS (SELECT unnest([900000, 1050000, 1100000, 1150000, 1250000])
               AS threshold),
      agg AS (SELECT CAST(threshold AS BIGINT) AS threshold,
                CAST(sum(CASE WHEN score_milli >= threshold THEN p
                  ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN score_milli >= threshold THEN ng
                  ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN score_milli < threshold THEN p
                  ELSE 0 END) AS BIGINT) AS fn
              FROM by_score CROSS JOIN th GROUP BY 1)
      SELECT threshold, tp, fp, fn,
        tp * 1000 // greatest(tp + fp, 1) AS precision_permille,
        tp * 1000 // greatest(tp + fn, 1) AS recall_permille,
        2 * tp * 1000 // greatest(2 * tp + fp + fn, 1) AS f1_permille
      FROM agg ORDER BY threshold""",
    "q_dedup_cluster_sizes" -> (Dedup.componentsCte + """,
      comp AS (SELECT v AS doc_id, min(l) AS component
               FROM reach GROUP BY v),
      cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
             FROM comp GROUP BY 1)
      SELECT cluster_size, count(*) AS n_clusters,
        CAST(cluster_size * count(*) AS BIGINT) AS n_docs
      FROM cs GROUP BY cluster_size ORDER BY cluster_size"""),
    "q_dedup_containment" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
      sh0 AS (SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
             FROM (SELECT *, unnest(range(1, len(t) - 1)) AS i FROM toks)),
      keep AS (SELECT g FROM sh0 GROUP BY g HAVING count(*) <= 100),
      sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN keep USING (g)),
      sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  CAST(count(*) AS BIGINT) AS i
                FROM sh a JOIN sh b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT da, db, i, sa.n AS na, sb.n AS nb,
        i * 1000 // sa.n AS c_ab_permille,
        i * 1000 // sb.n AS c_ba_permille
      FROM inter
      JOIN sizes sa ON da = sa.doc_id
      JOIN sizes sb ON db = sb.doc_id
      WHERE greatest(i * 1000 // sa.n, i * 1000 // sb.n) >= 800
      ORDER BY da, db""",
    "q_corr_spearman" -> """
      WITH scored AS (
        SELECT doc_id, CAST(len(a) AS BIGINT) AS ntok,
          CAST(len(list_distinct(a)) AS BIGINT) * 1000 // len(a) AS qpm
        FROM (SELECT doc_id, string_split(text, ' ') AS a
              FROM documents)),
      r AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY ntok, doc_id) AS BIGINT)
                AS rank_len,
              CAST(row_number() OVER (ORDER BY qpm, doc_id) AS BIGINT)
                AS rank_q
            FROM scored)
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST((rank_len - rank_q) AS HUGEINT)
          * (rank_len - rank_q)) AS BIGINT) AS sum_d2,
        1.0 - (6.0 * CAST(sum(CAST((rank_len - rank_q) AS HUGEINT)
            * (rank_len - rank_q)) AS DOUBLE)) /
          (CAST(count(*) AS DOUBLE) *
            (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) - 1.0))
          AS rho
      FROM r""",
    "q_robust_mad" -> """
      WITH c AS (SELECT l_returnflag, l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v
                 FROM lineitem),
      rk AS (SELECT *,
               CAST(row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY v, l_orderkey, l_linenumber) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
                 AS n
             FROM c),
      med AS (SELECT l_returnflag, max(n) AS n,
                max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med_cents
              FROM rk GROUP BY 1),
      dev AS (SELECT c.l_returnflag, c.l_orderkey, c.l_linenumber,
                abs(c.v - m.med_cents) AS ad, m.n, m.med_cents
              FROM c JOIN med m USING (l_returnflag)),
      rk2 AS (SELECT *,
                CAST(row_number() OVER (PARTITION BY l_returnflag
                  ORDER BY ad, l_orderkey, l_linenumber) AS BIGINT)
                  AS rn
              FROM dev),
      mad AS (SELECT l_returnflag,
                max(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad_cents
              FROM rk2 GROUP BY 1)
      SELECT d.l_returnflag, max(d.n) AS n,
        max(d.med_cents) AS med_cents, max(m.mad_cents) AS mad_cents,
        CAST(sum(CASE WHEN d.ad > 3 * m.mad_cents THEN 1 ELSE 0 END)
          AS BIGINT) AS n_beyond_3mad
      FROM dev d JOIN mad m USING (l_returnflag)
      GROUP BY d.l_returnflag ORDER BY d.l_returnflag""")
}

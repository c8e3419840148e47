package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 8 (SURVEY.md §2.M): a
  * fastText-style hashed linear quality classifier, a Count-Min sketch
  * with probe-key error audit, RFM customer segmentation, exact-integer
  * robust column statistics (winsorization + IQR outlier gate),
  * class-balance reweighting for labeled embeddings, and a
  * deterministic per-source reservoir sample.
  *
  * Determinism contract (same as CorpusOps5): md5 is the only hash
  * (`conv(substr(md5(x),1,k),16,10)` ↔ DuckDB `'0x'||substr(...)`),
  * every score is exact int64 arithmetic, and every integer division
  * has non-negative operands so Spark's truncating `div` and DuckDB's
  * flooring `//` agree.
  */
object CorpusOps6 {

  /** fastText-style linear quality classifier (Joulin et al. 2016,
    * "Bag of Tricks for Efficient Text Classification") run as a
    * SCORING pass: tokens hash into 256 feature buckets
    * (md5-prefix % 256), a broadcast weight table (the "trained
    * model" — here a deterministic Weyl sequence in [0, 2002] so both
    * engines derive identical weights) scores each bucket, and a doc
    * keeps iff its mean token weight clears the midpoint. This is the
    * quality-filter shape of the GPT-3/LLaMA pipelines: model weights
    * ride a broadcast dim table, never a UDF closure.
    *
    * Exactness: weights are non-negative integers and the per-doc mean
    * is `sum * 1000 div ntok` — all operands non-negative.
    *
    * Scale: token rows partial-aggregate to (doc, bucket) counts —
    * at most 256 rows per doc — BEFORE the weight join; the weight
    * table is 256 rows broadcast; the only doc-keyed shuffle carries
    * bucket-level rows, never raw tokens. */
  val qQualityClassifier: Q = (s, dir) => {
    val weights = broadcast(s.range(0, 256).select(
      col("id").as("bucket"),
      (col("id") * lit(2654435761L) % 2003).as("weight")))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), col("source"),
        size(col("a")).cast("long").as("ntok"), explode(col("a")).as("w"))
      .withColumn("bucket",
        conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long") % 256)
      .groupBy(col("doc_id"), col("source"), col("ntok"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .join(weights, Seq("bucket"))
      .groupBy(col("doc_id"), col("source"), col("ntok"))
      .agg(sum(col("c") * col("weight")).as("raw"))
      .select(col("doc_id"), col("source"), col("ntok"),
        expr("raw * 1000 div ntok").as("score_milli"))
      .withColumn("kept", col("score_milli") >= 1001000L)
      .orderBy(col("doc_id"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over lineitem
    * part frequencies: depth d=4 md5-derived hash rows x width w=256
    * buckets, then a point-query audit for probe keys 1..20 — the CMS
    * estimate (min over rows) vs the exact count, with the guaranteed
    * overestimate as exact permille. Complements the KMV theta sketch
    * (distincts) and the topk sketch (heavy hitters) with the
    * frequency-sketch family member.
    *
    * Scale: the sketch is d*w = 1024 cells whatever the input size,
    * and the 4x row fan-out partial-aggregates map-side to at most
    * 1024 rows per task before the single tiny shuffle; probes join
    * the broadcast cell table. The sketch build is one linear scan —
    * the shape that survives 100 TB is exactly this: constant-size
    * state, map-side combine, no per-key anything. */
  val qAggCountmin: Q = (s, dir) => {
    def bucketOf(j: Column, key: Column): Column =
      conv(substring(md5(concat_ws("_", j, key)), 1, 8), 16, 10)
        .cast("long") % 256
    val li = Tables(s, dir, "lineitem").select(col("l_partkey"))
    val cells = li
      .select(explode(expr("sequence(0, 3)")).as("j"), col("l_partkey"))
      .withColumn("bucket", bucketOf(col("j"), col("l_partkey")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cell"))
    val probes = s.range(1, 21).select(col("id").as("probe_key"))
      .select(col("probe_key"), explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("bucket", bucketOf(col("j"), col("probe_key")))
    val est = probes
      .join(broadcast(cells), Seq("j", "bucket"), "left")
      .groupBy(col("probe_key"))
      .agg(min(coalesce(col("cell"), lit(0L))).as("cm_estimate"))
    val truth = li.filter(col("l_partkey").between(1, 20))
      .groupBy(col("l_partkey").as("probe_key"))
      .agg(count(lit(1)).as("true_cnt"))
    est.join(truth, Seq("probe_key"))
      .select(col("probe_key"), col("true_cnt"), col("cm_estimate"),
        expr("cm_estimate * 1000 div true_cnt").as("overest_permille"))
      .orderBy(col("probe_key"))
  }

  /** RFM customer segmentation (Hughes 1994; the classic CRM cube):
    * per purchasing customer, recency (days since last order vs the
    * corpus max date), frequency (order count) and monetary (lifetime
    * total in exact cents), each quintiled with ntile(5) under a
    * deterministic total order, then rolled up to the (r, f, m)
    * segment grid. Quintile 1 = most recent / most frequent / highest
    * spend.
    *
    * Exactness: money becomes integer cents once
    * (round(price * 100) — identical IEEE multiply + half-up round in
    * both engines for positive values); ntile's fill rule (floor + 1
    * extra row in the first `n mod 5` buckets) is the SQL standard and
    * identical in Spark and DuckDB given the tie-broken ORDER BY.
    *
    * Scale: the per-customer rollup is one partial-aggregated shuffle,
    * persisted once for the three quintile passes. Each quintile is the
    * [[ScaleWindows.bucketedNtile]] bucket-offset decomposition — NO
    * unpartitioned window anywhere in the plan (the r9 verdict's named
    * scale-killer): global rank = broadcast bucket offset + per-bucket
    * row_number, ntile from the rank in exact integer arithmetic. The
    * bucket divisors (64-day recency bands, raw order-count, $100k
    * monetary bands) bound the offset tables at tens-to-hundreds of
    * rows while keeping per-bucket partitions ~1/buckets of the
    * customer dimension. */
  val qCustomerRfm: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    val mx = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
    val per = graft.CacheScope.track(o.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("monetary_cents"))
      .crossJoin(broadcast(mx))
      .select(col("o_custkey"), col("frequency"), col("monetary_cents"),
        datediff(col("mx"), col("last_order")).cast("long")
          .as("recency_days"))
      .persist())
    val passes = Seq(
      ("r_score", expr("recency_days div 64"), false,
        Seq(col("recency_days").asc, col("o_custkey").asc)),
      ("f_score", col("frequency"), true,
        Seq(col("frequency").desc, col("o_custkey").asc)),
      ("m_score", expr("monetary_cents div 10000000"), true,
        Seq(col("monetary_cents").desc, col("o_custkey").asc)))
    // each pass's output is persisted so the next pass's four lineage
    // references (counts / offsets / n / main) hit a cached scan instead
    // of replaying the previous pass's plan 4x (exponential otherwise)
    val scored = passes.foldLeft(per) { case (df, (nm, b, d, ord)) =>
      graft.CacheScope.track(
        ScaleWindows.bucketedNtile(df, 5, b, d, ord, nm)
          .withColumn(nm, col(nm).cast("int"))
          .persist())
    }
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("segment_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Robust column statistics per l_returnflag over l_extendedprice in
    * exact integer cents: rank-based quartiles (type-1 / ceil-index —
    * no interpolation, so every statistic is an ACTUAL data value and
    * exact int64), Tukey fences at 1.5 IQR, outlier counts beyond each
    * fence, and the winsorized mean (values clamped to the fences) —
    * the data-cleaning profile a pipeline runs before training a
    * numeric model on a column.
    *
    * Exactness: cents = round(price * 100) (identical in both
    * engines); quartile indexes are ceil via `(k*n + 3) div 4`; the
    * 1.5x fence is `(3 * iqr) div 2` (iqr >= 0); the winsorized sum
    * divides non-negative clamped cents by n.
    *
    * Scale: one windowed sort per flag group (3 groups) for the ranks,
    * then a broadcast of the 3-row quartile table back onto the scan
    * for the clamp pass. At 100 TB the rank pass becomes
    * approx_percentile the same way as [[qCustomerRfm]]'s note; the
    * clamp pass is already map-side. */
  val qRobustStats: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val cents = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
    val ranked = cents
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))))
      .withColumn("n", count(lit(1)).over(Window
        .partitionBy(col("l_returnflag"))))
    val quart = ranked.groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"),
        max(when(expr("rn = (n + 3) div 4"), col("v"))).as("q1"),
        max(when(expr("rn = (2 * n + 3) div 4"), col("v"))).as("med"),
        max(when(expr("rn = (3 * n + 3) div 4"), col("v"))).as("q3"))
      .select(col("l_returnflag"), col("n"), col("q1"), col("med"),
        col("q3"),
        (col("q1") - expr("(3 * (q3 - q1)) div 2")).as("lo"),
        (col("q3") + expr("(3 * (q3 - q1)) div 2")).as("hi"))
    cents.join(broadcast(quart), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"),
        max(col("q1")).as("q1_cents"), max(col("med")).as("med_cents"),
        max(col("q3")).as("q3_cents"),
        max(col("lo")).as("lo_cents"), max(col("hi")).as("hi_cents"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("out_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("out_hi"),
        sum(greatest(least(col("v"), col("hi")), col("lo"))).as("wsum"))
      .select(col("l_returnflag"), col("n"), col("q1_cents"),
        col("med_cents"), col("q3_cents"), col("lo_cents"),
        col("hi_cents"), col("out_lo"), col("out_hi"),
        expr("wsum div n").as("wins_mean_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** Class-balance reweighting over the labeled embeddings: per label,
    * inverse-frequency weight (N / (L * n) as exact permille), the
    * median-frequency-balancing weight (Eigen & Fergus 2015 — median
    * class count / n, exact permille; median = low median, an actual
    * count), and the uniform resample target N div L with the signed
    * excess. The imbalance audit every classifier-training pipeline
    * runs before sampling.
    *
    * Scale: one partial-aggregated shuffle to L label rows; everything
    * after is label-count-sized (window over L rows, broadcast of two
    * scalars). */
  val qLabelBalance: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(s, dir, "embeddings")
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
    val med = counts
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n"), col("label"))))
      .withColumn("nl", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .filter(expr("rn = (nl + 1) div 2"))
      .select(col("n").as("med_n"))
    val totals = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_labels"))
    counts.crossJoin(broadcast(totals)).crossJoin(broadcast(med))
      .select(col("label"), col("n"), col("total"), col("n_labels"),
        expr("total * 1000 div (n_labels * n)").as("inv_weight_permille"),
        expr("med_n * 1000 div n").as("medfreq_weight_permille"),
        expr("total div n_labels").as("resample_target"),
        (col("n") - expr("total div n_labels")).as("excess"))
      .orderBy(col("label"))
  }

  /** Deterministic per-source "reservoir" sample: 10 docs per source,
    * chosen by md5(doc_id) rank — the uniform-without-replacement
    * debug sample a data card ships per shard. The md5 hex string IS
    * the sort key (identical lexicographic order in both engines), so
    * re-running on any engine reproduces the same sample — the
    * property that makes the sample auditable.
    *
    * Scale: one window per source partition; the rank key is computed
    * map-side and the per-group limit lowers to WindowGroupLimit (no
    * full sort of non-surviving rows). */
  val qSampleReservoir: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    Tables(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("rk"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("source"))
        .orderBy(col("rk"), col("doc_id"))))
      .filter(col("rn") <= 10)
      .select(col("source"), col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rn"))
  }

  val queries: Map[String, Q] = Map(
    "q_quality_classifier" -> qQualityClassifier,
    "q_agg_countmin" -> qAggCountmin,
    "q_customer_rfm" -> qCustomerRfm,
    "q_robust_stats" -> qRobustStats,
    "q_label_balance" -> qLabelBalance,
    "q_sample_reservoir" -> qSampleReservoir)

  val oracle: Map[String, String] = Map(
    "q_quality_classifier" -> """
      WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS a
                 FROM documents),
      t AS (SELECT doc_id, source, CAST(len(a) AS BIGINT) AS ntok,
              unnest(a) AS w
            FROM d),
      b AS (SELECT doc_id, source, ntok,
              CAST('0x' || substr(md5(w), 1, 4) AS BIGINT) % 256 AS bucket,
              count(*) AS c
            FROM t GROUP BY 1, 2, 3, 4),
      wt AS (SELECT r AS bucket, (r * 2654435761) % 2003 AS weight
             FROM (SELECT unnest(range(0, 256)) AS r)),
      sc AS (SELECT doc_id, source, ntok,
               CAST(sum(c * weight) AS BIGINT) AS raw
             FROM b JOIN wt USING (bucket) GROUP BY 1, 2, 3)
      SELECT doc_id, source, ntok, raw * 1000 // ntok AS score_milli,
             raw * 1000 // ntok >= 1001000 AS kept
      FROM sc ORDER BY doc_id""",
    "q_agg_countmin" -> """
      WITH li AS (SELECT l_partkey FROM lineitem),
      f AS (SELECT j.j, l_partkey,
              CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || '_'
                || CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 256
                AS bucket
            FROM li CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j),
      cells AS (SELECT j, bucket, count(*) AS cell FROM f GROUP BY 1, 2),
      probes AS (SELECT p.p AS probe_key, j.j,
                   CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || '_'
                     || CAST(p.p AS VARCHAR)), 1, 8) AS BIGINT) % 256
                     AS bucket
                 FROM (SELECT unnest(range(1, 21)) AS p) p
                 CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j),
      est AS (SELECT probe_key,
                min(coalesce(cell, 0)) AS cm_estimate
              FROM probes LEFT JOIN cells USING (j, bucket)
              GROUP BY 1),
      truth AS (SELECT l_partkey AS probe_key, count(*) AS true_cnt
                FROM li WHERE l_partkey BETWEEN 1 AND 20 GROUP BY 1)
      SELECT probe_key, true_cnt, cm_estimate,
             cm_estimate * 1000 // true_cnt AS overest_permille
      FROM est JOIN truth USING (probe_key) ORDER BY probe_key""",
    "q_customer_rfm" -> """
      WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
      per AS (SELECT o_custkey,
                max(CAST(o_orderdate AS DATE)) AS last_order,
                count(*) AS frequency,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_cents
              FROM orders GROUP BY 1),
      r AS (SELECT o_custkey, frequency, monetary_cents,
              CAST(date_diff('day', last_order, mx) AS BIGINT)
                AS recency_days
            FROM per CROSS JOIN mx),
      sc AS (SELECT *,
               ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
                 AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC)
                 AS f_score,
               ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
                 AS m_score
             FROM r)
      SELECT r_score, f_score, m_score, count(*) AS n_customers,
             CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
      FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q_robust_stats" -> """
      WITH c AS (SELECT l_returnflag, l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v
                 FROM lineitem),
      rk AS (SELECT *,
               CAST(row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY v, l_orderkey, l_linenumber) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
                 AS n
             FROM c),
      q AS (SELECT l_returnflag, max(n) AS n,
              max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1,
              max(CASE WHEN rn = (2 * n + 3) // 4 THEN v END) AS med,
              max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS q3
            FROM rk GROUP BY 1),
      qq AS (SELECT l_returnflag, n, q1, med, q3,
               q1 - (3 * (q3 - q1)) // 2 AS lo,
               q3 + (3 * (q3 - q1)) // 2 AS hi
             FROM q)
      SELECT c.l_returnflag, max(qq.n) AS n,
        max(q1) AS q1_cents, max(med) AS med_cents, max(q3) AS q3_cents,
        max(lo) AS lo_cents, max(hi) AS hi_cents,
        CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS out_lo,
        CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS out_hi,
        CAST(sum(greatest(least(v, hi), lo)) AS BIGINT) // max(qq.n)
          AS wins_mean_cents
      FROM c JOIN qq USING (l_returnflag)
      GROUP BY c.l_returnflag ORDER BY c.l_returnflag""",
    "q_label_balance" -> """
      WITH counts AS (SELECT label, count(*) AS n FROM embeddings
                      GROUP BY 1),
      m AS (SELECT n AS med_n FROM
              (SELECT n, row_number() OVER (ORDER BY n, label) AS rn,
                      count(*) OVER () AS nl
               FROM counts)
            WHERE rn = (nl + 1) // 2),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                   count(*) AS n_labels
            FROM counts)
      SELECT label, n, total, n_labels,
        total * 1000 // (n_labels * n) AS inv_weight_permille,
        med_n * 1000 // n AS medfreq_weight_permille,
        total // n_labels AS resample_target,
        n - total // n_labels AS excess
      FROM counts CROSS JOIN t CROSS JOIN m ORDER BY label""",
    "q_sample_reservoir" -> """
      WITH r AS (SELECT source, doc_id, n_chars,
                   md5(CAST(doc_id AS VARCHAR)) AS rk
                 FROM documents),
      rk AS (SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY rk, doc_id) AS rn
             FROM r)
      SELECT source, rn, doc_id, n_chars
      FROM rk WHERE rn <= 10 ORDER BY source, rn""")
}

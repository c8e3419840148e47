package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Corpus + analytics operators, r10 wave 3 (SURVEY.md §2.M):
  * threshold-aware set-similarity join via PPJoin prefix filtering,
  * weighted median, two-feature OLS by Cramer's rule, and A-priori
  * frequent triples.
  *
  * Determinism contract as CorpusOps5/20: exact int64/DECIMAL(38,0)
  * arithmetic, deterministic tie-breaks, one IEEE division at the
  * very end where a ratio is genuinely real-valued.
  */
object CorpusOps21 {

  /** Set-similarity self-join with PREFIX FILTERING (Xiao, Wang, Lin,
    * Yu 2008, "Efficient similarity joins for near duplicate
    * detection" — the PPJoin candidate rule): order each doc's
    * distinct 3-shingles by ascending global df (rarest first, ties by
    * shingle), keep only the first n − ceil(t·n) + 1 as the PREFIX,
    * and generate candidates from prefix∩prefix ≠ ∅. For Jaccard ≥ t
    * this is LOSSLESS — unlike the df-cap heuristic of
    * q_dedup_jaccard, the prune is derived from the threshold itself,
    * so the output is EXACTLY the pairs with J ≥ 0.5, no recall
    * caveat. (Shingle sets, not unigram sets: unigrams saturate —
    * same-language docs share most words, making "similarity"
    * quadratic and meaningless.)
    *
    * Scale: prefixes are ~half the shingle stream (t = 0.5), and the
    * rarest-first ordering makes prefix posting lists short by
    * construction (hot shingles land in suffixes); the verify join
    * runs only on candidates. Per-doc rank windows partition by doc.
    * Exactness: jaccard is integer permille i·1000 div (na+nb−i). */
  val qDedupPpjoin: Q = (s, dir) =>
    ppjoinImpl(Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")), 500, 3)

  /** The PPJoin pipeline behind [[qDedupPpjoin]], parameterized and
    * shared with the public `graft.api.Graft.ppjoin` facade: docs =
    * (doc_id, text); `thrPermille` is the Jaccard threshold t·1000
    * (prefix length n − ceil(t·n) + 1 and the length filter
    * t·|B| ≤ |A| ≤ |B|/t are both derived from it, so the prune stays
    * LOSSLESS at any threshold); `shingle` is the k-shingle width. At
    * (500, 3) every integer formula reduces to the literals the
    * DuckDB oracle replays — bit-identical to the r10 version. */
  private[graft] def ppjoinImpl(docs: org.apache.spark.sql.DataFrame,
      thrPermille: Int, shingle: Int): org.apache.spark.sql.DataFrame = {
    require(thrPermille > 0 && thrPermille <= 1000,
      s"threshold permille must be in (0, 1000], got $thrPermille")
    require(shingle >= 1, s"shingle width must be >= 1, got $shingle")
    val tok = graft.CacheScope.track(docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(array_distinct(when(size(col("t")) >= shingle,
          expr(s"""transform(sequence(1, size(t) - $shingle + 1),
                  i -> array_join(slice(t, i, $shingle), ' '))"""))
          .otherwise(array()))).as("w"))
      .persist())
    val df = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("w").asc)
    val wN = Window.partitionBy(col("doc_id"))
    val ranked = graft.CacheScope.track(tok.join(df, Seq("w"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wN))
      .persist())
    // prefix length: n − ceil(t·n) + 1 (at t = 0.5 this is the
    // n − (n+1) div 2 + 1 the oracle replays)
    val prefix = ranked.filter(
        expr(s"rn <= n - ($thrPermille * n + 999) div 1000 + 1"))
      .select(col("doc_id"), col("w"), col("n"))
    // length filter (Xiao et al. §3, sound): J(A,B) ≥ t forces
    // t·|B| ≤ |A| ≤ |B|/t, so size-incompatible postings never pair —
    // applied INSIDE the candidate join, before the distinct
    val cand = prefix.select(col("doc_id").as("da"), col("w"),
        col("n").as("na0"))
      .join(prefix.select(col("doc_id").as("db"), col("w"),
        col("n").as("nb0")), Seq("w"))
      .filter(col("da") < col("db") &&
        col("na0") * 1000 >= col("nb0") * thrPermille &&
        col("nb0") * 1000 >= col("na0") * thrPermille)
      .select(col("da"), col("db")).distinct()
    val sizes = ranked.groupBy(col("doc_id")).agg(max(col("n")).as("nn"))
    val inter = cand
      .join(tok.select(col("doc_id").as("da"), col("w")), Seq("da"))
      .join(tok.select(col("doc_id").as("db"), col("w").as("wb")), Seq("db"))
      .filter(col("w") === col("wb"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("nn").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("nn").as("nb")), "db")
      .select(col("da"), col("db"), col("i"), col("na"), col("nb"),
        expr("i * 1000 div (na + nb - i)").as("jacc_permille"))
      .filter(col("jacc_permille") >= thrPermille)
      .orderBy(col("da"), col("db"))
  }

  /** Weighted median of line revenue (cents, weighted by quantity) per
    * return flag — the "median dollar", where q_robust_stats' median is
    * the median LINE: half the WEIGHT sits at or below it. Lower
    * weighted median: first value whose running weight doubles past
    * the total.
    *
    * Exactness: quantities are integral doubles → exact longs; the
    * cumulative window is ROWS-framed over a deterministic total order.
    * Scale: one rank window per flag group (3 dimension-bounded
    * partitions), nothing else. */
  val qWeightedMedian: Q = (s, dir) => {
    val rows = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("v"),
        col("l_quantity").cast("long").as("wt"))
    val wCum = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    rows
      .withColumn("cumw", sum(col("wt")).over(wCum))
      .withColumn("totw", sum(col("wt")).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(max(col("totw")).as("total_weight"),
        min(when(col("cumw") * 2 >= col("totw"), col("v")))
          .as("wmedian_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  /** Two-feature OLS per return flag — revenue cents on (quantity,
    * discount basis points) — solved in closed form by Cramer's rule
    * over the CENTERED normal equations, everything exact DECIMAL(38,0)
    * until the final two divisions: with nS_ij = n·Σx_i x_j − Σx_i·Σx_j,
    * b1 = (nS22·nSy1 − nS12·nSy2) / (nS11·nS22 − nS12²). The grouped
    * generalization of q_discount_lift's single-feature slope; the
    * "does quantity explain the discount effect away?" audit.
    *
    * Scale: one partial-aggregated shuffle to 3 moment rows; the
    * algebra runs on the 3-row table. Determinant products reach
    * ~10^30 at sf0.1 — inside DECIMAL(38,0)/HUGEINT in both engines;
    * the emitted coefficients are one IEEE division each. */
  val qOlsTwoFeature: Q = (s, dir) => {
    val d38 = DecimalType(38, 0)
    val m = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 10000).cast("long").as("x2"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("y").cast(d38)).as("sy"),
        sum(col("x1").cast(d38)).as("s1"),
        sum(col("x2").cast(d38)).as("s2"),
        sum((col("x1").cast(d38) * col("x1"))).as("s11"),
        sum((col("x1").cast(d38) * col("x2"))).as("s12"),
        sum((col("x2").cast(d38) * col("x2"))).as("s22"),
        sum((col("x1").cast(d38) * col("y"))).as("sy1"),
        sum((col("x2").cast(d38) * col("y"))).as("sy2"))
    m.select(col("l_returnflag"), col("n"),
        (col("n") * col("s11") - col("s1") * col("s1")).as("ns11"),
        (col("n") * col("s12") - col("s1") * col("s2")).as("ns12"),
        (col("n") * col("s22") - col("s2") * col("s2")).as("ns22"),
        (col("n") * col("sy1") - col("s1") * col("sy")).as("nsy1"),
        (col("n") * col("sy2") - col("s2") * col("sy")).as("nsy2"))
      .select(col("l_returnflag"), col("n"),
        ((col("ns22") * col("nsy1") - col("ns12") * col("nsy2"))
          .cast("double") /
          (col("ns11") * col("ns22") - col("ns12") * col("ns12"))
            .cast("double")).as("b_qty_cents"),
        ((col("ns11") * col("nsy2") - col("ns12") * col("nsy1"))
          .cast("double") /
          (col("ns11") * col("ns22") - col("ns12") * col("ns12"))
            .cast("double")).as("b_disc_cents_per_bp"))
      .orderBy(col("l_returnflag"))
  }

  /** Frequent item TRIPLES via the A-priori candidate rule (Agrawal &
    * Srikant 1994): a triple can only be frequent if all three of its
    * pairs are, so candidate generation joins the frequent-pair list
    * with itself and semi-joins the third pair BEFORE touching baskets
    * again — the prune that keeps k=3 mining from exploding on wide
    * baskets. Output: triples with basket support ≥ 3 and the support
    * count.
    *
    * Scale: the basket self-joins run on the distinct (order, item)
    * projection restricted to items of frequent pairs; per-basket
    * fan-out is bounded by the frequent-pair density (the A-priori
    * guarantee), not by basket-width³. */
  val qBasketTriples: Q = (s, dir) => {
    val minSup = 2L
    val li = graft.CacheScope.track(Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().persist())
    val fp = graft.CacheScope.track(
      li.select(col("o"), col("p").as("pa"))
        .join(li.select(col("o"), col("p").as("pb")), Seq("o"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= minSup)
        .select(col("pa"), col("pb"))
        .persist())
    // candidates: (a,b) + (a,c) frequent, b < c, and (b,c) frequent
    val cand = fp.select(col("pa"), col("pb"))
      .join(fp.select(col("pa"), col("pb").as("pc")), Seq("pa"))
      .filter(col("pb") < col("pc"))
      .join(fp.select(col("pa").as("pb"), col("pb").as("pc")),
        Seq("pb", "pc"), "left_semi")
    val tri = li.select(col("o"), col("p").as("pa"))
      .join(li.select(col("o"), col("p").as("pb")), Seq("o"))
      .filter(col("pa") < col("pb"))
      .join(broadcast(fp), Seq("pa", "pb"), "left_semi")
      .join(li.select(col("o"), col("p").as("pc")), Seq("o"))
      .filter(col("pb") < col("pc"))
      .join(broadcast(cand), Seq("pa", "pb", "pc"), "left_semi")
      .groupBy(col("pa"), col("pb"), col("pc"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
    tri.orderBy(col("pa"), col("pb"), col("pc"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_ppjoin" -> qDedupPpjoin,
    "q_weighted_median" -> qWeightedMedian,
    "q_ols_two_feature" -> qOlsTwoFeature,
    "q_basket_triples" -> qBasketTriples)

  val oracle: Map[String, String] = Map(
    "q_dedup_ppjoin" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
      tok AS (SELECT DISTINCT doc_id,
                t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS w
              FROM (SELECT *, unnest(range(1, len(t) - 1)) AS i
                    FROM toks)),
      df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1),
      ranked AS (SELECT tok.doc_id, tok.w, df.df,
                   CAST(row_number() OVER (PARTITION BY doc_id
                     ORDER BY df.df ASC, tok.w ASC) AS BIGINT) AS rn,
                   CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT)
                     AS n
                 FROM tok JOIN df USING (w)),
      prefix AS (SELECT doc_id, w, n FROM ranked
                 WHERE rn <= n - (n + 1) // 2 + 1),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM prefix a JOIN prefix b
                 ON a.w = b.w AND a.doc_id < b.doc_id
                 AND a.n * 2 >= b.n AND b.n * 2 >= a.n),
      sizes AS (SELECT doc_id, max(n) AS nn FROM ranked GROUP BY 1),
      inter AS (SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS i
                FROM cand c
                  JOIN tok ta ON ta.doc_id = c.da
                  JOIN tok tb ON tb.doc_id = c.db AND ta.w = tb.w
                GROUP BY 1, 2)
      SELECT da, db, i, sa.nn AS na, sb.nn AS nb,
        i * 1000 // (sa.nn + sb.nn - i) AS jacc_permille
      FROM inter
      JOIN sizes sa ON da = sa.doc_id
      JOIN sizes sb ON db = sb.doc_id
      WHERE i * 1000 // (sa.nn + sb.nn - i) >= 500
      ORDER BY da, db""",
    "q_weighted_median" -> """
      WITH r AS (SELECT l_returnflag, l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                   CAST(l_quantity AS BIGINT) AS wt
                 FROM lineitem),
      c AS (SELECT *,
              CAST(sum(wt) OVER (PARTITION BY l_returnflag
                ORDER BY v, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumw,
              CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT)
                AS totw
            FROM r)
      SELECT l_returnflag, max(totw) AS total_weight,
        min(CASE WHEN cumw * 2 >= totw THEN v END) AS wmedian_cents,
        count(*) AS n_lines
      FROM c GROUP BY 1 ORDER BY l_returnflag""",
    "q_ols_two_feature" -> """
      WITH m AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
        CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT))
          AS HUGEINT) AS sy,
        CAST(sum(CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS s1,
        CAST(sum(CAST(round(l_discount * 10000) AS HUGEINT))
          AS HUGEINT) AS s2,
        sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT))
          AS s11,
        sum(CAST(l_quantity AS HUGEINT)
          * CAST(round(l_discount * 10000) AS BIGINT)) AS s12,
        sum(CAST(round(l_discount * 10000) AS HUGEINT)
          * CAST(round(l_discount * 10000) AS BIGINT)) AS s22,
        sum(CAST(l_quantity AS HUGEINT)
          * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy1,
        sum(CAST(round(l_discount * 10000) AS HUGEINT)
          * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy2
        FROM lineitem GROUP BY 1),
      ns AS (SELECT l_returnflag, n,
               n * s11 - s1 * s1 AS ns11,
               n * s12 - s1 * s2 AS ns12,
               n * s22 - s2 * s2 AS ns22,
               n * sy1 - s1 * sy AS nsy1,
               n * sy2 - s2 * sy AS nsy2
             FROM m)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        CAST(ns22 * nsy1 - ns12 * nsy2 AS DOUBLE) /
          CAST(ns11 * ns22 - ns12 * ns12 AS DOUBLE) AS b_qty_cents,
        CAST(ns11 * nsy2 - ns12 * nsy1 AS DOUBLE) /
          CAST(ns11 * ns22 - ns12 * ns12 AS DOUBLE)
          AS b_disc_cents_per_bp
      FROM ns ORDER BY l_returnflag""",
    "q_basket_triples" -> """
      WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                  FROM lineitem),
      fp AS (SELECT a.p AS pa, b.p AS pb
             FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
             GROUP BY 1, 2 HAVING count(*) >= 2),
      cand AS (SELECT f1.pa, f1.pb, f2.pb AS pc
               FROM fp f1 JOIN fp f2
                 ON f1.pa = f2.pa AND f1.pb < f2.pb
               WHERE EXISTS (SELECT 1 FROM fp f3
                             WHERE f3.pa = f1.pb AND f3.pb = f2.pb))
      SELECT a.p AS pa, b.p AS pb, c.p AS pc,
        CAST(count(*) AS BIGINT) AS support
      FROM li a
        JOIN li b ON a.o = b.o AND a.p < b.p
        JOIN fp ON fp.pa = a.p AND fp.pb = b.p
        JOIN li c ON a.o = c.o AND b.p < c.p
        JOIN cand ON cand.pa = a.p AND cand.pb = b.p AND cand.pc = c.p
      GROUP BY 1, 2, 3 HAVING count(*) >= 2
      ORDER BY pa, pb, pc""")
}

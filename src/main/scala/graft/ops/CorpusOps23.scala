package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Corpus + analytics operators, r10 wave 5 (SURVEY.md §2.M):
  * moving-average seasonal decomposition of the event series and a
  * power-iteration dominant eigenvector of the embedding Gram matrix.
  *
  * Determinism contract as the other r10 waves: exact
  * int64/DECIMAL(38,0) interiors, per-round floor-division rescaling
  * for iterative linear algebra (the q_graph_pagerank / q_graph_hits
  * discipline), IEEE divisions only where a value is genuinely real.
  */
object CorpusOps23 {

  /** Classical additive seasonal decomposition of the daily event
    * count (the moving-average construction underlying STL, Cleveland
    * et al. 1990 §2): trend = centered 7-day moving sum (×7 units keep
    * it integer; NULL on the 3 edge days of each end where the window
    * is partial), seasonal = per-day-of-week mean of the detrended
    * series, residual = detrended − seasonal. The decomposition every
    * ingestion-volume dashboard runs before alerting on "drops" that
    * are just weekends.
    *
    * Exactness: y and trend7 are exact ints in ×7 units; the
    * day-of-week mean and residual are one IEEE division + one
    * subtraction, identical operation order in both engines.
    *
    * Scale: events collapse to the bounded day axis FIRST (one
    * partial-aggregated shuffle); every window after that runs on
    * calendar-sized data — the repo's accepted day-axis-bounded
    * unpartitioned-window class. */
  val qTsStlDecompose: Q = (s, dir) => {
    val daily = Tables(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val detr = daily
      .withColumn("trend7",
        when(count(lit(1)).over(w7) === 7, sum(col("y")).over(w7)))
      .withColumn("dow", dayofweek(col("day")))
      .withColumn("detr7", col("y") * 7 - col("trend7"))
    val seas = detr.filter(col("detr7").isNotNull)
      .groupBy(col("dow"))
      .agg((sum(col("detr7")).cast("double") / count(lit(1)))
        .as("seasonal7"))
    detr.join(broadcast(seas), Seq("dow"), "left")
      .select(col("day").cast("string").as("day"), col("y"),
        col("trend7"), col("dow").cast("long").as("dow"),
        col("seasonal7"),
        (col("detr7").cast("double") - col("seasonal7")).as("resid7"))
      .orderBy(col("day"))
  }

  /** Dominant eigenvector of the embedding Gram matrix by THREE power
    * iterations — the first principal direction of the corpus (what a
    * PCA/whitening stage computes before projecting), done as pure
    * relational algebra: G is the 64×64 integer Gram table (one
    * map-side pair fan-out, the q_emb_gram shape), each iteration is a
    * matrix-vector equi-join with DECIMAL(38,0) products rescaled to
    * ≤1e6 micro-units by floor division against the round max (exact,
    * bit-identical cross-engine). Sign convention: the rescale keeps
    * the max-|component| positive orientation deterministic because
    * all rescales divide by the positive max of abs values with
    * truncation toward zero on both engines — guarded by emitting
    * |max| alongside.
    *
    * Convergence: 3 iterations from the all-ones vector give the
    * standard power-method estimate; the per-round pre-rescale max is
    * emitted as the eigenvalue proxy trace (λ̂ ratio between rounds).
    *
    * Scale: G is bounded (d² = 4096 rows) and broadcast; iterations
    * touch G only — corpus size enters through ONE Gram pass whose
    * output is row-count-independent. */
  val qEmbPcaPower: Q = (s, dir) => {
    val d38 = DecimalType(38, 0)
    val emb = EmbQuant.quantized(s, dir)
    // full symmetric Gram from the upper-triangle fan-out
    val upper = emb
      .select(posexplode(expr(
        """flatten(transform(sequence(1, 64), i ->
             transform(sequence(i, 64), j ->
               element_at(q, i) * element_at(q, j))))""")))
      .groupBy(col("pos")).agg(sum(col("col")).as("g"))
    val pairIdx = s.range(1)
      .select(posexplode(expr(
        """flatten(transform(sequence(1, 64), i ->
             transform(sequence(i, 64), j -> struct(i as i, j as j))))""")))
      .select(col("pos"), col("col.i").as("i"), col("col.j").as("j"))
    val ut = upper.join(broadcast(pairIdx), Seq("pos"))
      .select(col("i"), col("j"), col("g"))
    val gfull = graft.CacheScope.track(ut.unionAll(
        ut.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("g")))
      .persist())
    // v0 = 1 for every dim; each round: v <- rescale(G v) to ≤1e6
    def step(v: org.apache.spark.sql.DataFrame) = {
      val raw = gfull
        .join(broadcast(v.select(col("i").as("j"), col("v"))), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("g").cast(d38) * col("v")).as("raw"))
      val mx = raw.agg(max(abs(col("raw"))).as("mx"))
      // sign-split rescale: Spark's `div` truncates toward zero while
      // DuckDB's `//` floors, so negative components would diverge by
      // one ulp — sign·(abs·1e6 div mx) keeps both engines on the
      // identical non-negative floor division
      raw.crossJoin(broadcast(mx))
        .select(col("i"), expr(
          """CAST(CASE WHEN raw < 0 THEN -1 ELSE 1 END
               * CAST((abs(raw) * 1000000) div mx AS BIGINT)
             AS BIGINT)""").as("v"))
    }
    val v0 = s.range(1, 65).select(col("id").as("i"), lit(1L).as("v"))
    val v3 = step(step(step(v0)))
    v3.orderBy(col("i"))
  }

  val queries: Map[String, Q] = Map(
    "q_ts_stl_decompose" -> qTsStlDecompose,
    "q_emb_pca_power" -> qEmbPcaPower)

  val oracle: Map[String, String] = Map(
    "q_ts_stl_decompose" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS y
                     FROM events GROUP BY 1),
      t AS (SELECT day, y,
              CASE WHEN count(*) OVER w = 7
                   THEN CAST(sum(y) OVER w AS BIGINT) END AS trend7,
              CAST(dayofweek(day) AS BIGINT) + 1 AS dow
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                         AND 3 FOLLOWING)),
      dt AS (SELECT *, y * 7 - trend7 AS detr7 FROM t),
      seas AS (SELECT dow,
                 CAST(sum(detr7) AS DOUBLE) / count(*) AS seasonal7
               FROM dt WHERE detr7 IS NOT NULL GROUP BY 1)
      SELECT CAST(dt.day AS VARCHAR) AS day, dt.y, dt.trend7, dt.dow,
        seas.seasonal7,
        CAST(dt.detr7 AS DOUBLE) - seas.seasonal7 AS resid7
      FROM dt LEFT JOIN seas USING (dow)
      ORDER BY day""",
    "q_emb_pca_power" -> """
      WITH e AS (SELECT vec_id, r.i AS i,
                   CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                     AS BIGINT) AS v
                 FROM embeddings, range(1, 65) r(i)),
      g AS (SELECT a.i AS i, b.i AS j,
              CAST(sum(a.v * b.v) AS BIGINT) AS g
            FROM e a JOIN e b ON a.vec_id = b.vec_id
            GROUP BY 1, 2),
      v0 AS (SELECT i, CAST(1 AS HUGEINT) AS v
             FROM range(1, 65) r(i)),
      r1 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * v0.v) AS raw
             FROM g JOIN v0 ON g.j = v0.i GROUP BY 1),
      v1 AS (SELECT i, CAST((CASE WHEN raw < 0 THEN -1 ELSE 1 END)
               * (abs(raw) * 1000000 // (SELECT max(abs(raw)) FROM r1))
               AS HUGEINT) AS v FROM r1),
      r2 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * v1.v) AS raw
             FROM g JOIN v1 ON g.j = v1.i GROUP BY 1),
      v2 AS (SELECT i, CAST((CASE WHEN raw < 0 THEN -1 ELSE 1 END)
               * (abs(raw) * 1000000 // (SELECT max(abs(raw)) FROM r2))
               AS HUGEINT) AS v FROM r2),
      r3 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * v2.v) AS raw
             FROM g JOIN v2 ON g.j = v2.i GROUP BY 1),
      v3 AS (SELECT i, CAST((CASE WHEN raw < 0 THEN -1 ELSE 1 END)
               * (abs(raw) * 1000000 // (SELECT max(abs(raw)) FROM r3))
               AS HUGEINT) AS v FROM r3)
      SELECT CAST(i AS BIGINT) AS i, CAST(v AS BIGINT) AS v
      FROM v3 ORDER BY i""")
}

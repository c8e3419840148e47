package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-matrix operators beyond search (SURVEY.md §2.M): supervised
  * nearest-centroid classification and the one-pass Gram/covariance
  * accumulation that trains PCA/whitening projections.
  *
  * Published grounding: Rocchio/nearest-centroid classification is the
  * classic prototype method (Manning et al., IIR §14.2); corpus-level
  * domain/quality tagging via embedding classifiers is standard pipeline
  * practice (e.g. CCNet's LM-based and fastText-based filters). The Gram
  * matrix G = Σ x xᵀ in one distributed pass is the textbook building
  * block for PCA — covariance = (G − s sᵀ/n)/n from the same outputs.
  *
  * Same determinism discipline as Similarity.scala: embeddings quantize
  * to integer micro-units once, every sum/dot is exact int64, and the
  * only floats are per-row cosine divisions both engines compute from
  * identical integers.
  */
object EmbeddingOps {

  // quantization + integer dot are the shared EmbQuant contract (ops
  // package object) — same 1e6 scale as Similarity and both oracles
  private def quantized(s: SparkSession, dir: String): DataFrame =
    EmbQuant.quantized(s, dir)

  private def dotq(a: Column, b: Column): Column = EmbQuant.dotq(a, b)

  /** Nearest-centroid (Rocchio) label classifier: per-label integer SUM
    * centroids from the train split (cosine is scale-invariant, so the
    * unnormalized sum avoids a float mean), then each held-out vector
    * gets the argmax-cosine label with a deterministic (cos desc, label)
    * tie-break.
    *
    * Scale: the centroid table is L x d integers however large the
    * train split — it broadcasts; the train side is one shuffle on
    * (label, pos) with map-side partial sums; the test stream scores
    * map-side. The confusion columns make it a quality gate: train a
    * tagger on a labeled slice, tag 100 TB with zero test-side shuffle.
    *
    * Fixture note: the synthetic labels carry no embedding-space
    * structure (held-out 1-NN accuracy ~ chance, measured), so the
    * reported accuracy sits near 1/L by construction — the tested
    * surface is the exact centroid algebra, deterministic argmax and
    * confusion accounting, not fixture learnability. */
  val qEmbClassify: Q = (s, dir) => {
    val emb = quantized(s, dir).withColumn("n2", dotq(col("q"), col("q")))
    val cents = emb.filter(col("vec_id") % 5 =!= 0)
      .select(col("label"), posexplode(col("q")))
      .groupBy(col("label"), col("pos")).agg(sum(col("col")).as("sv"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, sv))), x -> x.sv)")
        .as("cq"))
      .select(col("label").as("clabel"), col("cq"))
      .withColumn("cn2", dotq(col("cq"), col("cq")))
    emb.filter(col("vec_id") % 5 === 0)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max_by(struct(col("clabel"), col("ccos")),
        struct(col("ccos"), -col("clabel"))).as("best"))
      .select(col("vec_id"), col("label"),
        col("best.clabel").as("pred"), col("best.ccos").as("cos"),
        when(col("label") === col("best.clabel"), 1).otherwise(0)
          .as("correct"))
      .orderBy(col("vec_id"))
  }

  /** One-pass Gram accumulation for PCA/whitening: the upper triangle
    * of G = Σ x xᵀ plus the per-dimension sums and the vector count —
    * everything a driver needs to form the covariance and eigendecompose
    * (d x d is tiny; the PASS over the data is the distributed part).
    *
    * Scale: the pair products are generated map-side per vector
    * (flatten/transform — no self-join, no shuffle of the vector
    * stream), then ONE shuffle on (i, j) with map-side partial sums
    * aggregates d(d+1)/2 = 2080 cells; output size is independent of
    * row count. This is exactly how a 100 TB covariance pass should
    * look: no collect, no per-vector join, bounded state per reducer. */
  val qEmbGram: Q = (s, dir) => {
    val emb = quantized(s, dir)
    // fan out plain longs (a struct per product tripled explode cost,
    // measured); the (i, j) labels are re-derived AFTER aggregation on
    // the 2080 result rows from the same enumeration order
    val gram = emb
      .select(posexplode(expr(
        """flatten(transform(sequence(1, 64), i ->
             transform(sequence(i, 64), j ->
               element_at(q, i) * element_at(q, j))))""")))
      .groupBy(col("pos"))
      .agg(sum(col("col")).as("g"), count(lit(1)).as("n"))
    val pairIdx = s.range(1)
      .select(posexplode(expr(
        """flatten(transform(sequence(1, 64), i ->
             transform(sequence(i, 64), j -> struct(i as i, j as j))))""")))
      .select(col("pos"), col("col.i"), col("col.j"))
    val labeled = gram.join(broadcast(pairIdx), Seq("pos"))
      .select(col("i"), col("j"), col("g"), col("n"))
    val dims = emb.select(posexplode(col("q")))
      .select((col("pos") + 1).as("d"), col("col").as("v"))
      .groupBy(col("d")).agg(sum(col("v")).as("sv"))
    labeled
      .join(broadcast(dims.select(col("d").as("i"), col("sv").as("si"))),
        Seq("i"))
      .join(broadcast(dims.select(col("d").as("j"), col("sv").as("sj"))),
        Seq("j"))
      .select(col("i"), col("j"), col("g"), col("si"), col("sj"), col("n"))
      .orderBy(col("i"), col("j"))
  }

  /** Embedding outlier gate: each vector's cosine to its OWN label's
    * centroid, bottom-20 — the mislabeled/garbage-embedding filter that
    * runs before centroid-classifier training (and the SemDeDup
    * "prune far-from-centroid" variant of cluster hygiene).
    *
    * Same exact-integer discipline as [[qEmbClassify]]: unnormalized
    * int64 sum centroids (cosine is scale-invariant), integer dots,
    * one IEEE division per row; tie-break on vec_id.
    *
    * Scale: centroids are an L x d broadcast; scoring is map-side over
    * the vector stream (equi-join on label against the broadcast);
    * bottom-20 lowers to TakeOrderedAndProject. */
  val qEmbOutliers: Q = (s, dir) => {
    val emb = quantized(s, dir).withColumn("n2", dotq(col("q"), col("q")))
    val cents = emb
      .select(col("label"), posexplode(col("q")))
      .groupBy(col("label"), col("pos")).agg(sum(col("col")).as("sv"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, sv))), x -> x.sv)")
        .as("cq"))
      .withColumn("cn2", dotq(col("cq"), col("cq")))
    emb.join(broadcast(cents), Seq("label"))
      .select(col("vec_id"), col("label"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("own_cos"))
      .orderBy(col("own_cos").asc, col("vec_id"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q_emb_classify" -> qEmbClassify,
    "q_emb_gram" -> qEmbGram,
    "q_emb_outliers" -> qEmbOutliers)

  private val eSql =
    """SELECT vec_id, label, r.i AS i,
         CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000) AS BIGINT) AS v
       FROM embeddings, range(1, 65) r(i)"""

  val oracle: Map[String, String] = Map(
    "q_emb_classify" -> s"""
      WITH e AS ($eSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cents AS (SELECT label AS clabel, i, CAST(sum(v) AS BIGINT) AS cv
                FROM e WHERE vec_id % 5 <> 0 GROUP BY 1, 2),
      cn AS (SELECT clabel, CAST(sum(cv * cv) AS BIGINT) AS cn2
             FROM cents GROUP BY 1),
      d AS (SELECT a.vec_id, a.label, c.clabel,
              CAST(sum(a.v * c.cv) AS BIGINT) AS dot
            FROM e a JOIN cents c ON a.i = c.i
            WHERE a.vec_id % 5 = 0 GROUP BY 1, 2, 3),
      sc AS (SELECT d.vec_id, d.label, d.clabel,
               CAST(dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) *
                 sqrt(CAST(cn.cn2 AS DOUBLE))) AS ccos
             FROM d JOIN n ON d.vec_id = n.vec_id
                    JOIN cn ON d.clabel = cn.clabel)
      SELECT vec_id, label, clabel AS pred, ccos AS cos,
        CASE WHEN label = clabel THEN 1 ELSE 0 END AS correct
      FROM sc
      QUALIFY row_number() OVER (PARTITION BY vec_id
        ORDER BY ccos DESC, clabel) = 1
      ORDER BY vec_id""",
    "q_emb_outliers" -> s"""
      WITH e AS ($eSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cents AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS cv
                FROM e GROUP BY 1, 2),
      cn AS (SELECT label, CAST(sum(cv * cv) AS BIGINT) AS cn2
             FROM cents GROUP BY 1),
      d AS (SELECT a.vec_id, a.label, CAST(sum(a.v * c.cv) AS BIGINT)
              AS dot
            FROM e a JOIN cents c ON a.label = c.label AND a.i = c.i
            GROUP BY 1, 2)
      SELECT d.vec_id, d.label,
        CAST(dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) *
          sqrt(CAST(cn.cn2 AS DOUBLE))) AS own_cos
      FROM d JOIN n ON d.vec_id = n.vec_id
             JOIN cn ON d.label = cn.label
      ORDER BY own_cos ASC, d.vec_id LIMIT 20""",
    "q_emb_gram" -> s"""
      WITH e AS ($eSql),
      gram AS (SELECT a.i AS i, b.i AS j,
                 CAST(sum(a.v * b.v) AS BIGINT) AS g, count(*) AS n
               FROM e a JOIN e b
                 ON a.vec_id = b.vec_id AND b.i >= a.i
               GROUP BY 1, 2),
      dims AS (SELECT i AS d, CAST(sum(v) AS BIGINT) AS sv
               FROM e GROUP BY 1)
      SELECT i, j, g, di.sv AS si, dj.sv AS sj, n
      FROM gram JOIN dims di ON gram.i = di.d
                JOIN dims dj ON gram.j = dj.d
      ORDER BY i, j""")
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 69: rank-biased overlap — the IVF-vs-exact order audit
  * and the generic two-ranking RBO core. */
class Wave56Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("rbo core: identical 1000, disjoint 0, reversal = double replay") {
    val a = Seq((1L, "x", 1), (1L, "y", 2), (1L, "z", 3))
      .toDF("q", "it", "rk")
    val same = run(api.Graft.rboAgreement(a, a, "q", "it", "rk", 3))
    assert(same.head.getAs[Long]("rbo_permille") == 1000L)
    val b = Seq((1L, "p", 1), (1L, "q", 2), (1L, "r", 3))
      .toDF("q", "it", "rk")
    val none = run(api.Graft.rboAgreement(a, b, "q", "it", "rk", 3))
    assert(none.head.getAs[Long]("rbo_permille") == 0L)
    // full reversal at depth 3: prefix overlaps o = (0, 1, 3);
    // RBO = [Σ .1·.9^(d-1)·o_d/d] / (1 − .9^3)
    val rev = Seq((1L, "z", 1), (1L, "y", 2), (1L, "x", 3))
      .toDF("q", "it", "rk")
    val r = run(api.Graft.rboAgreement(a, rev, "q", "it", "rk", 3))
      .head.getAs[Long]("rbo_permille")
    val expect = 1000.0 *
      (0.1 * 0.9 * (1.0 / 2) + 0.1 * 0.81 * 1.0) / (1 - 0.729)
    assert(math.abs(r - math.floor(expect)) <= 1, s"$r vs $expect")
  }

  test("rank agreement: fixture readout; facade rollup == declared") {
    val declared = run(SparkEntry.queries("q_sim_rank_agreement")(
      spark, sf))
    assert(declared.nonEmpty)
    declared.foreach { r =>
      val (n, u, p) = (r.getAs[Long]("n_queries"),
        r.getAs[Long]("u_sum"), r.getAs[Long]("rbo_permille"))
      assert(n > 0 && u >= 0 && p >= 0 && p <= 1000, s"$r")
      assert(p == u * 1000 / (ops.CorpusOps66.rboFull * n), s"$r")
    }
    // the generic facade over the same two ranked lists aggregates
    // to the declared per-label table (units cancel in the ratio)
    val ex = ops.Similarity.qSimTopK(spark, sf)
    val iv = ops.Similarity.qSimIvf(spark, sf)
    val perQ = run(api.Graft.rboAgreement(
      ex.select(col("qid"), col("neighbor"), col("rnk")),
      iv.select(col("qid"), col("neighbor"), col("rnk")),
      "qid", "neighbor", "rnk"))
    val labels = run(Tables(spark, sf, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        col("label").cast("long").as("label")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uMax = perQ.head.getAs[Long]("u_max")
    val byLabel = perQ.groupBy(r => labels(r.getAs[Long]("qid")))
    declared.foreach { d =>
      val rows = byLabel(d.getLong(0))
      val u = rows.map(_.getAs[Long]("u_sum")).sum
      assert(d.getAs[Long]("n_queries") == rows.size.toLong)
      assert(d.getAs[Long]("rbo_permille") ==
        u * 1000 / (uMax * rows.size), s"$d")
    }
  }

}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 72: the PQ distortion frontier. */
class Wave58Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("pq distortion: monotone in m, and the frontier is real") {
    val rows = run(SparkEntry.queries("q_sim_pq_distortion")(spark, sf))
    assert(rows.map(_.getLong(0)) == Seq(2L, 4L, 8L))
    assert(rows.map(_.getAs[Long]("n_vecs")).distinct.size == 1)
    // finer subspaces strictly dominate: an m=2 codeword choice is a
    // constrained m=4 choice (same codeword on both halves), so the
    // per-vector optimum can only improve — mean and worst both
    val means = rows.map(_.getAs[Long]("mean_d2_micro"))
    val worst = rows.map(_.getAs[Long]("max_d2_micro"))
    assert(means == means.sorted.reverse && means.forall(_ > 0), s"$means")
    assert(worst.zip(worst.tail).forall { case (a, b) => a >= b },
      s"$worst")
  }

  test("pq distortion facade == declared") {
    val declared = run(SparkEntry.queries("q_sim_pq_distortion")(
      spark, sf))
    val facade = run(api.Graft.pqDistortion(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}

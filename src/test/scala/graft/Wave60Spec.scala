package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 74: the S-curve actual-detection audit. */
class Wave60Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("scurve actual: same bins as expected; detector splits the modes") {
    val actual = run(SparkEntry.queries("q_dedup_scurve_actual")(
      spark, sf))
    assert(actual.size == 10)
    actual.foreach { r =>
      assert(r.getAs[Long]("detected") <= r.getAs[Long]("n_pairs"), s"$r")
    }
    // the decile histogram IS q_dedup_lsh_expected's (shared binning
    // off the shared exact pair stream)
    val expected = run(SparkEntry.queries("q_dedup_lsh_expected")(
      spark, sf)).filter(_.getLong(0) == 16L)
    assert(actual.map(r => r.getLong(0) -> r.getAs[Long]("n_pairs")) ==
      expected.map(r => r.getLong(2) -> r.getAs[Long]("n_pairs")))
    // the fixture's duplicate mass is bimodal: the est_jacc cut
    // suppresses the decile-0 noise entirely (analytic banding alone
    // would see 148 permille of it) while the near-dup tail is caught
    // in full — the deployed detector's whole point, as data
    val byDec = actual.map(r => r.getLong(0) -> r).toMap
    assert(byDec(0L).getAs[Long]("n_pairs") > 0 &&
      byDec(0L).getAs[Long]("detected_permille") < 148L)
    Seq(8L, 9L).foreach { d =>
      val r = byDec(d)
      assert(r.getAs[Long]("n_pairs") > 0 &&
        r.getAs[Long]("detected") == r.getAs[Long]("n_pairs"), s"$r")
    }
  }
}

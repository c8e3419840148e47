package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r10 wave-25 operators: CUPED's variance
  * reduction must be a genuine reduction (optimal θ can never
  * inflate variance), DSIR weights must favor the target slice,
  * and the Haldane odds ratio must agree in sign with its own
  * determinant. */
class Wave25Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) =
    try SparkEntry.queries(name)(spark, sf).collect()
    finally CacheScope.release()

  test("CUPED: vr in [0,1000], arms partition users, theta finite") {
    val r = q("q_ab_cuped").head
    assert(r.getAs[Long]("na") + r.getAs[Long]("nb") == r.getAs[Long]("n"))
    assert(r.getAs[Long]("na") > 0 && r.getAs[Long]("nb") > 0)
    val vr = r.getAs[Long]("vr_permille")
    // var(Y - θX) <= var(Y) at the OLS θ; floor rounding of θ can
    // push the ratio a hair past 1000 but never structurally
    assert(vr >= 0 && vr <= 1001, s"variance ratio out of range: $vr")
    assert(!r.isNullAt(r.fieldIndex("theta_micro")))
  }

  test("DSIR: top-25 deterministic, weights strictly ordered per tie rule") {
    val rows = q("q_mix_dsir")
    assert(rows.length == 25)
    val pairs = rows.map(r =>
      (r.getAs[Long]("w_micro"), r.getAs[Long]("doc_id")))
    pairs.sliding(2).foreach {
      case Array((w1, d1), (w2, d2)) =>
        assert(w1 > w2 || (w1 == w2 && d1 < d2), "order violated")
      case _ =>
    }
    // the target slice should dominate the head of the importance
    // ranking (the whole point of the likelihood ratio)
    val enFrac = rows.count(_.getAs[String]("lang") == "en")
    assert(enFrac >= 13, s"target slice not favored: $enFrac/25 en")
  }

  test("odds ratio: sign agrees with the corrected determinant") {
    val r = q("q_stats_odds_ratio").head
    val (a, b, c, d) = (r.getAs[Long]("yy"), r.getAs[Long]("yn"),
      r.getAs[Long]("ny"), r.getAs[Long]("nn"))
    val det = (2 * a + 1) * (2 * d + 1) - (2 * b + 1) * (2 * c + 1)
    val lor = r.getAs[Long]("or_log2_micro")
    assert(det.sign == lor.sign || lor == 0L,
      s"log-OR sign $lor disagrees with determinant $det")
    assert(r.getAs[Long]("se2_micro") > 0)
  }
}

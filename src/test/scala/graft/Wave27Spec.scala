package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r10 wave-27 operators: the Bradley-Terry
  * tournament must balance (every win is someone's loss), strengths
  * must stay on the normalized scale and rank coherently with raw
  * win rates at the extremes; Kendall tau-b must stay in its range
  * with a consistent pair census. */
class Wave27Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) =
    try SparkEntry.queries(name)(spark, sf).collect()
    finally CacheScope.release()

  test("Bradley-Terry: tournament balances, scale normalized, coherent") {
    val rows = q("q_eval_bradley_terry")
    assert(rows.length >= 2)
    val wins = rows.map(_.getAs[Long]("wins")).sum
    val losses = rows.map(_.getAs[Long]("losses")).sum
    assert(wins == losses, s"win/loss imbalance: $wins vs $losses")
    val st = rows.map(_.getAs[Long]("strength_micro"))
    // renormalized to mean 1e6 (floor rounding loses < 1 micro/source)
    val mean = st.sum / rows.length
    assert(math.abs(mean - 1000000L) <= 5, s"scale drifted: mean $mean")
    // output is strength-ordered; the leader must out-win the tail
    assert(st.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    def rate(r: org.apache.spark.sql.Row) = {
      val w = r.getAs[Long]("wins"); val l = r.getAs[Long]("losses")
      w.toDouble / (w + l)
    }
    assert(rate(rows.head) > rate(rows.last),
      "strength leader does not out-win the strength tail")
  }

  test("Kendall tau-b: range and pair census") {
    val r = q("q_rank_kendall").head
    val n0 = r.getAs[Long]("n0")
    val c = r.getAs[Long]("c"); val d = r.getAs[Long]("d")
    assert(c + d <= n0, "concordant+discordant exceeds pair count")
    val t = r.getAs[Long]("tau_b2_signed_permille")
    assert(t >= -1000 && t <= 1000, s"tau_b^2 out of range: $t")
  }
}

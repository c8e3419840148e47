package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 87: quality-profile drift. */
class Wave70Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("rule-profile drift: same shape 0; disjoint 1000; hand value") {
    // equal shapes at different sizes -> 0
    val eq = Seq(("s", 3L, 1L), ("s", 3L, 1L), ("s", 5L, 1L),
      ("s", 5L, 1L), ("s", 3L, 0L), ("s", 5L, 0L))
      .toDF("g", "b", "a")
    val re = run(api.Graft.ruleProfileDrift(eq, "g", "b",
      col("a") === 1L))
    assert(re.head.getAs[Long]("tv_permille") == 0L, s"$re")
    // disjoint bins -> 1000
    val dj = Seq(("s", 1L, 1L), ("s", 2L, 0L)).toDF("g", "b", "a")
    val rd = run(api.Graft.ruleProfileDrift(dj, "g", "b",
      col("a") === 1L))
    assert(rd.head.getAs[Long]("tv_permille") == 1000L, s"$rd")
    // one-sided group reads the declared maximal drift
    val os = Seq(("s", 1L, 1L), ("s", 2L, 1L)).toDF("g", "b", "a")
    val ro = run(api.Graft.ruleProfileDrift(os, "g", "b",
      col("a") === 1L))
    assert(ro.head.getAs[Long]("tv_permille") == 1000L &&
      ro.head.getAs[Long]("n_b") == 0L, s"$ro")
    // hand case: A = {b1: 3, b2: 1}, B = {b1: 1, b2: 1}
    // dev = |3*2-1*4| + |1*2-1*4| = 2 + 2 = 4; tv = 4000/(2*8) = 250
    val h = (Seq.fill(3)(("s", 1L, 1L)) ++ Seq(("s", 2L, 1L),
      ("s", 1L, 0L), ("s", 2L, 0L))).toDF("g", "b", "a")
    val rh = run(api.Graft.ruleProfileDrift(h, "g", "b",
      col("a") === 1L))
    assert(rh.head.getAs[Long]("tv_permille") == 250L, s"$rh")
  }

  test("rule-profile drift: declared census + facade == declared") {
    val declared = run(
      SparkEntry.queries("q_drift_rule_profile")(spark, sf))
    assert(declared.nonEmpty)
    declared.foreach { r =>
      val tv = r.getAs[Long]("tv_permille")
      assert(tv >= 0L && tv <= 1000L, s"$r")
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") > 0L)
    }
    // the split censuses every doc exactly once: totals match the
    // per-source doc counts of the attribution table
    val attr = run(
      SparkEntry.queries("q_quality_rule_attribution")(spark, sf))
      .groupBy(_.getString(0)).map { case (s0, rows) =>
        s0 -> rows.head.getAs[Long]("n_docs") }
    declared.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") ==
        attr(r.getString(0)), s"$r")
    }
  }
}

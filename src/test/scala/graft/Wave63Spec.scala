package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 77: Cochran's Q over the 7-rule battery. */
class Wave63Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("cochran: BigInt brute replay on a constructed panel") {
    // 8 subjects x 3 judges with real disagreement
    val rows = Seq(
      (0L, 1L, 0L, 0L), (1L, 1L, 1L, 0L), (2L, 0L, 0L, 0L),
      (3L, 1L, 0L, 1L), (4L, 1L, 1L, 1L), (5L, 0L, 1L, 0L),
      (6L, 1L, 0L, 0L), (7L, 0L, 0L, 1L))
    val df = rows.toDF("id", "j1", "j2", "j3")
      .withColumn("g", org.apache.spark.sql.functions.lit("p"))
    val r = run(api.Graft.cochranQ(df, "g", Seq("j1", "j2", "j3"))).head
    val m = BigInt(3)
    val cj = Seq(rows.map(_._2).sum, rows.map(_._3).sum,
      rows.map(_._4).sum).map(BigInt(_))
    val ri = rows.map(x => BigInt(x._2 + x._3 + x._4))
    val n = ri.sum
    val num = (m - 1) * (m * cj.map(c => c * c).sum - n * n) * 1000
    val den = m * n - ri.map(x => x * x).sum
    assert(r.getAs[Long]("total_fails") == n.toLong &&
      r.getAs[Long]("sum_ri2") == ri.map(x => x * x).sum.toLong)
    assert(r.getAs[Long]("q_milli") == (num / den).toLong, s"$r")
  }

  test("cochran: m = 2 IS McNemar's (b-c)^2/(b+c); degenerate = 0") {
    // a=both fail, b=only j1, c=only j2, d=neither: 3/4/1/2
    val rows = (0 until 3).map(i => (i.toLong, 1L, 1L)) ++
      (3 until 7).map(i => (i.toLong, 1L, 0L)) ++
      Seq((7L, 0L, 1L)) ++ (8 until 10).map(i => (i.toLong, 0L, 0L))
    val df = rows.toDF("id", "j1", "j2")
      .withColumn("g", org.apache.spark.sql.functions.lit("p"))
    val r = run(api.Graft.cochranQ(df, "g", Seq("j1", "j2"))).head
    // (b - c)^2 * 1000 / (b + c) = 9 * 1000 / 5
    assert(r.getAs[Long]("q_milli") == 1800L, s"$r")
    // unanimous panel (every subject fails all or none) -> den = 0
    val u = Seq((0L, 1L, 1L), (1L, 0L, 0L), (2L, 1L, 1L))
      .toDF("id", "j1", "j2")
      .withColumn("g", org.apache.spark.sql.functions.lit("p"))
    val ru = run(api.Graft.cochranQ(u, "g", Seq("j1", "j2"))).head
    assert(ru.getAs[Long]("q_milli") == 0L, s"$ru")
  }

  test("cochran: declared ingredients reconcile with rule attribution") {
    val q = run(SparkEntry.queries("q_quality_cochran_q")(spark, sf))
      .map(r => r.getString(0) -> r).toMap
    val attr = run(
      SparkEntry.queries("q_quality_rule_attribution")(spark, sf))
    assert(q.nonEmpty)
    // N (total fails) = the attribution table's per-source fail sum;
    // n_docs agrees; Q is non-negative
    attr.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val r = q(src)
      assert(r.getAs[Long]("m") == 7L)
      assert(r.getAs[Long]("total_fails") ==
        rows.map(_.getAs[Long]("fails")).sum, s"$src")
      assert(r.getAs[Long]("n_docs") ==
        rows.head.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("q_milli") >= 0L)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 73: the UniMax budget frontier. */
class Wave59Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("unimax sweep: half-budget row == declared; monotone in budget") {
    val sweep = run(SparkEntry.queries("q_mix_unimax_sweep")(spark, sf))
    val declared = run(SparkEntry.queries("q_mix_unimax")(spark, sf))
    // the 500-permille arm IS the deployed allocation, value-for-value
    val half = sweep.filter(_.getLong(0) == 500L)
    assert(half.map(r => r.toSeq.drop(1)) == declared.map(_.toSeq))
    // per-group allocation is monotone in the budget (every fold step
    // preserves rem ordering: x - min(cap, x div k) is non-decreasing)
    val byGrp = sweep.groupBy(_.getString(1))
    byGrp.foreach { case (g, rows) =>
      val allocs = rows.sortBy(_.getLong(0))
        .map(_.getAs[Long]("alloc_tokens"))
      assert(allocs == allocs.sorted, s"$g: $allocs")
      rows.foreach { r =>
        assert(r.getAs[Long]("alloc_tokens") <=
          r.getAs[Long]("cap_tokens"), s"$r")
      }
    }
    // a bigger budget can only saturate MORE groups
    val cappedPerBudget = sweep.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getAs[Long]("capped")).sum)
    assert(cappedPerBudget == cappedPerBudget.sorted, s"$cappedPerBudget")
  }

  test("unimax frontier facade == declared") {
    import org.apache.spark.sql.functions._
    val declared = run(SparkEntry.queries("q_mix_unimax_sweep")(
      spark, sf))
    val facade = run(api.Graft.unimaxFrontier(
      Tables(spark, sf, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("ntok")),
      "ntok", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}

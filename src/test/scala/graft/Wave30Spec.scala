package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r10 wave-30 operators: the IVM delta algebra
  * must converge to the direct rebuild (checked against an
  * INDEPENDENT Spark formulation, not just the DuckDB oracle), and
  * the DPO pairing must be a matching: every doc in at most one
  * pair, pair counts exactly n/2 per group. */
class Wave30Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) =
    try SparkEntry.queries(name)(spark, sf).collect()
    finally CacheScope.release()

  test("join-view IVM: merge of signed deltas == direct rebuild") {
    val ivm = q("q_mv_join_ivm")
    val direct = Tables(spark, sf, "orders")
      .filter(col("o_orderkey") % 10 =!= 3)
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(Tables.dec(col("o_totalprice"))).as("sumd"))
      .select(col("c_mktsegment"), col("o_orderpriority"), col("cnt"),
        col("sumd").cast("double").as("sum_price"),
        (col("sumd").cast("double") / col("cnt")).as("avg_price"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
      .collect()
    assert(ivm.nonEmpty)
    assert(ivm.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq,
      "incremental state diverged from the direct rebuild")
    // maintained count must never be <= 0 after the retraction merge
    ivm.foreach(r => assert(r.getAs[Long]("cnt") > 0))
  }

  test("join-view IVM: dim joins broadcast in every delta branch") {
    val plan = SparkEntry.queries("q_mv_join_ivm")(spark, sf)
      .queryExecution.executedPlan.toString
    CacheScope.release()
    assert(plan.contains("BroadcastHashJoin"),
      "customer dim should broadcast")
    assert(!plan.contains("SortMergeJoin"),
      s"unexpected shuffle join in a dim-join IVM plan")
  }

  test("DPO pairs: rank-symmetric pairing is a matching with n/2 pairs") {
    val rows = q("q_pref_pairs")
    assert(rows.nonEmpty)
    // independent group sizes straight from the fixture
    val sizes = Tables(spark, sf, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
        r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val (total, kept) =
        (r.getAs[Long]("pairs_total"), r.getAs[Long]("pairs_kept"))
      assert(total == sizes(key) / 2,
        s"pairing not a perfect half-matching for $key: $total")
      assert(kept <= total && kept >= 0)
      assert(r.getAs[Long]("chosen_longer") <= kept,
        "length-bias count exceeds kept pairs")
      // rank-symmetric pairing makes every margin non-negative, and a
      // kept pair clears the 50-milli dead zone
      assert(r.getAs[Long]("margin_sum") >= 50 * kept)
    }
  }
}

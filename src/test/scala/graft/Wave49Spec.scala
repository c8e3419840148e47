package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 55: the NSW trilogy completed — degree (build dial) and
  * delta-insert (maintenance dial) beside the ef sweep (query dial).
  * The delta audit's incremental ≡ rebuild theorem is pinned three
  * ways: conf twin, edge-census hash (DuckDB oracle), and the
  * explicit edge-set equality here. */
class Wave49Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("deg sweep: 3 rows; deg=8 point == the deployed operating point") {
    val sweep = run(SparkEntry.queries("q_sim_nsw_deg_sweep")(spark, sf))
    assert(sweep.map(_.getLong(0)) == Seq(4L, 8L, 16L))
    val rec = run(SparkEntry.queries("q_sim_nsw_recall")(spark, sf)).head
    val p8 = sweep.find(_.getLong(0) == 8L).get
    assert(p8.getAs[Long]("candidates") == rec.getAs[Long]("candidates"))
    assert(p8.getAs[Long]("recall_at10_permille") ==
      rec.getAs[Long]("recall_at10_permille"))
    val facade = run(api.Graft.nswDegFrontier(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding"))
    assert(facade == sweep)
  }

  test("delta insert: incremental == full rebuild (conf twin + census)") {
    val inc = run(SparkEntry.queries("q_sim_nsw_delta")(spark, sf))
    assert(inc.nonEmpty)
    // node conservation: every vector sits in exactly one cell
    val n = Tables(spark, sf, "embeddings").count()
    assert(inc.map(_.getAs[Long]("n_nodes")).sum == n)
    // the rebuild plan must be bit-identical (the theorem)
    spark.conf.set("spark.graft.nsw.fullRebuild", "true")
    val reb =
      try run(SparkEntry.queries("q_sim_nsw_delta")(spark, sf))
      finally spark.conf.unset("spark.graft.nsw.fullRebuild")
    assert(inc == reb)
    val facade = run(api.Graft.nswInsertAudit(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding"))
    assert(facade == inc)
  }

  test("delta insert: non-dense ids shift cleanly") {
    val embs = Tables(spark, sf, "embeddings")
    val base = run(api.Graft.nswInsertAudit(embs, "vec_id", "embedding"))
    val shifted = embs.select((col("vec_id") + 100).as("vec_id"),
      col("embedding"))
    val sh = run(api.Graft.nswInsertAudit(shifted, "vec_id",
      "embedding"))
    // same cells (ids shifted), same node/edge counts; dst_sum moves
    // by exactly 100 per edge
    assert(sh.map(r => (r.getLong(0) - 100,
        r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("dst_sum") - 100L * r.getAs[Long]("n_edges"))) ==
      base.map(r => (r.getLong(0), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("dst_sum"))))
  }
}

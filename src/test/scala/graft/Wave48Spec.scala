package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 53: the graph-based ANN (NSW-shape, VERDICT r16 item 5)
  * — search-result shape, audit-vs-search consistency, facade pins,
  * and the non-dense-id discipline from birth. */
class Wave48Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("nsw search: every query gets a contiguous ranked top-10") {
    val rows = run(SparkEntry.queries("q_sim_nsw_search")(spark, sf))
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 50)
    byQ.foreach { case (q, rs) =>
      // ranks are 1..k contiguous, neighbors distinct, self excluded
      assert(rs.map(_.getLong(1)).sorted == (1L to rs.size).toSeq, s"$q")
      val cids = rs.map(_.getLong(2))
      assert(cids.distinct.size == cids.size && !cids.contains(q))
    }
  }

  test("nsw recall: audit row is consistent with the search") {
    val rec = run(SparkEntry.queries("q_sim_nsw_recall")(spark, sf))
    assert(rec.size == 1)
    val r = rec.head
    assert(r.getAs[Long]("n_queries") == 50L)
    assert(r.getAs[Long]("candidates") > 0L)
    val recall = r.getAs[Long]("recall_at10_permille")
    assert(recall >= 0 && recall <= 1000)
    // the searched top-10 is drawn FROM the audited candidate set, so
    // hits (= recall numerator) can never exceed the search's output
    val searched = run(SparkEntry.queries("q_sim_nsw_search")(spark, sf))
    assert(searched.size <= 50 * 10)
    assert(recall * 50 * 10 / 1000 <= searched.size)
  }

  test("nsw ef sweep: 3 rows; deployed point == the recall audit") {
    val sweep = run(SparkEntry.queries("q_sim_nsw_ef_sweep")(spark, sf))
    assert(sweep.map(_.getLong(0)) == Seq(4L, 8L, 16L))
    // the ef = 16 frontier point IS the deployed walk — its audit
    // numbers must equal q_sim_nsw_recall's row exactly
    val rec = run(SparkEntry.queries("q_sim_nsw_recall")(spark, sf)).head
    val p16 = sweep.find(_.getLong(0) == 16L).get
    assert(p16.getAs[Long]("n_queries") == rec.getAs[Long]("n_queries"))
    assert(p16.getAs[Long]("candidates") == rec.getAs[Long]("candidates"))
    assert(p16.getAs[Long]("recall_at10_permille") ==
      rec.getAs[Long]("recall_at10_permille"))
    val facade = run(api.Graft.nswEfFrontier(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding"))
    assert(facade == sweep)
  }

  test("nsw facades == declared; non-dense ids; empty raise") {
    val embs = Tables(spark, sf, "embeddings")
    val declared = run(SparkEntry.queries("q_sim_nsw_search")(spark, sf))
    val facade = run(api.Graft.nswSearch(embs, "vec_id", "embedding"))
    assert(facade.nonEmpty && facade == declared)
    val declaredRec =
      run(SparkEntry.queries("q_sim_nsw_recall")(spark, sf))
    val facadeRec =
      run(api.Graft.nswRecallAudit(embs, "vec_id", "embedding"))
    assert(facadeRec == declaredRec)
    // ids shifted by +100: same vectors, same graph, same walk
    val shifted = embs.select((col("vec_id") + 100).as("vec_id"),
      col("embedding"))
    val sh = run(api.Graft.nswSearch(shifted, "vec_id", "embedding"))
    assert(sh.map(r => (r.getLong(0) - 100, r.getLong(1),
        r.getLong(2) - 100)) ==
      declared.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    intercept[IllegalArgumentException] {
      api.Graft.nswSearch(embs.filter(col("vec_id") < 0),
        "vec_id", "embedding")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 79: embedding cell-histogram drift (exact TV). */
class Wave65Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  private def oneHot(j: Int): Seq[Double] =
    Seq.tabulate(64)(i => if (i == j) 1.0 else 0.0)

  test("cell drift: same occupancy SHAPE reads TV = 0 at any scale") {
    // seeds 0..15 on distinct axes; A carries 2 vectors per cell
    // (seed + one copy), B carries 1 per cell — different sizes,
    // identical distributions
    val eq = (0 until 16).map(i => (i.toLong, oneHot(i))) ++
      (0 until 16).map(i => (100L + i, oneHot(i))) ++
      (0 until 16).map(i => (200L + i, oneHot(i)))
    val re = run(api.Graft.embCellDrift(eq.toDF("vec_id", "embedding"),
      "vec_id", "embedding", col("vec_id") < 200L))
    assert(re.size == 16)
    re.foreach { x =>
      assert(x.getAs[Long]("tv_permille") == 0L &&
        x.getAs[Long]("dev_micro") == 0L, s"$x")
    }
  }

  test("cell drift: disjoint snapshots, exact hand-computed TV") {
    val rows = (0 until 16).map(i => (i.toLong, oneHot(i))) ++
      (0 until 10).map(i => (100L + i, oneHot(0))) ++
      (0 until 10).map(i => (200L + i, oneHot(1)))
    val df = rows.toDF("vec_id", "embedding")
    // A = seeds + the cell-0 pack (26), B = the cell-1 pack (10)
    val r = run(api.Graft.embCellDrift(df, "vec_id", "embedding",
      col("vec_id") < 200L))
    val byCell = r.map(x => x.getLong(0) -> x).toMap
    // sum_dev = |11*10-0| + |1*10-10*26| + 14*|1*10-0| = 500
    // tv = 500 * 1000 div (2 * 26 * 10) = 961
    r.foreach(x => assert(x.getAs[Long]("tv_permille") == 961L, s"$x"))
    assert(byCell(0L).getAs[Long]("n_a") == 11L &&
      byCell(0L).getAs[Long]("n_b") == 0L)
    assert(byCell(1L).getAs[Long]("n_a") == 1L &&
      byCell(1L).getAs[Long]("n_b") == 10L)
    // dev_micro: cell0 110*1e6 div 260 = 423076; cell1 250*1e6 div
    // 260 = 961538; others 10*1e6 div 260 = 38461
    assert(byCell(0L).getAs[Long]("dev_micro") == 423076L)
    assert(byCell(1L).getAs[Long]("dev_micro") == 961538L)
    assert(byCell(5L).getAs[Long]("dev_micro") == 38461L)
  }

  test("cell drift: declared fixture invariants + facade == declared") {
    val declared = run(SparkEntry.queries("q_emb_cell_drift")(spark, sf))
    assert(declared.size == 16)
    val tv = declared.head.getAs[Long]("tv_permille")
    assert(tv >= 0L && tv <= 1000L)
    assert(declared.forall(_.getAs[Long]("tv_permille") == tv))
    val sumDev = declared.map(_.getAs[Long]("dev_micro")).sum
    assert(sumDev >= 2000L * tv - 16L &&
      sumDev <= 2000L * (tv + 1L) + 16L, s"$sumDev vs $tv")
    val facade = run(api.Graft.embCellDrift(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding",
      expr("""pmod(CAST(conv(substring(md5(CAST(vec_id AS STRING)),
          1, 15), 16, 10) AS BIGINT), 2)""") === 0))
    assert(facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}

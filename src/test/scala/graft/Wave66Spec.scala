package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 80: Kendall's W concordance. */
class Wave66Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("kendall w: unanimous rankers read 1000; full m=2 reversal 0") {
    val uni = Seq(("a", 30L, 300L, 3L), ("b", 20L, 200L, 2L),
      ("c", 10L, 100L, 1L)).toDF("id", "k1", "k2", "k3")
    val r = run(api.Graft.kendallW(uni, "id", Seq("k1", "k2", "k3")))
    assert(r.size == 3)
    r.foreach { x =>
      assert(x.getAs[Long]("w_milli") == 1000L &&
        x.getAs[Long]("rho_avg_milli") == 1000L, s"$x")
    }
    // identical rankings -> every rank column agrees per row
    r.foreach(x => assert(x.getAs[Long]("rank_k1") ==
      x.getAs[Long]("rank_k2")))
    val rev = Seq(("a", 3L, 1L), ("b", 2L, 2L), ("c", 1L, 3L))
      .toDF("id", "k1", "k2")
    val r2 = run(api.Graft.kendallW(rev, "id", Seq("k1", "k2")))
    // perfectly opposed rankings: every r_sum = n + 1 -> S = 0
    r2.foreach { x =>
      assert(x.getAs[Long]("r_sum") == 4L &&
        x.getAs[Long]("w_milli") == 0L &&
        x.getAs[Long]("rho_avg_milli") == -1000L, s"$x")
    }
  }

  test("kendall w: BigInt brute replay on a mixed panel") {
    val rows = Seq(("a", 5L, 9L, 1L), ("b", 4L, 2L, 8L),
      ("c", 3L, 7L, 2L), ("d", 2L, 1L, 9L), ("e", 1L, 5L, 3L))
    val r = run(api.Graft.kendallW(rows.toDF("id", "k1", "k2", "k3"),
      "id", Seq("k1", "k2", "k3")))
    val (m, n) = (BigInt(3), BigInt(5))
    val rsums = r.map(x => BigInt(x.getAs[Long]("r_sum")))
    val s4 = rsums.map(rs => (2 * rs - m * (n + 1)) *
      (2 * rs - m * (n + 1))).sum
    val w = s4 * 3000 / (m * m * (n * n * n - n))
    r.foreach(x => assert(x.getAs[Long]("w_milli") == w.toLong, s"$x"))
    // each ranking is a strict permutation: rank sums are n(n+1)/2
    Seq("rank_k1", "rank_k2", "rank_k3").foreach { c =>
      assert(r.map(_.getAs[Long](c)).sorted == Seq(1L, 2L, 3L, 4L, 5L))
    }
  }

  test("kendall w: declared fixture invariants") {
    val declared = run(
      SparkEntry.queries("q_agreement_kendall_w")(spark, sf))
    assert(declared.nonEmpty)
    val w = declared.head.getAs[Long]("w_milli")
    assert(w >= 0L && w <= 1000L)
    assert(declared.forall(_.getAs[Long]("w_milli") == w))
    val rho = declared.head.getAs[Long]("rho_avg_milli")
    assert(rho == (3L * w - 1000L) / 2L)
    val n = declared.size.toLong
    // every ranker emits a strict permutation of 1..n
    Seq("rank_k_quality", "rank_k_length", "rank_k_diversity")
      .foreach { c =>
        assert(declared.map(_.getAs[Long](c)).sorted ==
          (1L to n), s"$c")
      }
    assert(declared.map(_.getAs[Long]("r_sum")).sum == 3L * n * (n + 1) / 2)
  }
}

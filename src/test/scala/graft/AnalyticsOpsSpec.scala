package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r9 wave 8-11 analytics/corpus operators that the
  * value oracle cannot express: sketch error bounds, rank-statistic
  * ordering, conservation laws, and candidate-set exclusions. */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("count-min estimates NEVER underestimate (CMS one-sided bound)") {
    val rows = q("q_agg_countmin").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("cm_estimate")
      val truth = r.getAs[Long]("true_cnt")
      assert(est >= truth, s"probe ${r.get(0)}: est $est < true $truth")
      assert(r.getAs[Long]("overest_permille") >= 1000L)
    }
  }

  test("reservoir sample draws exactly 10 per source, ranks 1..10") {
    val rows = q("q_sample_reservoir").collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      assert(rs.length == 10, s"$src drew ${rs.length}")
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to 10), src)
    }
  }

  test("robust stats: rank quartiles are ordered, winsorized mean inside fences") {
    q("q_robust_stats").collect().foreach { r =>
      val (q1, med, q3) = (r.getAs[Long]("q1_cents"),
        r.getAs[Long]("med_cents"), r.getAs[Long]("q3_cents"))
      val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      assert(lo <= q1 && q1 <= med && med <= q3 && q3 <= hi, r.toString)
      val wm = r.getAs[Long]("wins_mean_cents")
      assert(wm >= lo && wm <= hi, r.toString)
    }
  }

  test("PQ assignment conserves vectors per subspace and errors are non-negative") {
    val rows = q("q_emb_pq").collect()
    val n = Tables(spark, sf, "embeddings").count()
    val byM = rows.groupBy(_.getAs[Int]("m"))
    assert(byM.keySet == Set(0, 1, 2, 3))
    byM.foreach { case (m, rs) =>
      assert(rs.map(_.getAs[Long]("n_assigned")).sum == n, s"subspace $m")
      rs.foreach(r => assert(r.getAs[Long]("total_err") >= 0L))
    }
  }

  test("ABC classes conserve total revenue and partition the part set") {
    val rows = q("q_pareto_abc").collect()
    val parts = Tables(spark, sf, "lineitem")
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_.getAs[String]("abc_class")).toSet.subsetOf(
      Set("A", "B", "C")))
    assert(rows.map(_.getAs[Long]("n_parts")).sum == parts)
    val shares = rows.map(_.getAs[Long]("class_share_pm")).sum
    // integer floor per class: within 3 permille of a full partition
    assert(shares >= 997 && shares <= 1000, s"shares $shares")
  }

  test("RFM segments conserve purchasing customers; scores in 1..5") {
    val rows = q("q_customer_rfm").collect()
    val purchasers = Tables(spark, sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == purchasers)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5, s"$c=$v")
      }
    }
  }

  test("link prediction candidates are strict non-edges with >= 1 common neighbor") {
    val preds = q("q_graph_linkpred").collect()
    assert(preds.nonEmpty)
    preds.foreach(r => assert(r.getAs[Long]("common") >= 1L))
    // recompute the support-pruned edge set and assert exclusion
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("u"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    preds.foreach { r =>
      val p = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(!edges.contains(p), s"predicted pair $p is already an edge")
    }
  }

  test("rerank emits a full top-10 per query and flags exactly the rank moves") {
    val rows = q("q_sim_rerank").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 5)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("fine_rank")).sorted.toSeq == (1 to 10),
        s"query $qid")
    }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("moved") ==
        (r.getAs[Int]("fine_rank") != r.getAs[Int]("coarse_rank")))
    }
  }

  test("KL drift is non-negative up to micro-bit rounding; interp fills every hour") {
    q("q_mix_kl").collect().foreach { r =>
      val kl = r.getAs[Double]("kl_microbits")
      assert(!kl.isNaN && kl > -100.0, s"KL $kl")
    }
    val interp = q("q_ts_interp").collect()
    assert(interp.forall(!_.isNullAt(3)), "interpolated value was null")
    // spine ends are observed, never extrapolated
    val byUser = interp.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[String]("hour"))
      assert(!sorted.head.getAs[Boolean]("interpolated"), s"user $u head")
      assert(!sorted.last.getAs[Boolean]("interpolated"), s"user $u last")
    }
  }

  test("skew diagnostic: max >= p99 >= mean >= 1; hot keys sorted desc") {
    val rows = q("q_skew_diagnose").collect()
    def metric(m: String): Long =
      rows.find(_.getAs[String]("metric") == m).get.getAs[Long]("val")
    assert(metric("max") >= metric("p99"))
    assert(metric("p99") >= metric("mean"))
    assert(metric("mean") >= 1L)
    assert(metric("skew_permille") >= 1000L)
    val hot = rows.filter(_.getAs[String]("metric") == "hot")
      .map(_.getAs[Long]("val"))
    assert(hot.length == 5 && hot.sameElements(hot.sorted.reverse))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r12 wave 32: pass@k estimator (ops/CorpusOps44.scala), distinct-n
  * diversity, and hard-negative mining (ops/Similarity.scala). */
class Wave32Spec extends AnyFunSuite {
  import TestSpark._

  test("pass@k: monotone in k, exact bounds, pool accounting") {
    val rows = try SparkEntry.queries("q_eval_pass_at_k")(spark, sf)
        .collect()
      finally CacheScope.release()
    assert(rows.nonEmpty)
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n"), r.getAs[Long]("c"))
      val ks = Seq(r.getAs[Long]("pass1_permille"),
        r.getAs[Long]("pass2_permille"), r.getAs[Long]("pass5_permille"))
      assert(c >= 0 && c <= n, r)
      assert(ks.forall(p => p >= 0 && p <= 1000), r)
      // more samples can only help: pass@1 <= pass@2 <= pass@5
      assert(ks == ks.sorted, s"not monotone in k: $r")
      // k = 1 is the exact success rate (ceiling division form)
      assert(ks.head == 1000L - (1000L * (n - c)) / n, r)
      // degenerate pools pin the estimator exactly
      if (c == 0) assert(ks.head == 0, r)
      if (c == n) assert(ks == Seq(1000L, 1000L, 1000L), r)
    }
  }

  test("distinct-n: ratios bounded, gram accounting reconciles") {
    val rows = try SparkEntry.queries("q_text_distinct_n")(spark, sf)
        .collect()
      finally CacheScope.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("distinct1") <= r.getAs[Long]("tokens"), r)
      assert(r.getAs[Long]("distinct2") <= r.getAs[Long]("bigrams"), r)
      assert(r.getAs[Long]("d1_permille") <= 1000 &&
        r.getAs[Long]("d2_permille") <= 1000, r)
      // each doc with >= 2 tokens contributes len - 1 bigrams
      assert(r.getAs[Long]("bigrams") < r.getAs[Long]("tokens"), r)
    }
  }

  test("hard negatives: label disjoint, top-3, dominated by free top-1") {
    val hard = try SparkEntry.queries("q_sim_hard_negatives")(spark, sf)
        .collect()
      finally CacheScope.release()
    assert(hard.nonEmpty)
    hard.foreach { r =>
      assert(r.getAs[Any]("qlabel") != r.getAs[Any]("neg_label"), r)
      assert(r.getAs[Int]("rnk") <= 3, r)
    }
    assert(hard.groupBy(_.getAs[Long]("qid")).values.forall(_.length <= 3))
    // the unrestricted top-1 cosine can only be >= the best hard
    // negative (dropping the label constraint widens the pool)
    val free = try SparkEntry.queries("q_sim_topk")(spark, sf)
        .filter(col("rnk") === 1)
        .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos"))
        .toMap
      finally CacheScope.release()
    hard.filter(_.getAs[Int]("rnk") == 1).foreach { r =>
      val q = r.getAs[Long]("qid")
      assert(free(q) >= r.getAs[Double]("cos") - 1e-12,
        s"hard top-1 beats free top-1 for qid $q")
    }
  }

  test("pass@k n < k guard: 1000 iff any pass, 0 iff none (ADVICE r13)") {
    // The corpus pools all hold >= 25 attempts, so the r13 guard was
    // unexercised. Fixture: pools smaller than k on every contract
    // branch — c > 0 (=> 1000), c = 0 (=> 0) — plus n = k boundary
    // rows where the falling factorial must still be exact.
    import spark.implicits._
    val fx = Seq(
      ("a", 3L, 2L),  // n < 5: some pass  -> pass5 = 1000
      ("b", 3L, 0L),  // n < 5: none pass  -> pass5 = 0
      ("c", 1L, 1L),  // n < 2: pass2 = 1000; pass1 = exact 1000
      ("d", 1L, 0L),  // n < 2: pass2 = 0;    pass1 = exact 0
      ("e", 5L, 1L),  // n = 5 boundary: 1000 - C(4,5)... = 1000 (c>=1
                      //   kills the numerator's last factor: 1000-0)
      ("f", 5L, 0L))  // n = 5, c = 0: exact 0
      .toDF("source", "n", "c")
    val got = fx.select(col("source"),
        expr(ops.CorpusOps44.passKExpr(1)).as("p1"),
        expr(ops.CorpusOps44.passKExpr(2)).as("p2"),
        expr(ops.CorpusOps44.passKExpr(5)).as("p5"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // hand-computed: pass@k = 1000 - 1000*C(n-c,k)/C(n,k) (floor div)
    assert(got("a") == (667L, 1000L, 1000L), got("a").toString) // 1-1/3
    assert(got("b") == (0L, 0L, 0L))
    assert(got("c") == (1000L, 1000L, 1000L))
    assert(got("d") == (0L, 0L, 0L))
    assert(got("e") == (200L, 400L, 1000L)) // 1-4/5, 1-C(4,2)/C(5,2)=1-600
    assert(got("f") == (0L, 0L, 0L))
  }
}

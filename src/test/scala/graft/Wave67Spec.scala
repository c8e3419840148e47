package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 waves 81-82: minhash estimation error + NB threshold pick. */
class Wave67Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("est error: identical docs estimate exactly (err 0 at decile 9)") {
    // two identical docs: exact J = 1, signatures identical ->
    // agree = 32 -> est = 1 -> error 0; a disjoint pair never enters
    // the df-capped shingle pair stream
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg hh"),
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "xx yy zz ww vv uu tt ss")).toDF("id", "text")
    val r = run(api.Graft.minhashEstError(docs, "id", "text"))
    assert(r.size == 10)
    val d9 = r.find(_.getLong(0) == 9L).get
    assert(d9.getAs[Long]("n_pairs") == 1L &&
      d9.getAs[Long]("mean_err_micro") == 0L &&
      d9.getAs[Long]("max_err_micro") == 0L &&
      d9.getAs[Long]("bias_micro") == 0L, s"$d9")
    assert(r.map(_.getAs[Long]("n_pairs")).sum == 1L)
  }

  test("est error: declared fixture invariants") {
    val declared = run(
      SparkEntry.queries("q_dedup_minhash_est_error")(spark, sf))
    assert(declared.size == 10)
    declared.foreach { x =>
      val (n, me, mx, b) = (x.getAs[Long]("n_pairs"),
        x.getAs[Long]("mean_err_micro"), x.getAs[Long]("max_err_micro"),
        x.getAs[Long]("bias_micro"))
      // error is a |fraction| difference: bounded by 1e6; mean <= max;
      // |bias| <= mean (signed mean of the same terms)
      assert(me >= 0 && me <= mx + 1 && mx <= 1000000L, s"$x")
      assert(math.abs(b) <= me + 1, s"$x")
      if (n == 0) assert(me == 0 && mx == 0 && b == 0)
    }
    // the pair census matches the shared stream's decile census
    val sc = run(
      SparkEntry.queries("q_dedup_scurve_actual")(spark, sf))
    assert(declared.map(x => (x.getLong(0), x.getAs[Long]("n_pairs")))
      == sc.map(x => (x.getLong(0), x.getAs[Long]("n_pairs"))))
  }

  test("nb threshold: cumulative accounting + best flags") {
    val declared = run(
      SparkEntry.queries("q_quality_nb_threshold")(spark, sf))
    assert(declared.size == 51)
    val cal = run(
      SparkEntry.queries("q_quality_nb_calibration")(spark, sf))
    val totDocs = cal.map(_.getAs[Long]("n_docs")).sum
    val totPos = cal.map(_.getAs[Long]("n_pos")).sum
    declared.groupBy(_.getAs[Long]("cost_ratio")).foreach {
      case (lamb, rows) =>
        assert(rows.size == 17)
        val sorted = rows.sortBy(_.getAs[Long]("threshold"))
        // t = 0 keeps everything
        assert(sorted.head.getAs[Long]("kept") == totDocs &&
          sorted.head.getAs[Long]("tp") == totPos, s"$lamb")
        // kept/tp are non-increasing in t
        sorted.sliding(2).foreach { case Seq(a, b) =>
          assert(a.getAs[Long]("kept") >= b.getAs[Long]("kept"))
          assert(a.getAs[Long]("tp") >= b.getAs[Long]("tp"))
        }
        // utility arithmetic + exactly one best = the true argmax
        rows.foreach { x =>
          assert(x.getAs[Long]("utility") == x.getAs[Long]("tp") -
            lamb * x.getAs[Long]("fp"))
        }
        val best = rows.filter(_.getAs[Long]("is_best") == 1L)
        assert(best.size == 1)
        assert(best.head.getAs[Long]("utility") ==
          rows.map(_.getAs[Long]("utility")).max)
    }
    // a harsher cost ratio never LOWERS the optimal cut
    val bestByLam = declared.filter(_.getAs[Long]("is_best") == 1L)
      .sortBy(_.getAs[Long]("cost_ratio"))
      .map(_.getAs[Long]("threshold"))
    assert(bestByLam == bestByLam.sorted, s"$bestByLam")
  }

  test("nb threshold: facade == declared") {
    val declared = run(
      SparkEntry.queries("q_quality_nb_threshold")(spark, sf))
    val flagged = run(api.Graft.nbThresholdPick(
      ops.CorpusOps46.gopherFlagged(
        Tables(spark, sf, "documents")
          .select(col("doc_id"), col("source"), col("text")),
        Seq("doc_id", "source", "text"))
        .select(col("doc_id"), col("text"), col("r_all")),
      "doc_id", "text", col("r_all"), col("doc_id") % 2 === 0))
    assert(flagged.nonEmpty &&
      flagged.map(_.toSeq) == declared.map(_.toSeq))
  }
}

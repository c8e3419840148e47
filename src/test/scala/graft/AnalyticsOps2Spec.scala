package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r9 wave 17-18 operators that the value oracle
  * cannot express: probability-range laws for the classifier
  * evaluation suite, set semantics of CDC compaction, the band
  * ordering of trailing-window engagement counts, and the
  * one-sidedness of the cardinality estimator's components. */
class AnalyticsOps2Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("AUC is a probability; pos/neg partition the corpus") {
    val r = q("q_classifier_auc").collect().head
    val docs = Tables(spark, sf, "documents").count()
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == docs)
    assert(r.getAs[Long]("auc_num2") >= 0L)
    assert(r.getAs[Long]("auc_num2") <= r.getAs[Long]("auc_den2"))
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0, s"auc $auc")
  }

  test("calibration deciles partition the corpus with equal-frequency bins") {
    val rows = q("q_calibration_bins").collect()
    val docs = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("bin")).sorted.toSeq == (1L to 10L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, s"ntile fill rule: ${sizes.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("pos_permille") <= 1000L)
    }
  }

  test("kappa is in [-1, 1] and the 2x2 confusion conserves the corpus") {
    val r = q("q_agreement_kappa").collect().head
    val docs = Tables(spark, sf, "documents").count()
    assert(r.getAs[Long]("yy") + r.getAs[Long]("yn") +
      r.getAs[Long]("ny") + r.getAs[Long]("nn") == docs)
    val k = r.getAs[Double]("kappa")
    assert(k.isNaN || (k >= -1.0 && k <= 1.0), s"kappa $k")
  }

  test("benford digits are 1..9, conserve orders, and permilles sum to ~1000") {
    val rows = q("q_dq_benford").collect()
    val orders = Tables(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("digit")).forall(d => d >= 1 && d <= 9))
    assert(rows.map(_.getAs[Long]("n")).sum == orders)
    val obs = rows.map(_.getAs[Long]("obs_permille")).sum
    assert(obs >= 1000 - rows.length && obs <= 1000, s"obs sum $obs")
    // the canonical expectation itself sums to 1000 exactly
    assert(Seq(301, 176, 125, 97, 79, 67, 58, 51, 46).sum == 1000)
  }

  test("CDC compaction keeps exactly the keys whose LATEST op is an upsert") {
    import org.apache.spark.sql.expressions.Window
    val got = q("q_cdc_compact").collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[String]("last_event_type")).toMap
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expect = Tables(spark, sf, "events")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("event_type"))
      .toMap
    val survivors = expect.filter(_._2 != "error")
    assert(got.keySet == survivors.keySet,
      s"missing=${survivors.keySet -- got.keySet} extra=${got.keySet -- survivors.keySet}")
    got.foreach { case (k, t) => assert(t == survivors(k), s"key $k") }
  }

  test("engagement bands nest: dau <= wau <= mau; stickiness <= 1000") {
    val rows = q("q_rollup_dau").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, wk, m) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"))
      assert(d <= wk && wk <= m, s"${r.getAs[String]("day")}: $d/$wk/$m")
      assert(d >= 1L) // observed days have at least one active user
      assert(r.getAs[Long]("stickiness_permille") <= 1000L)
    }
    // first observed day has no history: all three bands coincide
    val first = rows.minBy(_.getAs[String]("day"))
    assert(first.getAs[Long]("dau") == first.getAs[Long]("mau"))
  }

  test("trend regression has a positive spread denominator per type") {
    val rows = q("q_ts_trend").collect()
    assert(rows.length == 5) // one per event type
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") >= 2, r.toString)
      assert(r.getAs[Long]("slope_den") > 0L, r.toString)
      assert(!r.getAs[Double]("slope_per_day").isNaN)
    }
  }

  test("cardinality audit: estimate and actual both dominate row count") {
    val r = q("q_join_card_audit").collect().head
    val n = r.getAs[Long]("n_rows")
    assert(r.getAs[Long]("ndv") <= n)
    assert(r.getAs[Long]("est_pairs") >= n)    // n^2/ndv >= n
    assert(r.getAs[Long]("actual_pairs") >= n) // sum c^2 >= sum c
    assert(r.getAs[Long]("max_key_share_permille") <= 1000L)
  }
}

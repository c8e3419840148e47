package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the r10 wave-9 operators: association-rule
  * direction/bounds laws, the pigeonhole law of the mode, l-diversity
  * floor bounds, and the curriculum interleave's per-source
  * monotonicity (the law the bucketed-rank decomposition must
  * preserve). */
class AnalyticsOps4Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("association rules: bounds, no self-rules, direction asymmetry") {
    val rows = q("q_basket_rules").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("antecedent") != r.getAs[Long]("consequent"))
      val conf = r.getAs[Long]("conf_permille")
      assert(conf >= 0L && conf <= 1000L, s"conf $conf")
      assert(r.getAs[Long]("supp") >= 2L)
      assert(r.getAs[Long]("lift_micro") >= 0L)
    }
    // lift is direction-symmetric: when both directions of a pair
    // survive the top-20 cut, their lifts must agree exactly
    val byPair = rows.groupBy(r => {
      val a = r.getAs[Long]("antecedent"); val b = r.getAs[Long]("consequent")
      (math.min(a, b), math.max(a, b))
    })
    byPair.values.filter(_.length == 2).foreach { pair =>
      assert(pair(0).getAs[Long]("lift_micro") ==
        pair(1).getAs[Long]("lift_micro"))
      assert(pair(0).getAs[Long]("supp") == pair(1).getAs[Long]("supp"))
    }
  }

  test("mode: pigeonhole law and share bound per group") {
    val rows = q("q_agg_mode").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cnt = r.getAs[Long]("mode_cnt")
      val nd = r.getAs[Long]("n_distinct")
      val share = r.getAs[Long]("share_permille")
      assert(share >= 0L && share <= 1000L)
      // the most frequent value covers at least 1/n_distinct of rows
      assert(cnt * nd * share >= 0)
      assert(share * nd >= 1000L - nd, s"pigeonhole: $share * $nd")
    }
  }

  test("l-diversity: majority floor and gate consistency") {
    val rows = q("q_privacy_ldiversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      val p = r.getAs[Long]("majority_permille")
      assert(l >= 1L && p <= 1000L)
      // floor(1000*max/n) with max*l >= n  =>  p*l >= 1000 - l
      assert(p * l >= 1000L - l, s"majority floor: p=$p l=$l")
      assert(r.getAs[Boolean]("is_diverse") == (l >= 2 && p <= 800))
    }
  }

  test("label propagation: labels are graph node ids, sizes positive") {
    val rows = q("q_graph_labelprop").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("community")).distinct.length == rows.length)
    // every label originates from a node id, and node ids are part keys
    val parts = Tables(spark, sf, "lineitem")
      .select("l_partkey").distinct().collect()
      .map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(parts.contains(r.getAs[Long]("community")))
      assert(r.getAs[Long]("n_nodes") >= 1L)
      assert(parts.contains(r.getAs[Long]("min_node")))
    }
  }

  test("double exponential smoothing: Brown identities and cold start") {
    val rows = q("q_ts_holt").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s1 = r.getAs[Long]("s1_milli"); val s2 = r.getAs[Long]("s2_milli")
      assert(r.getAs[Long]("level_milli") == 2 * s1 - s2)
      assert(r.getAs[Long]("trend_milli") == s1 - s2)
      assert(r.getAs[Long]("forecast_milli") ==
        r.getAs[Long]("level_milli") + r.getAs[Long]("trend_milli"))
    }
    // day 1: no lags, so S1 = y*1000 exactly and S2 = S1 (zero trend)
    val first = rows.head
    assert(first.getAs[Long]("s1_milli") == first.getAs[Long]("y") * 1000L)
    assert(first.getAs[Long]("trend_milli") == 0L)
  }

  test("mips: 5 ranks per query, dot non-increasing, ranks positive") {
    val rows = q("q_sim_mips").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("mips_rnk"))
      assert(sorted.map(_.getAs[Long]("mips_rnk")).toSeq == (1L to 5L))
      sorted.map(_.getAs[Long]("dot")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a, s"q$qid dot rise")
        case _ =>
      }
      rs.foreach(r => assert(r.getAs[Long]("cos_rnk") >= 1L))
    }
  }

  test("correlation matrix: 6 pairs, r2 within [0, 1e6], sign in range") {
    val rows = q("q_corr_matrix").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val r2 = r.getAs[Long]("r2_micro")
      // Cauchy-Schwarz: r^2 <= 1 exactly, in micro units
      assert(r2 >= 0L && r2 <= 1000000L, s"r2 $r2")
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("sign")))
      // pairs follow the declared feature order (i < j), never self-pairs
      val order = Seq("qty", "disc", "tax", "price_k")
      assert(order.indexOf(r.getAs[String]("feat_x")) <
        order.indexOf(r.getAs[String]("feat_y")))
    }
  }

  test("upsample plan: cap respected, deficit only from the cap") {
    val rows = q("q_mix_upsample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val repeat = r.getAs[Long]("repeat_milli")
      val capped = r.getAs[Long]("capped_milli")
      val tokens = r.getAs[Long]("tokens")
      assert(capped <= 4000L && capped <= repeat && capped >= 0L)
      assert(r.getAs[Long]("effective_tokens") <= tokens * 4)
      val deficit = r.getAs[Long]("deficit_tokens")
      assert(deficit >= 0L)
      // uncapped sources only miss their target by fixed-point rounding
      if (capped < 4000L)
        assert(deficit <= tokens / 1000L + 2L, s"deficit $deficit")
    }
  }

  test("modularity: degree-mass law per community, bounded total") {
    val rows = q("q_graph_modularity").collect()
    val total = rows.filter(_.getAs[Long]("community") == -1L)
    assert(total.length == 1)
    // Q is bounded in [-1/2, 1); milli units with per-community floor slack
    val qm = total.head.getAs[Long]("q_milli")
    assert(qm >= -1000L && qm <= 1000L, s"total modularity $qm")
    rows.filter(_.getAs[Long]("community") != -1L).foreach { r =>
      // 2*e_c <= d_c: intra edges count twice in the degree mass
      assert(2 * r.getAs[Long]("e_in") <= r.getAs[Long]("d_sum"))
      assert(r.getAs[Long]("n_nodes") >= 1L)
    }
  }

  test("welch t-test: t2 non-negative, df within classical bounds") {
    val r = q("q_stats_ttest").collect().head
    val n1 = r.getAs[Long]("n1"); val n0 = r.getAs[Long]("n0")
    assert(n1 > 1L && n0 > 1L)
    assert(r.getAs[Double]("t2") >= 0.0)
    val df = r.getAs[Double]("welch_df")
    assert(df >= math.min(n1, n0) - 1.0 - 1e-9, s"df $df")
    assert(df <= n1 + n0 - 2.0 + 1e-9, s"df $df")
    // the split covers the whole corpus
    val docs = Tables(spark, sf, "documents").count()
    assert(n1 + n0 == docs)
  }

  test("filter venn: masks decode to the flag columns, mass conserved") {
    val rows = q("q_filter_venn").collect()
    assert(rows.map(_.getAs[Long]("mask")).distinct.length == rows.length)
    rows.foreach { r =>
      val mask = r.getAs[Long]("mask")
      assert(((mask & 1) == 1) == r.getAs[Boolean]("f_len"))
      assert(((mask & 2) == 2) == r.getAs[Boolean]("f_lang"))
      assert(((mask & 4) == 4) == r.getAs[Boolean]("f_score"))
      assert(((mask & 8) == 8) == r.getAs[Boolean]("f_ttr"))
    }
    // every doc lands in exactly one combination
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf, "documents").count())
  }

  test("bootstrap: interval ordered and covers both means") {
    val r = q("q_stats_bootstrap").collect().head
    val lo = r.getAs[Long]("ci_lo_milli"); val hi = r.getAs[Long]("ci_hi_milli")
    assert(lo <= hi)
    assert(lo <= r.getAs[Long]("boot_mean_milli") &&
      r.getAs[Long]("boot_mean_milli") <= hi)
    assert(lo <= r.getAs[Long]("obs_mean_milli") &&
      r.getAs[Long]("obs_mean_milli") <= hi)
  }

  test("matryoshka: hit counts are subsets of a 5-list") {
    val rows = q("q_emb_matryoshka").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val h16 = r.getAs[Long]("hits16"); val h32 = r.getAs[Long]("hits32")
      assert(h16 >= 0L && h16 <= 5L)
      assert(h32 >= 0L && h32 <= 5L)
    }
  }

  test("as-of tolerance: gate nulls stale matches, agrees with plain as-of") {
    val tol = q("q_join_asof_tol").collect()
    tol.foreach { r =>
      val pid = Option(r.getAs[Any]("pid_tol"))
      val wait = Option(r.getAs[Any]("wait_us"))
      assert(pid.isDefined == wait.isDefined)
      wait.foreach(w =>
        assert(w.asInstanceOf[Long] >= 0L &&
          w.asInstanceOf[Long] <= 3600000000L))
    }
    // wherever the tolerance matched, it matched the SAME purchase the
    // unbounded as-of found (the gate only ever removes, never rewires)
    val plain = q("q_join_asof").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id")) ->
        Option(r.getAs[Any]("asof_pid"))).toMap
    tol.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"))
      Option(r.getAs[Any]("pid_tol")).foreach { p =>
        assert(plain(key).contains(p), s"rewired match at $key")
      }
    }
  }

  test("twap: bounded by the observed value range") {
    val rows = q("q_ts_twap").collect()
    assert(rows.nonEmpty)
    val mm = Tables(spark, sf, "events")
      .selectExpr("min(CAST(round(value * 1e6) AS BIGINT)) lo",
        "max(CAST(round(value * 1e6) AS BIGINT)) hi").collect().head
    rows.foreach { r =>
      val t = r.getAs[Long]("twap_micro")
      assert(t >= mm.getAs[Long]("lo") && t <= mm.getAs[Long]("hi"),
        s"twap $t outside value range")
      assert(r.getAs[Long]("span_us") > 0L)
    }
  }

  test("regr battery: r2 in [0,1], counts conserve") {
    val rows = q("q_agg_regr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
      assert(r.getAs[Long]("n") > 0L)
    }
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables(spark, sf, "lineitem").count())
  }

  test("conductance: phi in [0,1000], cut within volume") {
    val rows = q("q_graph_conductance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val phi = r.getAs[Long]("phi_milli")
      assert(phi >= 0L && phi <= 1000L, s"phi $phi")
      val cut = r.getAs[Long]("cut")
      assert(cut >= 0L && cut <= r.getAs[Long]("vol"))
    }
  }

  test("markov evolution: mass conserved within truncation slack") {
    val rows = q("q_path_stationary").collect()
    val init = rows.length * 1000000L
    for (c <- Seq("pi1_micro", "pi2_micro", "pi3_micro")) {
      val mass = rows.map(_.getAs[Long](c)).sum
      assert(mass <= init, s"$c mass $mass above initial")
      assert(mass >= init * 95 / 100, s"$c mass $mass lost >5%")
      rows.foreach(r => assert(r.getAs[Long](c) >= 0L))
    }
  }

  test("burstiness: VMR floor, df respected") {
    val rows = q("q_text_burstiness").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // VMR >= the Poisson floor is not guaranteed (underdispersion
      // exists), but it is never negative and df/tf are consistent
      assert(r.getAs[Long]("vmr_milli") >= 0L)
      assert(r.getAs[Long]("df") >= 5L)
      assert(r.getAs[Long]("tf") >= r.getAs[Long]("df"))
    }
  }

  test("hubness: occurrence mass equals the retrieved-list mass") {
    val rows = q("q_emb_hubness").collect()
    val nVecs = Tables(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nVecs)
    // total occurrences = 5 per sampled query
    val mass = rows.map(r =>
      r.getAs[Long]("occ") * r.getAs[Long]("n_vectors")).sum
    val nQueries = Tables(spark, sf, "embeddings")
      .filter("vec_id % 10 = 0").count()
    assert(mass == nQueries * 5)
  }

  test("iqr outliers: fences ordered, outlier mass bounded") {
    val rows = q("q_dq_iqr_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fence_lo") <= r.getAs[Double]("q1"))
      assert(r.getAs[Double]("q1") <= r.getAs[Double]("q3"))
      assert(r.getAs[Double]("q3") <= r.getAs[Double]("fence_hi"))
      val n = r.getAs[Long]("n")
      // each tail holds at most a quarter of the mass by construction
      assert(r.getAs[Long]("n_below") <= n / 4 + 1)
      assert(r.getAs[Long]("n_above") <= n / 4 + 1)
    }
  }

  test("srm: both designs audited, chi2 consistent with the flag") {
    val rows = q("q_ab_srm").collect()
    assert(rows.map(_.getAs[String]("scenario")).sorted.toSeq ==
      Seq("ab_50_50", "holdout_90_10"))
    val users = Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
      val chi2 = r.getAs[Long]("chi2_micro")
      assert(chi2 >= 0L)
      assert(r.getAs[Boolean]("srm_detected") == (chi2 > 3841000L))
    }
  }

  test("assortativity: correlation bounded, edge ends even") {
    val r = q("q_graph_assortativity").collect().head
    val rm = r.getAs[Long]("r_milli")
    assert(rm >= -1000L && rm <= 1000L, s"r_milli $rm")
    assert(r.getAs[Long]("edge_ends") % 2 == 0L)
  }

  test("kaplan-meier: survival non-increasing, risk set telescopes") {
    val rows = q("q_surv_km").collect()
    assert(rows.nonEmpty)
    val total = Tables(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.head.getAs[Long]("n_risk") == total)
    assert(rows.map(r => r.getAs[Long]("d_events") +
      r.getAs[Long]("c_censored")).sum == total)
    // risk set strictly shrinks along t; survival log never rises
    var prevRisk = Long.MaxValue
    var prevS = 0L // log2 S starts at 0 (S = 1)
    rows.foreach { r =>
      val risk = r.getAs[Long]("n_risk")
      assert(risk < prevRisk || prevRisk == Long.MaxValue)
      assert(risk > 0L)
      prevRisk = risk
      Option(r.getAs[Any]("s_log2_micro")).foreach { s =>
        assert(s.asInstanceOf[Long] <= prevS,
          s"survival rose at t=${r.getAs[Long]("t_days")}")
        prevS = s.asInstanceOf[Long]
      }
    }
  }

  test("sax: 8 segments cover the day axis, quartile symbols balanced") {
    val rows = q("q_ts_sax").collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("segment")).sorted.toSeq == (0L to 7L))
    val nDays = Tables(spark, sf, "events")
      .selectExpr("to_date(ts)").distinct().count()
    assert(rows.map(_.getAs[Long]("days")).sum == nDays)
    // equi-depth quartiles of 8 segments: each symbol exactly twice
    val syms = rows.map(_.getAs[String]("symbol")).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(syms == Map("a" -> 2, "b" -> 2, "c" -> 2, "d" -> 2), syms)
  }

  test("compaction plan: bins conserve the manifest, fills bounded") {
    val rows = q("q_layout_compaction").collect()
    assert(rows.nonEmpty)
    val totalRows = Tables(spark, sf, "lineitem").count()
    assert(rows.map(_.getAs[Long]("rows")).sum == totalRows)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") >= 1L)
      assert(r.getAs[String]("first_month") <= r.getAs[String]("last_month"))
      // a bin only overflows by at most its last file
      assert(r.getAs[Long]("fill_permille") >= 0L)
    }
  }

  test("forward as-of: matches never precede the click") {
    val fw = q("q_join_asof_forward").collect()
    assert(fw.nonEmpty)
    // consistency with the backward as-of: a click with BOTH a prior
    // and a next purchase has next >= prior purchase id timestamps by
    // construction — here just pin null-handling and row conservation
    val clicks = Tables(spark, sf, "events")
      .filter("event_type = 'click'").count()
    assert(fw.length == clicks)
  }

  test("not-in null trap: raw is zero, stripped agrees with not-exists") {
    val r = q("q_subquery_not_in_null").collect().head
    assert(r.getAs[Long]("cnt_raw") == 0L)
    assert(r.getAs[Long]("cnt_stripped") == r.getAs[Long]("cnt_not_exists"))
    assert(r.getAs[Long]("cnt_stripped") > 0L)
  }

  test("quantified comparisons: ALL is never beaten more than ANY") {
    val rows = q("q_subquery_quantified").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("beats_all") <= r.getAs[Long]("beats_any"))
      assert(r.getAs[Long]("beats_any") <= r.getAs[Long]("n_cust"))
    }
  }

  test("t-closeness: distance in [0,1000], gate consistent") {
    val rows = q("q_privacy_tcloseness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("t_permille")
      assert(t >= 0L && t <= 1000L, s"t $t")
      assert(r.getAs[Boolean]("is_close") == (t <= 300L))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
  }

  test("changepoint p-value: add-one bounds and arithmetic consistency") {
    val r = q("q_ts_changepoint_pvalue").collect().head
    assert(r.getAs[Long]("n_perms") == 50L)
    val nGe = r.getAs[Long]("n_ge")
    assert(nGe >= 0L && nGe <= 50L)
    val p = r.getAs[Long]("p_permille")
    assert(p == (nGe + 1) * 1000 / 51)
    assert(p >= 19L && p <= 1000L) // add-one smoothing floor 1/51
    assert(r.getAs[Long]("peak_obs") > 0L)
  }

  test("curriculum: rounds contiguous per source, scores non-increasing") {
    val rows = q("q_curriculum_order").collect()
    assert(rows.length == 100)
    // (round, source) unique
    assert(rows.map(r => (r.getAs[Long]("round"),
      r.getAs[String]("source"))).distinct.length == 100)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("round"))
      // rounds start at 1 and are contiguous (the interleave serves
      // every source's r-th doc before any source's (r+1)-th)
      assert(sorted.head.getAs[Long]("round") == 1L, s"$src first round")
      sorted.map(_.getAs[Long]("round")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b == a + 1, s"$src gap $a->$b")
        case _ =>
      }
      // curriculum = best-first within each source
      sorted.map(_.getAs[Long]("score_milli")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a, s"$src score rise $a->$b")
        case _ =>
      }
    }
  }

  test("conformal: rank law, calibration-side mass, sane held-out bands") {
    val r = SparkEntry.queries("q_eval_conformal")(spark, sf).collect()(0)
    val (nCal, rankR, thr) = (r.getAs[Long]("n_cal"),
      r.getAs[Long]("rank_r"), r.getAs[Long]("threshold_milli"))
    assert(rankR == math.max((nCal + 1) / 10, 1L))
    // by construction at least n_cal - r + 1 calibration positives
    // sit at-or-above the threshold (the conformal mass guarantee)
    import org.apache.spark.sql.functions._
    val calAtOrAbove = graft.ops.CorpusOps10.scored(spark, sf)
      .filter(col("doc_id") % 2 === 0 && col("pos") === 1 &&
        col("score_milli") >= thr).count()
    assert(calAtOrAbove >= nCal - rankR + 1,
      s"$calAtOrAbove < ${nCal - rankR + 1}")
    // held-out coverage: distribution-free expectation is
    // 1 - r/(n+1) ~ 908 permille; the synthetic halves drift mildly,
    // so pin a generous honesty band, and flagged >= covered always
    val cov = r.getAs[Long]("coverage_permille")
    assert(cov >= 800 && cov <= 1000, s"coverage $cov")
    assert(r.getAs[Long]("flagged") >= r.getAs[Long]("covered"))
  }

  test("doremi: mean-1e6 normalization and weight monotone in excess") {
    val rows = SparkEntry.queries("q_mix_doremi")(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = rows.length
    val tot = rows.map(_.getAs[Long]("weight_micro")).sum
    // floor division loses < 1 micro per source per normalize step
    assert(math.abs(tot - k * 1000000L) <= 3L * k, s"tot $tot k $k")
    // same multiplicative update + shared normalization => final
    // weight is monotone non-decreasing in excess loss
    val byExcess = rows.sortBy(_.getAs[Long]("excess_milli"))
    byExcess.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("weight_micro") <=
        b.getAs[Long]("weight_micro") + 1, // +1 floor slack
        s"${a.getAs[String]("source")} vs ${b.getAs[String]("source")}")
      case _ =>
    }
    // zero-excess sources end BELOW the mean (they only get diluted)
    rows.filter(_.getAs[Long]("excess_milli") == 0L)
      .foreach(r0 => assert(r0.getAs[Long]("weight_micro") <= 1000000L))
  }
}

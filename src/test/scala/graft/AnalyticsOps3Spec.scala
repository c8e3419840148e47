package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DamerauLev

/** Invariants of the r9 wave 19 operators that the value oracle cannot
  * express: the algebraic laws of the CUSUM statistic and the interval
  * sweep, range laws for KS/Gini, pattern-count consistency, ADC
  * ranking sanity, and the textbook Damerau-Levenshtein cases that
  * separate the unrestricted variant from OSA. */
class AnalyticsOps3Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("damerau-levenshtein: textbook cases, identity, symmetry, lev bound") {
    // CA→ABC is THE separating case: unrestricted DL = 2 (transpose to
    // AC, insert B inside the transposed pair), OSA = 3.
    assert(DamerauLev.dist("CA", "ABC") == 2)
    assert(DamerauLev.dist("ab", "ba") == 1)
    assert(DamerauLev.dist("kitten", "sitting") == 3)
    assert(DamerauLev.dist("", "abc") == 3 && DamerauLev.dist("abc", "") == 3)
    val words = Seq("ring", "red", "widget", "small", "grand", "rng", "ringg")
    for (a <- words; b <- words) {
      val d = DamerauLev.dist(a, b)
      assert(d == DamerauLev.dist(b, a), s"symmetry $a $b")
      if (a == b) assert(d == 0)
      else assert(d > 0)
      // DL adds an edit op to Levenshtein's set, so it never exceeds it
      import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
      val lev = u8(a).levenshteinDistance(u8(b))
      assert(d <= lev, s"dl($a,$b)=$d > lev=$lev")
    }
  }

  test("cusum returns to exactly 0 at the last day; exactly one changepoint") {
    val rows = q("q_ts_changepoint").collect()
    assert(rows.last.getAs[Long]("cusum_scaled") == 0L)
    assert(rows.count(_.getAs[Boolean]("is_changepoint")) == 1)
    // the flagged day attains the max |cusum|
    val peak = rows.map(r => math.abs(r.getAs[Long]("cusum_scaled"))).max
    val cp = rows.filter(_.getAs[Boolean]("is_changepoint")).head
    assert(math.abs(cp.getAs[Long]("cusum_scaled")) == peak)
  }

  test("interval sweep conserves orders and never goes negative") {
    val rows = q("q_ts_concurrency").collect()
    val orders = Tables(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("opens")).sum == orders)
    assert(rows.map(_.getAs[Long]("closes")).sum == orders)
    rows.foreach(r => assert(r.getAs[Long]("concurrent") >= 0L))
    // after the final boundary every interval has closed
    assert(rows.last.getAs[Long]("concurrent") == 0L)
  }

  test("binned KS statistic is a probability distance in micro units") {
    val r = q("q_dq_ks").collect().head
    val ks = r.getAs[Long]("ks_micro")
    assert(ks >= 0L && ks <= 1000000L, s"ks_micro $ks")
    assert(r.getAs[Long]("d_num") <= r.getAs[Long]("n1") * r.getAs[Long]("n2"))
    assert(r.getAs[Long]("n_bins") > 0L)
  }

  test("gini is in [0, 1) micro for every nation") {
    val rows = q("q_ineq_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_micro")
      assert(g >= 0L && g < 1000000L,
        s"${r.getAs[String]("n_name")} gini $g")
    }
  }

  test("pattern matches never exceed the purchases that close them") {
    val rows = q("q_event_pattern").collect()
    rows.foreach { r =>
      val conv = r.getAs[Int]("n_conversions").toLong
      assert(conv <= r.getAs[Long]("n_purchases"))
      assert(r.getAs[Boolean]("converted") == (conv > 0))
      assert(r.getAs[Long]("n_events") > 0L)
    }
  }

  test("interval-overlap profile: pairs exist, totals dominate maxima") {
    val rows = q("q_join_interval_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_overlapping_pairs") >= 1L)
      assert(r.getAs[Long]("max_overlap_days") >= 1L)
      assert(r.getAs[Long]("total_overlap_days") >=
        r.getAs[Long]("max_overlap_days"))
    }
  }

  test("chi-squared cells conserve the corpus; total is the cell sum") {
    val rows = q("q_dq_chi2").collect()
    val docs = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("o")).sum == docs)
    val total = rows.head.getAs[Long]("chi2_total_micro")
    assert(rows.map(_.getAs[Long]("cell_chi2_micro")).sum == total)
    rows.foreach(r => assert(r.getAs[Long]("cell_chi2_micro") >= 0L))
    // Σe == N exactly; each floor loses < 1 micro-unit
    val eSum = rows.map(_.getAs[Long]("e_micro")).sum
    assert(eSum <= docs * 1000000L && eSum > docs * 1000000L - rows.length)
  }

  test("PSI is non-negative (every drift term is)") {
    val r = q("q_mix_psi").collect().head
    assert(r.getAs[Double]("psi_microbits") >= 0.0)
    assert(r.getAs[Long]("n_bins") > 0L)
  }

  test("zone-map audit: z-order prunes both dimensions, dominates 1-key sort") {
    val m = q("q_layout_zonemap_audit").collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val nat = m("1_natural"); val pk = m("2_partkey_sort"); val z = m("3_zorder")
    Seq(nat, pk, z).foreach(r => assert(r.getAs[Long]("n_buckets") == 64L))
    assert(z.getAs[Long]("pruned_a") > 0L && z.getAs[Long]("pruned_b") > 0L)
    assert(pk.getAs[Long]("pruned_a") > 0L)
    val conj = (r: org.apache.spark.sql.Row) => r.getAs[Long]("pruned_conjunctive")
    assert(conj(z) >= conj(pk) && conj(pk) >= conj(nat))
  }

  test("item-item cosine: (0,1], ranked, support-pruned") {
    val rows = q("q_rec_itemcos").collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c > 0.0 && c <= 1.0, s"cos $c")
      assert(r.getAs[Int]("rnk") >= 1 && r.getAs[Int]("rnk") <= 5)
      assert(r.getAs[Long]("cij") >= 2L)
      assert(r.getAs[Long]("item") != r.getAs[Long]("partner"))
    }
  }

  test("conversion latency: converted never exceeds signups, p50 <= p90") {
    val rows = q("q_ts_latency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_signups"))
      if (!r.isNullAt(r.fieldIndex("p50_latency_s"))) {
        assert(r.getAs[Long]("p50_latency_s") >= 0L)
        assert(r.getAs[Long]("p50_latency_s") <= r.getAs[Long]("p90_latency_s"))
      }
    }
  }

  test("mann-kendall: S bounded by the pair count, z carries S's sign") {
    val r = q("q_ts_mannkendall").collect().head
    val n = r.getAs[Long]("n"); val s = r.getAs[Long]("s")
    assert(math.abs(s) <= n * (n - 1) / 2)
    assert(r.getAs[Long]("var18") > 0L)
    assert(math.signum(r.getAs[Double]("z")) == math.signum(s.toDouble))
  }

  test("theil-sen: quantiles are ordered, pair count is n-choose-2") {
    val r = q("q_ts_theilsen").collect().head
    val n = q("q_ts_mannkendall").collect().head.getAs[Long]("n")
    assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    assert(r.getAs[Double]("p10_slope") <=
      r.getAs[Double]("median_slope_cents_per_day"))
    assert(r.getAs[Double]("median_slope_cents_per_day") <=
      r.getAs[Double]("p90_slope"))
  }

  test("skyline windowed rewrite equals the brute-force dominance scan") {
    val parts = Tables(spark, sf, "part")
      .selectExpr("p_partkey", "CAST(round(p_retailprice * 100) AS BIGINT) AS p",
        "CAST(p_size AS BIGINT) AS z")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = parts.filter { case (k, p, z) =>
      !parts.exists { case (k2, p2, z2) =>
        k2 != k && p2 <= p && z2 <= z && (p2 < p || z2 < z) }
    }.map(_._1).toSet
    val got = q("q_skyline_frontier").collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got == brute, s"windowed $got vs brute $brute")
  }

  test("forecast backtest: APEs non-negative, MAPE is their floor-mean") {
    val rows = q("q_forecast_backtest").collect()
    assert(rows.nonEmpty && rows.length <= 28)
    val apes = rows.map(_.getAs[Long]("ape_micro"))
    apes.foreach(a => assert(a >= 0L))
    assert(rows.head.getAs[Long]("mape_micro") == apes.sum / apes.length)
  }

  test("acf: every lag within [-1,1], pair counts are n-k") {
    val n = q("q_ts_mannkendall").collect().head.getAs[Long]("n")
    val rows = q("q_ts_acf").collect()
    assert(rows.map(_.getAs[Long]("k")).sorted.toSeq == (1L to 14L))
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 && a <= 1.0, s"k=${r.getAs[Long]("k")} acf $a")
      assert(r.getAs[Long]("n_pairs") == n - r.getAs[Long]("k"))
    }
  }

  test("nearest-event join equals the brute-force two-sided scan") {
    import java.sql.Timestamp
    val evs = Tables(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("error", "purchase"))
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = evs.groupBy(_._1)
    val brute = byUser.toSeq.flatMap { case (_, rs) =>
      val buys = rs.filter(_._4 == "purchase").map(r => (r._2, r._3)).toSeq
      rs.toSeq.filter(_._4 == "error").flatMap { case (_, us, eid, _) =>
        // backward = max (ts,id) before the error's (ts,id); forward =
        // min (ts,id) strictly after — the pinned window order
        def key(b: (Long, Long)) = (b._1, b._2)
        val before = buys.filter(b => b._1 < us || (b._1 == us && b._2 < eid))
        val after = buys.filter(b => b._1 > us || (b._1 == us && b._2 > eid))
        val bw = if (before.isEmpty) None else Some(before.maxBy(key))
        val fw = if (after.isEmpty) None else Some(after.minBy(key))
        val pick: Option[(Long, Long)] = (bw, fw) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (us - b._1 <= f._1 - us) Some(b) else Some(f)
        }
        pick.map(p => (eid, p._2, math.abs(us - p._1)))
      }
    }.toSet
    val got = q("q_join_nearest").collect()
      .map(r => (r.getAs[Long]("error_id"),
        r.getAs[Long]("nearest_purchase_id"),
        r.getAs[Long]("distance_us"))).toSet
    assert(got == brute,
      s"diff: ${(got -- brute).take(3)} / ${(brute -- got).take(3)}")
  }

  test("bfs levels: seeds at 0, every level-k vertex touches level k-1") {
    val rows = q("q_graph_bfs").collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("dist"))
    val dist = rows.toMap
    assert(rows.length == dist.size, "one label per vertex")
    assert(dist.filter(_._2 == 0L).keySet == dist.keySet.filter(_ < 3))
    // reconstruct edges the same way to check the relaxation law
    val li = Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    dist.filter(_._2 > 0L).foreach { case (v, d) =>
      assert(adj(v).exists(n => dist.get(n).contains(d - 1)),
        s"vertex $v at $d has no neighbor at ${d - 1}")
    }
  }

  test("trimmed/winsorized means sit inside the trimmed support") {
    val rows = q("q_agg_trimmed").collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("trim_n") == n - 2 * (n / 10))
      val tm = r.getAs[Long]("trimmed_mean_microcents")
      val wm = r.getAs[Long]("winsorized_mean_microcents")
      // winsorizing pulls tails IN, so both robust means stay within
      // a factor of the other (loose sanity: same sign, same order)
      assert(tm > 0L && wm > 0L)
      assert(math.abs(tm - wm) < math.max(tm, wm),
        s"robust means diverged: $tm vs $wm")
    }
  }

  test("streaks: length >= 2, the longest starts on a real order day") {
    val rows = q("q_streak_longest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak_days") >= 2L)
      assert(r.getAs[Long]("n_streaks") >= 1L)
      assert(r.getAs[String]("first_longest_start") != null)
    }
  }

  test("conditional entropy bounded by log2 of the successor fan-out") {
    val rows = q("q_path_entropy").collect()
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_microbits")
      val cap = math.log(r.getAs[Long]("n_successors").toDouble) /
        math.log(2.0) * 1e6
      assert(h >= -1.0, s"entropy $h negative")  // -1 micro: rounding slop
      assert(h <= cap + 1.0, s"entropy $h above uniform cap $cap")
    }
  }

  test("position attribution conserves exactly 1000 permille per journey") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf, "events")
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
    val journeys = ev.filter(col("event_type").isin("view", "click"))
      .join(firstBuy, Seq("user_id"))
      .filter(col("ts") < col("fp.ts") ||
        (col("ts") === col("fp.ts") && col("event_id") < col("fp.event_id")))
      .select(col("user_id")).distinct().count()
    val rows = q("q_attr_position").collect()
    assert(rows.map(_.getAs[Long]("credit_permille_total")).sum ==
      1000L * journeys)
  }

  test("cohort overlap: retained never exceeds the cohort") {
    val rows = q("q_cohort_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("both") <= r.getAs[Long]("active_m1"))
      assert(r.getAs[Long]("retention_permille") <= 1000L)
      val k = r.getAs[Long]("k")
      assert(k >= 1L && k <= 6L)
    }
  }

  test("diversity indices are probabilities/ratios in range") {
    val rows = q("q_text_simpson").collect()
    rows.foreach { r =>
      val sm = r.getAs[Long]("simpson_micro")
      val ttr = r.getAs[Long]("ttr_micro")
      assert(sm >= 0L && sm <= 1000000L)
      assert(ttr > 0L && ttr <= 1000000L)
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("recall audit: hits bounded by the exact lists, permille in range") {
    val rows = q("q_sim_recall_audit").collect()
    assert(rows.map(_.getAs[String]("method")).sorted.toSeq ==
      Seq("ivf", "ivfpq"))
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_exact"))
      val rp = r.getAs[Long]("recall_permille")
      assert(rp >= 0L && rp <= 1000L)
    }
  }

  test("skyline layers: disjoint, layer 1 equals the frontier query, " +
      "each layer dominated only by earlier layers") {
    val l = q("q_skyline_layers").collect()
      .map(r => (r.getAs[Long]("layer"), r.getAs[Long]("p_partkey"),
        r.getAs[Long]("price_cents"), r.getAs[Long]("size")))
    val frontier = q("q_skyline_frontier").collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(l.filter(_._1 == 1L).map(_._2).toSet == frontier)
    assert(l.map(_._2).distinct.length == l.length, "layers overlap")
    // no point in layer k is dominated by a point in the SAME layer
    for (k <- 1L to 3L) {
      val pts = l.filter(_._1 == k).map(p => (p._3, p._4))
      pts.foreach { case (p, z) =>
        assert(!pts.exists { case (p2, z2) =>
          p2 <= p && z2 <= z && (p2 < p || z2 < z) }, s"layer $k")
      }
    }
  }

  test("FD audit: the key FD holds with zero violations") {
    val m = q("q_dq_fd_audit").collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    assert(m("o_orderkey->o_custkey").getAs[Long]("violations") == 0L)
    m.values.foreach { r =>
      assert(r.getAs[Long]("violations") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("violation_permille") <= 1000L)
    }
  }

  test("exposure audit: coverage and gini are in range, slots conserve") {
    val r = q("q_rec_exposure").collect().head
    assert(r.getAs[Long]("n_recommended") <= r.getAs[Long]("n_items"))
    assert(r.getAs[Long]("coverage_permille") <= 1000L)
    val g = r.getAs[Long]("exposure_gini_micro")
    assert(g >= 0L && g < 1000000L)
    val slots = q("q_rec_itemcos").collect().length.toLong
    assert(r.getAs[Long]("n_slots") == slots)
  }

  test("keyphrases: over-represented only, ranked, per-source top-5") {
    val rows = q("q_text_keyphrase").collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length))
      val scores = rs.sortBy(_.getAs[Int]("rnk"))
        .map(_.getAs[Long]("chi2_micro"))
      assert(scores.sameElements(scores.sorted.reverse), s"$src not desc")
      rs.foreach(r => assert(r.getAs[Long]("chi2_micro") >= 0L))
    }
  }

  test("order gaps: p50 <= p90 <= max, gaps are positive") {
    val rows = q("q_order_gap_percentiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p50 = r.getAs[Long]("p50_gap_days")
      val p90 = r.getAs[Long]("p90_gap_days")
      assert(p50 >= 0L && p50 <= p90)
      assert(p90 <= r.getAs[Long]("max_gap_days"))
    }
  }

  test("embedding norm profile: ordered quantiles, conservation of vectors") {
    val rows = q("q_emb_norm_profile").collect()
    val total = Tables(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_n2") <= r.getAs[Long]("med_n2"))
      assert(r.getAs[Long]("med_n2") <= r.getAs[Long]("max_n2"))
      assert(r.getAs[Long]("n_degenerate") <= r.getAs[Long]("n_vecs"))
    }
  }

  test("discount lift: variance denominator positive, ratio matches num/den") {
    val rows = q("q_discount_lift").collect()
    rows.foreach { r =>
      val den = r.getAs[Long]("slope_den")
      assert(den > 0L, "zero discount variance")
      val ratio = r.getAs[Double]("qty_per_bp")
      assert(ratio == r.getAs[Long]("slope_num").toDouble / den.toDouble)
    }
  }

  test("relative ranks: pr/cd in [0,1], quartiles 1..4, top row pr == max") {
    val rows = q("q_window_relrank").collect()
    rows.foreach { r =>
      val pr = r.getAs[Double]("pr"); val cd = r.getAs[Double]("cd")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      assert(pr <= cd + 1e-12, "percent_rank never exceeds cume_dist")
      val qt = r.getAs[Int]("quartile")
      assert(qt >= 1 && qt <= 4)
      if (r.getAs[Int]("rn") == 1) assert(pr == 1.0 && cd == 1.0)
    }
  }

  test("WAPE bounds MAPE's building blocks: |bias| <= abs_err <= actual-scale") {
    val r = q("q_forecast_wape").collect().head
    assert(math.abs(r.getAs[Long]("bias_num")) <= r.getAs[Long]("abs_err"))
    assert(r.getAs[Long]("wape_micro") >= 0L)
    assert(math.abs(r.getAs[Double]("bias_ratio")) <=
      r.getAs[Long]("wape_micro").toDouble / 1e6 + 1e-9)
  }

  test("ivf-pq ADC ranking: per-query top-5, non-decreasing, self-free") {
    val rows = q("q_sim_ivfpq").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length))
      val ds = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("adc_d2"))
      assert(ds.sameElements(ds.sorted), s"qid $qid not sorted by ADC")
      rs.foreach { r =>
        assert(r.getAs[Long]("neighbor") != qid)
        assert(r.getAs[Long]("adc_d2") >= 0L)
      }
    }
  }
}

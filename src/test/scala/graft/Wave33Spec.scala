package graft

import org.scalatest.funsuite.AnyFunSuite

/** r12 wave 33: ColBERT MaxSim (ops/Similarity.scala),
  * length-controlled win rate and vocab overlap
  * (ops/CorpusOps45.scala). */
class Wave33Spec extends AnyFunSuite {
  import TestSpark._

  test("maxsim dominates the full dot: sum of facet maxima >= diagonal") {
    // score(q,d) = sum_i max_j <q_i, d_j> >= sum_i <q_i, d_i> = <q, d>
    val rows = try SparkEntry.queries("q_sim_maxsim")(spark, sf).collect()
      finally CacheScope.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("maxsim") >= r.getAs[Long]("dot_full"), r)
      assert(r.getAs[Int]("rnk") <= 5, r)
    }
  }

  test("lc winrate: every non-baseline source rated, permilles bounded") {
    val rows = try SparkEntry.queries("q_eval_lc_winrate")(spark, sf)
        .collect()
      finally CacheScope.release()
    val nSrc = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"))
      .distinct().count()
    assert(rows.length == nSrc - 1) // all sources vs the src0 baseline
    rows.foreach { r =>
      assert(r.getAs[String]("source") != "src0")
      Seq("raw_win_permille", "lc_win_permille").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 1000, s"$c out of range: $r")
      }
      assert(r.getAs[Long]("lc_gap") ==
        r.getAs[Long]("raw_win_permille") - r.getAs[Long]("lc_win_permille"))
      assert(r.getAs[Long]("n_bins") >= 1)
    }
  }

  test("binary sq: hamming bounded by dims, exact-top5 audit is a flag") {
    val rows = try SparkEntry.queries("q_sim_binary_sq")(spark, sf)
        .collect()
      finally CacheScope.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 64, r)
      assert(Set(0L, 1L).contains(r.getAs[Long]("in_exact_top5")), r)
    }
    assert(rows.groupBy(_.getAs[Long]("qid")).values.forall(_.length == 5))
    // the 1-bit sketch must retain SOME signal on this corpus (planted
    // near-dups share sign patterns): at least one exact-top-5 hit
    assert(rows.map(_.getAs[Long]("in_exact_top5")).sum >= 1)
  }

  test("rating agreement: pair accounting closes, tau-b2 bounded") {
    val r = (try SparkEntry.queries("q_eval_rating_agreement")(spark, sf)
        .collect()
      finally CacheScope.release()).head
    val nSrc = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"))
      .distinct().count()
    assert(r.getAs[Long]("n0") == nSrc * (nSrc - 1) / 2)
    assert(r.getAs[Long]("c") + r.getAs[Long]("d") <= r.getAs[Long]("n0"))
    val t = r.getAs[Long]("tau_b2_signed_permille")
    assert(t >= -1000 && t <= 1000, r)
  }

  test("coreset: sqrt allocation exact, kept ids are the cell minima") {
    val rows = try SparkEntry.queries("q_sample_coreset")(spark, sf)
        .collect()
      finally CacheScope.release()
    val nAll = Tables(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nAll)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("kept"))
      assert(k == math.ceil(math.sqrt(n.toDouble)).toLong,
        s"allocation not ceil(sqrt): $r")
      assert(k >= 1 && k <= n, r)
    }
    // dense cells downsample harder than sparse ones (monotone share)
    val byN = rows.sortBy(_.getAs[Long]("n"))
    val shares = byN.map(_.getAs[Long]("kept_permille"))
    assert(shares.head >= shares.last,
      s"sparse cells must keep a larger share: ${shares.toSeq}")
  }

  test("bestfit packing: bins within bounds, never beats contiguous LB") {
    val rows = try SparkEntry.queries("q_pack_bestfit")(spark, sf)
        .collect()
      finally CacheScope.release()
    // one row per FIXED-SIZE 512-doc shard — the bounded-state design
    val nShards = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.expr("doc_id div 512"))
      .distinct().count()
    assert(rows.length == nShards && nShards >= 1)
    rows.foreach(r => assert(r.getAs[Long]("n_docs") <= 512, r))
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val (bins, lb, nd) = (r.getAs[Long]("bins"),
        r.getAs[Long]("contig_lower_bound"), r.getAs[Long]("n_docs"))
      // no-straddle packing can never use fewer bins than the
      // contiguous bound, and never more than one bin per doc
      assert(bins >= lb && bins <= nd, r)
      val fill = r.getAs[Long]("fill_permille")
      assert(fill > 0 && fill <= 1000, r)
      assert(fill == r.getAs[Long]("total_len") * 1000 / (bins * 1024), r)
    }
  }

  test("mattr: bounded by window arithmetic, all sources measured") {
    val rows = try SparkEntry.queries("q_text_mattr")(spark, sf)
        .collect()
      finally CacheScope.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("mattr_permille")
      // each 25-token window holds between 1 and 25 types
      assert(m >= 40 && m <= 1000, r)
      assert(r.getAs[Long]("windows") >= r.getAs[Long]("n_docs"), r)
    }
  }

  test("vocab overlap: full upper triangle, jaccard bounded and exact") {
    val rows = try SparkEntry.queries("q_vocab_overlap")(spark, sf)
        .collect()
      finally CacheScope.release()
    val nSrc = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"))
      .distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    rows.foreach { r =>
      val (i, u) = (r.getAs[Long]("inter"), r.getAs[Long]("uni"))
      assert(r.getAs[String]("sa") < r.getAs[String]("sb"))
      assert(i >= 0 && i <= u, r)
      assert(r.getAs[Long]("jaccard_permille") == i * 1000 / u, r)
    }
  }
}

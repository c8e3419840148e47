package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality bounds for the sketch-based operators that have no SQL oracle:
  * MinHash vs exact Jaccard, LSH-ANN recall vs exact cosine pairs,
  * SimHash invariances. */
class DedupSimilaritySpec extends AnyFunSuite {
  import TestSpark._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("CacheScope.release drops per-invocation persists (no leak)") {
    // two invocations + release must not grow the persistent-RDD set
    // (ADVICE r7: bench loops accumulated one pinned frame per run)
    graft.CacheScope.release()
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 2).foreach { _ =>
      SparkEntry.queries("q_dedup_minhash")(spark, sf)
        .write.mode("overwrite").format("noop").save()
      graft.CacheScope.release()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"persisted RDD count grew $before -> $after across released runs")
  }

  test("components loop frees its localCheckpoint blocks (no RDD leak)") {
    // localCheckpoint stores blocks at the RDD level where
    // Dataset.unpersist cannot see them (r8 review) — the loop must
    // free superseded rounds itself and CacheScope.release the final one
    graft.CacheScope.release()
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 2).foreach { _ =>
      SparkEntry.queries("q_dedup_components")(spark, sf)
        .write.mode("overwrite").format("noop").save()
      graft.CacheScope.release()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"checkpoint RDD count grew $before -> $after across released runs")
  }

  test("minhash candidates recover strong exact-Jaccard pairs") {
    val exact = SparkEntry.queries("q_dedup_jaccard")(spark, sf)
      .filter(col("jacc") >= 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val mh = pairs("q_dedup_minhash")
    assert(exact.nonEmpty, "fixture lost its planted near-dups?")
    val recall = exact.count(mh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall $recall over ${exact.size} pairs")
  }

  test("minhash estimate tracks exact jaccard within 0.25") {
    val exact = SparkEntry.queries("q_dedup_jaccard")(spark, sf)
      .select(col("da"), col("db"), col("jacc"))
    val est = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select(col("da"), col("db"), col("est_jacc"))
    val joined = exact.join(est, Seq("da", "db"))
      .select(abs(col("jacc") - col("est_jacc")).as("err"))
      .agg(max(col("err"))).collect().head.getDouble(0)
    assert(joined <= 0.25, s"max |est - exact| = $joined")
  }

  test("ppjoin prefix+length prune is LOSSLESS vs brute-force Jaccard >= 0.5") {
    // The whole claim of q_dedup_ppjoin over the df-cap heuristic is
    // that its prune is derived from the threshold and thus exact —
    // prove it against an ALL-PAIRS shingle Jaccard (sf0.001 keeps the
    // brute force tractable), not just the oracle that replays the
    // same pruned algorithm.
    val toks = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        explode(array_distinct(when(size(col("t")) >= 3,
          expr("""transform(sequence(1, size(t) - 2),
                  i -> concat_ws(' ', element_at(t, i),
                                 element_at(t, i + 1),
                                 element_at(t, i + 2)))"""))
          .otherwise(array()))).as("w"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val brute = toks.select(col("doc_id").as("da"), col("w"))
      .join(toks.select(col("doc_id").as("db"), col("w")), Seq("w"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(expr("i * 1000 div (na + nb - i) >= 500"))
      .select(col("da"), col("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pp = SparkEntry.queries("q_dedup_ppjoin")(spark, sf)
      .select(col("da"), col("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture lost its planted near-dups?")
    assert(pp == brute,
      s"ppjoin ${pp.size} pairs != brute ${brute.size}: " +
        s"missed=${(brute -- pp).take(3)} extra=${(pp -- brute).take(3)}")
  }

  test("simhash salted skew path matches the unsalted pair set") {
    // hotBlockDf=0 marks EVERY (blk, bv) key hot, forcing the salted
    // scatter/replicate join everywhere — the strongest equivalence
    // check: salting must never add or lose a pair (VERDICT r7 item 5)
    val base = pairs("q_dedup_simhash_pairs")
    spark.conf.set(graft.ops.Dedup.SimhashSaltConf, "4")
    spark.conf.set(graft.ops.Dedup.SimhashHotDfConf, "0")
    try {
      val salted = pairs("q_dedup_simhash_pairs")
      assert(salted == base,
        s"salted path diverged: only-salted=${salted -- base} " +
          s"only-base=${base -- salted}")
    } finally {
      spark.conf.unset(graft.ops.Dedup.SimhashSaltConf)
      spark.conf.unset(graft.ops.Dedup.SimhashHotDfConf)
    }
    assert(base.nonEmpty)
  }

  test("simhash: near-dup pairs have small hamming distance") {
    val strong = SparkEntry.queries("q_dedup_jaccard")(spark, sf)
      .filter(col("jacc") >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val close = pairs("q_dedup_simhash_pairs")
    assert(strong.nonEmpty)
    val covered = strong.count(close.contains).toDouble / strong.size
    assert(covered >= 0.9,
      s"simhash hamming<=7 covers only $covered of jacc>=0.8 pairs")
  }

  test("LSH-ANN candidates are a subset of exact pairs with usable recall") {
    val exact = SparkEntry.queries("q_sim_neardup")(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val ann = SparkEntry.queries("q_sim_ann_lsh")(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(ann.subsetOf(exact), "ANN produced a pair the exact scan lacks")
    val recall = ann.size.toDouble / exact.size
    // the multi-probe analysis (Similarity.scala) predicts ~0.87 recall
    // for worst-case cos=0.3 pairs; 0.8 is tight enough that a broken
    // hyperplane hash fails this test (0.6 was not — VERDICT r4)
    assert(recall >= 0.8,
      s"ANN recall $recall (8 tables x 6 bits, multi-probe hamming<=1)")
  }

  test("semantic dedup pairs are exact near-dups found within clusters") {
    val exact = SparkEntry.queries("q_sim_neardup")(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sem = SparkEntry.queries("q_dedup_semantic")(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // within-cluster blocking can only LOSE cross-cluster pairs, never
    // invent one: every semantic pair must be an exact pair, and the
    // cosine values are the identical int64-exact arithmetic
    assert(sem.subsetOf(exact),
      "semantic dedup produced a pair the exact scan lacks")
    val recall = sem.size.toDouble / exact.size
    // near-dup pairs are by construction semantically close, so most
    // land in the same coarse cell; 0.5 fails if assignment breaks
    // (random cid assignment would put ~1/16 of pairs together)
    assert(recall >= 0.5,
      s"semantic-dedup within-cluster recall $recall vs exact all-pairs")
  }

  test("IVF top-k recalls most exact brute-force neighbors") {
    def nbrs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sf).select("qid", "neighbor")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = nbrs("q_sim_topk")
    val ivf = nbrs("q_sim_ivf")
    assert(exact.nonEmpty)
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall (K=16, nprobe=4)")
  }

  test("IVF delta merge: conservation, checksum, and stored-state plan") {
    val df = SparkEntry.queries("q_sim_ivf_delta")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // conservation: every vector lands in exactly one cell, so counts
    // and id-sums across cells reproduce the corpus exactly
    val emb = Tables(spark, sf, "embeddings")
    val nAll = emb.count()
    val idSum = emb.agg(org.apache.spark.sql.functions.sum("vec_id"))
      .collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_merged")).sum == nAll)
    assert(rows.map(_.getAs[Long]("n_base")).sum ==
      emb.filter(col("vec_id") % 10 =!= 0).count())
    assert(rows.map(_.getAs[Long]("idsum_merged")).sum == idSum)
    // imbalance permilles sum to ~K*1000 (floor division slack < K)
    val imb = rows.map(_.getAs[Long]("imbalance_permille")).sum
    assert(imb > 16000 - 16 && imb <= 16000, s"imbalance sum $imb")
    // the merge plan consumes the STORED cell-state parquet and never
    // re-scans base vectors: the stored path appears, the base-side
    // predicate (vec_id % 10 != 0) does not — only the delta batch
    // (= 0) and the frozen centroids (< 16) touch the embeddings table
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
    assert(scans.exists(_.contains("graft_ivf_base")),
      scans.map(_.take(300)).mkString("\n"))
    val plan = df.queryExecution.optimizedPlan.toString.replaceAll("\\s", "")
    assert(!plan.contains("NOT((vec_id%10)=0)") &&
      !plan.contains("(vec_id%10)!=0"),
      "base vectors must come from stored postings, not a re-scan")
  }

  test("IVF split: vectors conserved, max cell strictly shrinks, one split") {
    val rows = SparkEntry.queries("q_sim_ivf_split")(spark, sf).collect()
    val emb = Tables(spark, sf, "embeddings")
    val nAll = emb.count()
    val idSum = emb.agg(org.apache.spark.sql.functions.sum("vec_id"))
      .collect()(0).getLong(0)
    // conservation: the split moves vectors between sub-cells of ONE
    // cell — totals across the post-split state reproduce the corpus
    assert(rows.map(_.getAs[Long]("n")).sum == nAll)
    assert(rows.map(_.getAs[Long]("idsum")).sum == idSum)
    // exactly one cell split (two rows with sub > 0, same cid, both
    // non-empty: the two seeds are members, so neither side is bare)
    val split = rows.filter(_.getAs[Long]("sub") > 0)
    assert(split.length == 2 &&
      split.map(_.getAs[Long]("cid")).distinct.length == 1, split.toSeq)
    assert(split.forall(_.getAs[Long]("n") >= 1))
    assert(rows.count(_.getAs[Long]("sub") == 0L) == 15)
    // imbalance strictly decreases: the pre-split hot cell was the
    // max; afterwards every cell (sub-cells included) is smaller
    val hotN = split.map(_.getAs[Long]("n")).sum
    assert(rows.map(_.getAs[Long]("n")).max < hotN,
      s"max cell must shrink below the pre-split hot size $hotN")
    // the trigger column reports the pre-split imbalance of that cell
    val trig = rows.map(_.getAs[Long]("trigger_imbalance_permille")).distinct
    assert(trig.length == 1 && trig.head == hotN * 16 * 1000 / nAll)
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens always collides") {
    // Schleimer et al. 2003 Theorem: any match of length
    // >= w + k - 1 (= 8 tokens at k=5, w=4) yields at least one
    // shared fingerprint. Generated docs share an 8-token run inside
    // otherwise-disjoint token streams; control docs share nothing.
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    // 12 tokens = 8 shared k-grams = 5 windows fully inside the run;
    // ceil(5/w) = 2 distinct guaranteed fingerprints, matching the
    // pair filter's shared_fp >= 2 (a bare w+k-1 = 8-token run
    // guarantees only ONE)
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    def noise(tag: String, n: Int) =
      (1 to n).map(i => s"$tag${rnd.nextInt(1000)}x$i").mkString(" ")
    val docs = Seq(
      (1L, s"${noise("a", 20)} $run ${noise("b", 20)}"),
      (2L, s"${noise("c", 30)} $run ${noise("d", 10)}"),
      (3L, noise("e", 40)), // control: no shared run
      (4L, s"${noise("f", 15)} $run ${noise("g", 25)}"))
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.winnowPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair among {1,2,4} must collide with >= 2 shared
    // fingerprints (the 12-token run's guarantee above)
    for (p <- Seq((1L, 2L), (1L, 4L), (2L, 4L)))
      assert(pairs.contains(p), s"guaranteed pair $p missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"control doc collided: $pairs")
  }

  test("bloom pre-filter never yields a false negative") {
    // the Bloom guarantee the exact-verify join relies on: every true
    // member is bloom-positive, so n_member <= n_bloom_pos per doc and
    // skipping exact verification for negatives loses nothing
    val rows = SparkEntry.queries("q_dedup_bloom")(spark, sf)
      .select("n_shingles", "n_bloom_pos", "n_member", "n_fp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pos, mem, fp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mem <= pos, s"member $mem > bloom-positive $pos")
      assert(fp == pos - mem, s"fp $fp != pos $pos - mem $mem")
      assert(pos <= n)
    }
  }

  test("perplexity buckets are monotone in bits_per_bigram") {
    // the head/middle/tail cut is an integer compare on the same
    // quantity bits_per_bigram reports — labels must never cross
    val rows = SparkEntry.queries("q_text_perplexity")(spark, sf)
      .select("bits_per_bigram", "ppl_bucket").collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    val maxHead = rows.filter(_._2 == "head").map(_._1).maxOption
    val tail = rows.filter(_._2 == "tail").map(_._1)
    val minTail = tail.minOption
    val mids = rows.filter(_._2 == "middle").map(_._1)
    for (h <- maxHead; m <- mids.minOption) assert(h <= m + 1e-4)
    for (m <- mids.maxOption; t <- minTail) assert(m <= t + 1e-4)
  }

  test("gram matrix agrees with a driver-side recomputation") {
    // the one-pass map-side pair generation must equal the naive
    // per-vector outer product; diagonal cells are the squared norms
    val rows = SparkEntry.queries("q_emb_gram")(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val vecs = TestSpark.spark.read
      .parquet(s"$sf/embeddings.parquet")
      .selectExpr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q")
      .collect().map(_.getSeq[Long](0))
    val expected = Array.ofDim[Long](65, 65)
    for (v <- vecs; i <- 1 to 64; j <- i to 64)
      expected(i)(j) += v(i - 1) * v(j - 1)
    assert(rows.size == 64 * 65 / 2)
    rows.foreach { case ((i, j), g) =>
      assert(g == expected(i)(j), s"gram($i,$j) $g != ${expected(i)(j)}")
    }
  }

  test("classifier output is a valid confusion accounting") {
    val rows = SparkEntry.queries("q_emb_classify")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (label, pred, correct) = (r.getInt(1), r.getInt(2), r.getInt(4))
      assert(pred >= 0 && pred <= 9)
      assert(correct == (if (label == pred) 1 else 0))
    }
  }

  test("topk rank-1 neighbor has the maximum cosine per query") {
    val rows = SparkEntry.queries("q_sim_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF rebalance: conservation + monotone hottest cell per round") {
    // r12 item 6 done-criteria: Σn and Σidsum conserved across every
    // scheduler round, and the hottest cell never grows — strictly
    // shrinking whenever a round actually split (cell count grew).
    val sts = try ops.Similarity.rebalanceStates(spark, sf).map { f =>
        val cells = f.groupBy(col("cid"), col("path"))
          .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("ids"))
          .collect()
        (cells.map(_.getLong(2)).sum, cells.map(_.getLong(3)).sum,
          cells.map(_.getLong(2)).max, cells.length)
      } finally CacheScope.release()
    assert(sts.size == 4) // merged state + 3 rounds
    assert(sts.map(_._1).distinct.size == 1, s"vector count drifted: $sts")
    assert(sts.map(_._2).distinct.size == 1, s"idsum drifted: $sts")
    sts.sliding(2).foreach { case Seq(a, b) =>
      // global max is non-increasing; a split round adds exactly one
      // cell (strict max decrease would be wrong: another cell can TIE
      // the split cell's size — sf0.001 round 3 does exactly that)
      assert(b._3 <= a._3, s"hottest cell grew: $a -> $b")
      if (b._4 != a._4) assert(b._4 == a._4 + 1,
        s"split round changed cell count by != 1: $a -> $b")
      case _ => ()
    }
    // the fixture's trigger (1100 permille) fires at least once
    assert(sts.last._4 > sts.head._4, "no split happened on the fixture")
  }

  test("minhash autoBanding: both paths pinned at their operating point") {
    // r12 item 8: the deployed banding is picked-by-policy. On the
    // fixture every sweep point measures full recall, so the policy
    // picks the cheapest qualifier (8, 4) — pin the pick, then pin
    // that the conf-gated query banding EQUALS the explicit pipeline
    // at that point, and that the default path stays the 16×2 the
    // oracle replays.
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("da"), col("db")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pick = try SparkEntry.queries("q_dedup_lsh_autopick")(spark, sf)
        .collect()(0)
      finally CacheScope.release()
    assert((pick.getAs[Long]("bands"), pick.getAs[Long]("rows_per_band"))
      == ((8L, 4L)), s"fixture policy pick moved: $pick")
    val auto =
      try {
        spark.conf.set("spark.graft.minhash.autoBanding", "true")
        pairs(SparkEntry.queries("q_dedup_minhash")(spark, sf))
      } finally {
        spark.conf.unset("spark.graft.minhash.autoBanding")
        CacheScope.release()
      }
    val at84 = try pairs(ops.Dedup.minhashPairs(spark, sf, 8, 4))
      finally CacheScope.release()
    assert(auto == at84, "conf-gated path != explicit (8, 4) pipeline")
    val deflt = try pairs(SparkEntry.queries("q_dedup_minhash")(spark, sf))
      finally CacheScope.release()
    val at162 = try pairs(ops.Dedup.minhashPairs(spark, sf, 16, 2))
      finally CacheScope.release()
    assert(deflt == at162, "default path != explicit (16, 2) pipeline")
    // the fixture's high-Jaccard planted dups are caught either way
    assert((at84 intersect at162).nonEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws the engine's semantics guarantee (SURVEY.md §5.2):
  * partition-count invariance of aggregation (partial+final ≡ single
  * pass), pushdown on/off result equality, set-op laws — on ScalaCheck-
  * generated data (sampled with fixed seeds; scalatestplus bridge is not
  * in the offline cache), not just fixtures. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int)]] = Gen.listOfN(200,
    Gen.zip(Gen.choose(0, 9), Gen.choose(-1000000, 1000000)))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val seeds = Seq(1L, 42L, 777L, 20260812L)

  test("aggregation is partition-count invariant (map-side combine law)") {
    for (s <- seeds) {
      val rows = sample(rowsGen, s)
      val df = rows.toDF("k", "v")
      def agg(parts: Int) =
        df.repartition(parts).groupBy($"k")
          .agg(sum(expr("CAST(v AS DECIMAL(18,2))")).as("s"),
            count(lit(1)).as("c"))
          .orderBy($"k").collect().toSeq
      assert(agg(1) == agg(13), s"seed $s")
    }
  }

  test("zorder64 interleave round-trips every bit (generated keys)") {
    // inverse of the dilation: collect even (resp. odd) bits back down
    def compact(v: Long): Long = {
      var x = v & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
      x
    }
    val keyGen = Gen.zip(Gen.choose(0L, (1L << 32) - 1),
      Gen.choose(0L, (1L << 32) - 1))
    for (s <- seeds; i <- 1 to 50) {
      val (a, b) = sample(keyGen, s * 1009 + i)
      val z = graft.functions.ZOrder64.interleave(a, b)
      assert(compact(z) == a && compact(z >> 1) == b,
        s"round trip failed for ($a, $b)")
    }
  }

  test("bloom bit algebra has no false negatives on generated strings") {
    // same md5-position expressions as q_dedup_bloom, on arbitrary keys:
    // every inserted key must probe positive whatever the input set —
    // the law the gated exact-verify join relies on
    val strGen = Gen.listOfN(300, Gen.identifier.suchThat(_.nonEmpty))
    for (s <- seeds.take(2)) {
      val keys = sample(strGen, s).distinct
      val hashed = keys.toDF("g")
        .withColumn("m", md5($"g"))
        .select($"g",
          expr("cast(conv(substring(m, 1, 8), 16, 10) as bigint) % 512")
            .as("blk"),
          explode(array(
            expr("cast(conv(substring(m, 9, 6), 16, 10) as bigint) % 248"),
            expr("cast(conv(substring(m, 15, 6), 16, 10) as bigint) % 248"),
            expr("cast(conv(substring(m, 21, 6), 16, 10) as bigint) % 248")))
            .as("p"))
      val bloom = hashed
        .select($"blk", expr("p div 62").as("word"),
          expr("shiftleft(cast(1 as bigint), cast(p % 62 as int))").as("mask"))
        .groupBy($"blk", $"word").agg(expr("bit_or(mask)").as("w"))
        .withColumnRenamed("blk", "b_blk").withColumnRenamed("word", "b_word")
      val misses = hashed
        .join(bloom, $"blk" === $"b_blk" &&
          expr("p div 62") === $"b_word", "left")
        .select($"g",
          coalesce(expr("shiftright(w, cast(p % 62 as int)) & 1"), lit(0L))
            .as("hit"))
        .groupBy($"g").agg(min($"hit").as("hit"))
        .filter($"hit" === 0).count()
      assert(misses == 0, s"false negatives on seed $s")
    }
  }

  test("filter pushdown on/off produces identical results") {
    val q = () => Tables(spark, sf, "lineitem")
      .filter($"l_extendedprice" > 50000 && $"l_suppkey" <= 5)
      .groupBy($"l_returnflag").agg(count(lit(1)).as("c"))
      .orderBy($"l_returnflag")
    val on = q().collect().toSeq
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    val off = try q().collect().toSeq
      finally spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    assert(on == off)
  }

  test("union + distinct == set union; intersect/except laws") {
    for (s <- seeds) {
      val xs = sample(rowsGen, s).map(_._2 % 50)
      val ys = sample(rowsGen, s + 1).map(_._2 % 50)
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      assert(a.union(b).distinct().collect().map(_.getInt(0)).toSet ==
        xs.toSet ++ ys.toSet, s"union seed $s")
      assert(a.intersect(b).collect().map(_.getInt(0)).toSet ==
        xs.toSet.intersect(ys.toSet), s"intersect seed $s")
      assert(a.except(b).collect().map(_.getInt(0)).toSet ==
        xs.toSet.diff(ys.toSet), s"except seed $s")
    }
  }

  test("approx sketches are run-to-run deterministic and error-bounded") {
    val a = SparkEntry.queries("q_agg_approx")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_agg_approx")(spark, sf).collect().toSeq
    assert(a == b, "sketch outputs drifted between runs")
    // accuracy vs exact: HLL++ at default rsd (5%) and a 1000-accuracy
    // KLL-style percentile must land near their exact counterparts
    val exact = Tables(spark, sf, "lineitem")
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("l_partkey")).as("nd"),
        org.apache.spark.sql.functions.expr(
          "percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    a.foreach { row =>
      val (nd, p50) = exact(row.getString(0))
      val appNd = row.getLong(1)
      assert(math.abs(appNd - nd).toDouble / nd <= 0.10,
        s"approx_count_distinct $appNd vs exact $nd")
      val appP50 = row.getDouble(2)
      assert(math.abs(appP50 - p50) / p50 <= 0.10,
        s"approx p50 $appP50 vs exact $p50")
    }
  }

  test("kmv sketch laws: sized-exact, merge-order invariant, serde round trip") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.LongType
    val longsGen = Gen.listOfN(500, Gen.choose(Long.MinValue, Long.MaxValue))
    for (s <- seeds) {
      val vals = sample(longsGen, s)
      val masked = vals.map(_ & Long.MaxValue).distinct
      def agg(k: Int) = functions.KmvAgg(
        BoundReference(0, LongType, nullable = false), k)
      // sized-exact: k >= NDV -> the sketch IS the distinct set
      val big = agg(4096)
      val full = vals.foldLeft(big.createAggregationBuffer()) {
        (b, v) => big.update(b, InternalRow(v))
      }
      assert(big.eval(full).asInstanceOf[ArrayData].toLongArray().toSeq ==
        masked.sorted, s"seed $s: sized sketch != distinct set")
      // merge-order invariance at k << NDV
      val small = agg(64)
      def sketchOf(chunk: Seq[Long]) = chunk.foldLeft(
        small.createAggregationBuffer()) {
        (b, v) => small.update(b, InternalRow(v))
      }
      val chunks = vals.grouped(97).map(sketchOf).toList
      def arr(b: java.util.TreeSet[java.lang.Long]) =
        small.eval(b).asInstanceOf[ArrayData].toLongArray().toSeq
      val fwd = arr(chunks.map(c => small.deserialize(small.serialize(c)))
        .reduceLeft(small.merge))
      val rev = arr(chunks.reverse
        .map(c => small.deserialize(small.serialize(c)))
        .reduceLeft(small.merge))
      assert(fwd == rev, s"seed $s: merge order changed the sketch")
      assert(fwd == masked.sorted.take(64), s"seed $s: merged sketch is " +
        "not the k smallest distinct values")
    }
  }

  test("row_number over a total order is a permutation 1..n") {
    for (s <- seeds) {
      val rows = sample(rowsGen, s)
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i) }
        .toDF("k", "v", "id")
      val rns = df.select(row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"k").orderBy($"v", $"id")).as("rn"), $"k")
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"rn").as("srn"))
        .collect()
      rns.foreach { r =>
        val n = r.getLong(1)
        assert(r.getLong(2) == n * (n + 1) / 2, s"seed $s")
      }
    }
  }

  test("damerau-levenshtein is a metric on generated strings") {
    import graft.functions.DamerauLev.dist
    val strGen = Gen.listOfN(3, Gen.choose(0, 8)
      .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))))
    for (s <- seeds; i <- 1 to 8) {
      val Seq(x, y, z) = sample(strGen, s * 100 + i)
      assert(dist(x, x) == 0)
      assert(dist(x, y) == dist(y, x), s"symmetry $x $y")
      assert((dist(x, y) == 0) == (x == y), s"identity $x $y")
      // triangle inequality — holds for UNRESTRICTED DL (it fails for
      // the OSA variant, which is exactly why this pin matters)
      assert(dist(x, z) <= dist(x, y) + dist(y, z),
        s"triangle $x $y $z")
      // edits can't beat the length gap, nor exceed the longer string
      assert(dist(x, y) >= math.abs(x.length - y.length))
      assert(dist(x, y) <= math.max(x.length, y.length))
    }
  }

  test("bucketedNtile/RowNumber equal the naive global windows (generated)") {
    // The bucket-offset decomposition's equality proof on arbitrary
    // data, not just the fixtures the oracles replay: random values
    // (ties included), random coarse divisors, asc and desc, k from
    // degenerate (n < k) to coarse.
    import org.apache.spark.sql.expressions.Window
    import graft.ops.ScaleWindows
    val gen: Gen[List[(Int, Int)]] = Gen.listOfN(157,
      Gen.zip(Gen.choose(0, 500), Gen.choose(0, 1000000)))
    for (s <- seeds; (desc, divisor, k) <-
        Seq((false, 64, 5), (true, 7, 10), (false, 1, 3), (true, 997, 200))) {
      val rows = sample(gen, s * 31 + divisor)
      val df = rows.zipWithIndex
        .map { case ((v, _), id) => (v.toLong, id.toLong) }
        .toDF("v", "id")
      val ord = if (desc) Seq($"v".desc, $"id".asc)
                else Seq($"v".asc, $"id".asc)
      val naive = df.withColumn("want_nt",
          ntile(k).over(Window.orderBy(ord: _*)).cast("long"))
        .withColumn("want_rn",
          row_number().over(Window.orderBy(ord: _*)).cast("long"))
      val got = ScaleWindows.bucketedRowNumber(
        ScaleWindows.bucketedNtile(df, k, expr(s"v div $divisor"), desc,
          ord, "got_nt"),
        expr(s"v div $divisor"), desc, ord, "got_rn")
      val joined = naive.join(got, Seq("v", "id"))
        .filter($"want_nt" =!= $"got_nt" || $"want_rn" =!= $"got_rn")
      assert(joined.count() == 0,
        s"seed $s desc=$desc div=$divisor k=$k: " +
          joined.limit(3).collect().mkString(", "))
    }
  }

  test("bucketedNtile/RowNumber keep and correctly rank NULL buckets") {
    // r10 advice: the offsets equi-join silently dropped rows whose
    // bucket expression was null. Null order keys must rank exactly
    // where the naive window puts them (NULLS FIRST asc / NULLS LAST
    // desc — Spark defaults) and every input row must survive.
    import org.apache.spark.sql.expressions.Window
    import graft.ops.ScaleWindows
    val df = Seq[(java.lang.Long, Long)](
      (null, 0L), (5L, 1L), (null, 2L), (3L, 3L), (9L, 4L),
      (1L, 5L), (null, 6L), (7L, 7L), (3L, 8L), (2L, 9L))
      .toDF("v", "id")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) Seq($"v".desc, $"id".asc)
                else Seq($"v".asc, $"id".asc)
      val naive = df.withColumn("want_nt",
          ntile(3).over(Window.orderBy(ord: _*)).cast("long"))
        .withColumn("want_rn",
          row_number().over(Window.orderBy(ord: _*)).cast("long"))
      val got = ScaleWindows.bucketedRowNumber(
        ScaleWindows.bucketedNtile(df, 3, expr("v div 2"), desc,
          ord, "got_nt"),
        expr("v div 2"), desc, ord, "got_rn")
      assert(got.count() == 10, s"desc=$desc: rows dropped")
      val bad = naive.join(got, Seq("id"))
        .filter($"want_nt" =!= $"got_nt" || $"want_rn" =!= $"got_rn")
      assert(bad.count() == 0,
        s"desc=$desc: " + bad.limit(5).collect().mkString(", "))
    }
  }

  test("damerau-levenshtein rejects document-sized input with a clear error") {
    import graft.functions.DamerauLev
    val big = "a" * (DamerauLev.MaxLen + 1)
    val e = intercept[IllegalArgumentException](DamerauLev.dist(big, "b"))
    assert(e.getMessage.contains("exceeds"), e.getMessage)
    // at the boundary it still computes (one long run vs one char)
    assert(DamerauLev.dist("a" * 3, "") == 3)
  }

  test("passAtK laws on generated pools: bounds, monotone in k, exacts") {
    // pass@k is a probability in [0, 1000] permille, non-decreasing in
    // k (more samples can only help), exactly 0 when c = 0 and exactly
    // 1000 when c > n - k (every k-subset must contain a pass)
    val poolGen = Gen.listOfN(60,
      Gen.choose(1L, 40L).flatMap(n =>
        Gen.choose(0L, n).map(c => (n, c))))
    for (s <- seeds) {
      val pools = sample(poolGen, s).zipWithIndex
        .map { case ((n, c), i) => (i.toLong, n, c) }
        .toDF("id", "n", "c")
      val rows = api.Graft.passAtK(pools, "n", "c", Seq(1, 3, 7))
        .collect()
      rows.foreach { r =>
        val (n, c) = (r.getAs[Long]("n"), r.getAs[Long]("c"))
        val ks = Seq(r.getAs[Long]("pass1_permille"),
          r.getAs[Long]("pass3_permille"), r.getAs[Long]("pass7_permille"))
        assert(ks.forall(v => v >= 0 && v <= 1000), s"seed $s: $r")
        assert(ks == ks.sorted, s"seed $s not monotone in k: $r")
        if (c == 0) assert(ks.forall(_ == 0L), s"seed $s: $r")
        Seq(1, 3, 7).zip(ks).foreach { case (k, v) =>
          // with at least one pass AND fewer fails than k, every
          // k-subset must contain a pass (c = 0 stays 0 at any k)
          if (c > 0 && c > n - k) assert(v == 1000L, s"seed $s k=$k: $r")
        }
      }
    }
  }

  test("bestOfN laws on generated pools: bo1 = floor mean, monotone, <= max") {
    val poolGen = Gen.listOfN(150,
      Gen.zip(Gen.choose(0, 11), Gen.choose(0L, 2000000L)))
    for (s <- seeds) {
      val rows = sample(poolGen, s).zipWithIndex
        .map { case ((g, v), i) => (g.toLong, v, i.toLong) }
      val df = rows.toDF("g", "score", "id")
      val got = api.Graft.bestOfN(df, Seq("g"), "score", Seq(1, 2, 4),
          tieCol = Some("id"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val vs = rs.map(_._2)
        val (m, bo1, bo2, bo4) = got(g)
        assert(m == vs.size)
        assert(bo1 == vs.sum / vs.size, s"seed $s g=$g")
        assert(bo1 <= bo2 && bo2 <= bo4, s"seed $s g=$g not monotone")
        assert(bo4 <= vs.max, s"seed $s g=$g exceeds max")
        if (m >= 4) {
          // brute-force E[max of 4-subset] numerator over all C(m,4)
          val sorted = vs.sorted
          val num = sorted.zipWithIndex.map { case (v, i0) =>
            val i = i0 + 1L
            BigInt(v) * (BigInt(i - 1) * (i - 2) * (i - 3) / 6)
          }.sum
          val den = BigInt(m) * (m - 1) * (m - 2) * (m - 3) / 24
          assert(BigInt(bo4) == num / den, s"seed $s g=$g brute 4-subset")
        }
      }
    }
  }
}

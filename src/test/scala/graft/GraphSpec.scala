package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-operator semantics (ops/GraphOps.scala): the degree-oriented
  * triangle census must agree with an orientation-FREE brute force —
  * the r8 review caught a ~50% undercount from ordering wedge pairs by
  * node id while edges were oriented by (degree, node); this pins the
  * invariant independently of the oracle (which shared the bug). */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("triangle census equals orientation-free brute force") {
    val rows = SparkEntry.queries("q_graph_triangles")(spark, sf).collect()
    val reported = rows.find(_.getString(0) == "triangles").get.getLong(2)
    // brute force on the node-id-normalized undirected edge set: a
    // triangle {a<b<c} is one row of e0xe0xe0 — no orientation involved
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e0 = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("u"), col("v"))
    val brute = e0.as("x")
      .join(e0.as("y"), col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .join(e0.as("z"),
        col("z.u") === col("x.v") && col("z.v") === col("y.v"))
      .count()
    assert(reported == brute, s"census $reported != brute force $brute")
    assert(reported > 0)
  }

  test("pagerank broadcast and shuffle-join paths are bit-identical") {
    // Ranks are integer micro-units (floor-div + integer sums only), so
    // the co-partitioned shuffle path must reproduce the broadcast
    // trajectory EXACTLY over all nodes — at sf0.01, where the graph is
    // big enough for a real multi-partition shuffle.
    val dir = "/root/testdata/sf0.01"
    def ranks(shuffle: Boolean) = try
      ops.GraphOps.pagerankRanks(spark, dir, shuffle)
        .orderBy(col("node")).collect().toSeq
    finally CacheScope.release()
    val b = ranks(shuffle = false)
    val sh = ranks(shuffle = true)
    assert(b.nonEmpty && b == sh,
      s"broadcast/shuffle diverge: ${b.take(3)} vs ${sh.take(3)}")
    // and the conf gate actually routes the public query
    spark.conf.set("spark.graft.pagerank.shuffleJoin", "true")
    try {
      val viaConf = SparkEntry.queries("q_graph_pagerank")(spark, dir)
        .collect().toSeq
      val top = b.sortBy(r => (-r.getLong(1), r.getString(0))).take(20)
      assert(viaConf == top)
    } finally {
      spark.conf.unset("spark.graft.pagerank.shuffleJoin")
      CacheScope.release()
    }
  }

  test("ppr broadcast and shuffle-join paths are bit-identical") {
    // Same discipline as PageRank (same core): integer micro-unit
    // ranks, so the co-partitioned shuffle path must reproduce the
    // broadcast trajectory EXACTLY over all nodes.
    val dir = "/root/testdata/sf0.01"
    def ranks(shuffle: Boolean) = try
      ops.GraphOps.pprRanks(spark, dir, shuffle)
        .orderBy(col("node")).collect().toSeq
    finally CacheScope.release()
    val b = ranks(shuffle = false)
    val sh = ranks(shuffle = true)
    assert(b.nonEmpty && b == sh,
      s"broadcast/shuffle PPR diverge: ${b.take(3)} vs ${sh.take(3)}")
    // and the conf gate actually routes the public query
    spark.conf.set("spark.graft.pagerank.shuffleJoin", "true")
    try {
      val viaConf = SparkEntry.queries("q_graph_ppr")(spark, dir)
        .collect().toSeq
      val top = b.filter(_.getLong(1) > 0)
        .sortBy(r => (-r.getLong(1), r.getString(0))).take(20)
      assert(viaConf == top)
    } finally {
      spark.conf.unset("spark.graft.pagerank.shuffleJoin")
      CacheScope.release()
    }
  }

  test("katz: w1 is exact indegree, fixed point is pure integer algebra") {
    val rows = try SparkEntry.queries("q_graph_katz")(spark, sf).collect()
      finally CacheScope.release()
    assert(rows.length == 20)
    // independent indegree recomputation for the reported nodes
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("S"), col("l_suppkey")).as("a"),
        concat(lit("C"), col("o_custkey")).as("b"))
      .distinct()
    val indeg = pairs.select(col("b").as("node"))
      .union(pairs.select(col("a").as("node")))
      .groupBy(col("node")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("w1") == indeg(r.getAs[String]("node")), r)
      assert(r.getAs[Long]("katz_x512") == r.getAs[Long]("w1") * 64 +
        r.getAs[Long]("w2") * 8 + r.getAs[Long]("w3"), r)
    }
    val ks = rows.map(_.getAs[Long]("katz_x512")).toSeq
    assert(ks == ks.sorted.reverse, "top-20 must be katz-descending")
  }

  test("katz broadcast and shuffle-join paths are bit-identical") {
    val dir = "/root/testdata/sf0.01"
    def top(shuffle: Boolean) = try
      ops.GraphOps.katzWalks(spark, dir, shuffle).collect().toSeq
    finally CacheScope.release()
    val b = top(shuffle = false)
    val sh = top(shuffle = true)
    assert(b.nonEmpty && b == sh,
      s"broadcast/shuffle Katz diverge: ${b.take(3)} vs ${sh.take(3)}")
  }

  test("triangles broadcast and shuffle-join paths are bit-identical") {
    // Exact integer census — the conf-gated shuffled-hash path must
    // reproduce every row (summary AND top list) of the broadcast path.
    val dir = "/root/testdata/sf0.01"
    def result(shuffle: Boolean) = try
      ops.GraphOps.trianglesResult(spark, dir, shuffle).collect().toSeq
    finally CacheScope.release()
    val b = result(shuffle = false)
    val sh = result(shuffle = true)
    assert(b.nonEmpty && b == sh,
      s"broadcast/shuffle triangles diverge: ${b.take(3)} vs ${sh.take(3)}")
    // and the conf gate actually routes the public query
    spark.conf.set("spark.graft.triangles.shuffleJoin", "true")
    try {
      val viaConf = SparkEntry.queries("q_graph_triangles")(spark, dir)
        .collect().toSeq
      assert(viaConf == b)
    } finally {
      spark.conf.unset("spark.graft.triangles.shuffleJoin")
      CacheScope.release()
    }
  }

  test("clustering broadcast and shuffle-join paths are bit-identical") {
    val dir = "/root/testdata/sf0.01"
    def result(shuffle: Boolean) = try
      ops.GraphOps2.clusteringResult(spark, dir, shuffle).collect().toSeq
    finally CacheScope.release()
    val b = result(shuffle = false)
    val sh = result(shuffle = true)
    assert(b.nonEmpty && b == sh,
      s"broadcast/shuffle clustering diverge: ${b.take(3)} vs ${sh.take(3)}")
    spark.conf.set("spark.graft.clustering.shuffleJoin", "true")
    try {
      val viaConf = SparkEntry.queries("q_graph_clustering")(spark, dir)
        .collect().toSeq
      assert(viaConf == b)
    } finally {
      spark.conf.unset("spark.graft.clustering.shuffleJoin")
      CacheScope.release()
    }
  }

  test("hits broadcast and shuffle-join paths are bit-identical") {
    // Integer micro-unit authority scores: the co-partitioned path
    // (edges hash-partitioned on sup once, auth/hub vectors
    // shuffled-hash-joined) must replay the broadcast trajectory.
    val dir = "/root/testdata/sf0.01"
    def result(shuffle: Boolean) = try
      ops.CorpusOps22.hitsResult(spark, dir, shuffle).collect().toSeq
    finally CacheScope.release()
    val b = result(shuffle = false)
    val sh = result(shuffle = true)
    assert(b.nonEmpty && b == sh,
      s"broadcast/shuffle HITS diverge: ${b.take(3)} vs ${sh.take(3)}")
    spark.conf.set("spark.graft.hits.shuffleJoin", "true")
    try {
      val viaConf = SparkEntry.queries("q_graph_hits")(spark, dir)
        .collect().toSeq
      assert(viaConf == b)
    } finally {
      spark.conf.unset("spark.graft.hits.shuffleJoin")
      CacheScope.release()
    }
  }

  test("auto gate: edge cardinality flips the graph family to shuffle") {
    // With the path conf UNSET the gate reads the persisted edge
    // cache's cardinality (StressBench r14 found the forced-broadcast
    // census goes 13× superlinear once the co-purchase graph
    // densifies). Force the crossover down to 1 edge: the public
    // queries must plan shuffled-hash joins.
    spark.conf.set("spark.graft.graph.broadcastEdgeLimit", "1")
    try {
      for (name <- Seq("q_graph_triangles", "q_graph_clustering",
          "q_graph_hits")) {
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString(
              "formatted"))
        assert(p.contains("ShuffledHashJoin"),
          s"$name ignored the auto gate:\n$p")
        CacheScope.release()
      }
    } finally {
      spark.conf.unset("spark.graft.graph.broadcastEdgeLimit")
      CacheScope.release()
    }
  }

  test("k-core broadcast and shuffle-semi paths are bit-identical") {
    // Pure integer set filtering — the co-partitioned shuffle path must
    // reproduce the broadcast path exactly, rounds and top list included.
    val dir = "/root/testdata/sf0.01"
    def result(shuffle: Boolean) = try
      ops.GraphOps.kcoreResult(spark, dir, shuffle).collect().toSeq
    finally CacheScope.release()
    val b = result(shuffle = false)
    val sh = result(shuffle = true)
    assert(b.nonEmpty && b == sh,
      s"broadcast/shuffle k-core diverge: ${b.take(3)} vs ${sh.take(3)}")
  }

  test("k-core peeling is monotone: survivors shrink, round3 degrees >= k") {
    val rows = SparkEntry.queries("q_graph_kcore")(spark, sf).collect()
    def round(r: Int) = rows.find(_.getString(0) == s"round$r").get
    assert((1 to 2).forall(r => round(r).getLong(1) >= round(r + 1).getLong(1)),
      "node survivors must be non-increasing")
    val degs = rows.filter(_.getString(0) == "top").map(_.getLong(2))
    assert(degs.forall(_ >= 3), s"residual degree under k: ${degs.toSeq}")
  }

  test("personalized pagerank: mass localizes at the seed, 3-hop support") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_graph_ppr")(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
    // the seed (top-degree node, deterministic tie) holds the restart
    // mass every iteration -> it must rank first
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("S"), col("l_suppkey")).as("a"),
        concat(lit("C"), col("o_custkey")).as("b")).distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val seed = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src")).limit(1)
      .collect()(0).getString(0)
    assert(rows.head.getString(0) == seed,
      s"top PPR node ${rows.head.getString(0)} != seed $seed")
    // after 3 iterations only nodes within 3 hops of the seed can
    // carry mass (walk support = BFS ball of radius 3)
    var frontier = Set(seed)
    var ball = Set(seed)
    val adj = edges.collect().groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    for (_ <- 1 to 3) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- ball
      ball ++= frontier
    }
    val outside = rows.map(_.getString(0)).filterNot(ball)
    assert(outside.isEmpty, s"mass outside the 3-hop ball: $outside")
  }
}

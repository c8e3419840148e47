package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch diagnostic (optimization r18): candidate-stream counts for
  * q_dedup_semantic — raw pair rows off the probe self-join (with the
  * per-pair cell-share duplication), distinct pairs, and accepted
  * (cos >= 0.3) pairs — to decide whether the fuzzy-join
  * dedup-after-verify restructure pays here too. Replicates the
  * Similarity.semanticDedupImpl candidate pipeline at the declared
  * operating point. Not part of any driver surface.
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("dotq", a, b)
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("""transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))""")
          .as("q"))
      .withColumn("n2", dot(col("q"), col("q")))
      .persist()
    val n = emb.count()
    val K = graft.ops.Similarity.resolveCells(spark, n, floor = 64L,
      defaultTarget = 32L).toLong
    val S = math.max(64L, math.floor(math.sqrt(64.0 * K)).toLong)
    println(s"[sprobe] n=$n K=$K S=$S")
    val sups = emb.filter(col("vec_id") < S)
      .select(col("vec_id").as("sid"), col("q").as("sq"), col("n2").as("sn2"))
    val vsc = emb.crossJoin(broadcast(sups))
      .select(col("vec_id"), col("sid"),
        (dot(col("q"), col("sq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("sn2").cast("double"))))
          .as("scos")).persist()
    val wS = Window.partitionBy(col("vec_id")).orderBy(col("scos").desc, col("sid"))
    val vsup = vsc.withColumn("srnk", row_number().over(wS))
      .filter(col("srnk") <= 8).select(col("vec_id"), col("sid"))
    val scj = vsc.filter(col("vec_id") < K).groupBy(col("vec_id"))
      .agg(max_by(col("sid"), struct(col("scos"), -col("sid"))).as("sid"))
      .select(col("vec_id").as("cid"), col("sid"))
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))
    val allowed = vsup.join(broadcast(scj), Seq("sid"))
      .select(col("vec_id"), col("cid"))
    val scored = allowed.join(broadcast(cents), Seq("cid"))
      .join(emb.select(col("vec_id"), col("q"), col("n2")), Seq("vec_id"))
      .select(col("vec_id"), col("cid"),
        (dot(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
    val wP = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val probes = scored.withColumn("prnk", row_number().over(wP))
      .filter(col("prnk") <= 6).select(col("vec_id"), col("cid")).persist()
    val raw = probes.as("a").join(probes.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    println(s"[sprobe] raw pair rows:      ${raw.count()}")
    val cand = raw.distinct().persist()
    println(s"[sprobe] distinct pairs:     ${cand.count()}")
    val acc = cand
      .join(emb.select(col("vec_id").as("va"), col("q").as("qa"),
        col("n2").as("na")), "va")
      .join(emb.select(col("vec_id").as("vb"), col("q").as("qb"),
        col("n2").as("nb")), "vb")
      .filter((dot(col("qa"), col("qb")).cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        >= 0.3)
    println(s"[sprobe] accepted (cos>=.3): ${acc.count()}")
    spark.stop()
  }
}

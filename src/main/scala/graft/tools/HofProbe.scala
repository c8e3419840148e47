package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic (optimization r18): times the OLD vs NEW forms
  * of the two trainer higher-order expressions — the BPE pair fan-out
  * (in-lambda re-split vs pre-bound split) and the unigram Viterbi DP
  * (double vs single literal-map lookup) — interleaved in ONE session,
  * so box noise and JIT state cancel. Not part of any driver surface.
  */
object HofProbe {
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
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[hprobe] $name%-24s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    // the real symbolized dictionary, persisted so both forms read cache
    val dict = graft.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("sym",
        concat(regexp_replace(col("word"), "(.)", "$1 "), lit("</w>")))
      .persist()
    println(s"[hprobe] dict rows: ${dict.count()}")

    def pairsOld(df: DataFrame) = df
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(split(sym, ' ')) - 1),
           i -> concat(element_at(split(sym, ' '), i), ' ',
                       element_at(split(sym, ' '), i + 1)))"""))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
    def pairsNew(df: DataFrame) = df
      .select(col("freq"), split(col("sym"), " ").as("syms"))
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
           i -> concat(element_at(syms, i), ' ',
                       element_at(syms, i + 1)))"""))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))

    // a realistic ~100-entry vocab for the DP
    val vocab: Map[String, Long] =
      (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> 21000000L)
        .toMap ++
        (1 to 60).map(i => s"p$i" -> 18000000L).toMap
    def dpOld(df: DataFrame) = df.withColumn("vm", typedLit(vocab))
      .withColumn("dp", expr(s"""
        aggregate(
          sequence(1, least(length(word), 16)),
          array(named_struct('c', CAST(0 AS BIGINT), 'nl', 0)),
          (acc, p) -> concat(acc, array(
            array_min(filter(
              transform(sequence(1, 4), l ->
                IF(p >= l AND element_at(vm,
                     substring(word, p - l + 1, l)) IS NOT NULL,
                   named_struct(
                     'c', element_at(acc, p - l + 1).c +
                       element_at(vm, substring(word, p - l + 1, l)),
                     'nl', CAST(-l AS INT)),
                   NULL)),
              x -> x IS NOT NULL)))))"""))
      .select(sum(expr("size(dp)")).as("s"))
    def dpNew(df: DataFrame) = df.withColumn("vm", typedLit(vocab))
      .withColumn("dp", expr(s"""
        aggregate(
          sequence(1, least(length(word), 16)),
          array(named_struct('c', CAST(0 AS BIGINT), 'nl', 0)),
          (acc, p) -> concat(acc, array(
            array_min(filter(
              transform(
                transform(sequence(1, 4), l ->
                  named_struct('l', l,
                    'v', IF(p >= l, element_at(vm,
                           substring(word, p - l + 1, l)), NULL))),
                e -> IF(e.v IS NOT NULL,
                   named_struct(
                     'c', element_at(acc, p - e.l + 1).c + e.v,
                     'nl', CAST(-e.l AS INT)),
                   NULL)),
              x -> x IS NOT NULL)))))"""))
      .select(sum(expr("size(dp)")).as("s"))

    for (r <- 1 to 3) {
      println(s"--- round $r")
      time("pairs OLD")(noop(pairsOld(dict)))
      time("pairs NEW")(noop(pairsNew(dict)))
      time("dp OLD")(noop(dpOld(dict)))
      time("dp NEW")(noop(dpNew(dict)))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the deletion-variant fuzzy join
  * (optimization r18): times each stage of q_join_fuzzy's pipeline in
  * isolation and counts the intermediate streams, so the optimization
  * targets the stage that actually costs. Not part of any driver
  * surface.
  */
object FuzzyProbe {
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
    val c = graft.Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fprobe] $name%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val variants = c.select(col("id"), explode(expr(
        """array_union(
             array(name),
             transform(sequence(1, length(name)),
               i -> concat(substring(name, 1, i - 1),
                           substring(name, i + 1, length(name)))))"""))
        .as("v"))
        .select(col("id"), xxhash64(col("v")).as("h"))
      time("variant explode + hash")(noop(variants))
      println(s"[fprobe]   variant rows: ${time("variant count")(variants.count())}")
      val joined = variants.as("a")
        .join(variants.as("b").hint("shuffle_hash"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .select(col("a.id").as("ida"), col("b.id").as("idb"))
      time("self-join (pre-distinct)")(noop(joined))
      println(s"[fprobe]   raw cand rows: ${time("raw cand count")(joined.count())}")
      val cand = joined.distinct()
      time("distinct")(noop(cand))
      println(s"[fprobe]   distinct cand rows: ${time("cand count")(cand.count())}")
      val full = cand
        .join(c.select(col("id").as("ida"), col("name").as("na")), "ida")
        .join(c.select(col("id").as("idb"), col("name").as("nb")), "idb")
        .withColumn("dist", levenshtein(col("na"), col("nb")))
        .filter(col("dist") <= 1)
        .select(col("ida"), col("idb"), col("dist"))
        .orderBy(col("ida"), col("idb"))
      time("verify + sort (full query)")(noop(full))
    }
    spark.stop()
  }
}

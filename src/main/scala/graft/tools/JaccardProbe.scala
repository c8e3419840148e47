package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the shingle-jaccard family (optimization
  * r17): times each stage of the inverted-index pair pipeline in
  * isolation over the warm cache, so the optimization targets the
  * stage that actually costs. Not part of any driver surface.
  */
object JaccardProbe {
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
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jprobe] $name%-26s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val raw = docs
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"),
          explode(array_distinct(when(size(col("t")) >= 3,
            expr("""transform(sequence(1, size(t) - 2),
                    i -> concat_ws(' ', element_at(t, i),
                                   element_at(t, i + 1),
                                   element_at(t, i + 2)))"""))
            .otherwise(array()))).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("shingle+hash (persist)")(noop(raw))
      val cnt = time("shingle count")(raw.count())
      println(s"[jprobe]   shingle rows: $cnt")
      val hot = raw.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select(col("h"))
      val sh = raw.join(hot, Seq("h"), "left_anti")
      time("df-cap anti-join")(noop(sh))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      time("sizes agg")(noop(sizes))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("i"))
      time("self-join + inter agg")(noop(inter))
      val ic = time("inter count")(inter.count())
      println(s"[jprobe]   pair rows: $ic")
      val full = inter
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .select(col("da"), col("db"),
          (col("i").cast("double") /
            (col("na") + col("nb") - col("i")).cast("double")).as("jacc"))
        .filter(col("jacc") >= 0.2)
        .orderBy(col("da"), col("db"))
      time("full query (warm raw)")(noop(full))
      raw.unpersist()
    }
    spark.stop()
  }
}

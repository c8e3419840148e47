package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage decomposition for the q_dedup_lsh_sweep stress
  * factor (r12): times signature build, PPJoin truth, and each (b, r)
  * band join separately at a given fixture dir. Not part of any
  * contract; run manually. */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.noDumps", "1")
    graft.functions.GraftFunctions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val sigs = docs
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(split(text, ' ')) - 2),
           i -> array_join(slice(split(text, ' '), i, 3), ' '))"""))
        .as("g"))
      .distinct()
      .withColumn("th", xxhash64(col("g")))
      .groupBy(col("doc_id"))
      .agg(expr("minhash32(th)").as("sig"))
      .persist()
    t("sigs materialize")(sigs.count())

    t("ppjoin truth") {
      graft.ops.CorpusOps21.ppjoinImpl(docs, 500, 3)
        .select(col("da"), col("db")).count()
    }

    for ((b, r) <- Seq((32, 1), (16, 2), (8, 4))) {
      val bands = sigs.select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, ${b - 1}), bi -> slice(sig, bi * $r + 1, $r))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
        .persist()
      t(s"bands($b,$r) mat")(bands.count())
      val hot = bands.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("df")).filter(col("df") > 50)
        .select(col("band"), col("key")).persist()
      val nh = t(s"hot($b,$r)")(hot.count())
      val cold = bands.join(broadcast(hot), Seq("band", "key"), "left_anti")
      val nc = t(s"cand($b,$r)") {
        cold.as("a").join(cold.as("b"),
            col("a.band") === col("b.band") &&
              col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct().count()
      }
      System.err.println(s"[probe]   hot=$nh cand=$nc")
      bands.unpersist(); hot.unpersist()
    }
    spark.stop()
  }
}

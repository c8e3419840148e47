package graft.tools

import org.apache.spark.sql.SparkSession

/** Second r12 probe: run q_dedup_lsh_sweep twice at one dir and print
  * BOTH wall times (the StressBench min-of-two hides whether run 2
  * actually hit the caches). */
object SweepProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stress10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.noDumps", "1")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_dedup_lsh_sweep")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      System.err.println(f"[probe2] run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    graft.CacheScope.release()
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (optimization r18): times the walk-heavy NSW
  * queries (search + the two sweeps, 8 beam walks total) with the noop
  * sink — the A/B instrument for the score-carrying visited-set rework
  * of CorpusOps57.walk. Not part of any driver surface.
  */
object NswProbe {
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
    System.setProperty("graft.noDumps", "1")
    val qs = args.drop(1).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q_sim_nsw_search", "q_sim_nsw_ef_sweep",
        "q_sim_nsw_deg_sweep"))
    // bench semantics: two timed runs per query, CacheScope released
    // only after the PAIR — run 2 reuses run 1's persisted frames via
    // the CacheManager plan match, exactly like Bench.timeAll
    qs.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once()
      val b = once()
      graft.CacheScope.release()
      println(f"[nprobe] $name%-22s run1 $a%7.3f  run2 $b%7.3f s")
    }
    spark.stop()
  }
}

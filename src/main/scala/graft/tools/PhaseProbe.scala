package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: split a query's wall time into plan
  * construction, analysis+optimization+physical planning, first
  * execution (cold caches/codegen) and second execution (the steady
  * state Bench's min-of-2 reports). Run:
  * sbt "runMain graft.tools.PhaseProbe <sfDir> <q1,q2,...>"
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.noDumps", "1")
    spark.range(1000).selectExpr("sum(id)").collect()
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val tBuild = ms(t0)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis+optimization+planning
      val tPlan = ms(t1)
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val tExec1 = ms(t2)
      val t3 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val tExec2 = ms(t3)
      graft.CacheScope.release()
      println(f"[probe] $name%-28s build=$tBuild%8.1f plan=$tPlan%8.1f " +
        f"exec1=$tExec1%8.1f exec2=$tExec2%8.1f ms")
    }
    spark.stop()
  }
}

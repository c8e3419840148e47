ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hdsphivereleasesrcspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap policy (measured r02): large heaps WITHOUT pre-touch made
// allocation sweep fresh pages and the kernel zeroing storm slowed
// queries 10-40x with zero GCs; pre-touch fixes that but its own cost
// explodes superlinearly on this kernel (16g: 14s, 24g: 188s, 90g:
// ~15min — THP defrag). 16g is ample for every sf0.1 workload (full
// bench: 17-30s), so clamp the requested driver memory to 16g and
// pre-fault it once at JVM start.
val driverMem: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g").toLowerCase
  val mb = if (req.endsWith("g")) req.dropRight(1).toLong * 1024
           else if (req.endsWith("m")) req.dropRight(1).toLong
           else sys.error(s"SPARK_DRIVER_MEM needs a g/m unit, got '$req'")
  s"${math.min(mb, 16384L)}m"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms$driverMem",
  "-XX:+UseParallelGC",
  "-XX:+AlwaysPreTouch",
)
// Optimization-round experiment hook: extra -D flags for the forked
// run/test JVMs (e.g. candidate spark.* confs measured A/B before being
// promoted into code). The driver never sets this env, so its bench JVMs
// are byte-identical to the committed defaults. A non-empty value is
// LOGGED loudly (ADVICE r17): a stray value lingering in a developer's
// environment would otherwise silently change every test/bench JVM.
// Split on whitespace runs, so multi-space formatting can't mangle
// flags (flags containing literal spaces are not supported — pass
// several -D flags instead).
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
  .map { v =>
    sLog.value.warn(
      s"SPARK_GRAFT_EXTRA_JAVA_OPTS is set — forked JVMs get: $v")
    v.split("\\s+").filter(_.nonEmpty).toSeq
  }.getOrElse(Seq.empty)

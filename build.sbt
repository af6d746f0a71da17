ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "energyemissionslakehousespark"
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
// Forked run output must reach stdout RAW, not through sbt's logger:
// the "[info] " prefix makes the Bench/Verify JSON lines unparseable
// for anything that json-loads captured output lines.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Heap sized to the session's CORE COUNT, not a constant (r22, guide §5):
// local-mode execution memory is shared by every concurrent task, and the
// historic 8g default left local[32] ~150 MB of execution memory per task
// slot — heavy sort/join stages spilled under concurrency that local[8]
// never saw (one mechanism behind 32-core-only slowdowns on a 128 GiB
// box). 512 MB/core + 4 GB driver slack, floor 8g (so 8-core sessions
// keep their historical conditions); SPARK_DRIVER_MEM still overrides.
def graftDefaultHeap: String = {
  val cores =
    try sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt
    catch { case _: NumberFormatException => 32 }
  s"${math.max(8, 4 + cores / 2)}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", graftDefaultHeap)}",
) ++
  // ad-hoc forked-JVM flags for perf probes (GC logs, profilers):
  // e.g. SPARK_GRAFT_EXTRA_JAVA_OPTS="-Xlog:gc*:file=/tmp/gc.log"
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))

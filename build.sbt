ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "phrasekitspark"
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
// Pass the forked run's stdout through VERBATIM (no [info] prefixing): the
// bench driver machine-parses the single JSON line Bench prints, and sbt's
// default logger wrapping made BENCH_r02.json's `parsed` field null.
run / outputStrategy := Some(StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // fixed heap: without -Xms the first big job in a fork pays heap growth +
  // GC-ergonomics adaptation — measurement noise the scaling bench can't
  // afford (part of the session-scoped first-sample ramp; Bench scaladoc)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // fixed, level-independent GC parallelism: the scaling bench compares
  // local[2] vs local[8] sessions inside ONE JVM — by default the GC uses
  // all 32 host threads, handing the small-N phase free parallelism the
  // task-slot cap doesn't govern and skewing the efficiency ratio
  "-XX:ParallelGCThreads=8", "-XX:ConcGCThreads=2",
)

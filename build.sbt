ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tbscalespatialdatapipelinespark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // A 181-query whole-stage-codegen run generates far more JIT'd classes
  // than the JVM's default 240 MB code cache holds; when it fills, the
  // compiler DISABLES itself and later queries run interpreted (observed
  // as systematic 2-20x slowdowns on hash-heavy queries late in full-
  // suite runs that never reproduce in short local ones).
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
  // HotSpot refuses to JIT methods over ~8 KB of bytecode by default;
  // a single wide codegen'd expression (m1b's 16-tree frozen-forest CASE
  // sum is one ~2400-node expression that cannot be split per-method)
  // lands exactly there and runs as interpreted bytecode (~3.5 us/row
  // measured). Standard Spark-on-wide-codegen tuning.
  "-XX:-DontCompileHugeMethods",
)

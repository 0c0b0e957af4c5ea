ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlportofoliospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Spark suites share one local SparkSession; running them in parallel
// multiplies concurrent jobs on one heap and OOMs the fork.
Test / parallelExecution := false
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
  // ~80 queries of whole-stage-codegen classes overflow the default
  // 240 MB code cache; once full the JIT stops compiling and late
  // queries run interpreted (3-5x slowdowns late in Verify/Bench).
  "-XX:ReservedCodeCacheSize=1g", "-XX:+UseCodeCacheFlushing",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// `spark.sql.catalogImplementation` is a STATIC conf — the first
// session in a JVM pins it. HiveCatalogSpec needs a hive (Derby
// metastore) catalog while every other suite shares the in-memory
// one, so it gets its own forked JVM.
Test / testGrouping := {
  val forkOpts = ForkOptions().withRunJVMOptions(
    ((Test / javaOptions).value ++ (Test / envVars).value.map { case (k, v) => s"-D$k=$v" }).toVector)
  val (hive, rest) = (Test / definedTests).value
    .partition(_.name.endsWith("HiveCatalogSpec"))
  Seq(
    Tests.Group("rest", rest, Tests.SubProcess(forkOpts)),
    Tests.Group("hive", hive, Tests.SubProcess(forkOpts)))
}

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "solspark"
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
// Forked run output goes straight to stdout — no sbt "[info] " prefix, so
// Bench's single JSON line parses cleanly for the driver.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Suites that need their own SparkContext run in their own forked JVM,
// apart from the shared-session suite group (sbt runs the groups serially):
// HiveSpec + ThriftServerSpec flip spark.sql.catalogImplementation=hive (a
// static conf fixed at SharedState creation), RetrySpec needs a
// local[4,2] master (task retries — maxFailures is a context property).
// ClusterSpec needs a local-cluster[2,2,1024] master (separate executor
// JVM processes — the only way to exercise speculation, which
// TaskSchedulerImpl disables under isLocal).
val ownJvmSuites = Seq("HiveSpec", "ThriftServerSpec", "RetrySpec", "ClusterSpec")
Test / testGrouping := {
  val jvmOpts = (Test / javaOptions).value.toVector
  // ClusterSpec's in-process Worker builds executor launch commands via the
  // launcher library directly (no bin/load-spark-env.sh), which needs
  // SPARK_SCALA_VERSION to resolve the binary dist's jars dir.
  val env = Map("SPARK_SCALA_VERSION" -> "2.13")
  val (own, rest) = (Test / definedTests).value
    .partition(t => ownJvmSuites.exists(t.name.endsWith))
  (own.map(t => Tests.Group(t.name, Seq(t),
    Tests.SubProcess(ForkOptions().withRunJVMOptions(jvmOpts).withEnvVars(env)))) :+
    Tests.Group("rest", rest,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(jvmOpts).withEnvVars(env))))
    .filter(_.tests.nonEmpty)
}

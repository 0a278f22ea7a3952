ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "reddittwitterbigdatapipelinespark"
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
// The forked run JVM inherits sbt's raw stdout instead of going through the
// logger: without this every println is re-emitted as an "[info] ..." line,
// which is why the driver's JSON-tail parse of Bench output came back null
// four rounds running. With StdoutOutput the final bench JSON line is bare.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Embedded Derby (JdbcUpsertSinkSpec) is one engine per JVM and its
// storage layer races under heavy parallel-suite load (NPE in
// BaseContainerHandle.deleteObserver — seen in the r3 full run, passes in
// isolation). Run Derby-touching suites in their OWN forked JVM; the
// default Tags.ForkedTestGroup limit of 1 serializes the groups, so the
// Derby engine always gets a quiet JVM.
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val (derby, rest) = (Test / definedTests).value
    .partition(_.name.contains("JdbcUpsertSinkSpec"))
  Seq(
    Tests.Group("derby", derby, Tests.SubProcess(opts)),
    Tests.Group("rest", rest, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}

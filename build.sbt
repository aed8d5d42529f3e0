ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cardanospark"
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
  // embedded Derby (JdbcSink tests) writes its log to CWD otherwise
  "-Dderby.stream.error.file=/tmp/derby.log",
  "-Dspark.sql.session.timeZone=UTC",
  // javax.imageio (Multimodal PNG decode) without a display
  "-Djava.awt.headless=true",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

// Parallel forked test groups (round-17 suite-wall work): the suite is
// 64 sequential suites in one JVM — ~1540 s wall on a 32-CPU host that
// a local[4] session leaves ~87% idle. Suites partition into five
// groups, each forked into its OWN JVM with its OWN SparkSession, run
// concurrently: no shared-session state at all (conf toggles, tracked
// caches, StagedLayouts, warehouse tables are all per-JVM), so this is
// parallelism without any cross-suite race surface. The scratch
// PostgreSQL suites already bind per-suite unix-socket ports; Derby
// runs per-suite temp databases. Grouping is balanced from measured
// per-suite walls (QueriesSmokeSpec ~450 s is the pole and gets its
// own JVM; the LoopFixtures sharers stay together so the staged loop
// run is still built once).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val fo = (Test / forkOptions).value
  val gfo = fo.withRunJVMOptions(
    fo.runJVMOptions.filterNot(_.startsWith("-Xmx")) :+
      s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "10g")}")
  def groupOf(fqcn: String): String = {
    val n = fqcn.substring(fqcn.lastIndexOf('.') + 1)
    if (n == "QueriesSmokeSpec") "g0-smoke"
    else if (Set("RefreshLoopSpec", "ProductionPipelineSpec",
        "StreamOuterJoinSpec", "ProcessingTimeTriggerSpec",
        "Scd2ZoneSpec", "CdcZoneSpec").contains(n)) "g1-loops"
    else if (Set("SemanticLoopSpec", "TokenizerLoopSpec",
        "EventStreamSpec", "PostgresCdcSpec", "PostgresCdc5Spec",
        "PostgresStreamLoopSpec").contains(n)) "g2-streams"
    else if (Set("JdbcSinkSpec", "PostgresDialectSpec",
        "SignatureZoneSpec", "PqZoneSpec", "IvfIndexZoneSpec",
        "ZoneMaintenanceSpec", "ZoneRebuildSpec",
        "HammingZoneSpec").contains(n)) "g3-zones"
    else "g4-core"
  }
  tests.groupBy(t => groupOf(t.name)).toSeq.sortBy(_._1).map {
    case (g, ts) => Tests.Group(g, ts, Tests.SubProcess(gfo))
  }
}
// sbt's default restrictions serialize forked test groups — lift that
// (5 groups × local[4] sessions ≈ 20 busy threads on 32 CPUs).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(16),
)

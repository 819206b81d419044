ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ubdcairbnbspark"
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
// Pass forked-run stdout through UNPREFIXED: Bench's contract is ONE bare
// JSON line on stdout; sbt's default log routing would prepend "[info] ".
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
// Right-size the forked-run heap. SPARK_DRIVER_MEM may offer the whole
// box (~90g on a 128g host), but a huge heap actively HURTS this
// workload: G1 spreads allocation across fresh regions, so allocation-
// heavy queries (dedup explode + collect_set churn) page-fault through
// tens of GB of never-touched 4K pages. Measured on q33 at sf0.1:
// 2.3s @ 8g heap, 74s @ 90g, 91s @ -Xms90g, minutes with THP-madvise
// (synchronous hugepage compaction). sf0.1 runs peak well under 8g, so
// cap at 16g and pre-touch at startup — the same right-sizing you'd
// apply to executor heaps on a real cluster (many modest executors beat
// one giant heap for shuffle-heavy work).
val graftHeapGb: Int = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  def num(s: String): Option[Int] = scala.util.Try(s.toInt).toOption
  val gb =
    if (req.endsWith("m")) num(req.stripSuffix("m")).map(m => (m + 1023) / 1024)
    else num(req.stripSuffix("g"))
  math.max(4, math.min(gb.getOrElse(8), 16))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms${graftHeapGb}g",
  s"-Xmx${graftHeapGb}g",
  "-XX:+AlwaysPreTouch",
  // dozens of whole-stage-codegen'd queries in one JVM overflow the
  // default 240m code cache; once full the JIT stops compiling and
  // trig-heavy plans run interpreted (observed 10-20x slowdowns)
  // 42+ codegen'd queries x 3 bench runs overflow smaller caches - when
  // the code cache fills, the JIT stops compiling and late-alphabet
  // queries run interpreted (10-30x). Flushing alone thrashes; 1g
  // overflowed at ~450+ codegen'd queries, 2g holds the full suite.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:+UseCodeCacheFlushing",
)

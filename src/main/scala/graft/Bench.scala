package graft

import scala.jdk.CollectionConverters._

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver. Uses GraftSession.builder so the
  * benched plans carry the engine's tuned config (AQE, broadcast
  * threshold, shuffle partitions). Full-suite runs with a committed
  * baseline for the same sf also run the 2x flag gate IN-PROCESS (after
  * the isolated re-measure) and exit nonzero on a remaining non-exempt
  * flag, so a round close cannot be green-by-staleness (r10 verdict #7). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    // the driver parses ONE JSON line from a ~2000-char output TAIL;
    // WindowExec's "No Partition Defined" WARN (4 audited-bounded sites,
    // SURVEY §5 aggwin census) would squeeze it out — silence that
    // logger for the bench process only, AFTER Spark's log4j2 context
    // is initialized so the override is not reconfigured away.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    // Column's "Constructing trivially true equals predicate" WARN (self-
    // join disambiguation on audited same-key joins) — same tail-budget
    // hazard; the r8 tail still carried these lines ahead of the JSON.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.Column",
      org.apache.logging.log4j.Level.ERROR)
    // warm the JVM + parquet footers once so per-query numbers measure the
    // plan, not first-touch classloading.
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    // dev-only subset filter (regex on query name); driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    val results = selected.map { case (name, fn) =>
      // min of N runs (cache cleared between them): run 1 absorbs
      // codegen/JIT compile; the min filters transient host throttling,
      // which swings identical binaries by 4-10x on this box. Every run
      // still includes the full pipeline (no warm caches carried over).
      val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
      var crashed = false
      val dt = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => crashed = true }
        (System.nanoTime() - t0) / 1e9
      }.min
      spark.catalog.clearCache()
      // a crashing query must NOT land as a fast green entry: record -1 so
      // tools/check_bench_outliers.py fails the gate on it.
      name -> (if (crashed) -1.0 else dt)
    }
    // Deterministic 2x gate (r9 verdict #2): a 2-3s query measured during
    // the 628-query sweep can read 20-50% high from ambient contention /
    // GC debt, so a would-be gate flag is NOT trusted until re-measured
    // isolated — end of suite, nothing concurrent, min-of-3 after
    // clearCache — and the honest min is what lands in the JSON. The
    // committed DuckDB baseline for this sf (matched by dir basename)
    // supplies the ratio; no baseline on disk → no re-measure (dev dirs).
    val sfBase = sfDir.stripSuffix("/").split("/").last
    val floor = if ("sf1(?![0-9.])".r.findFirstIn(sfBase).isDefined) 5.0 else 2.0
    val baseQ: Map[String, Double] = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      // every committed BASELINE_*.json is a candidate; the embedded sf
      // field decides the match (r10 advice: a hardcoded pair silently
      // skipped the sf0.3 tier)
      val baselineFiles = {
        val d = java.nio.file.Paths.get(".")
        val st = java.nio.file.Files.list(d)
        try st.iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith("BASELINE_") && n.endsWith(".json"))
          .toSeq.sorted
        finally st.close()
      }
      baselineFiles.iterator.flatMap { f =>
        val p = java.nio.file.Paths.get(f)
        if (!java.nio.file.Files.exists(p)) Iterator.empty
        else {
          val j = JsonMethods.parse(java.nio.file.Files.readString(p))
          val bsf = j \ "sf" match {
            case JString(s) => s.stripSuffix("/").split("/").last
            case _          => ""
          }
          if (bsf != sfBase) Iterator.empty
          else j \ "queries" match {
            case JObject(fields) => Iterator(fields.collect {
              case (k, JDouble(v))  => k -> v
              case (k, JInt(v))     => k -> v.toDouble
              case (k, JDecimal(v)) => k -> v.toDouble
              case (k, JLong(v))    => k -> v.toDouble
            }.toMap)
            case _ => Iterator.empty
          }
        }
      }.nextOption().getOrElse(Map.empty)
    }
    val candidates = results.filter { case (n, t) =>
      t > floor && baseQ.get(n).exists(b => b >= 0 && t > 2.0 * math.max(b, 1e-4))
    }
    val remeasured = candidates.map { case (name, sweepT) =>
      System.gc()
      val fn = SparkEntry.queries(name)
      val iso = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // a query that survived the sweep but crashes here keeps its
        // (honest, slower) sweep time rather than killing the bench
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => Double.MaxValue }
      }.min
      name -> math.min(sweepT, iso) // min over all 6 honest cold runs
    }.toMap
    val finalResults = results.map { case (n, t) => n -> remeasured.getOrElse(n, t) }
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val total = finalResults.map(_._2).filter(_ >= 0).sum
    // 1-min system load average (32-core box): lets a flag be adjudicated
    // against machine weather after the fact.
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Full per-query timings → file: the driver keeps only a ~2000-char
    // stdout tail (BENCH_r02/r03 parsed at 42/51 queries, r04/r05 with
    // 500+ queries did not), so the stdout line carries the slowest 40
    // (the regression-relevant ones) and the file carries everything.
    val isoNote = f""""remeasured":${remeasured.size},"load_avg":$loadAvg%.2f"""
    val fullJson = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${finalResults.size},$isoNote,"queries":${jmap(finalResults)},"sf":"$sfDir"}"""
    // dev-only subset runs must not clobber the committed full-suite file
    if (only.isEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_local.json"), fullJson + "\n")
    val top = finalResults.sortBy(-_._2).take(40).sortBy(_._1)
    // only advertise the full-suite file when this run actually wrote it
    // (subset runs deliberately leave BENCH_local.json untouched)
    val allRef = if (only.isEmpty) """"queries_all":"BENCH_local.json",""" else ""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${finalResults.size},$allRef$isoNote,"queries":${jmap(top)},"sf":"$sfDir"}""")
    spark.stop()
    // In-process flag gate (r10 verdict #7): identical rule to
    // tools/check_vs_baseline.py — ratio > 2x AND above the sf floor AND
    // not in the shared exemption file. Numbers here already include the
    // isolated re-measure, so a nonzero exit is a real plan regression,
    // not machine weather. Subset runs and dirs without a committed
    // baseline skip it; SPARK_GRAFT_BENCH_NOGATE=1 is the dev override.
    if (only.isEmpty && baseQ.nonEmpty &&
        !sys.env.get("SPARK_GRAFT_BENCH_NOGATE").contains("1")) {
      val exPath = java.nio.file.Paths.get("tools/exemptions.json")
      val exempt: Set[String] =
        if (!java.nio.file.Files.exists(exPath)) Set.empty
        else {
          import org.json4s._
          import org.json4s.jackson.JsonMethods
          val j = JsonMethods.parse(java.nio.file.Files.readString(exPath))
          def names(field: String): Set[String] = j \ field match {
            case JArray(vs) => vs.collect { case JString(s) => s }.toSet
            case _          => Set.empty
          }
          names("base") ++
            (if (floor == 5.0) names("sf1_extra") else Set.empty)
        }
      val flags = finalResults.filter { case (n, t) =>
        t > floor && !exempt(n) &&
          baseQ.get(n).exists(b => b >= 0 && t > 2.0 * math.max(b, 1e-4))
      }
      // stderr: the driver parses ONE JSON line from a ~2000-char stdout
      // tail, so gate chatter must not displace it
      flags.foreach { case (n, t) =>
        System.err.println(f"GATE-FLAG $n: spark $t%.3fs vs baseline ${baseQ(n)}%.3fs = ${t / math.max(baseQ(n), 1e-4)}%.1fx")
      }
      if (flags.nonEmpty) {
        System.err.println(s"gate: ${flags.size} non-exempt flag(s) — exiting nonzero")
        sys.exit(1)
      }
      System.err.println("gate: ok (no non-exempt query exceeds 2x of baseline)")
    }
  }
}
